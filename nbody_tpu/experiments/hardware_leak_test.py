"""Hardware leak test: does "broken physics" cost extra energy?

TPU-native equivalent of the reference test
(reference: hardware_leak_test.py:74-612). The reference drives six
workload patterns while a 10 Hz NVML+psutil monitor thread records power,
then computes "unexplained power" — the power not explained by reported
utilization. TPUs expose no power counters, so this build runs the same
six workloads under the documented degraded telemetry mode
(SURVEY.md §7 'NVML-shaped features'): the monitor records host CPU, RSS
and device memory, and the "parasitic energy" observable becomes
per-iteration wall-time inflation of the broken workload relative to the
clean one at identical logical work.

Usage:
    python -m nbody_tpu.experiments.hardware_leak_test --quick
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision
from nbody_tpu.utils.profiler import DeviceProfiler, fence


def _workload_idle(duration_s: float):
    time.sleep(duration_s)
    return 0


def _make_sim_workload(precision, num_stars, seed):
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    sim = DirectSimulation(pos, vel, m, precision=precision)
    sim.step(20)  # warm the exact 20-step program the loop measures
    fence(sim.state.positions)

    def run(duration_s: float):
        iters = 0
        t_end = time.perf_counter() + duration_s
        while time.perf_counter() < t_end:
            sim.step(20)
            fence(sim.state.positions)
            iters += 20
        return iters

    return run


def _workload_recursive_stress(duration_s: float):
    """matmul/log/exp chains (reference: hardware_leak_test.py:557-560)."""
    x = jnp.ones((512, 512)) * 1.001

    @jax.jit
    def chain(a):
        for _ in range(8):
            a = jnp.log(jnp.exp(a @ a * 1e-3) + 1.0)
        return a

    fence(chain(x))
    iters = 0
    t_end = time.perf_counter() + duration_s
    while time.perf_counter() < t_end:
        fence(chain(x))
        iters += 1
    return iters


def _workload_memory_thrash(duration_s: float):
    """Repeated large alloc/free cycles."""
    iters = 0
    t_end = time.perf_counter() + duration_s

    @jax.jit
    def alloc(key):
        return jnp.sum(jax.random.normal(key, (1024, 1024)))

    k = jax.random.PRNGKey(0)
    while time.perf_counter() < t_end:
        k, sub = jax.random.split(k)
        fence(alloc(sub))
        iters += 1
    return iters


def run_leak_test(duration_s: float = 5.0, num_stars: int = 800,
                  seed: int = 42):
    """(reference: hardware_leak_test.py:184-370)"""
    workloads = {
        "idle": _workload_idle,
        "float64_clean": _make_sim_workload(Precision.FLOAT64,
                                            min(num_stars, 400), seed),
        "float32_standard": _make_sim_workload(Precision.FLOAT32, num_stars,
                                              seed),
        "int4_broken": _make_sim_workload(Precision.INT4_SIM, num_stars,
                                          seed),
        "recursive_stress": _workload_recursive_stress,
        "memory_thrash": _workload_memory_thrash,
    }

    results = {}
    for name, fn in workloads.items():
        prof = DeviceProfiler(sample_interval_ms=100, experiment_name=name)
        prof.start()
        t0 = time.perf_counter()
        iters = fn(duration_s)
        wall = time.perf_counter() - t0
        prof.stop()
        a = prof.analyze()
        results[name] = {
            "iterations": iters,
            "wall_s": wall,
            "iters_per_sec": iters / wall if wall > 0 else 0.0,
            "mean_host_cpu": a.mean_host_cpu,
            "peak_memory_mb": a.peak_memory_mb,
            "power_watts": None,  # NVML channel: unavailable on TPU
        }
        print(f"  {name:18s}: {iters:6d} iters in {wall:.1f}s "
              f"({results[name]['iters_per_sec']:8.1f}/s)  "
              f"cpu={a.mean_host_cpu if a.mean_host_cpu is not None else float('nan'):5.1f}%  "
              f"mem={a.peak_memory_mb if a.peak_memory_mb else 0:.0f}MB")
    return results


def analyze_leak(results) -> dict:
    """Degraded-mode 'parasitic energy' analysis
    (reference: hardware_leak_test.py:317-370): per-tick cost inflation of
    broken vs clean at identical logical work replaces the power ratio."""
    clean = results["float32_standard"]["iters_per_sec"]
    broken = results["int4_broken"]["iters_per_sec"]
    overhead = (clean / broken - 1.0) * 100.0 if broken > 0 else float("inf")
    verdict = {
        "clean_ticks_per_sec": clean,
        "broken_ticks_per_sec": broken,
        "broken_overhead_percent": overhead,
        "parasitic_cost_detected": overhead > 10.0,
        "note": ("reference measured ~31.6% power overhead for "
                 "low-precision compute on RTX 5090; TPU degraded mode "
                 "measures wall-time overhead of the int4 quantization "
                 "path instead (no power counters)"),
    }
    print(f"\n  int4 'broken math' overhead vs clean float32: "
          f"{overhead:+.1f}% "
          f"({'PARASITIC COST DETECTED' if verdict['parasitic_cost_detected'] else 'within noise'})")
    return verdict


def main(argv=None):
    p = argparse.ArgumentParser(description="Hardware leak test (degraded "
                                            "telemetry mode on TPU)")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--stars", type=int, default=800)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/hardware_leak")
    args = p.parse_args(argv)
    if args.quick:
        args.duration, args.stars = 2.0, 400

    print("\n" + "=" * 60)
    print("HARDWARE LEAK TEST (TPU degraded-telemetry mode)")
    print("=" * 60)
    results = run_leak_test(args.duration, args.stars, args.seed)
    verdict = analyze_leak(results)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "hardware_leak_report.json").write_text(json.dumps(
        {"workloads": results, "analysis": verdict}, indent=2))


if __name__ == "__main__":
    main()
