"""Stability test: find the quantization stability floor.

TPU-native equivalent of the reference suite
(reference: stability_test.py:22-252): run every precision mode until
explosion (NaN/Inf, >1000% drift, unbound) or max_ticks, then print the
stability-floor table and the threshold mode.

Usage:
    python -m nbody_tpu.experiments.stability_test --stars 2000 --ticks 2000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax

from nbody_tpu.experiments._common import detect_explosion, energy_drift_pct
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision

MODES = [Precision.FLOAT64, Precision.FLOAT32, Precision.BFLOAT16,
         Precision.FLOAT16, Precision.INT8_SIM, Precision.INT4_SIM]


@dataclasses.dataclass
class StabilityResult:
    mode: str
    stable_ticks: int
    final_energy: float
    initial_energy: float
    energy_drift_percent: float
    exploded: bool
    runtime_seconds: float


def test_precision_mode(positions, velocities, masses, mode: Precision,
                        max_ticks: int = 2000, check_interval: int = 50,
                        **sim_kwargs) -> StabilityResult:
    """(reference: stability_test.py:64-130) — the tick loop runs as fused
    check_interval-step scans with one explosion check per chunk."""
    print(f"  Testing {mode.value}...", end=" ", flush=True)
    t0 = time.time()
    sim = DirectSimulation(positions, velocities, masses, precision=mode,
                           **sim_kwargs)
    initial_energy = sim.get_total_energy()
    stable_ticks = 0
    exploded = False

    for tick in range(0, max_ticks, check_interval):
        sim.step(check_interval)
        stable_ticks = tick + check_interval
        if detect_explosion(sim, initial_energy):
            exploded = True
            print(f"EXPLODED at tick {stable_ticks}")
            break
        if stable_ticks % 500 == 0:
            print(stable_ticks, end=" ", flush=True)

    runtime = time.time() - t0
    final_energy = sim.get_total_energy()
    drift = energy_drift_pct(initial_energy, final_energy)
    if not exploded:
        print(f"STABLE ({max_ticks} ticks, {drift:+.2f}% drift)")
    return StabilityResult(mode=mode.value, stable_ticks=stable_ticks,
                           final_energy=final_energy,
                           initial_energy=initial_energy,
                           energy_drift_percent=drift, exploded=exploded,
                           runtime_seconds=runtime)


def run_stability_suite(num_stars: int = 2000, max_ticks: int = 2000,
                        seed: int = 42, **sim_kwargs):
    """(reference: stability_test.py:133-191)"""
    print(f"\n{'=' * 60}\nQUANTIZATION STABILITY FLOOR TEST\n{'=' * 60}")
    print(f"Stars: {num_stars}, max ticks: {max_ticks}, "
          f"backend: {jax.default_backend()}")

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed),
                                     num_stars=num_stars)
    results = [test_precision_mode(pos, vel, m, mode, max_ticks,
                                   **sim_kwargs)
               for mode in MODES]

    print(f"\n{'=' * 60}\nSTABILITY FLOOR RESULTS\n{'=' * 60}")
    print(f"{'Mode':12s} {'Status':10s} {'Ticks':>7s} {'Drift %':>10s} "
          f"{'Runtime s':>10s}")
    print("-" * 60)
    for r in results:
        status = "EXPLODED" if r.exploded else "stable"
        print(f"{r.mode:12s} {status:10s} {r.stable_ticks:7d} "
              f"{r.energy_drift_percent:+10.2f} {r.runtime_seconds:10.2f}")

    # Threshold mode: the first mode (walking down the ladder) that
    # explodes or exceeds 5% drift (reference: stability_test.py:239-247).
    threshold = None
    for r in results:
        if r.exploded or abs(r.energy_drift_percent) > 5.0:
            threshold = r.mode
            break
    if threshold:
        print(f"\nStability floor: physics breaks at '{threshold}'")
    else:
        print("\nAll modes stable within 5% drift at this configuration")
    return results, threshold


def main(argv=None):
    p = argparse.ArgumentParser(description="Quantization stability floor")
    p.add_argument("--stars", type=int, default=2000)
    p.add_argument("--ticks", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/stability")
    args = p.parse_args(argv)

    results, threshold = run_stability_suite(args.stars, args.ticks,
                                             args.seed)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "stability_results.json").write_text(json.dumps({
        "results": [dataclasses.asdict(r) for r in results],
        "threshold_mode": threshold,
        "num_stars": args.stars,
        "max_ticks": args.ticks,
    }, indent=2))
    print(f"\nResults written to {out / 'stability_results.json'}")


if __name__ == "__main__":
    main()
