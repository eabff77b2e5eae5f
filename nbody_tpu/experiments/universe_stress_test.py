"""Universe stress test: composite "hard mode" boundary scan.

TPU-native equivalent of the reference composite
(reference: universe_stress_test.py:81-713): a quick boundary scan across
the four crash axes (velocity / dt / quantization / softening), a
clean-vs-broken ghost-force energy-leak measurement, a mini density
scaling run, a "reality map" figure and a JSON report.

Usage:
    python -m nbody_tpu.experiments.universe_stress_test --quick
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import jax

from nbody_tpu.experiments import crash_point_test as cpt
from nbody_tpu.experiments import density_limit_test as dlt
from nbody_tpu.experiments._common import energy_drift_pct
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision


@dataclasses.dataclass
class UniverseBoundary:
    """(reference: universe_stress_test.py:81-92)"""

    axis: str
    safe_value: float | None
    crash_value: float | None
    crash_type: str | None


def quick_boundary_scan(num_stars: int, ticks: int, seed: int):
    """(reference: universe_stress_test.py:119-273)"""
    print("\n--- BOUNDARY SCAN (4 axes) ---")
    vel = cpt.find_velocity_crash_point(num_stars, ticks, seed)
    dt = cpt.find_dt_crash_point(num_stars, ticks, seed)
    quant = cpt.find_quantization_crash_point(num_stars, ticks, seed)
    soft = cpt.find_softening_crash_point(num_stars, ticks, seed)

    def boundary(axis, sweep, key, crash_key):
        crash = next((r for r in sweep["sweep"] if r["crash"]), None)
        safe = None
        for r in sweep["sweep"]:
            if r["crash"]:
                break
            safe = r[key]
        return UniverseBoundary(
            axis=axis, safe_value=safe,
            crash_value=crash[key] if crash else None,
            crash_type=crash["crash"]["crash_type"] if crash else None)

    return [
        boundary("velocity_multiplier", vel, "multiplier", "crash"),
        boundary("dt", dt, "dt", "crash"),
        boundary("quantization_levels", quant, "levels", "crash"),
        boundary("softening", soft, "softening", "crash"),
    ]


def measure_energy_leak(num_stars: int, ticks: int, seed: int) -> dict:
    """Ghost-force leak: per-tick energy injection of broken vs clean
    (reference: universe_stress_test.py:276-347)."""
    print("\n--- ENERGY LEAK (ghost force) ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    rates = {}
    for mode in (Precision.FLOAT32, Precision.INT4_SIM):
        sim = DirectSimulation(pos, vel, m, precision=mode)
        e0 = sim.get_total_energy()
        sim.step(ticks)
        drift = energy_drift_pct(e0, sim.get_total_energy())
        rates[mode.value] = drift / ticks
        print(f"  {mode.value}: {drift / ticks:+.5f}%/tick")
    ghost = rates["int4_sim"] - rates["float32"]
    print(f"  ghost-force rate (int4 - f32): {ghost:+.5f}%/tick")
    return {"rates_pct_per_tick": rates, "ghost_rate_pct_per_tick": ghost}


def plot_reality_map(boundaries, out_dir: Path):
    """(reference: universe_stress_test.py:350-470)"""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    labels = [b.axis for b in boundaries]
    crashes = [(b.crash_value if b.crash_value is not None else 0)
               for b in boundaries]
    colors = ["#e74c3c" if b.crash_value is not None else "#2ecc71"
              for b in boundaries]
    bars = ax.barh(labels, [1] * len(labels), color=colors, alpha=0.6)
    for bar, b in zip(bars, boundaries):
        txt = (f"breaks at {b.crash_value} ({b.crash_type})"
               if b.crash_value is not None else "no crash found in range")
        ax.text(0.02, bar.get_y() + bar.get_height() / 2, txt,
                va="center", fontsize=10)
    ax.set_xlim(0, 1)
    ax.set_xticks([])
    ax.set_title("Reality map: where the universe breaks")
    fig.tight_layout()
    path = out_dir / "reality_map.png"
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def run_full_stress_test(quick: bool, seed: int, out_dir: str) -> dict:
    """(reference: universe_stress_test.py:477-615)"""
    n = 300 if quick else 600
    ticks = 100 if quick else 300
    boundaries = quick_boundary_scan(n, ticks, seed)
    leak = measure_energy_leak(n, ticks * 2, seed)
    print("\n--- MINI DENSITY SCALING ---")
    density = dlt.run_density_sweep([100, 400, 1000] if quick
                                    else [100, 400, 1000, 4000],
                                    ticks_per_size=50, seed=seed)
    report = {
        "boundaries": [dataclasses.asdict(b) for b in boundaries],
        "energy_leak": leak,
        "density_scaling": density,
    }
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    plot_reality_map(boundaries, out)
    (out / "stress_test_report.json").write_text(
        json.dumps(report, indent=2, default=str))
    print(f"\nReality map + report written to {out}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Composite universe stress test")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/stress")
    args = p.parse_args(argv)
    print("\n" + "=" * 60)
    print("UNIVERSE STRESS TEST (hard mode)")
    print("=" * 60)
    run_full_stress_test(args.quick, args.seed, args.output)


if __name__ == "__main__":
    main()
