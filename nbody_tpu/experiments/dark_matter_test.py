"""Dark-matter control experiment: what REAL dark matter does.

TPU-native equivalent of the reference control
(reference: dark_matter_test.py:24-217): rotation curves from galaxies with
genuine analytic NFW halos at DM ratios 0/2/5/10x, initial vs final curves,
and an outer-slope table — the yardstick against which quantization
artifacts are compared.

Usage:
    python -m nbody_tpu.experiments.dark_matter_test --stars 2000 --ticks 400
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from nbody_tpu.diagnostics.metrics import rotation_curve
from nbody_tpu.experiments._common import outer_slope
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy, create_galaxy_with_halo
from nbody_tpu.ops.precision import Precision

DM_RATIOS = [0.0, 2.0, 5.0, 10.0]


def run_dm_comparison(num_stars: int = 2000, num_ticks: int = 400,
                      seed: int = 42):
    """(reference: dark_matter_test.py:24-97)"""
    print("\n" + "=" * 60)
    print("DARK MATTER CONTROL EXPERIMENT")
    print("Rotation curves with REAL (analytic NFW) dark matter halos")
    print("=" * 60)

    key = jax.random.PRNGKey(seed)
    results = {}
    for ratio in DM_RATIOS:
        label = f"DM {ratio:g}x"
        print(f"\n  {label}: building ICs and running {num_ticks} ticks...")
        if ratio == 0.0:
            pos, vel, m = create_disk_galaxy(key, num_stars=num_stars)
        else:
            pos, vel, m = create_galaxy_with_halo(key, num_stars=num_stars,
                                                  dm_mass_ratio=ratio)
        initial_curve = rotation_curve(pos, vel, num_bins=15)
        sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
        sim.step(num_ticks)
        final_curve = rotation_curve(sim.positions, sim.velocities,
                                     num_bins=15)
        s0, v0 = outer_slope(initial_curve)
        s1, v1 = outer_slope(final_curve)
        results[label] = {
            "dm_ratio": ratio,
            "initial_curve": {"radii": np.asarray(initial_curve.radii).tolist(),
                              "velocities": np.asarray(initial_curve.velocities).tolist()},
            "final_curve": {"radii": np.asarray(final_curve.radii).tolist(),
                            "velocities": np.asarray(final_curve.velocities).tolist()},
            "initial_outer_slope": s0,
            "final_outer_slope": s1,
            "final_mean_outer_v": v1,
        }
        print(f"    outer slope: initial {s0:+.4f} -> final {s1:+.4f}")
    return results


def plot_comparison(results, out_dir: Path):
    """(reference: dark_matter_test.py:100-181)"""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(14, 6))
    colors = plt.cm.plasma(np.linspace(0.15, 0.85, len(results)))
    for (label, r), c in zip(results.items(), colors):
        for ax, which in zip(axes, ("initial_curve", "final_curve")):
            cr = np.asarray(r[which]["radii"])
            cv = np.asarray(r[which]["velocities"], float)
            valid = ~np.isnan(cv)
            ax.plot(cr[valid], cv[valid], "o-", ms=3, color=c, label=label)
    axes[0].set_title("Initial rotation curves")
    axes[1].set_title("Final rotation curves")
    for ax in axes:
        ax.set_xlabel("Radius")
        ax.set_ylabel("Circular velocity")
        ax.grid(True, alpha=0.3)
        ax.legend()
    fig.suptitle("Real NFW dark matter: the flat-curve yardstick")
    fig.tight_layout()
    path = out_dir / "dark_matter_curves.png"
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description="Dark matter control experiment")
    p.add_argument("--stars", type=int, default=2000)
    p.add_argument("--ticks", type=int, default=400)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/dark_matter")
    args = p.parse_args(argv)

    results = run_dm_comparison(args.stars, args.ticks, args.seed)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    plot_comparison(results, out)

    print("\n" + "-" * 50)
    print(f"{'config':10s} {'init slope':>11s} {'final slope':>12s}")
    for label, r in results.items():
        print(f"{label:10s} {r['initial_outer_slope']:+11.4f} "
              f"{r['final_outer_slope']:+12.4f}")
    print("-" * 50)
    print("More DM -> flatter (less negative) outer slope: that is what a")
    print("REAL dark-matter signature looks like; compare with the")
    print("quantization artifact in sensitivity_test.")

    (out / "dark_matter_results.json").write_text(
        json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
