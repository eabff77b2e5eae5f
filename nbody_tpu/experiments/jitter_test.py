"""Jitter test: is "dark matter" simulation lag?

TPU-native equivalent of the reference test
(reference: jitter_test.py:45-535):

* nested multi-scale system — concentric galaxies at radius 10/5/2.5 with
  masses doubling per level (reference: jitter_test.py:45-86);
* frame-rate sweep — run the same *physical* duration at dt in
  {0.1 ... 0.001} and measure trajectory jitter via second differences of
  sampled positions/velocities (reference: jitter_test.py:122-250);
* velocity sweep — probe 0.1c..0.9c of the sim speed limit c=10 and
  measure jitter growth (reference: jitter_test.py:89-119, 253-320);
* verdicts via correlation of jitter with dt and with beta
  (reference: jitter_test.py:427-484).

Usage:
    python -m nbody_tpu.experiments.jitter_test --quick
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision

C_SIM = 10.0  # simulation speed limit for the velocity sweep


def nested_galaxies(key, stars_per_level: int = 300, levels: int = 3):
    """Concentric multi-scale system (reference: jitter_test.py:45-86)."""
    keys = jax.random.split(key, levels)
    parts = []
    for lvl in range(levels):
        radius = 10.0 / (2 ** lvl)
        pos, vel, m = create_disk_galaxy(keys[lvl],
                                         num_stars=stars_per_level,
                                         galaxy_radius=radius)
        parts.append((pos, vel, m * (2.0 ** lvl)))
    pos = jnp.concatenate([p for p, _, _ in parts])
    vel = jnp.concatenate([v for _, v, _ in parts])
    m = jnp.concatenate([mm for _, _, mm in parts])
    return pos, vel, m


def measure_jitter(pos, vel, m, dt: float, total_time: float,
                   num_samples: int = 30):
    """Second-difference jitter of sampled trajectories
    (reference: jitter_test.py:122-159): run the SAME physical duration
    at step dt, sample num_samples times at (as nearly as possible) equal
    physical spacing, and normalise the second differences by the sample
    spacing squared — an acceleration-noise proxy comparable across dt
    (the raw |d2 P| scales like spacing^2 for perfect physics)."""
    num_ticks = max(int(round(total_time / dt)), num_samples)
    interval = max(num_ticks // num_samples, 1)
    sample_dt = interval * dt  # physical spacing between samples
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           dt=dt, dynamic_params=True)
    e0 = sim.get_total_energy()
    pos_frames, vel_frames = [], []
    for _ in range(num_samples):
        sim.step(interval)
        pos_frames.append(np.asarray(sim.positions))
        vel_frames.append(np.asarray(sim.velocities))
    P = np.stack(pos_frames)   # (S, N, D)
    V = np.stack(vel_frames)
    pos_jitter = float(np.abs(np.diff(P, n=2, axis=0)).mean()) / sample_dt ** 2
    vel_jitter = float(np.abs(np.diff(V, n=2, axis=0)).mean()) / sample_dt ** 2
    e1 = sim.get_total_energy()
    drift_pct = (e1 - e0) / abs(e0) * 100 if abs(e0) > 1e-12 else 0.0
    return pos_jitter, vel_jitter, drift_pct


def frame_rate_sweep(key, total_time: float = 2.0, quick: bool = False):
    """(reference: jitter_test.py:162-250)"""
    print("\n--- FRAME-RATE SWEEP (same physical time, varying dt) ---")
    pos, vel, m = nested_galaxies(key, stars_per_level=150 if quick else 300)
    dts = [0.1, 0.05, 0.02, 0.01, 0.005, 0.001]
    rows = []
    for dt in dts:
        pj, vj, drift = measure_jitter(pos, vel, m, dt, total_time)
        rows.append({"dt": dt, "pos_jitter": pj, "vel_jitter": vj,
                     "energy_drift_pct": drift})
        print(f"  dt={dt:6.3f}: pos jitter={pj:.3e}  vel jitter={vj:.3e}  "
              f"dE={drift:+.4f}%")
    # correlation of jitter with dt
    logs = np.log10([r["dt"] for r in rows])
    pjs = np.log10([max(r["pos_jitter"], 1e-12) for r in rows])
    corr = float(np.corrcoef(logs, pjs)[0, 1])
    print(f"  corr(log dt, log jitter) = {corr:+.3f}")
    return {"rows": rows, "dt_jitter_correlation": corr,
            "lag_creates_jitter": corr > 0.5}


def velocity_sweep(key, quick: bool = False):
    """(reference: jitter_test.py:253-320): jitter vs fraction of c_sim."""
    print("\n--- VELOCITY SWEEP (0.1c .. 0.9c of c_sim=10) ---")
    pos, vel, m = create_disk_galaxy(key, num_stars=150 if quick else 400)
    rows = []
    for beta in [0.1, 0.3, 0.5, 0.7, 0.9]:
        boost = beta * C_SIM / max(float(jnp.abs(vel).max()), 1e-9)
        pj, vj, drift = measure_jitter(pos, vel * boost, m, dt=0.01,
                                       total_time=1.0)
        rows.append({"beta": beta, "pos_jitter": pj, "vel_jitter": vj,
                     "energy_drift_pct": drift})
        print(f"  v={beta:.1f}c: pos jitter={pj:.3e}  vel jitter={vj:.3e}  "
              f"dE={drift:+.4f}%")
    betas = [r["beta"] for r in rows]
    pjs = [r["pos_jitter"] for r in rows]
    corr = float(np.corrcoef(betas, pjs)[0, 1])
    print(f"  corr(beta, jitter) = {corr:+.3f}")
    return {"rows": rows, "beta_jitter_correlation": corr,
            "speed_creates_jitter": corr > 0.5}


def print_analysis(fr: dict, vs: dict):
    """The reference's full verdict battery (jitter_test.py:427-484):
    analysis tables with per-row energy drift, ratio verdicts (does
    jitter grow >1.5x across the sweep?) AND the correlation verdicts."""
    print("\n" + "=" * 60)
    print("JITTER HYPOTHESIS ANALYSIS")
    print("=" * 60)
    print("\nFRAME RATE TEST:")
    print("-" * 62)
    print(f"{'dt':<10} {'FPS':<8} {'Pos Jitter':<12} {'Vel Jitter':<12} "
          f"{'Energy %':<10}")
    print("-" * 62)
    for r in fr["rows"]:
        print(f"{r['dt']:<10.4f} {1 / r['dt']:<8.0f} "
              f"{r['pos_jitter']:<12.4e} {r['vel_jitter']:<12.4e} "
              f"{r['energy_drift_pct']:<+10.4f}")
    print("\nVELOCITY TEST:")
    print("-" * 50)
    print(f"{'V/c':<8} {'Pos Jitter':<12} {'Vel Jitter':<12} "
          f"{'Energy %':<10}")
    print("-" * 50)
    for r in vs["rows"]:
        print(f"{r['beta']:<8.2f} {r['pos_jitter']:<12.4e} "
              f"{r['vel_jitter']:<12.4e} {r['energy_drift_pct']:<+10.4f}")

    print("\n" + "-" * 40)
    print("VERDICT:")
    # ratio verdicts (reference: :465-484); rows are ordered dt desc =
    # FPS ascending, so [-1] is the highest frame rate / velocity
    fr_jit = [r["vel_jitter"] for r in fr["rows"]]
    fr["jitter_grows_with_fps"] = bool(fr_jit[-1] > fr_jit[0] * 1.5)
    if fr["jitter_grows_with_fps"]:
        print("  + Jitter INCREASES with frame rate "
              "(supports the 'simulation lag' hypothesis)")
    else:
        print("  - Jitter does NOT increase with frame rate")
    vs_jit = [r["vel_jitter"] for r in vs["rows"]]
    vs["jitter_grows_with_speed"] = bool(vs_jit[-1] > vs_jit[0] * 1.5)
    if vs["jitter_grows_with_speed"]:
        print("  + Jitter INCREASES with velocity "
              "(fast objects jitter more, like near light speed)")
    else:
        print("  - Jitter does NOT increase with velocity")
    print(f"  corr(log dt, log jitter) = "
          f"{fr['dt_jitter_correlation']:+.3f} -> frame-rate lag "
          f"{'CONFIRMED' if fr['lag_creates_jitter'] else 'not supported'}")
    print(f"  corr(beta, jitter)       = "
          f"{vs['beta_jitter_correlation']:+.3f} -> speed-jitter "
          f"{'CONFIRMED' if vs['speed_creates_jitter'] else 'not supported'}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Jitter / simulation-lag test")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/jitter")
    args = p.parse_args(argv)

    print("\n" + "=" * 60)
    print("JITTER TEST: is 'dark matter' simulation lag?")
    print("=" * 60)

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    fr = frame_rate_sweep(k1, quick=args.quick)
    vs = velocity_sweep(k2, quick=args.quick)

    print_analysis(fr, vs)

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "jitter_report.json").write_text(json.dumps(
        {"frame_rate_sweep": fr, "velocity_sweep": vs}, indent=2))


if __name__ == "__main__":
    main()
