"""Behavioral parity check against the PyTorch reference implementation.

Runs the reference engine (torch, CPU) and this framework's direct engine
from IDENTICAL initial conditions and compares the physics outputs:
per-mode energy-drift trajectories, final rotation curves, and radius
evolution. Bit parity is impossible (different RNGs, different reduction
orders); the pass criteria are the scientific envelopes SURVEY.md §7
prescribes ("validate statistically — drift/rotation-curve envelopes").

Usage:
    python tools/reference_parity.py --stars 300 --ticks 300
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_PATH = "/root/reference"


def run_reference(positions, velocities, masses, mode_str: str,
                  num_ticks: int, interval: int):
    """Run the reference torch engine on CPU from given numpy ICs."""
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch

        from quantization import get_mode_from_string
        from simulation import GalaxySimulation

        sim = GalaxySimulation(
            torch.tensor(positions, dtype=torch.float32),
            torch.tensor(velocities, dtype=torch.float32),
            torch.tensor(masses, dtype=torch.float32),
            precision_mode=get_mode_from_string(mode_str),
            device=torch.device("cpu"),
        )
        e0 = sim.get_total_energy()
        drifts = []
        for _ in range(num_ticks // interval):
            sim.run(interval)
            drifts.append((sim.get_total_energy() - e0) / abs(e0) * 100)
        final_pos = sim.positions.cpu().numpy()
        final_vel = sim.velocities.cpu().numpy()
        return drifts, final_pos, final_vel
    finally:
        sys.path.remove(REFERENCE_PATH)


def run_ours(positions, velocities, masses, mode_str: str, num_ticks: int,
             interval: int):
    from nbody_tpu.models.direct import DirectSimulation

    sim = DirectSimulation(positions, velocities, masses,
                           precision=mode_str, force_impl="dense")
    e0 = sim.get_total_energy()
    drifts = []
    for _ in range(num_ticks // interval):
        sim.step(interval)
        drifts.append((sim.get_total_energy() - e0) / abs(e0) * 100)
    return drifts, np.asarray(sim.positions), np.asarray(sim.velocities)


def radius90(pos):
    r = np.sqrt((np.asarray(pos) ** 2).sum(1))
    return float(np.percentile(r, 90))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stars", type=int, default=300)
    p.add_argument("--ticks", type=int, default=300)
    p.add_argument("--interval", type=int, default=50)
    p.add_argument("--modes", type=str, default="float32,int8,int4")
    p.add_argument("--output", type=str, default="output/reference_parity")
    args = p.parse_args(argv)

    # Shared ICs from OUR generator, handed to both engines as raw arrays.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(42),
                                     num_stars=args.stars)
    pos, vel, m = map(np.asarray, (pos, vel, m))

    report = {}
    print(f"\n{'=' * 70}")
    print("REFERENCE PARITY: torch reference (CPU) vs nbody_tpu, same ICs")
    print(f"{'=' * 70}")
    print(f"{'mode':10s} {'tick':>5s} {'reference %':>12s} {'ours %':>12s}")
    ok = True
    for mode in args.modes.split(","):
        ref_d, ref_pos, _ = run_reference(pos, vel, m, mode, args.ticks,
                                          args.interval)
        our_d, our_pos, _ = run_ours(pos, vel, m, mode, args.ticks,
                                     args.interval)
        for i, (a, b) in enumerate(zip(ref_d, our_d)):
            print(f"{mode:10s} {(i + 1) * args.interval:5d} "
                  f"{a:+12.4f} {b:+12.4f}")
        # envelope criteria: same sign+magnitude class of final drift
        final_ref, final_our = ref_d[-1], our_d[-1]
        scale = max(abs(final_ref), abs(final_our), 0.05)
        agree = abs(final_ref - final_our) < max(0.5 * scale, 0.05)
        r_ref, r_our = radius90(ref_pos), radius90(our_pos)
        radius_agree = abs(r_ref - r_our) / r_ref < 0.1
        report[mode] = {
            "drift_reference": ref_d, "drift_ours": our_d,
            "final_drift_reference": final_ref,
            "final_drift_ours": final_our,
            "drift_envelope_agree": bool(agree),
            "radius90_reference": r_ref, "radius90_ours": r_our,
            "radius_agree": bool(radius_agree),
        }
        ok &= agree and radius_agree
        print(f"{mode:10s} drift envelope "
              f"{'AGREE' if agree else 'DISAGREE'}; radius90 "
              f"{r_ref:.2f} vs {r_our:.2f} "
              f"({'AGREE' if radius_agree else 'DISAGREE'})")

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "reference_parity.json").write_text(json.dumps(report, indent=2))
    print(f"\nPARITY: {'PASS' if ok else 'FAIL'} "
          f"(report: {out / 'reference_parity.json'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
