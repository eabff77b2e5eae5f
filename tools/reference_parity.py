"""Behavioral parity check against the PyTorch reference implementation.

Runs the reference engine (torch, CPU) and this framework's direct engine
from IDENTICAL initial conditions and compares the physics outputs:
per-mode energy-drift trajectories, final rotation curves, and radius
evolution. Bit parity is impossible (different RNGs, different reduction
orders); the pass criteria are the scientific envelopes SURVEY.md §7
prescribes ("validate statistically — drift/rotation-curve envelopes").

Canonical-scale support (reference: main.py default 5000 stars x 2000
ticks, simulation.py:199-250):

* reference trajectories are CACHED under ``tools/reference_cache/``
  keyed by (stars, ticks, interval, seed, mode) — the torch run at
  canonical scale is ~1 h on this box's single core and only has to
  happen once;
* ``--perturb`` runs a reference TWIN with a fixed random particle
  permutation — identical physics, different summation order — whose
  drift spread bounds the reference's OWN reduction-order chaos. Our
  drift agrees if it lands within the widened envelope: int4's
  long-horizon drift is chaotically sensitive to summation order, so
  demanding closer agreement than the reference has with itself would
  be noise-chasing (reference: quantization.py:112-121 semantics).
* ``--ours-backend tpu`` runs our side on the real chip with the
  production kernels (``--ours-impl auto``), grounding the on-chip
  drift claims instead of the CPU dense oracle.

Usage:
    python tools/reference_parity.py --stars 300 --ticks 300
    python tools/reference_parity.py --stars 5000 --ticks 2000 \
        --interval 100 --modes int4 --perturb --ours-backend tpu
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
CACHE_DIR = Path(REPO_ROOT) / "tools" / "reference_cache"

# Mode strings the reference's own parser recognises
# (reference quantization.py:160-175). Anything else it SILENTLY maps to
# FLOAT64 — so we translate our extra aliases explicitly and refuse the
# rest: a typo (or an ours-only alias like "f16") must never masquerade
# as the reference's float64 baseline. That exact failure produced the
# first canonical "f16" cache row, which was in fact a FLOAT64-mode run
# and has been re-keyed as the float64 row (see its "note" field).
REFERENCE_MODE_STRINGS = frozenset({
    "float64", "float32", "bfloat16", "bf16", "float16", "fp16",
    "int8", "int8_sim", "int4", "int4_sim", "custom",
})
_TO_REFERENCE_MODE = {
    "f64": "float64", "fp64": "float64",
    "f32": "float32", "fp32": "float32",
    "f16": "float16", "half": "float16", "fp16": "float16",
    # Collapse the reference parser's own synonyms to ONE spelling each,
    # matching the committed cache filenames (ref_*_bf16.json,
    # ref_*_int4.json): without this, run_reference_cached("bfloat16")
    # keys a different cache file than ("bf16") and silently re-runs the
    # ~1 h torch reference instead of hitting the committed trajectory.
    "bfloat16": "bf16",
    "int4_sim": "int4",
    "int8_sim": "int8",
}


def canonical_reference_mode(mode_str: str) -> str:
    """Translate a mode string into the reference parser's vocabulary.

    Raises on anything neither table knows, instead of inheriting the
    reference's silent unknown->FLOAT64 fallback."""
    key = _TO_REFERENCE_MODE.get(mode_str.lower(), mode_str.lower())
    if key not in REFERENCE_MODE_STRINGS:
        raise ValueError(
            f"mode {mode_str!r} is not recognised by the reference's "
            f"get_mode_from_string (it would silently run FLOAT64); "
            f"known: {sorted(REFERENCE_MODE_STRINGS)}")
    return key


def run_reference(positions, velocities, masses, mode_str: str,
                  num_ticks: int, interval: int, perm=None):
    """Run the reference torch engine on CPU from given numpy ICs.

    ``perm`` optionally permutes the particle order fed to the reference
    (outputs are un-permuted) — identical physics, perturbed reduction
    order: the reference's own chaotic-envelope probe."""
    mode_str = canonical_reference_mode(mode_str)
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch

        from quantization import get_mode_from_string
        from simulation import GalaxySimulation

        if perm is not None:
            positions, velocities, masses = (
                positions[perm], velocities[perm], masses[perm])
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
        if perm is not None:
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            final_pos, final_vel = final_pos[inv], final_vel[inv]
        return drifts, final_pos, final_vel
    finally:
        sys.path.remove(REFERENCE_PATH)


def _cache_path(stars, ticks, interval, seed, mode, perturbed) -> Path:
    tag = "_perm" if perturbed else ""
    return CACHE_DIR / (f"ref_s{stars}_t{ticks}_i{interval}_"
                        f"seed{seed}_{mode}{tag}.json")


def run_reference_cached(positions, velocities, masses, mode_str: str,
                         num_ticks: int, interval: int, seed: int,
                         perm=None, refresh: bool = False):
    """Reference run memoised on disk (canonical-scale torch runs are
    ~1 h single-core; the trajectory is deterministic given the config)."""
    mode_str = canonical_reference_mode(mode_str)
    path = _cache_path(len(positions), num_ticks, interval, seed, mode_str,
                       perm is not None)
    if path.exists() and not refresh:
        blob = json.loads(path.read_text())
        print(f"  [reference cache hit: {path.name}]")
        return (blob["drifts"], np.asarray(blob["final_pos"], np.float32),
                np.asarray(blob["final_vel"], np.float32))
    drifts, fpos, fvel = run_reference(positions, velocities, masses,
                                       mode_str, num_ticks, interval, perm)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({
        "stars": len(positions), "ticks": num_ticks, "interval": interval,
        "seed": seed, "mode": mode_str, "perturbed": perm is not None,
        "drifts": [float(d) for d in drifts],
        "final_pos": np.asarray(fpos, np.float32).tolist(),
        "final_vel": np.asarray(fvel, np.float32).tolist(),
    }))
    print(f"  [reference cached: {path.name}]")
    return drifts, fpos, fvel


def run_ours(positions, velocities, masses, mode_str: str, num_ticks: int,
             interval: int, force_impl: str = "dense"):
    from nbody_tpu.models.direct import DirectSimulation

    sim = DirectSimulation(positions, velocities, masses,
                           precision=mode_str, force_impl=force_impl)
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
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--perturb", action="store_true",
                   help="also run a permuted-order reference twin; its "
                        "drift spread bounds the reference's own "
                        "reduction-order chaos and widens the envelope")
    p.add_argument("--ours-backend", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--ours-impl", type=str, default=None,
                   help="force impl for our side (default: dense on cpu, "
                        "auto on tpu)")
    p.add_argument("--refresh-cache", action="store_true")
    p.add_argument("--output", type=str, default="output/reference_parity")
    args = p.parse_args(argv)

    # Shared ICs from OUR generator, handed to both engines as raw arrays.
    # ICs are always generated on the CPU backend so the cached reference
    # trajectories stay IC-bit-identical regardless of --ours-backend.
    import jax

    if args.ours_backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from nbody_tpu.models.galaxy import create_disk_galaxy

    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(args.seed),
                                         num_stars=args.stars)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    ours_impl = args.ours_impl or ("auto" if args.ours_backend == "tpu"
                                   else "dense")

    report = {}
    print(f"\n{'=' * 70}")
    print("REFERENCE PARITY: torch reference (CPU) vs nbody_tpu, same ICs")
    print(f"stars={args.stars} ticks={args.ticks} "
          f"ours={args.ours_backend}/{ours_impl} perturb={args.perturb}")
    print(f"{'=' * 70}")
    print(f"{'mode':10s} {'tick':>5s} {'reference %':>12s} {'ours %':>12s}")
    ok = True
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(args.stars)
    for mode in args.modes.split(","):
        # Key the report by the canonical spelling so '--modes bfloat16'
        # and '--modes bf16' (which already share a cache file) also emit
        # identically-keyed rows — report merges must never see two keys
        # for the same data (the f16/float64 row mixup grew from exactly
        # this kind of key drift).
        mode = canonical_reference_mode(mode)
        ref_d, ref_pos, _ = run_reference_cached(
            pos, vel, m, mode, args.ticks, args.interval, args.seed,
            refresh=args.refresh_cache)
        spread = 0.0
        r_spread = 0.0
        ref_d_perm = None
        r_ref_perm = None
        if args.perturb:
            ref_d_perm, ref_pos_perm, _ = run_reference_cached(
                pos, vel, m, mode, args.ticks, args.interval, args.seed,
                perm=perm, refresh=args.refresh_cache)
            spread = abs(ref_d[-1] - ref_d_perm[-1])
            r_ref_perm = radius90(ref_pos_perm)
            r_spread = abs(radius90(ref_pos) - r_ref_perm)
        our_d, our_pos, _ = run_ours(pos, vel, m, mode, args.ticks,
                                     args.interval, force_impl=ours_impl)
        for i, (a, b) in enumerate(zip(ref_d, our_d)):
            print(f"{mode:10s} {(i + 1) * args.interval:5d} "
                  f"{a:+12.4f} {b:+12.4f}")
        # envelope criteria: same sign+magnitude class of final drift;
        # with --perturb the envelope widens by the reference's own
        # summation-order chaos (2x the twin spread)
        final_ref, final_our = ref_d[-1], our_d[-1]
        scale = max(abs(final_ref), abs(final_our), 0.05)
        tol = max(0.5 * scale, 0.05, 2.0 * spread)
        agree = abs(final_ref - final_our) < tol
        r_ref, r_our = radius90(ref_pos), radius90(our_pos)
        # radius criterion widens by the reference's own chaos spread the
        # same way the drift criterion does (at canonical int4 scale the
        # reference's radius90 moves ~18% under its own summation-order
        # permutation — a fixed 10% would fail the reference against
        # itself)
        r_tol = max(0.1 * r_ref, 2.0 * r_spread)
        radius_agree = abs(r_ref - r_our) < r_tol
        report[mode] = {
            "drift_reference": ref_d, "drift_ours": our_d,
            "final_drift_reference": final_ref,
            "final_drift_ours": final_our,
            "drift_envelope_agree": bool(agree),
            "envelope_tolerance": tol,
            "radius90_reference": r_ref, "radius90_ours": r_our,
            "radius_agree": bool(radius_agree),
            "ours_backend": args.ours_backend, "ours_impl": ours_impl,
        }
        if ref_d_perm is not None:
            report[mode]["drift_reference_perturbed"] = ref_d_perm
            report[mode]["final_drift_reference_perturbed"] = ref_d_perm[-1]
            report[mode]["reference_chaos_spread"] = spread
            report[mode]["radius90_reference_perturbed"] = r_ref_perm
            report[mode]["radius90_chaos_spread"] = r_spread
            print(f"{mode:10s} reference twin (permuted order): "
                  f"{ref_d_perm[-1]:+.4f}% / r90 {r_ref_perm:.2f} -> "
                  f"chaos spread {spread:.4f}% / {r_spread:.2f}")
        ok &= agree and radius_agree
        print(f"{mode:10s} drift envelope "
              f"{'AGREE' if agree else 'DISAGREE'} (tol {tol:.3f}); "
              f"radius90 {r_ref:.2f} vs {r_our:.2f} "
              f"({'AGREE' if radius_agree else 'DISAGREE'})")

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "reference_parity.json").write_text(json.dumps(report, indent=2))
    print(f"\nPARITY: {'PASS' if ok else 'FAIL'} "
          f"(report: {out / 'reference_parity.json'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
