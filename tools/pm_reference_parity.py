"""Behavioral parity gate for the PM/cosmology path against the torch
reference's flagship workload.

The canonical direct-engine gate (tools/reference_parity.py) covers
simulation.py semantics; THIS tool gates the reference's *headline*
science run — the 2-D particle-mesh loop of ``universe_2d.py`` with the
quantized-|k|^2 Poisson solve (reference: universe_2d.py:1015-1219,
quantize hook :1050-1053), the source of the paper's 96 conservation
violations and the 2.7% -> 119.4% energy non-conservation curve
(BASELINE.md rows 1-3).

Protocol (mirrors the direct gate):

* ICs come from the reference's OWN ``_initialize`` (torch RNG, seed 42
  — the paper's ICs, universe_2d.py:949-1013), captured once and
  injected verbatim into our ``CosmologicalEngine`` via its ``ic_fn``
  hook. Bit-identical starting state on both sides.
* Our engine runs under ``ReferenceCosmology`` — the reference's
  lookup-table cosmic time (universe_2d.py:188-217) and its
  omega_r=9.4e-5 — so the (z, dt, H, a) schedule matches the torch run
  exactly (our production Cosmology integrates t(z) properly; the gate
  must drive both engines with the SAME clock).
* Reference runs are cached under tools/reference_cache/ (the N=10000
  paper-scale torch run walks Python per-particle deposit/interp loops,
  universe_2d.py:1027-1029/:1064-1068 — minutes per run, once).
* ``--perturb`` reruns the reference with a fixed particle permutation
  (identical physics, perturbed deposit/reduction order): its spread
  bounds the reference's own chaos and widens every envelope.

Pass criteria per mode:
  1. energy drift curve envelope (final drift, and the per-step
     violation curve's shape),
  2. glitch-event counts (energy jumps, momentum drifts) under the
     reference's detector semantics applied identically to both
     engines' series (universe_2d.py:355-401) — our engine's momentum
     stream is already M_sun-weighted at the host boundary, so the
     reference's absolute threshold applies as-is,
  3. final clustering contrast (density std/mean on a coarse grid,
     universe_2d.py:1279-1293) computed by ONE numpy function from both
     final position sets.

Usage:
    python tools/pm_reference_parity.py --n 1024 --modes float32
    python tools/pm_reference_parity.py --n 10000 \
        --modes float32,int4 --perturb --ours-backend tpu
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from nbody_tpu.config import Cosmology  # noqa: E402
from tools.reference_parity import canonical_reference_mode  # noqa: E402

REFERENCE_PATH = "/root/reference"
CACHE_DIR = Path(REPO_ROOT) / "tools" / "reference_cache"

# Paper anchors for the N=10000 z=50->0 run (BASELINE.md rows 1-3,
# decoded from the bundled paper's abstract; RTX 5090).
PAPER_ANCHOR = {
    "events_total": 96, "energy_events": 46, "momentum_events": 50,
    "drift_pct_z10": 2.7, "drift_pct_final": 119.4,
}


# --------------------------------------------------------------------------
# Reference clock
# --------------------------------------------------------------------------

_Z_TABLE = np.array([0, 0.1, 0.5, 1, 2, 3, 5, 10, 20, 50, 100, 500,
                     1000, 1100], dtype=np.float64)
_T_TABLE = np.array([13.8, 12.5, 8.6, 5.9, 3.3, 2.2, 1.2, 0.47, 0.18,
                     0.05, 0.017, 0.001, 0.0004, 0.00038], dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class ReferenceCosmology(Cosmology):
    """Planck-2018 with the reference's exact clock semantics.

    cosmic_time_gyr is the reference's 14-point lookup-table interp
    (universe_2d.py:188-217) — NOT the proper integral our production
    Cosmology uses — and omega_r matches the reference's 9.4e-5
    (universe_2d.py:172). Only for parity runs: both engines must see
    the identical (z, dt) schedule or trajectories diverge for clock
    reasons, not physics reasons."""

    omega_r: float = 9.4e-5

    def cosmic_time_gyr(self, z: float, n_steps: int = 0) -> float:
        if z >= 1100:
            return 0.00038 * (1100.0 / z) ** 1.5
        if z <= 0:
            return 13.8
        return float(np.interp(z, _Z_TABLE, _T_TABLE))


# --------------------------------------------------------------------------
# Reference side
# --------------------------------------------------------------------------

def _import_reference_u2():
    """Import the reference engine headlessly: force the Agg backend and
    no-op matplotlib.use so the module's TkAgg call (universe_2d.py:55)
    cannot demand a display."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import universe_2d as u2
    finally:
        sys.path.remove(REFERENCE_PATH)
        matplotlib.use = orig_use
    return u2


def _ics_cache_path(n: int, z: float, seed: int) -> Path:
    return CACHE_DIR / f"pm_ics_n{n}_z{z:g}_seed{seed}.json"


def _traj_cache_path(n: int, z: float, seed: int, mode: str,
                     perturbed: bool) -> Path:
    tag = "_perm" if perturbed else ""
    return CACHE_DIR / f"pm_ref_n{n}_z{z:g}_seed{seed}_{mode}{tag}.json"


def reference_ics(n: int, start_z: float, seed: int,
                  refresh: bool = False):
    """The reference's own torch-RNG ICs (positions, velocities, mass
    scalar), cached. All precision modes share them (universe_2d
    initialises in float32 for every mode except float64)."""
    path = _ics_cache_path(n, start_z, seed)
    if path.exists() and not refresh:
        blob = json.loads(path.read_text())
        return (np.asarray(blob["positions"], np.float32),
                np.asarray(blob["velocities"], np.float32),
                float(blob["mass"]))
    u2 = _import_reference_u2()
    import torch

    sim = u2.Universe2D(num_particles=n, start_redshift=start_z,
                        precision="float32", seed=seed,
                        device=torch.device("cpu"))
    pos = sim.positions.cpu().numpy().astype(np.float32)
    vel = sim.velocities.cpu().numpy().astype(np.float32)
    mass = float(sim.masses[0].item())
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({
        "n": int(sim.num_particles), "start_z": start_z, "seed": seed,
        "mass": mass,
        "positions": pos.tolist(), "velocities": vel.tolist(),
    }))
    print(f"  [reference ICs cached: {path.name}]")
    return pos, vel, mass


def run_reference_pm(ics, n: int, start_z: float, seed: int, mode: str,
                     dz: float = 1.0, max_steps: int = 60, perm=None,
                     refresh: bool = False) -> dict:
    """Run (or load) the torch reference PM engine with injected ICs.

    Returns {energies, momenta, glitch counts by type, final_pos,
    redshifts}. ``perm`` permutes the particle order (outputs
    un-permuted) — the chaos twin."""
    mode = canonical_reference_mode(mode)
    path = _traj_cache_path(n, start_z, seed, mode, perm is not None)
    if path.exists() and not refresh:
        print(f"  [reference cache hit: {path.name}]")
        return json.loads(path.read_text())

    u2 = _import_reference_u2()
    import torch

    pos, vel, mass = ics
    if perm is not None:
        pos, vel = pos[perm], vel[perm]
    sim = u2.Universe2D(num_particles=n, start_redshift=start_z,
                        precision=mode, seed=seed,
                        device=torch.device("cpu"))
    # Inject the shared ICs over whatever _initialize built (same seed,
    # so identical for the unpermuted run; the injection is what makes
    # the permuted twin and any cross-mode reuse exact).
    sim.positions = torch.tensor(pos, dtype=sim.dtype)
    sim.velocities = torch.tensor(vel, dtype=sim.dtype)
    sim.masses = torch.full((sim.num_particles,), mass, dtype=sim.dtype)

    steps = 0
    while not sim.completed and steps < max_steps:
        sim.step(dz=dz)
        steps += 1

    final_pos = sim.positions.cpu().numpy()
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        final_pos = final_pos[inv]

    summary = sim.glitch_detector.get_glitch_summary()
    blob = {
        "n": int(sim.num_particles), "mode": mode, "dz": dz,
        "seed": seed, "perturbed": perm is not None,
        "redshifts": [float(z) for z in sim.history["redshift"][1:]],
        "energies": [float(e) for e in sim.history["energy"]],
        "momenta": [[float(p[0]), float(p[1])]
                    for p in sim.glitch_detector.momentum_history],
        "glitch_summary": {k: int(v) for k, v in summary.items()},
        "glitch_total": int(sim.glitch_detector.get_glitch_count()),
        "final_pos": final_pos.astype(np.float32).tolist(),
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(blob))
    print(f"  [reference cached: {path.name}]")
    return blob


# --------------------------------------------------------------------------
# Our side
# --------------------------------------------------------------------------

def run_ours_pm(ics, n: int, start_z: float, mode: str, dz: float = 1.0,
                chunk: int = 10) -> dict:
    import jax.numpy as jnp

    from nbody_tpu.engines.cosmo import CosmologicalEngine

    pos, vel, mass = ics

    def ic_fn(key, num_side, cfg, start_redshift, cosmo):
        return (jnp.asarray(pos), jnp.asarray(vel),
                jnp.full((pos.shape[0],), mass, jnp.float32))

    eng = CosmologicalEngine(
        num_particles=n, box_size_mpc=200.0, start_redshift=start_z,
        precision=mode, dm_ratio=5.0, seed=42, dim=2, n_grid=128,
        deposit="ngp", cosmo=ReferenceCosmology(),
        glitch_threshold=0.05, ic_fn=ic_fn)
    eng.run_to_completion(dz=dz, chunk=chunk)
    return {
        "redshifts": [float(z) for z in eng.history["redshift"][1:]],
        "energies": [float(e) for e in eng.history["energy"]],
        "momenta": [[float(p[0]), float(p[1])]
                    for p in eng.glitch_detector.momentum_history],
        "final_pos": np.asarray(eng.positions).tolist(),
    }


# --------------------------------------------------------------------------
# Shared metrics (one implementation applied to both engines' series)
# --------------------------------------------------------------------------

def detector_counts(energies, momenta, threshold: float = 0.05):
    """The reference GlitchDetector's energy-jump and momentum-drift
    logic (universe_2d.py:355-401), re-applied identically to both
    engines' series so event-count parity is unit- and
    implementation-consistent."""
    e_events = 0
    hist = []
    for e in energies:
        hist.append(e)
        if len(hist) < 3:
            continue
        prev = hist[-2]
        if prev != 0 and abs(hist[-1] - prev) / abs(prev + 1e-10) > threshold:
            e_events += 1
    m_events = 0
    mh = []
    for p in momenta:
        mh.append(p)
        if len(mh) < 2:
            continue
        if math.hypot(p[0], p[1]) > threshold * 1000.0:
            m_events += 1
    return e_events, m_events


def drift_curve(energies):
    """Per-step energy drift vs the first recorded energy, in percent
    (the paper's 'energy non-conservation vs epoch' measure)."""
    e0 = energies[0]
    return [(e - e0) / abs(e0) * 100.0 for e in energies]


def clustering_contrast(final_pos, box: float = 200.0, n_grid: int = 32):
    """density std/mean on a coarse NGP grid (universe_2d.py:1279-1293),
    numpy, applied to both sides."""
    pos = np.asarray(final_pos)
    ij = (pos / box * n_grid).astype(np.int64) % n_grid
    density = np.zeros((n_grid, n_grid))
    np.add.at(density, (ij[:, 0], ij[:, 1]), 1.0)
    return float(density.std() / density.mean())


def drift_at_z(drifts, redshifts, z_target: float):
    idx = int(np.argmin(np.abs(np.asarray(redshifts) - z_target)))
    return drifts[idx]


# --------------------------------------------------------------------------
# Gate
# --------------------------------------------------------------------------

def compare_mode(ref: dict, ours: dict, twin: dict | None,
                 mode: str) -> dict:
    ref_drift = drift_curve(ref["energies"])
    our_drift = drift_curve(ours["energies"])
    steps = min(len(ref_drift), len(our_drift))

    spread = 0.0
    e_ev_spread = 0
    clus_spread = 0.0
    twin_row = {}
    if twin is not None:
        twin_drift = drift_curve(twin["energies"])
        spread = abs(ref_drift[-1] - twin_drift[-1])
        te, tm = detector_counts(twin["energies"], twin["momenta"])
        re_, rm_ = detector_counts(ref["energies"], ref["momenta"])
        e_ev_spread = abs(re_ - te)
        clus_spread = abs(clustering_contrast(ref["final_pos"])
                          - clustering_contrast(twin["final_pos"]))
        twin_row = {
            "final_drift_reference_perturbed": twin_drift[-1],
            "reference_chaos_spread": spread,
            "energy_events_reference_perturbed": te,
            "momentum_events_reference_perturbed": tm,
        }

    final_ref, final_our = ref_drift[steps - 1], our_drift[steps - 1]
    scale = max(abs(final_ref), abs(final_our), 1.0)
    # Envelope: half the drift magnitude class, floored at 5 percentage
    # points (PM drifts run to ~100%+ — the paper's own curve), widened
    # by 2x the reference's self-chaos.
    tol = max(0.5 * scale, 5.0, 2.0 * spread)
    drift_agree = abs(final_ref - final_our) < tol

    z10_ref = drift_at_z(ref_drift, ref["redshifts"], 10.0)
    z10_our = drift_at_z(our_drift, ours["redshifts"], 10.0)

    re_ev, rm_ev = detector_counts(ref["energies"], ref["momenta"])
    oe_ev, om_ev = detector_counts(ours["energies"], ours["momenta"])
    ev_tol = max(2, 2 * e_ev_spread)
    events_agree = (abs(re_ev - oe_ev) <= ev_tol
                    and abs(rm_ev - om_ev) <= 2)

    clus_ref = clustering_contrast(ref["final_pos"])
    clus_our = clustering_contrast(ours["final_pos"])
    clus_tol = max(0.25 * clus_ref, 2.0 * clus_spread)
    clus_agree = abs(clus_ref - clus_our) < clus_tol

    row = {
        "workload": ("universe_2d PM z=50->0.01 dz=1, NGP 128^2 grid, "
                     "quantized k^2 (reference: universe_2d.py:1015-1219)"),
        "n": ref["n"], "steps": steps,
        "drift_curve_reference": ref_drift,
        "drift_curve_ours": our_drift,
        "final_drift_reference": final_ref,
        "final_drift_ours": final_our,
        "drift_envelope_agree": bool(drift_agree),
        "envelope_tolerance": tol,
        "drift_at_z10_reference": z10_ref,
        "drift_at_z10_ours": z10_our,
        "energy_events_reference": re_ev,
        "energy_events_ours": oe_ev,
        "momentum_events_reference": rm_ev,
        "momentum_events_ours": om_ev,
        "event_tolerance_energy": ev_tol,
        "events_agree": bool(events_agree),
        "clustering_reference": clus_ref,
        "clustering_ours": clus_our,
        "clustering_agree": bool(clus_agree),
        "reference_glitch_summary": ref.get("glitch_summary", {}),
        "paper_anchor": PAPER_ANCHOR,
        **twin_row,
    }
    row["agree"] = bool(drift_agree and events_agree and clus_agree)
    return row


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10000,
                   help="particle count (paper scale: 10000)")
    p.add_argument("--start-z", type=float, default=50.0)
    p.add_argument("--dz", type=float, default=1.0)
    p.add_argument("--modes", type=str, default="float32,int4")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--perturb", action="store_true")
    p.add_argument("--ours-backend", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--refresh-cache", action="store_true")
    p.add_argument("--output", type=str, default="output/pm_parity")
    args = p.parse_args(argv)

    import jax

    if args.ours_backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ics = reference_ics(args.n, args.start_z, args.seed,
                        refresh=args.refresh_cache)
    n = ics[0].shape[0]  # reference rounds to a square grid
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(n)

    print(f"\n{'=' * 70}")
    print("PM REFERENCE PARITY: universe_2d (torch, CPU) vs "
          "CosmologicalEngine, same ICs + clock")
    print(f"n={n} z={args.start_z}->0.01 dz={args.dz} "
          f"ours={args.ours_backend} perturb={args.perturb}")
    print(f"{'=' * 70}")

    report, ok = {}, True
    for mode in args.modes.split(","):
        mode = canonical_reference_mode(mode)
        ref = run_reference_pm(ics, n, args.start_z, args.seed, mode,
                               dz=args.dz, refresh=args.refresh_cache)
        twin = None
        if args.perturb:
            twin = run_reference_pm(ics, n, args.start_z, args.seed, mode,
                                    dz=args.dz, perm=perm,
                                    refresh=args.refresh_cache)
        ours = run_ours_pm(ics, n, args.start_z, mode, dz=args.dz)
        row = compare_mode(ref, twin=twin, ours=ours, mode=mode)
        report[f"pm_{mode}"] = row
        ok &= row["agree"]
        print(f"\npm_{mode}: final drift ref {row['final_drift_reference']:+.2f}% "
              f"vs ours {row['final_drift_ours']:+.2f}% "
              f"(tol {row['envelope_tolerance']:.2f}) "
              f"{'AGREE' if row['drift_envelope_agree'] else 'DISAGREE'}")
        print(f"pm_{mode}: drift@z10 ref {row['drift_at_z10_reference']:+.2f}% "
              f"ours {row['drift_at_z10_ours']:+.2f}%  "
              f"[paper: +{PAPER_ANCHOR['drift_pct_z10']}% @z10, "
              f"+{PAPER_ANCHOR['drift_pct_final']}% final]")
        print(f"pm_{mode}: events E/M ref {row['energy_events_reference']}/"
              f"{row['momentum_events_reference']} vs ours "
              f"{row['energy_events_ours']}/{row['momentum_events_ours']} "
              f"[paper: {PAPER_ANCHOR['energy_events']}/"
              f"{PAPER_ANCHOR['momentum_events']}] "
              f"{'AGREE' if row['events_agree'] else 'DISAGREE'}")
        print(f"pm_{mode}: clustering ref {row['clustering_reference']:.3f} "
              f"vs ours {row['clustering_ours']:.3f} "
              f"{'AGREE' if row['clustering_agree'] else 'DISAGREE'}")

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    slim = {k: {kk: vv for kk, vv in v.items()} for k, v in report.items()}
    (out / "pm_reference_parity.json").write_text(json.dumps(slim, indent=2))
    print(f"\nPM PARITY: {'PASS' if ok else 'FAIL'} "
          f"(report: {out / 'pm_reference_parity.json'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
