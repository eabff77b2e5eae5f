"""Omega point test: the "final boss" — map the coordinates where the
simulated universe breaks down.

TPU-native equivalent of the reference suite
(reference: omega_point_test.py:173-1233):

* **BekensteinBoundTest** — pack density upward until throughput collapses
  (the "digital black hole", reference: :173-324);
* **TemporalAliasingTest** — log-spaced dt sweep, find the critical dt and
  the sharpness of the stability phase transition (reference: :331-443);
* **EntropyLeakTest** — sustained int4 run: ghost-energy injection rate
  and extrapolated "time to heat death" (reference: :450-588);
* **PhaseSpaceScanner** — (precision x velocity x density) grid with
  butterfly detection via 1e-4-perturbed twin runs (reference: :595-766;
  the reference's 1e-10 seed perturbation is below f32 resolution — the
  smallest representable nudge is used instead);
* **TriplePointHunter** — average the boundary points into breakdown
  coordinates with physical-constant analogies (reference: :773-908);
* simulation-probability score (reference: :1046-1183).

Usage:
    python -m nbody_tpu.experiments.omega_point_test --quick
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np

from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision
from nbody_tpu.utils.profiler import fence


def bekenstein_bound_test(quick: bool, seed: int) -> dict:
    """(reference: omega_point_test.py:173-324)"""
    print("\n--- OMEGA 1: BEKENSTEIN BOUND (digital black hole) ---")
    rows = []
    radii = [10.0, 5.0, 2.0, 1.0, 0.5, 0.2]
    n = 300 if quick else 600
    for radius in radii:
        pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), n,
                                         galaxy_radius=radius)
        sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
        sim.step(100)  # warm up the same-shape program
        fence(sim.state.positions)
        t0 = time.perf_counter()
        sim.step(100)
        fence(sim.state.positions)
        tps = 100.0 / (time.perf_counter() - t0)
        density = n / (radius * radius)
        finite = bool(np.isfinite(np.asarray(sim.positions)).all())
        rows.append({"radius": radius, "density": density,
                     "ticks_per_sec": tps, "stable": finite})
        print(f"  r={radius:5.1f} (rho={density:9.1f}): {tps:8.1f} ticks/s"
              + ("" if finite else "  BROKE"))
    tps0 = rows[0]["ticks_per_sec"]
    collapse = next((r for r in rows
                     if r["ticks_per_sec"] < tps0 * 0.5 or not r["stable"]),
                    None)
    return {"rows": rows,
            "collapse_density": collapse["density"] if collapse else None}


def temporal_aliasing_test(quick: bool, seed: int) -> dict:
    """(reference: omega_point_test.py:331-443)"""
    print("\n--- OMEGA 2: TEMPORAL ALIASING (critical dt) ---")
    n = 200 if quick else 400
    num_dts = 12 if quick else 25
    dts = np.logspace(np.log10(0.001), np.log10(5.0), num_dts)
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), n)
    rows = []
    for dt in dts:
        sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                               dt=float(dt), dynamic_params=True)
        e0 = sim.get_total_energy()
        sim.step(100)
        e1 = sim.get_total_energy()
        drift = abs((e1 - e0) / e0) if abs(e0) > 1e-12 else 0.0
        stable = bool(np.isfinite(np.asarray(sim.positions)).all()
                      and drift < 1.0)
        rows.append({"dt": float(dt), "drift": float(drift),
                     "stable": stable})
    critical = next((r["dt"] for r in rows if not r["stable"]), None)
    # sharpness: drift ratio across the transition
    drifts = [max(r["drift"], 1e-12) for r in rows]
    sharpness = float(np.max(np.abs(np.diff(np.log10(drifts)))))
    print(f"  critical dt: {critical}, transition sharpness "
          f"(max decade jump): {sharpness:.1f}")
    return {"rows": rows, "critical_dt": critical, "sharpness": sharpness}


def entropy_leak_test(quick: bool, seed: int) -> dict:
    """(reference: omega_point_test.py:450-588)"""
    print("\n--- OMEGA 3: ENTROPY LEAK (time to heat death) ---")
    n = 300 if quick else 600
    ticks = 2000 if quick else 10000
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), n)
    sim = DirectSimulation(pos, vel, m, precision=Precision.INT4_SIM)
    e0 = sim.get_total_energy()
    energies, checkpoints = [], []
    chunk = ticks // 10
    for k in range(10):
        sim.step(chunk)
        energies.append(sim.get_total_energy())
        checkpoints.append((k + 1) * chunk)
    rate_per_tick = (energies[-1] - e0) / abs(e0) / ticks
    # "heat death": when injected ghost energy ~ |E0| (drift = 100%)
    ticks_to_heat_death = (1.0 / rate_per_tick if rate_per_tick > 0
                           else float("inf"))
    print(f"  ghost energy rate: {rate_per_tick * 100:.5f}%/tick -> "
          f"heat death in ~{ticks_to_heat_death:,.0f} ticks")
    return {"ticks": checkpoints, "energies": energies,
            "rate_per_tick": rate_per_tick,
            "ticks_to_heat_death": ticks_to_heat_death}


def phase_space_scanner(quick: bool, seed: int) -> dict:
    """(reference: omega_point_test.py:595-766)"""
    print("\n--- OMEGA 4: PHASE SPACE SCANNER ---")
    precisions = [Precision.FLOAT32, Precision.INT8_SIM, Precision.INT4_SIM]
    vel_mults = [1.0, 5.0] if quick else [1.0, 5.0, 20.0]
    radii = [10.0, 2.0]
    n = 150 if quick else 300
    cells = []
    for prec in precisions:
        for vm in vel_mults:
            for radius in radii:
                pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed),
                                                 n, galaxy_radius=radius)
                sim = DirectSimulation(pos, vel * vm, m, precision=prec)
                # butterfly twin: smallest representable nudge
                pos_b = pos.at[0, 0].add(1e-5)
                twin = DirectSimulation(pos_b, vel * vm, m, precision=prec)
                e0 = sim.get_total_energy()
                sim.step(100)
                twin.step(100)
                drift = abs((sim.get_total_energy() - e0) / e0)
                butterfly = float(np.abs(
                    np.asarray(sim.positions)
                    - np.asarray(twin.positions)).mean())
                stable = bool(np.isfinite(np.asarray(sim.positions)).all()
                              and drift < 1.0)
                cells.append({
                    "precision": prec.value, "vel_mult": vm,
                    "radius": radius, "drift": float(drift),
                    "butterfly_divergence": butterfly, "stable": stable})
    unstable = [c for c in cells if not c["stable"]]
    print(f"  scanned {len(cells)} phase-space cells, "
          f"{len(unstable)} unstable")
    return {"cells": cells, "unstable_count": len(unstable)}


def triple_point_hunter(bek, temporal, phase) -> dict:
    """(reference: omega_point_test.py:773-908)"""
    print("\n--- OMEGA 5: TRIPLE POINT HUNTER ---")
    coords = {
        "critical_density": bek.get("collapse_density"),
        "critical_dt": temporal.get("critical_dt"),
        "unstable_fraction": (phase["unstable_count"]
                              / max(len(phase["cells"]), 1)),
    }
    analogies = {
        "critical_dt <-> Planck time": coords["critical_dt"],
        "critical_density <-> Bekenstein bound": coords["critical_density"],
        "speed limit <-> c (see crash_point_test)": 100.0,
    }
    for k, v in analogies.items():
        print(f"  {k}: {v}")
    return {"breakdown_coordinates": coords, "analogies": analogies}


def main(argv=None):
    p = argparse.ArgumentParser(description="Omega point: breakdown map")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/omega_point")
    args = p.parse_args(argv)

    print("\n" + "=" * 60)
    print("OMEGA POINT TEST: mapping the edges of simulated reality")
    print("=" * 60)
    bek = bekenstein_bound_test(args.quick, args.seed)
    temporal = temporal_aliasing_test(args.quick, args.seed)
    entropy = entropy_leak_test(args.quick, args.seed)
    phase = phase_space_scanner(args.quick, args.seed)
    triple = triple_point_hunter(bek, temporal, phase)

    # simulation-probability score (reference: :1046-1183): fraction of
    # probes that found sharp, constant-like breakdown boundaries.
    findings = [
        bek["collapse_density"] is not None,
        temporal["critical_dt"] is not None,
        entropy["rate_per_tick"] > 0,
        phase["unstable_count"] > 0,
    ]
    prob = sum(findings) / len(findings)
    print(f"\n  SIMULATION PROBABILITY SCORE: {prob:.0%} of probes found "
          "hard breakdown boundaries")

    report = {"bekenstein": bek, "temporal_aliasing": temporal,
              "entropy_leak": entropy, "phase_space": phase,
              "triple_point": triple,
              "simulation_probability": prob}
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "omega_point_report.json").write_text(
        json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
