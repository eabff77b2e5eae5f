"""Breakout tests: four active-interference probes at reality's seams.

TPU-native equivalent of the reference suite
(reference: breakout_tests.py:63-776):

1. **Precision wall** — a two-body close approach; rhythmic jitter in the
   separation series (coefficient of variation of per-interval deltas)
   marks the precision floor (reference: :63-208).
2. **Lazy loading** — identical run with/without per-tick host
   "observation" transfers; >5% slowdown = the universe renders on demand
   (reference: :215-358). On TPU this measures the device->host snapshot
   tax directly.
3. **Lattice symmetry** — energy drift for motion along axes vs diagonals;
   a significant difference (two-sample t-test) betrays the grid
   (reference: :365-520; 50x7-direction design condensed).
4. **Memory leak** — precision-cascade / overflow x1.001 / underflow
   x0.999 loops; record the iteration where values die
   (reference: :527-654).

Usage:
    python -m nbody_tpu.experiments.breakout_tests --quick
"""

from __future__ import annotations

import argparse
import json
import math
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision


def precision_wall_test(num_ticks: int = 400) -> dict:
    """(reference: breakout_tests.py:63-208)"""
    print("\n--- BREAKOUT 1: PRECISION WALL ---")
    cfg = SimConfig(G=1.0, softening=1e-4, dt=1e-3)
    pos = jnp.array([[-1.0, 0.0], [1.0, 0.0]])
    vel = jnp.array([[0.05, 0.02], [-0.05, -0.02]])
    m = jnp.ones(2)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           cfg=cfg, force_impl="dense")
    seps = []
    for _ in range(num_ticks // 10):
        sim.step(10)
        p = np.asarray(sim.positions)
        seps.append(float(np.linalg.norm(p[0] - p[1])))
    deltas = np.abs(np.diff(seps))
    deltas = deltas[deltas > 0]
    cv = float(deltas.std() / deltas.mean()) if len(deltas) > 3 else 0.0
    rhythmic = cv < 0.3  # suspiciously regular stepping
    print(f"  min separation {min(seps):.5f}, delta CV={cv:.3f} "
          f"({'RHYTHMIC (wall suspected)' if rhythmic else 'irregular'})")
    return {"min_separation": min(seps), "delta_cv": cv,
            "rhythmic_jitter": bool(rhythmic)}


def lazy_loading_test(num_stars: int = 500, num_ticks: int = 300,
                      seed: int = 42) -> dict:
    """(reference: breakout_tests.py:215-358)"""
    print("\n--- BREAKOUT 2: LAZY LOADING (observer effect) ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)

    from nbody_tpu.experiments._common import observer_effect_rates

    rate_free, rate_obs = observer_effect_rates(pos, vel, m, num_ticks)
    t_unobserved = num_ticks / rate_free
    t_observed = num_ticks / rate_obs
    overhead = (t_observed / t_unobserved - 1.0) * 100.0
    evidence = overhead > 5.0
    print(f"  unobserved {t_unobserved:.3f}s, observed {t_observed:.3f}s "
          f"-> overhead {overhead:+.1f}% "
          f"({'OBSERVER EFFECT' if evidence else 'no evidence'})")
    return {"unobserved_s": t_unobserved, "observed_s": t_observed,
            "overhead_percent": overhead, "observer_effect": bool(evidence)}


def lattice_symmetry_test(trials: int = 12, num_ticks: int = 150,
                          seed: int = 42) -> dict:
    """(reference: breakout_tests.py:365-520)"""
    print("\n--- BREAKOUT 3: LATTICE SYMMETRY ---")
    angles_axis = [0.0, math.pi / 2, math.pi, 3 * math.pi / 2]
    angles_diag = [math.pi / 4, 3 * math.pi / 4, 5 * math.pi / 4]

    def drift_for_angle(angle: float, trial: int) -> float:
        key = jax.random.PRNGKey(seed + trial)
        pos, vel, m = create_disk_galaxy(key, 200)
        boost = 0.5 * jnp.array([math.cos(angle), math.sin(angle)])
        sim = DirectSimulation(pos, vel + boost[None, :], m,
                               precision=Precision.FLOAT32)
        e0 = sim.get_total_energy()
        sim.step(num_ticks)
        return abs((sim.get_total_energy() - e0) / e0)

    axis_drifts, diag_drifts = [], []
    for t in range(trials):
        axis_drifts.append(drift_for_angle(
            angles_axis[t % len(angles_axis)], t))
        diag_drifts.append(drift_for_angle(
            angles_diag[t % len(angles_diag)], t))
    a, d = np.asarray(axis_drifts), np.asarray(diag_drifts)
    try:
        from scipy import stats
        t_stat, p_val = stats.ttest_ind(a, d, equal_var=False)
        t_stat, p_val = float(t_stat), float(p_val)
    except Exception:
        pooled = math.sqrt(a.var(ddof=1) / len(a) + d.var(ddof=1) / len(d))
        t_stat = float((a.mean() - d.mean()) / max(pooled, 1e-12))
        p_val = 1.0
    anisotropic = p_val < 0.05
    print(f"  axis drift {a.mean():.2e} +/- {a.std():.1e}, "
          f"diagonal {d.mean():.2e} +/- {d.std():.1e}")
    print(f"  t={t_stat:.2f}, p={p_val:.3f} "
          f"({'LATTICE DETECTED' if anisotropic else 'isotropic'})")
    return {"axis_mean": float(a.mean()), "diag_mean": float(d.mean()),
            "t_stat": t_stat, "p_value": p_val,
            "anisotropic": bool(anisotropic)}


def memory_leak_test(max_iters: int = 200) -> dict:
    """(reference: breakout_tests.py:527-654): where do the cascade loops
    die? (precision cascade /2, overflow x1.001^k, underflow x0.999^k...
    the reference uses larger factors; kept spiritually: /2, x2, x0.5)."""
    print("\n--- BREAKOUT 4: MEMORY LEAK / VALUE DEATH ---")

    @jax.jit
    def cascade(x, steps):
        def body(i, v):
            # inexact round trip: /3 then *3 rounds twice per iteration
            # (a *2.0000001 factor would round back to exactly 2.0 in f32
            # and the probe would be inert)
            return (v / 3.0) * 3.0
        return jax.lax.fori_loop(0, steps, body, x)

    results = {}
    # precision cascade: how many round trips until the drift random walk
    # crosses 1e-6 relative?
    drifted_at = None
    v = jnp.float32(1.0)
    for i in range(max_iters):
        v = cascade(v, 10)
        if abs(float(v) - 1.0) > 1e-6:
            drifted_at = (i + 1) * 10
            break
    results["precision_cascade_drift_iter"] = drifted_at
    results["precision_cascade_final_drift"] = abs(float(v) - 1.0)

    # overflow: x *= 2 until inf
    v = jnp.float32(1.0)
    inf_at = None
    for i in range(max_iters):
        v = v * 2.0
        if not np.isfinite(float(v)):
            inf_at = i + 1
            break
    results["overflow_inf_iter"] = inf_at

    # underflow: x *= 0.5 until 0
    v = jnp.float32(1.0)
    zero_at = None
    for i in range(max_iters):
        v = v * 0.5
        if float(v) == 0.0:
            zero_at = i + 1
            break
    results["underflow_zero_iter"] = zero_at
    print(f"  overflow -> inf after {inf_at} doublings (f32 max ~2^128)")
    print(f"  underflow -> 0 after {zero_at} halvings "
          f"(FTZ: ~127 if flushed, ~149 with denormals)")
    results["ftz_detected"] = bool(zero_at is not None and zero_at <= 130)
    return results


def run_all_breakout_tests(quick: bool = False, seed: int = 42) -> dict:
    """(reference: breakout_tests.py:661-750)"""
    ticks = 150 if quick else 300
    report = {
        "precision_wall": precision_wall_test(ticks),
        "lazy_loading": lazy_loading_test(300 if quick else 500, ticks,
                                          seed),
        "lattice_symmetry": lattice_symmetry_test(8 if quick else 12,
                                                  100 if quick else 150,
                                                  seed),
        "memory_leak": memory_leak_test(),
    }
    evidence = sum([
        report["precision_wall"]["rhythmic_jitter"],
        report["lazy_loading"]["observer_effect"],
        report["lattice_symmetry"]["anisotropic"],
        report["memory_leak"]["ftz_detected"],
    ])
    report["verdict"] = {
        "evidence_count": evidence,
        "conclusion": (f"{evidence}/4 probes returned positive evidence of "
                       "substrate artifacts"),
    }
    print(f"\nAGGREGATE: {report['verdict']['conclusion']}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Breakout test suite")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/breakout")
    args = p.parse_args(argv)

    print("\n" + "=" * 60)
    print("BREAKOUT TESTS: active interference probes")
    print("=" * 60)
    report = run_all_breakout_tests(args.quick, args.seed)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "breakout_results.json").write_text(
        json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
