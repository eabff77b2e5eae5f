"""Shared helpers for the experiment CLIs (L8 layer)."""

from __future__ import annotations

import numpy as np

from nbody_tpu.models.direct import DirectSimulation


def detect_explosion(sim: DirectSimulation, initial_energy: float) -> bool:
    """Explosion predicate (reference: stability_test.py:34-61):
    NaN/Inf state, >1000% energy drift, or bound system gone unbound."""
    pos = np.asarray(sim.positions)
    vel = np.asarray(sim.velocities)
    if not np.isfinite(pos).all() or not np.isfinite(vel).all():
        return True
    current = sim.get_total_energy()
    if abs(initial_energy) > 1e-10:
        if abs(current - initial_energy) / abs(initial_energy) > 10.0:
            return True
    if initial_energy < 0 and current > abs(initial_energy):
        return True
    return False


def outer_slope(curve, num_bins_min: int = 4):
    """Linear fit of the outer half of a rotation curve
    (reference: sensitivity_test.py:103-117). Returns (slope, mean_outer_v)."""
    radii = np.asarray(curve.radii if hasattr(curve, "radii")
                       else curve["radii"], float)
    vels = np.asarray(curve.velocities if hasattr(curve, "velocities")
                      else curve["velocities"], float)
    valid = ~np.isnan(vels)
    radii, vels = radii[valid], vels[valid]
    if len(vels) < num_bins_min:
        return 0.0, 0.0
    mid = len(vels) // 2
    outer_r, outer_v = radii[mid:], vels[mid:]
    if len(outer_r) < 2:
        return 0.0, 0.0
    slope = float(np.polyfit(outer_r, outer_v, 1)[0])
    return slope, float(outer_v.mean())


def radius_percentile(positions, pct: float = 90.0) -> float:
    r = np.sqrt((np.asarray(positions) ** 2).sum(axis=1))
    return float(np.percentile(r, pct))


def energy_drift_pct(initial: float, final: float) -> float:
    if abs(initial) < 1e-10:
        return 0.0
    return (final - initial) / abs(initial) * 100.0


def observer_effect_rates(positions, velocities, masses, num_ticks: int,
                          chunk: int = 10, repeats: int = 2):
    """Tick rates with and without per-chunk host 'observation' transfers
    — shared by breakout_tests (lazy loading) and red_team_proof
    (observer effect). Warms the exact chunk-sized program first so
    compilation never lands inside the timed window."""
    import time

    from nbody_tpu.ops.precision import Precision
    from nbody_tpu.utils.profiler import fence

    def run(observe: bool) -> float:
        sim = DirectSimulation(positions, velocities, masses,
                               precision=Precision.FLOAT32)
        sim.step(chunk)  # warm the chunk-sized program
        fence(sim.state.positions)
        t0 = time.perf_counter()
        for _ in range(num_ticks // chunk):
            sim.step(chunk)
            if observe:
                _ = np.asarray(sim.positions)  # full-state observation
            else:
                # Same fence kind as the observed arm (a minimal host
                # fetch) so the only difference between the arms is the
                # full-state transfer itself; block_until_ready can
                # return early on this platform, which inflated
                # rate_free and biased the verdicts.
                fence(sim.state.positions)
        return num_ticks / (time.perf_counter() - t0)

    rate_free = max(run(False) for _ in range(repeats))
    rate_obs = max(run(True) for _ in range(repeats))
    return rate_free, rate_obs
