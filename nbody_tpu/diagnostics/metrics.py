"""On-device simulation diagnostics.

Re-design of the reference metrics module (reference: metrics.py:12-227).
Every function here is pure jnp, jit/scan-safe, and returns device scalars
or fixed-shape arrays — the reference's ``.item()``-per-metric host syncs
(reference: simulation.py:174,192, metrics.py:67-95) become fused on-device
reductions that are streamed out once per snapshot interval.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.ops import doubledouble as dd

# NOTE: every public function here is jitted at module level. On this
# environment compiles go through a remote service with seconds of latency
# per XLA program, so an *eager* call into the double-double reduction
# graph (hundreds of primitives) costs minutes the first time — one fused
# jit per function makes it a single program.


# --------------------------------------------------------------------------
# Energies (reference: simulation.py:170-196)
# --------------------------------------------------------------------------

@jax.jit
def kinetic_energy(velocities, masses) -> jnp.ndarray:
    """KE = 0.5 * sum_i m_i |v_i|^2, compensated sum."""
    v_sq = jnp.sum(velocities * velocities, axis=-1)
    s = dd.dd_dot_f32(masses, v_sq)
    return 0.5 * (s.hi + s.lo)


@functools.partial(jax.jit, static_argnames=("cfg", "block"))
def potential_energy(positions, masses, cfg: SimConfig,
                     block: int = 1024, softening_sq=None) -> jnp.ndarray:
    """U = -G * sum_{i<j} m_i m_j / sqrt(|x_i - x_j|^2 + eps^2).

    Tiled over row blocks (O(N) memory) with a compensated reduction;
    counts every unordered pair once via a 0.5x over the full masked matrix
    (equivalent to the reference's triu mask, simulation.py:189-190).
    """
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    n, d = positions.shape
    pad = (-n) % block
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    mass_p = jnp.pad(masses, (0, pad))
    ids = jnp.arange(n + pad)

    def block_fn(args):
        pos_i, m_i, ids_i = args
        diff = positions[None, :, :] - pos_i[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1) + softening_sq
        inv_d = jax.lax.rsqrt(d2)
        pair = m_i[:, None] * masses[None, :] * inv_d
        # Mask self-pairs AND padded rows: a padded (origin, zero-mass)
        # row against a real particle at exactly the origin under zero
        # softening is 0 * rsqrt(0) = NaN, which would poison the summed
        # tile — the where-select replaces it before the reduction.
        mask = ((ids_i[:, None] != jnp.arange(n)[None, :])
                & (ids_i[:, None] < n))
        pair = jnp.where(mask, pair, 0.0)
        s = dd.dd_sum_chunked(pair.reshape(-1))
        return s.hi + s.lo

    blocks = (pos_p.reshape(-1, block, d), mass_p.reshape(-1, block),
              ids.reshape(-1, block))
    if blocks[0].shape[0] == 1:
        partial = block_fn((blocks[0][0], blocks[1][0], blocks[2][0]))
        return -0.5 * cfg.G * partial
    partial = jax.lax.map(block_fn, blocks)
    total = dd.dd_sum(partial)
    return -0.5 * cfg.G * (total.hi + total.lo)


@functools.partial(jax.jit, static_argnames=("cfg",))
def total_energy(positions, velocities, masses, cfg: SimConfig,
                 softening_sq=None) -> jnp.ndarray:
    return kinetic_energy(velocities, masses) + potential_energy(
        positions, masses, cfg, softening_sq=softening_sq)


# --------------------------------------------------------------------------
# Structure diagnostics (reference: metrics.py:25-156)
# --------------------------------------------------------------------------

class RotationCurve(NamedTuple):
    radii: jnp.ndarray          # (num_bins,) bin centers
    velocities: jnp.ndarray     # (num_bins,) mean tangential velocity (nan if empty)
    counts: jnp.ndarray         # (num_bins,) stars per bin


@functools.partial(jax.jit, static_argnames=("num_bins",))
def rotation_curve(positions, velocities, num_bins: int = 20,
                   max_radius=None) -> RotationCurve:
    """Mean tangential velocity vs radius — the dark-matter diagnostic
    (reference: metrics.py:25-78). Fixed-shape segment-sum binning instead
    of a Python loop over bins."""
    r = jnp.sqrt(jnp.sum(positions * positions, axis=-1))
    if max_radius is None:
        max_radius = jnp.max(r)
    # v_t = |x*vy - y*vx| / r (z-component of specific angular momentum / r)
    lz = positions[:, 0] * velocities[:, 1] - positions[:, 1] * velocities[:, 0]
    v_t = jnp.abs(lz) / jnp.maximum(r, 0.1)

    edges = jnp.linspace(0.0, max_radius, num_bins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    bin_width = max_radius / num_bins
    idx = jnp.clip(jnp.floor(r / jnp.maximum(bin_width, 1e-9)).astype(jnp.int32),
                   0, num_bins - 1)
    # r == max_radius lands in the last bin; r beyond (shouldn't happen when
    # max_radius defaults to max(r)) is clipped in as well.
    sums = jax.ops.segment_sum(v_t, idx, num_segments=num_bins)
    counts = jax.ops.segment_sum(jnp.ones_like(v_t), idx, num_segments=num_bins)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), jnp.nan)
    return RotationCurve(centers, means, counts.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("percentile",))
def galaxy_radius(positions, percentile: float = 90.0) -> jnp.ndarray:
    """Radius containing `percentile`% of particles (reference: metrics.py:81-95)."""
    r = jnp.sqrt(jnp.sum(positions * positions, axis=-1))
    n = r.shape[0]
    k = min(int(n * percentile / 100.0), n - 1)
    return jnp.sort(r)[k]


@functools.partial(jax.jit, static_argnames=("G",))
def bound_fraction(positions, velocities, masses, G: float = 0.001) -> jnp.ndarray:
    """Fraction of particles with v < v_escape from the enclosed mass
    (reference: metrics.py:98-145): sort by radius from the center of mass,
    cumsum masses for M(<r), compare |v| to sqrt(2 G M / r)."""
    total_mass = jnp.sum(masses)
    com = jnp.sum(positions * masses[:, None], axis=0) / total_mass
    r = jnp.sqrt(jnp.sum((positions - com) ** 2, axis=-1))
    order = jnp.argsort(r)
    cum_mass = jnp.cumsum(masses[order])
    enclosed = jnp.zeros_like(masses).at[order].set(cum_mass)
    v_esc = jnp.sqrt(2.0 * G * enclosed / jnp.maximum(r, 0.1))
    v_mag = jnp.sqrt(jnp.sum(velocities * velocities, axis=-1))
    return jnp.mean((v_mag < v_esc).astype(jnp.float32))


@jax.jit
def velocity_dispersion(velocities) -> jnp.ndarray:
    """Std of |v| — heating indicator (reference: metrics.py:148-156)."""
    v_mag = jnp.sqrt(jnp.sum(velocities * velocities, axis=-1))
    return jnp.std(v_mag)


# --------------------------------------------------------------------------
# Fused snapshot
# --------------------------------------------------------------------------

class Snapshot(NamedTuple):
    """Everything collect_metrics records (reference: metrics.py:159-179),
    as one fused on-device bundle emitted per interval."""

    tick: jnp.ndarray
    kinetic: jnp.ndarray
    potential: jnp.ndarray
    total: jnp.ndarray
    radius_90: jnp.ndarray
    bound_frac: jnp.ndarray
    dispersion: jnp.ndarray
    curve_radii: jnp.ndarray
    curve_velocities: jnp.ndarray
    curve_counts: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg", "num_bins"))
def snapshot(positions, velocities, masses, tick, cfg: SimConfig,
             num_bins: int = 20) -> Snapshot:
    ke = kinetic_energy(velocities, masses)
    pe = potential_energy(positions, masses, cfg)
    curve = rotation_curve(positions, velocities, num_bins=num_bins)
    return Snapshot(
        tick=tick,
        kinetic=ke,
        potential=pe,
        total=ke + pe,
        radius_90=galaxy_radius(positions, 90.0),
        bound_frac=bound_fraction(positions, velocities, masses, cfg.G),
        dispersion=velocity_dispersion(velocities),
        curve_radii=curve.radii,
        curve_velocities=curve.velocities,
        curve_counts=curve.counts,
    )


def compare_rotation_curves(curve1, curve2):
    """Outer-slope flatness comparison (reference: metrics.py:182-227).

    Host-side (numpy) analysis of two RotationCurve-like dicts/tuples.
    """
    import numpy as np

    v1 = np.asarray(curve1.velocities if hasattr(curve1, "velocities")
                    else curve1["velocities"], dtype=float)
    v2 = np.asarray(curve2.velocities if hasattr(curve2, "velocities")
                    else curve2["velocities"], dtype=float)
    r1 = np.asarray(curve1.radii if hasattr(curve1, "radii")
                    else curve1["radii"], dtype=float)

    valid = ~(np.isnan(v1) | np.isnan(v2))
    if valid.sum() == 0:
        return {"error": "No valid comparison points"}
    v1v, v2v, rv = v1[valid], v2[valid], r1[valid]
    outer = rv > np.median(rv)
    if outer.sum() > 2:
        slope1 = np.polyfit(rv[outer], v1v[outer], 1)[0]
        slope2 = np.polyfit(rv[outer], v2v[outer], 1)[0]
    else:
        slope1 = slope2 = 0.0
    return {
        "mean_velocity_diff": float((v2v - v1v).mean()),
        "outer_slope_baseline": float(slope1),
        "outer_slope_quantized": float(slope2),
        "flatness_increase": float(slope2 - slope1),
        "num_valid_bins": int(valid.sum()),
    }
