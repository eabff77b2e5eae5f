"""Softened all-pairs gravity with a precision-degradation hook.

Re-design of the reference's direct force kernel
(reference: simulation.py:74-118). Three implementations share identical
semantics:

* ``dense_accelerations`` — materialises the (N, N) pairwise block; used as
  the correctness oracle at small N and by unit tests.
* ``tiled_accelerations`` — lax.map over row blocks; O(N) memory, runs
  anywhere (CPU tests, TPU), compiles to a fused XLA loop.
* the Pallas kernel in ``nbody_tpu.ops.pallas_nbody`` — the production TPU
  path (VMEM-tiled, in-tile quantization).

The int-sim quantizer needs the global log-bounds of the softened dist^2
matrix. The global min is analytic (diagonal == softening^2, see
``precision.dist_sq_log_bounds``); the global max comes from a cheap
separate max pass (``max_pairwise_dist_sq``) so that tiled execution
reproduces the reference's tensor-global normalisation
(reference: quantization.py:112-121) exactly.

Physics (reference: simulation.py:83-117):
    diff[i, j] = x_j - x_i
    d2[i, j]   = |diff|^2 + softening^2
    d2q        = quantize(d2, mode)
    acc[i]     = G * sum_{j != i} m_j * diff[i, j] / d2q^{3/2}
    acc        = quantize_force(acc) for int8/int4 modes
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody_tpu.config import SimConfig
from nbody_tpu.ops import doubledouble as dd
from nbody_tpu.ops.precision import (
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)


def _pair_block(pos_i, pos_j, masses_j, self_mask, q: Quantizer,
                cfg: SimConfig, log_lo, log_hi, softening_sq=None):
    """Acceleration of a block of receivers `pos_i` due to sources `pos_j`.

    pos_i: (B, D), pos_j: (M, D), masses_j: (M,), self_mask: (B, M) bool
    marking entries where receiver == source (to be zeroed).
    ``softening_sq`` optionally overrides the static cfg value with a
    traced scalar (one compiled program serves a whole parameter sweep).
    Returns (B, D) f32.
    """
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    # (B, M, D) displacement; D is 2 or 3 so this is VPU-friendly.
    diff = pos_j[None, :, :] - pos_i[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1) + softening_sq  # (B, M)
    d2q = quantize_distance_squared(d2, q, log_lo=log_lo, log_hi=log_hi)
    # 1/d^3 = rsqrt(d2)^3 — one transcendental per pair.
    inv_d = jax.lax.rsqrt(d2q.astype(jnp.float32))
    inv_d3 = inv_d * inv_d * inv_d
    factor = cfg.G * masses_j[None, :] * inv_d3  # (B, M)
    factor = jnp.where(self_mask, 0.0, factor)
    return jnp.einsum("bm,bmd->bd", factor, diff)


@functools.partial(jax.jit, static_argnames=("cfg", "block"))
def max_pairwise_dist_sq(positions: jnp.ndarray, cfg: SimConfig,
                         block: int = 1024, softening_sq=None) -> jnp.ndarray:
    """Global max of the softened pairwise dist^2 matrix, O(N) memory.

    Needed only for int-sim modes (the log-grid's upper bound)."""
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    n = positions.shape[0]
    pad = (-n) % block
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    # padded rows replicate row 0: they cannot exceed the true max because
    # their pairwise distances are a subset of existing ones.
    pos_p = pos_p.at[n:].set(positions[0]) if pad else pos_p

    def row_block_max(pos_i):
        diff = positions[None, :, :] - pos_i[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.max(d2)

    blocks = pos_p.reshape(-1, block, positions.shape[1])
    maxes = jax.lax.map(row_block_max, blocks)
    return jnp.max(maxes) + softening_sq


def _diameter_directions(dim: int) -> jnp.ndarray:
    """Fixed unit-direction sets for the diameter lower bound: 8 in-plane
    angles for 2-D (worst-case extent >= cos(pi/16) ~ 0.981 of the true
    diameter), the 13 cube axes/face-diagonals/corners for 3-D."""
    if dim == 2:
        ang = jnp.arange(8, dtype=jnp.float32) * (jnp.pi / 8.0)
        return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=1)
    if dim == 3:
        import numpy as _np
        vecs = []
        for v in [(1, 0, 0), (0, 1, 0), (0, 0, 1),
                  (1, 1, 0), (1, -1, 0), (1, 0, 1), (1, 0, -1),
                  (0, 1, 1), (0, 1, -1),
                  (1, 1, 1), (1, 1, -1), (1, -1, 1), (1, -1, -1)]:
            a = _np.asarray(v, _np.float32)
            vecs.append(a / _np.linalg.norm(a))
        return jnp.asarray(_np.stack(vecs))
    raise ValueError(f"unsupported dim {dim}")


@functools.partial(jax.jit, static_argnames=("cfg", "max_candidates"))
def max_pairwise_dist_sq_pruned(positions, cfg: SimConfig,
                                softening_sq=None,
                                max_candidates: int = 1024):
    """EXACT global max softened pairwise dist^2 in O(N) work.

    The max pairwise distance is the point set's diameter; both of its
    endpoints lie far from the centroid: for any diameter pair (a, b),
    |a - c| >= D - r_max (triangle inequality, with r_max = max |x - c|
    and D >= any directional extent D_lb). So candidates = the
    ``max_candidates`` largest-radius points, and the exact max over
    their O(M^2) pairs equals the global max whenever the radius
    threshold D_lb - r_max admits <= M points — verified on device, with
    a lax.cond fallback to the full O(N^2/2) pass otherwise (degenerate
    geometries: near-spherical shells, coincident clouds). The bound is
    geometric over exact reals; a 1e-5 relative slack on the threshold
    absorbs f32 rounding of the radii (~1e-7).

    Per-pair arithmetic matches max_pairwise_dist_sq / the Pallas max
    pass op-for-op (diff, squares, sequential-axis sum, max, + softening)
    so the pruned result is BITWISE the same max — the int-sim log grid
    (reference: quantization.py:112-121) sees identical bounds. Replaces
    the 15.1 ms/step max pass at N=131k with ~1 ms (docs/PERF.md)."""
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    n, dim = positions.shape
    pos = positions.astype(jnp.float32)

    def dense_max(p):
        diff = p[None, :, :] - p[:, None, :]
        d2 = diff[..., 0] * diff[..., 0]
        for d in range(1, dim):
            d2 = d2 + diff[..., d] * diff[..., d]
        return jnp.max(d2)

    if n <= max_candidates:
        return dense_max(pos) + softening_sq

    c = jnp.mean(pos, axis=0)
    u = pos - c
    r2 = u[:, 0] * u[:, 0]
    for d in range(1, dim):
        r2 = r2 + u[:, d] * u[:, d]
    r = jnp.sqrt(r2)
    r_max = jnp.max(r)

    dirs = _diameter_directions(dim)
    proj = pos @ dirs.T                       # (N, K)
    d_lb = jnp.max(jnp.max(proj, axis=0) - jnp.min(proj, axis=0))
    # Endpoint radius bound with slack for f32 rounding of r / d_lb.
    thresh = (d_lb - r_max) * jnp.float32(1.0 - 1e-5) \
        - jnp.float32(1e-6) * r_max
    admitted = jnp.sum(r >= thresh)

    _, idx = jax.lax.top_k(r, max_candidates)
    cand = jnp.take(pos, idx, axis=0)

    def full_fallback():
        # Rare path (degenerate geometry): the O(N^2/2) pass. On TPU use
        # the compute-bound Pallas kernels — the lax.map version would
        # materialise a (block, N, D) HBM intermediate at large N. Both
        # cond branches COMPILE regardless of which executes, so the
        # resident-source kernel is only traced where its (D, N) VMEM
        # array fits; the streamed kernel covers the rest.
        if jax.default_backend() == "tpu":
            from nbody_tpu.ops.pallas_nbody import (
                pallas_max_dist_sq, pallas_max_dist_sq_streamed)
            if 4 * dim * n <= 8_000_000:
                return pallas_max_dist_sq(pos, cfg, softening_sq=0.0)
            return pallas_max_dist_sq_streamed(pos, cfg, softening_sq=0.0)
        return max_pairwise_dist_sq(pos, cfg, softening_sq=0.0)

    return jax.lax.cond(
        admitted <= max_candidates,
        lambda: dense_max(cand),
        full_fallback,
    ) + softening_sq


def _quant_bounds(positions, q: Quantizer, cfg: SimConfig,
                  softening_sq=None):
    """(log_lo, log_hi) for int modes, else (None, None)."""
    if not q.is_int:
        return None, None
    max_d2 = max_pairwise_dist_sq(positions, cfg,
                                  softening_sq=softening_sq)
    return dist_sq_log_bounds(
        q, max_d2,
        cfg.softening_sq if softening_sq is None else softening_sq)


def _maybe_quantize_force(acc, q: Quantizer, quantize_forces: bool):
    if quantize_forces and q.is_int:
        return quantize_force(acc, q)
    return acc


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces"))
def dense_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                        quantize_forces: bool = True,
                        softening_sq=None, log_lo=None,
                        log_hi=None) -> jnp.ndarray:
    """Oracle implementation: materialises (N, N). Small N only.

    ``log_lo``/``log_hi`` optionally supply EXTERNAL int-sim grid bounds
    (the bounds-reuse path owns them); default recomputes per call."""
    n = positions.shape[0]
    # Use the same bounds helper as the tiled/Pallas paths so all three
    # implementations quantize onto bit-identical grids (a 1-ulp bound
    # difference can flip a bin and move a force by a whole grid step).
    if log_lo is None or log_hi is None:
        log_lo, log_hi = _quant_bounds(positions, q, cfg, softening_sq)
    self_mask = jnp.eye(n, dtype=bool)
    acc = _pair_block(positions, positions, masses, self_mask, q, cfg,
                      log_lo, log_hi, softening_sq)
    return _maybe_quantize_force(acc, q, quantize_forces)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block"))
def tiled_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                        quantize_forces: bool = True,
                        block: int = 1024, softening_sq=None,
                        log_lo=None, log_hi=None) -> jnp.ndarray:
    """O(N) memory row-blocked force evaluation (any backend)."""
    n, d = positions.shape
    if log_lo is None or log_hi is None:
        log_lo, log_hi = _quant_bounds(positions, q, cfg, softening_sq)

    pad = (-n) % block
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    row_ids = jnp.arange(n + pad)

    def block_fn(args):
        pos_i, ids_i = args
        self_mask = ids_i[:, None] == jnp.arange(n)[None, :]
        return _pair_block(pos_i, positions, masses, self_mask, q, cfg,
                           log_lo, log_hi, softening_sq)

    blocks = (pos_p.reshape(-1, block, d), row_ids.reshape(-1, block))
    acc = jax.lax.map(block_fn, blocks).reshape(-1, d)[:n]
    return _maybe_quantize_force(acc, q, quantize_forces)


@functools.partial(jax.jit, static_argnames=("cfg", "block"))
def baseline_accelerations_dd(positions, masses, cfg: SimConfig,
                              block: int = 1024) -> jnp.ndarray:
    """Extended-precision force for the emulated-f64 baseline.

    f32 pairwise terms with a compensated (double-double) sum over sources,
    removing the O(sqrt(N) * eps) random-walk of naive f32 accumulation.
    Returns f32 (the compensation matters for the *sum*, whose residual is
    re-added before the final rounding).
    """
    n, d = positions.shape
    pad = (-n) % block
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    row_ids = jnp.arange(n + pad)

    def block_fn(args):
        pos_i, ids_i = args
        diff = positions[None, :, :] - pos_i[:, None, :]  # (B, N, D)
        d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
        inv_d = jax.lax.rsqrt(d2)
        inv_d3 = inv_d * inv_d * inv_d
        factor = cfg.G * masses[None, :] * inv_d3
        self_mask = ids_i[:, None] == jnp.arange(n)[None, :]
        factor = jnp.where(self_mask, 0.0, factor)
        contrib = factor[:, :, None] * diff  # (B, N, D)
        s = dd.dd_sum_chunked(contrib, axis=1)  # DD of (B, D)
        return s.hi + s.lo

    blocks = (pos_p.reshape(-1, block, d), row_ids.reshape(-1, block))
    if blocks[0].shape[0] == 1:  # single block: skip the map machinery
        return block_fn((blocks[0][0], blocks[1][0]))[:n]
    return jax.lax.map(block_fn, blocks).reshape(-1, d)[:n]
