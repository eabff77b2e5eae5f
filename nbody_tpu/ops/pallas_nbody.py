"""Tiled Pallas TPU kernel for softened all-pairs gravity.

The production force path: replaces the reference's (N, N, 2) broadcast
tensor (reference: simulation.py:83-112, memory-infeasible beyond ~10k
particles) with a VMEM-tiled O(N^2)-compute / O(N)-memory kernel.

Layout strategy (chosen for the VPU's (sublane, lane) tiling):
* receivers (i) live on the *lane* axis, sources (j) on the *sublane*
  axis, so the per-tile reduction over sources is a sublane reduction and
  the accumulator stays a (1, BI) lane vector — no in-kernel transposes;
* positions are passed twice, as (D, N) rows for receivers and (N, D)
  columns for sources, both resident in VMEM for the whole grid (a few MB
  even at N = 500k);
* sources are streamed in (BJ, 1) chunks by a fori_loop; padded tail
  sources carry zero mass, which zeroes their force contribution exactly —
  no explicit mask;
* the precision hook (quantize_distance_squared) runs in-tile; the int-sim
  log-grid uses global bounds precomputed outside (analytic min + a max
  pass), preserving the reference's tensor-global normalisation
  (reference: quantization.py:112-121).

Per pair: ~16 VPU flops + 1 rsqrt; f32 accumulators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.config import SimConfig
from nbody_tpu.ops.precision import (
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)
from nbody_tpu.ops.forces import max_pairwise_dist_sq


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _force_kernel(bounds_ref, pos_rows_ref, pos_cols_ref, gmass_ref, out_ref,
                  *, q: Quantizer, softening_sq: float, dim: int,
                  block_i: int, block_j: int, n_pad: int):
    """One grid step: accelerations for receiver block i over all sources.

    bounds_ref: (1, 2) SMEM — [log_lo, log_hi] for the int-sim quantizer
    pos_rows_ref: (D, N_pad) VMEM — receiver coordinates, lane-major
    pos_cols_ref: (N_pad, D) VMEM — source coordinates, sublane-major
    gmass_ref:  (N_pad, 1) VMEM — G * m_j (zero on padded tail)
    out_ref:    (D, BI) VMEM — acceleration of this receiver block
    """
    i0 = pl.program_id(0) * block_i
    num_j = n_pad // block_j

    # Receiver coordinates: (1, BI) lane vectors, one per dimension.
    xi = [pos_rows_ref[d:d + 1, pl.ds(i0, block_i)] for d in range(dim)]
    # Global receiver indices on the lane axis.
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_i), 1) + i0

    log_lo = bounds_ref[0, 0]
    log_hi = bounds_ref[0, 1]

    def j_chunk(jc, acc):
        j0 = jc * block_j
        # Source coordinates: (BJ, 1) sublane vectors.
        xj = [pos_cols_ref[pl.ds(j0, block_j), d:d + 1] for d in range(dim)]
        gm_j = gmass_ref[pl.ds(j0, block_j), :]  # (BJ, 1)

        # (BJ, BI) pairwise tile.
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        d2 = d2 + softening_sq

        if q.is_int:
            d2q = quantize_distance_squared(d2, q, log_lo=log_lo,
                                            log_hi=log_hi)
        else:
            d2q = quantize_distance_squared(d2, q)

        inv_d = jax.lax.rsqrt(d2q)
        factor = gm_j * (inv_d * inv_d * inv_d)  # (BJ, BI) via broadcast

        # Zero the self-interaction diagonal.
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (block_j, 1), 0) + j0
        factor = jnp.where(j_ids == i_ids, 0.0, factor)

        # Sublane-reduce over sources into (1, BI) lane accumulators.
        return tuple(
            acc[d] + jnp.sum(factor * diffs[d], axis=0, keepdims=True)
            for d in range(dim)
        )

    acc0 = tuple(jnp.zeros((1, block_i), jnp.float32) for _ in range(dim))
    acc = jax.lax.fori_loop(0, num_j, j_chunk, acc0)
    for d in range(dim):
        out_ref[d:d + 1, :] = acc[d]


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block_i", "block_j", "interpret"))
def pallas_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                         quantize_forces: bool = True,
                         block_i: int = 512, block_j: int = 1024,
                         interpret: bool | None = None):
    """Drop-in replacement for forces.dense/tiled_accelerations on TPU.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path is unit-testable on the CPU mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, dim = positions.shape
    n_pad = _round_up(n, max(block_i, block_j, 128))
    if n_pad < max(block_i, block_j):
        n_pad = max(block_i, block_j)

    positions = positions.astype(jnp.float32)
    pos_cols = jnp.zeros((n_pad, dim), jnp.float32).at[:n].set(positions)
    pos_rows = pos_cols.T  # (D, N_pad); XLA fuses the transpose
    gmass = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(
        cfg.G * masses.astype(jnp.float32))

    if q.is_int:
        max_d2 = max_pairwise_dist_sq(positions, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
        bounds = jnp.stack([log_lo, log_hi]).reshape(1, 2).astype(jnp.float32)
    else:
        bounds = jnp.zeros((1, 2), jnp.float32)

    kernel = functools.partial(
        _force_kernel, q=q, softening_sq=cfg.softening_sq, dim=dim,
        block_i=block_i, block_j=block_j, n_pad=n_pad)

    grid = (n_pad // block_i,)
    acc_rows = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((dim, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, block_i), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=16 * n_pad * n_pad * dim // 2,
            bytes_accessed=3 * n_pad * dim * 4,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(bounds, pos_rows, pos_cols, gmass)

    acc = acc_rows.T[:n]
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    return acc
