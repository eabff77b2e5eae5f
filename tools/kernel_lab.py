#!/usr/bin/env python
"""Kernel lab: measure candidate sym-kernel variants against production.

Variants under test (N=131072, in-scan, data-dependency threaded,
host-fetch fenced — the bench.py discipline):

  prod      — production pallas_accelerations_sym (18 ops/pair f32)
  uniform   — uniform-G*m t-form: with all masses equal, the per-pair
              direct (gm_j*w) and reaction (gm_i*w) products collapse to
              a shared t_d = w*diff_d; gm scales ONCE in the epilogue
              outside the kernel. 14 ops/pair. Requires n %% block_j == 0
              (no padding: padded rows otherwise lose their gm=0 guard).
  uniform2  — uniform + softening seeded into the d2 FMA chain
              (association change: (d0^2+soft)+d1^2).

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab.py
"""
from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.config import SimConfig
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.pallas_nbody import (
    _round_up,
    pallas_accelerations_sym,
    pallas_max_dist_sq,
)
from nbody_tpu.ops.precision import (
    Precision,
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)

N = 131072
STEPS = 10


def _force_kernel_sym_uniform(bounds_ref, pos_i_ref, src_ref, out_row_ref,
                              out_col_ref, *, q: Quantizer, self_masked: bool,
                              dim: int, block_i: int, block_j: int,
                              n_pad: int, seed_soft: bool,
                              unroll: int = 1):
    """Uniform-G*m t-form variant of _force_kernel_sym."""
    pid = pl.program_id(0)
    i0 = pid * block_i
    num_j = n_pad // block_j
    sj = i0 // block_j

    @pl.when(pid == 0)
    def _init_cols():
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]

    log_lo = bounds_ref[0, 0]
    log_hi = bounds_ref[0, 1]
    softening_sq = bounds_ref[0, 2]

    if q.is_int:
        lvl = float(q.levels - 1)
        safe_span = jnp.maximum(log_hi - log_lo, 1e-10)
        norm_a = lvl / safe_span
        norm_b = -log_lo * norm_a
        arg_k = -1.5 * safe_span / lvl
        arg_0 = -1.5 * log_lo
        arg_cap = -1.5 * math.log(q.min_dist_sq)

    def pair_w(d2):
        if q.is_int:
            log_d2 = jnp.log(jnp.maximum(d2, q.min_dist_sq))
            k = jnp.round(log_d2 * norm_a + norm_b)
            arg = jnp.minimum(k * arg_k + arg_0, arg_cap)
            return jnp.exp(arg)
        d2q = quantize_distance_squared(d2, q)
        inv_d = jax.lax.rsqrt(d2q)
        return inv_d * inv_d * inv_d

    def tile(j0):
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        diffs = [xj[d] - xi[d] for d in range(dim)]
        if seed_soft:
            d2 = diffs[0] * diffs[0] + softening_sq
            for d in range(1, dim):
                d2 = d2 + diffs[d] * diffs[d]
            return diffs, pair_w(d2)
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        return diffs, pair_w(d2 + softening_sq)

    # Own super-chunk: full tile, row sums only.
    diffs, w = tile(sj * block_j)
    if self_masked:
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (block_i, 1), 0) + i0
        c_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, block_j), 1)
                 + sj * block_j)
        w = jnp.where(r_ids == c_ids, 0.0, w)
    acc0 = tuple(jnp.sum(w * diffs[d], axis=1, keepdims=True)
                 for d in range(dim))

    def j_chunk(jc, acc):
        j0 = jc * block_j
        diffs, w = tile(j0)
        new = []
        for d in range(dim):
            t = w * diffs[d]
            col = -jnp.sum(t, axis=0, keepdims=True)  # (1, BJ)
            out_col_ref[d:d + 1, pl.ds(j0, block_j)] += col
            new.append(acc[d] + jnp.sum(t, axis=1, keepdims=True))
        return tuple(new)

    if unroll <= 1:
        acc = jax.lax.fori_loop(sj + 1, num_j, j_chunk, acc0)
    else:
        # manual 2-wide interleave: two independent tiles per iteration
        # (dynamic trip count, so lax unroll is unavailable); odd tail
        # chunk handled by a predicated extra tile
        total = num_j - (sj + 1)
        pairs = total // unroll

        def j_duo(k, acc):
            j0 = (sj + 1 + unroll * k) * block_j
            d_a, w_a = tile(j0)
            d_b, w_b = tile(j0 + block_j)
            tiles = [(d_a, w_a), (d_b, w_b)]
            for extra in range(2, unroll):
                tiles.append(tile(j0 + extra * block_j))
            new = []
            for d in range(dim):
                ts = [w * df[d] for df, w in tiles]
                for idx, t in enumerate(ts):
                    out_col_ref[d:d + 1,
                                pl.ds(j0 + idx * block_j, block_j)] += \
                        -jnp.sum(t, axis=0, keepdims=True)
                s_d = acc[d]
                for t in ts:
                    s_d = s_d + jnp.sum(t, axis=1, keepdims=True)
                new.append(s_d)
            return tuple(new)

        acc = jax.lax.fori_loop(0, pairs, j_duo, acc0)
        # remainder tiles (0..unroll-1), predicated
        for r in range(1, unroll):
            @pl.when(total % unroll == r)
            def _tails(r=r):
                a2 = acc
                for t_i in range(r):
                    a2 = j_chunk(num_j - r + t_i, a2)
                for d in range(dim):
                    out_row_ref[:, d:d + 1] = a2[d]

        @pl.when(total % unroll == 0)
        def _even():
            for d in range(dim):
                out_row_ref[:, d:d + 1] = acc[d]
        return
    for d in range(dim):
        out_row_ref[:, d:d + 1] = acc[d]


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block", "block_j", "seed_soft",
                                             "unroll"))
def pallas_accelerations_sym_uniform(positions, gm_scalar, q: Quantizer,
                                     cfg: SimConfig,
                                     quantize_forces: bool = True,
                                     block: int | None = None,
                                     block_j: int | None = None,
                                     seed_soft: bool = False,
                                     unroll: int = 1):
    n, dim = positions.shape
    if block is None:
        block = 256 if q.is_int else 512
    quantum = math.lcm(block, 128)
    if block_j is None:
        block_j = min(_round_up(1024, quantum),
                      _round_up(max(n, block), quantum))
    else:
        block_j = _round_up(block_j, quantum)
    n_pad = _round_up(max(n, block_j), block_j)
    assert n_pad == n, "uniform path requires aligned N (no padding)"

    positions = positions.astype(jnp.float32)
    src = positions.T  # (D, N) lane-major; no gm row needed

    soft = jnp.asarray(cfg.softening_sq, jnp.float32)
    if q.is_int:
        max_d2 = pallas_max_dist_sq(positions, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
        bounds = jnp.stack(
            [jnp.asarray(log_lo, jnp.float32),
             jnp.asarray(log_hi, jnp.float32),
             soft]).reshape(1, 3).astype(jnp.float32)
    else:
        bounds = jnp.stack(
            [jnp.float32(0), jnp.float32(0), soft]).reshape(1, 3)

    kernel = functools.partial(
        _force_kernel_sym_uniform, q=q,
        self_masked=cfg.softening_sq <= 0.0, dim=dim,
        block_i=block, block_j=block_j, n_pad=n_pad, seed_soft=seed_soft,
        unroll=unroll)

    grid = (n_pad // block,)
    rows, cols = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((dim, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * n_pad * n_pad * dim // 4,
            bytes_accessed=4 * n_pad * dim * 4,
            transcendentals=n_pad * n_pad // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=False,
    )(bounds, positions, src)

    acc = (rows + cols.T)[:n] * gm_scalar
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    return acc


def fence(x):
    np.asarray(x[:1])


def measure(label, step_fn, pos0):
    @functools.partial(jax.jit, static_argnames=())
    def scan(p):
        def body(p, _):
            return p + step_fn(p) * jnp.float32(1e-6), None
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    t0 = time.time()
    out = scan(pos0)
    fence(out)
    print(f"{label}: warmup {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    best = None
    for _ in range(3):
        t0 = time.time()
        out = scan(pos0)
        fence(out)
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    ms = best / STEPS * 1e3
    pairs = N * N * STEPS / best
    print(f"{label}: {ms:.2f} ms/step  {pairs:.3e} pairs/s", flush=True)
    return pairs


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    cfg = SimConfig()
    pos, _, m = create_disk_galaxy(jax.random.PRNGKey(42), num_stars=N)
    gm = jnp.float32(cfg.G)  # masses are all 1.0

    for mode, qf in [(Precision.FLOAT32, False), (Precision.INT4_SIM, True)]:
        q = Quantizer(mode)

        # correctness first: one eval, compare against production
        a_prod = pallas_accelerations_sym(pos, m, q, cfg, quantize_forces=qf)
        a_uni = pallas_accelerations_sym_uniform(pos, gm, q, cfg,
                                                 quantize_forces=qf)
        rel = float(jnp.max(jnp.abs(a_uni - a_prod))
                    / (jnp.max(jnp.abs(a_prod)) + 1e-30))
        print(f"[{mode.value}] uniform-vs-prod max rel delta: {rel:.2e}",
              flush=True)

        measure(f"{mode.value} prod",
                lambda p: pallas_accelerations_sym(p, m, q, cfg,
                                                   quantize_forces=qf), pos)
        measure(f"{mode.value} uniform",
                lambda p: pallas_accelerations_sym_uniform(
                    p, gm, q, cfg, quantize_forces=qf), pos)
        measure(f"{mode.value} uniform+seedsoft",
                lambda p: pallas_accelerations_sym_uniform(
                    p, gm, q, cfg, quantize_forces=qf, seed_soft=True), pos)
        for u in (2, 3, 4):
            measure(f"{mode.value} uniform {u}-wide",
                    lambda p, u=u: pallas_accelerations_sym_uniform(
                        p, gm, q, cfg, quantize_forces=qf, unroll=u), pos)


if __name__ == "__main__":
    main()
