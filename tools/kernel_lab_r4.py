#!/usr/bin/env python
"""Kernel lab round 4: the bounded attempt at the ~49% VPU headroom.

VERDICT r3 item 8 prescribes three measured experiments before the f32
kernel may be declared Mosaic-bound; a fourth (wide accumulator) is this
round's own idea. All variants are uniform-G*m t-form (the production
fast path) so gains compose with the round-3 interleave:

  A. exp2/log2 int chain — the int-sim pair weight currently runs
     jnp.log + jnp.exp; TPU transcendental hardware is base-2, so ln/exp
     lower to log2/exp2 plus a multiply each. Folding ln2 into the
     already-precomputed norm/arg constants removes 2 ops from the
     ~16-op int chain at zero semantic cost (same rounding boundaries
     up to 1 ulp of the fold).
  B. 384-sublane receiver blocks — the round-3 3-wide interleave was
     rejected for scoped-VMEM overflow at (512, 1024); temporaries scale
     with BI so (384, 1152) should fit a 3-wide (explicit accounting:
     ~6 MB/tile-in-flight at BI=512 -> ~4.5 MB at 384; 3x4.5 + src/col
     residents ~2 MB < 16 MB).
  C. restructured duo-accumulator join — the 2-wide interleave threads
     ONE (BI,1) accumulator through both tiles of a duo; giving each
     tile its own accumulator (joined once after the loop) removes the
     only remaining cross-tile dependency.
  D. wide (BI, BJ) row accumulator — replace the per-tile cross-lane
     row reduction jnp.sum(t, axis=1) with acc_wide += t (pure
     elementwise, position-independent since the final row sum
     commutes across tiles) and ONE cross-lane reduction at the end of
     the block. Cross-lane trees cost lane shuffles every tile; this
     moves all of them to a single epilogue.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_r4.py

N = 129024 (divisible by 512/1024/384/768/1152 so every block shape
runs unpadded through the uniform path; rates are pairs/s, comparable
across variants at the same N).
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

N = 129024
STEPS = 10
LN2 = math.log(2.0)
LOG2E = 1.0 / LN2


def _force_kernel_r4(bounds_ref, pos_i_ref, src_ref, out_row_ref,
                     out_col_ref, *, q: Quantizer, self_masked: bool,
                     dim: int, block_i: int, block_j: int, n_pad: int,
                     unroll: int, join: str, base2: bool):
    """Uniform-G*m sym kernel with the round-4 experiment knobs.

    join: 'serial' (production: one acc through the duo), 'dual'
    (variant C: per-tile accs, joined after the loop), 'wide'
    (variant D: (BI, BJ) elementwise accumulator, one cross-lane
    reduction in the epilogue).
    base2: variant A — int chain on log2/exp2 with ln2 folded into the
    constants.
    """
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
        if base2:
            # log_d2 = log2_d2 * ln2; exp(a) = exp2(a * log2e): fold both
            # constants so the chain is round(log2(x)*a2 + b) then
            # exp2(min(k*k2 + 02, cap2)) — two multiplies gone.
            norm_a2 = norm_a * LN2
            arg_k2 = arg_k * LOG2E
            arg_02 = arg_0 * LOG2E
            arg_cap2 = arg_cap * LOG2E

    def pair_w(d2):
        if q.is_int:
            if base2:
                log2_d2 = jnp.log2(jnp.maximum(d2, q.min_dist_sq))
                k = jnp.round(log2_d2 * norm_a2 + norm_b)
                return jnp.exp2(jnp.minimum(k * arg_k2 + arg_02, arg_cap2))
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

    total = num_j - (sj + 1)

    if join == "wide":
        # Variant D: (BI, BJ) accumulator per dim; every tile's t lands
        # as an elementwise add (the final row sum commutes across
        # tiles), cross-lane reduction ONCE in the epilogue.
        acc0 = tuple(w * diffs[d] for d in range(dim))

        def one_tile_wide(j0, acc):
            diffs, w = tile(j0)
            new = []
            for d in range(dim):
                t = w * diffs[d]
                out_col_ref[d:d + 1, pl.ds(j0, block_j)] += \
                    -jnp.sum(t, axis=0, keepdims=True)
                new.append(acc[d] + t)
            return tuple(new)

        if unroll <= 1:
            acc = jax.lax.fori_loop(
                sj + 1, num_j, lambda jc, a: one_tile_wide(jc * block_j, a),
                acc0)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = jnp.sum(acc[d], axis=1,
                                                  keepdims=True)
            return

        def j_duo(k, acc):
            j0 = (sj + 1 + 2 * k) * block_j
            acc = one_tile_wide(j0, acc)
            return one_tile_wide(j0 + block_j, acc)

        acc = jax.lax.fori_loop(0, total // 2, j_duo, acc0)

        @pl.when(total % 2 == 1)
        def _odd():
            a2 = one_tile_wide((num_j - 1) * block_j, acc)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = jnp.sum(a2[d], axis=1,
                                                  keepdims=True)

        @pl.when(total % 2 == 0)
        def _even():
            for d in range(dim):
                out_row_ref[:, d:d + 1] = jnp.sum(acc[d], axis=1,
                                                  keepdims=True)
        return

    acc0 = tuple(jnp.sum(w * diffs[d], axis=1, keepdims=True)
                 for d in range(dim))

    def one_tile(j0, acc):
        diffs, w = tile(j0)
        new = []
        for d in range(dim):
            t = w * diffs[d]
            out_col_ref[d:d + 1, pl.ds(j0, block_j)] += \
                -jnp.sum(t, axis=0, keepdims=True)
            new.append(acc[d] + jnp.sum(t, axis=1, keepdims=True))
        return tuple(new)

    if unroll <= 1:
        acc = jax.lax.fori_loop(
            sj + 1, num_j, lambda jc, a: one_tile(jc * block_j, a), acc0)
        for d in range(dim):
            out_row_ref[:, d:d + 1] = acc[d]
        return

    if join == "dual":
        # Variant C: each tile of the duo owns an accumulator; the only
        # cross-tile edge left is the col-buffer RMW (disjoint slices).
        zeros = tuple(jnp.zeros_like(acc0[d]) for d in range(dim))

        def j_duo_dual(k, accs):
            acc_a, acc_b = accs
            j0 = (sj + 1 + 2 * k) * block_j
            return (one_tile(j0, acc_a), one_tile(j0 + block_j, acc_b))

        acc_a, acc_b = jax.lax.fori_loop(0, total // 2, j_duo_dual,
                                         (acc0, zeros))

        @pl.when(total % 2 == 1)
        def _odd_d():
            a2 = one_tile((num_j - 1) * block_j, acc_a)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = a2[d] + acc_b[d]

        @pl.when(total % 2 == 0)
        def _even_d():
            for d in range(dim):
                out_row_ref[:, d:d + 1] = acc_a[d] + acc_b[d]
        return

    # production 'serial' join (round-3 2/3-wide interleave)
    if unroll == 2:
        def j_duo2(k, acc):
            j0 = (sj + 1 + 2 * k) * block_j
            acc = one_tile(j0, acc)
            return one_tile(j0 + block_j, acc)

        acc = jax.lax.fori_loop(0, total // 2, j_duo2, acc0)

        @pl.when(total % 2 == 1)
        def _odd_s():
            a2 = one_tile((num_j - 1) * block_j, acc)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = a2[d]

        @pl.when(total % 2 == 0)
        def _even_s():
            for d in range(dim):
                out_row_ref[:, d:d + 1] = acc[d]
        return

    assert unroll == 3
    trips = total // 3

    def j_trio(k, acc):
        j0 = (sj + 1 + 3 * k) * block_j
        acc = one_tile(j0, acc)
        acc = one_tile(j0 + block_j, acc)
        return one_tile(j0 + 2 * block_j, acc)

    acc = jax.lax.fori_loop(0, trips, j_trio, acc0)
    for r in range(1, 3):
        @pl.when(total % 3 == r)
        def _tail(r=r):
            a2 = acc
            for t_i in range(r):
                a2 = one_tile((num_j - r + t_i) * block_j, a2)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = a2[d]

    @pl.when(total % 3 == 0)
    def _even3():
        for d in range(dim):
            out_row_ref[:, d:d + 1] = acc[d]


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block", "block_j", "unroll",
                                             "join", "base2"))
def accelerations_r4(positions, gm_scalar, q: Quantizer, cfg: SimConfig,
                     quantize_forces: bool = True, block: int = 512,
                     block_j: int | None = None, unroll: int = 2,
                     join: str = "serial", base2: bool = False):
    n, dim = positions.shape
    quantum = math.lcm(block, 128)
    if block_j is None:
        block_j = min(_round_up(1024, quantum),
                      _round_up(max(n, block), quantum))
    else:
        block_j = _round_up(block_j, quantum)
    n_pad = _round_up(max(n, block_j), block_j)
    assert n_pad == n, "lab requires aligned N (no padding)"

    positions = positions.astype(jnp.float32)
    src = positions.T

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
        _force_kernel_r4, q=q, self_masked=cfg.softening_sq <= 0.0,
        dim=dim, block_i=block, block_j=block_j, n_pad=n_pad,
        unroll=unroll, join=join, base2=base2)

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


def measure(label, step_fn, pos0, ref=None):
    @jax.jit
    def scan(p):
        def body(p, _):
            return p + step_fn(p) * jnp.float32(1e-6), None
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    try:
        if ref is not None:
            a = step_fn(pos0)
            rel = float(jnp.max(jnp.abs(a - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-30))
            tag = f" (max rel delta vs prod {rel:.2e})"
        else:
            tag = ""
        t0 = time.time()
        out = scan(pos0)
        fence(out)
        print(f"{label}: warmup {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    best = None
    for _ in range(3):
        t0 = time.time()
        out = scan(pos0)
        fence(out)
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    ms = best / STEPS * 1e3
    pairs = N * N * STEPS / best
    print(f"{label}: {ms:.2f} ms/step  {pairs:.3e} pairs/s{tag}", flush=True)
    return pairs


def main():
    print(f"backend={jax.default_backend()} N={N}", file=sys.stderr,
          flush=True)
    cfg = SimConfig()
    pos, _, m = create_disk_galaxy(jax.random.PRNGKey(42), num_stars=N)
    gm = jnp.float32(cfg.G)

    for mode, qf in [(Precision.FLOAT32, False), (Precision.INT4_SIM, True)]:
        q = Quantizer(mode)
        ref = pallas_accelerations_sym(pos, m, q, cfg, quantize_forces=qf)
        measure(f"{mode.value} prod(sym auto)",
                lambda p: pallas_accelerations_sym(p, m, q, cfg,
                                                   quantize_forces=qf), pos)
        base = functools.partial(accelerations_r4, gm_scalar=gm, q=q,
                                 cfg=cfg, quantize_forces=qf)
        measure(f"{mode.value} lab serial 2w (512,1024) [baseline]",
                lambda p: base(p), pos, ref)
        if q.is_int:
            # Variant A: base-2 chain
            measure(f"{mode.value} A: base2 chain 2w (512,1024)",
                    lambda p: base(p, base2=True), pos, ref)
        # Variant C: dual accumulators
        measure(f"{mode.value} C: dual-acc 2w (512,1024)",
                lambda p: base(p, join="dual"), pos, ref)
        # Variant D: wide accumulator, 1- and 2-wide
        measure(f"{mode.value} D: wide-acc 1w (512,1024)",
                lambda p: base(p, unroll=1, join="wide"), pos, ref)
        measure(f"{mode.value} D: wide-acc 2w (512,1024)",
                lambda p: base(p, join="wide"), pos, ref)
        # Variant B: 384-sublane blocks, 2- and 3-wide (+ combos)
        for bj in (768, 1152):
            measure(f"{mode.value} B: serial 2w (384,{bj})",
                    lambda p, bj=bj: base(p, block=384, block_j=bj), pos,
                    ref)
            measure(f"{mode.value} B: serial 3w (384,{bj})",
                    lambda p, bj=bj: base(p, block=384, block_j=bj,
                                          unroll=3), pos, ref)
        measure(f"{mode.value} B+D: wide-acc 2w (384,1152)",
                lambda p: base(p, block=384, block_j=1152, join="wide"),
                pos, ref)
        if q.is_int:
            measure(f"{mode.value} A+D: base2 wide-acc 2w (512,1024)",
                    lambda p: base(p, join="wide", base2=True), pos, ref)


if __name__ == "__main__":
    main()
