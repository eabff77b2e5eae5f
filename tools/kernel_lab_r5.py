#!/usr/bin/env python
"""Kernel lab round 5: can the 4 idle MXUs buy anything? (VERDICT r4 #4)

PERF.md rejects the MXU dot-form d² (|xi|²+|xj|²−2·xi·xj) for
catastrophic cancellation of the NAIVE form. This lab measures the two
ways an MXU could still participate, so the rejection either falls or
gets upgraded to measured numbers:

A. **Compensated dot-form d² — accuracy** (jnp level, any backend).
   Dekker-split each coordinate x = xh + xl (xh = 12-bit head, so
   xh·xh' is exact in f32); d² = s_i + s_j − 2(hh + hl + lh) with the
   |x|² terms precomputed in f32x2 and the combination done by TwoSum
   chains. Measured against a float64 oracle on the adversarial
   geometry (tight cluster at box-scale offset from the origin) that
   kills the naive form. This answers "is the cancellation fixable"
   separately from "is it affordable".

B. **MXU slot-MAC arithmetic — cost** (the reason it is NOT affordable
   at D=2/3, written down as arithmetic the measurement below anchors):
   every MXU formulation of this kernel contracts or outputs over the
   coordinate dimension (K=D for dot-form d², N=D+1 for accumulation
   offload), so a (512,512) pair tile uses 2-3 lanes of the 128-wide
   MXU tile: ~2.3% utilization. With f32 operands needing the bf16x3
   3-pass scheme, one (512,512)→(512,3) accumulation matmul costs
   512·512·128·3 = 100M MAC-slots ≈ 1.0 µs at the 98.5e12 MAC/s spec —
   per tile, vs ~1.2 µs for the ENTIRE current 14-op VPU tile. Two such
   matmuls per tile (row + column accumulation) already exceed the VPU
   tile time before any overlap question arises; the three dot-form-d²
   cross matmuls (hh, hl, lh at K=2) cost the same ~1 µs slot budget
   again, and the compensated combination ADDS ~10 TwoSum VPU ops/pair
   against the 5 subtract-form ops it replaces.

C. **MXU accumulation offload — measured** (Pallas, TPU only). The
   strongest MXU formulation that does NOT touch d² semantics: keep the
   subtract-form d²/w on the VPU, replace the per-pair t=w·diff +
   row/col reductions (6 of 14 ops/pair) with two dot_generals per tile
   against [X | 1]-extended blocks:
       row (BI,D+1) = w · srcT_ext;   acc_d = row[:,d] − xi_d·row[:,D]
       col (D+1,BJ) = recv_extᵀ · w;  out_d += col[d] − xj_d·col[D]
   If Mosaic overlaps MXU and VPU perfectly this caps at 14/8 = 1.75×;
   the slot arithmetic above predicts it instead LOSES ~1.7× because
   the two matmuls alone take ~2 µs/tile. The measurement decides.

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_lab_r5.py
"""
from __future__ import annotations

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.config import SimConfig
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.pallas_nbody import _round_up, pallas_accelerations_sym
from nbody_tpu.ops.precision import Precision, Quantizer

N = 129024
STEPS = 10


# ---------------------------------------------------------------------------
# A. Compensated dot-form d²: accuracy study
# ---------------------------------------------------------------------------

def _dekker_split(x):
    """x = hi + lo with hi carrying the top 12 significand bits, so
    products of two hi parts are exact in f32 (24-bit significand)."""
    c = jnp.float32((1 << 12) + 1) * x
    hi = c - (c - x)
    return hi, x - hi


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def d2_subtract(p):
    diff = p[None, :, :] - p[:, None, :]
    return jnp.sum(diff * diff, axis=-1)


def _mm(a, b):
    """True-f32 matmul (6-pass on the MXU): the compensated scheme's
    split products are only exact if the matmul itself is f32 — at the
    TPU's default bf16-pass precision the 12-bit heads get re-rounded to
    8 bits and the compensation is void."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def d2_dot_naive(p):
    s = jnp.sum(p * p, axis=1)
    return s[:, None] + s[None, :] - 2.0 * _mm(p, p.T)


def d2_dot_compensated(p):
    """f32x2 dot-form: exact split products, TwoSum-combined. The three
    cross matmuls (hh, hl, lh) are the MXU-offloadable part; the
    combination chain is the per-pair VPU cost this form ADDS."""
    hi, lo = _dekker_split(p)
    hh = _mm(hi, hi.T)      # exact per-element products (12+12 bits)
    hl = _mm(hi, lo.T) + _mm(lo, hi.T)
    ll = _mm(lo, lo.T)
    # |x|² per particle in f32x2
    s_hi = jnp.sum(p.astype(jnp.float64) * p.astype(jnp.float64), axis=1) \
        if p.dtype == jnp.float64 else None
    sh, sl = _two_sum(jnp.sum(hi * hi, axis=1),
                      2.0 * jnp.sum(hi * lo, axis=1))
    sl = sl + jnp.sum(lo * lo, axis=1)
    # d² = (s_i + s_j) − 2(hh + hl + ll), combined hi/lo-first
    a, ae = _two_sum(sh[:, None], sh[None, :])
    b, be = _two_sum(a, -2.0 * hh)
    corr = ae + be + sl[:, None] + sl[None, :] - 2.0 * (hl + ll)
    del s_hi
    return b + corr


def accuracy_study():
    key = jax.random.PRNGKey(0)
    results = {}
    for name, scale, offset in [("production disk", 10.0, 0.0),
                                ("adversarial: tight cluster at 200", 0.5,
                                 200.0)]:
        p = (jax.random.normal(key, (2048, 2)) * scale + offset
             ).astype(jnp.float32)
        p64 = np.asarray(p, np.float64)
        diff = p64[None] - p64[:, None]
        oracle = (diff ** 2).sum(-1)
        np.fill_diagonal(oracle, np.inf)  # self-pairs: not meaningful
        errs = {}
        for label, fn in [("subtract-form", d2_subtract),
                          ("dot-form naive", d2_dot_naive),
                          ("dot-form compensated", d2_dot_compensated)]:
            got = np.asarray(fn(p), np.float64)
            np.fill_diagonal(got, np.inf)
            finite = np.isfinite(oracle)
            abs_err = np.max(np.abs(got[finite] - oracle[finite]))
            errs[label] = abs_err
            print(f"A [{name}] {label}: max abs err {abs_err:.3e} "
                  f"(softening floor 1e-2; int4 bin edges move at "
                  f"~1e-7·d²)", flush=True)
        results[name] = errs
    return results


# ---------------------------------------------------------------------------
# C. MXU accumulation offload: Pallas variant
# ---------------------------------------------------------------------------

def _force_kernel_mxu(bounds_ref, pos_i_ref, src_ref, out_row_ref,
                      out_col_ref, *, dim: int, block_i: int,
                      block_j: int, n_pad: int, dot_precision):
    """f32 uniform-G*m sym kernel, accumulation on the MXU.

    pos_i_ref is (BI, D+1) with a ones column, src_ref (D+1, N_pad) with
    a ones row. Per tile: w on the VPU (subtract-form d², unchanged),
    then row = dot(w, src_tile) (BI, D+1) and col = dot(recv_ext, w)
    (D+1, BJ) on the MXU; the force identities
      Σ_j w(xj−xi) = row[:, :D] − xi·row[:, D]
      Σ_i w(xj−xi) = xj·col[D] − col[:D]
    recover forces with O(B·D) epilogue ops."""
    pid = pl.program_id(0)
    i0 = pid * block_i
    num_j = n_pad // block_j
    sj = i0 // block_j

    @pl.when(pid == 0)
    def _init_cols():
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]
    softening_sq = bounds_ref[0, 2]
    recv_ext = pos_i_ref[...]  # (BI, D+1)

    def tile_w(j0):
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        d2 = d2 + softening_sq
        inv_d = jax.lax.rsqrt(d2)
        return inv_d * inv_d * inv_d  # (BI, BJ)

    def row_dot(w, j0):
        src_tile = src_ref[:, pl.ds(j0, block_j)]  # (D+1, BJ)
        return jax.lax.dot_general(
            w, src_tile, (((1,), (1,)), ((), ())),
            precision=dot_precision,
            preferred_element_type=jnp.float32)  # (BI, D+1)

    def col_dot(w):
        return jax.lax.dot_general(
            recv_ext, w, (((0,), (0,)), ((), ())),
            precision=dot_precision,
            preferred_element_type=jnp.float32)  # (D+1, BJ)

    # Own super-chunk: rows only.
    w = tile_w(sj * block_j)
    rd = row_dot(w, sj * block_j)
    acc = tuple(rd[:, d:d + 1] - xi[d] * rd[:, dim:dim + 1]
                for d in range(dim))

    def one_tile(j0, acc):
        w = tile_w(j0)
        rd = row_dot(w, j0)
        cd = col_dot(w)
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        for d in range(dim):
            out_col_ref[d:d + 1, pl.ds(j0, block_j)] += (
                cd[d:d + 1, :] - xj[d] * cd[dim:dim + 1, :])
        return tuple(acc[d] + rd[:, d:d + 1] - xi[d] * rd[:, dim:dim + 1]
                     for d in range(dim))

    def j_body(k, acc):
        return one_tile((sj + 1 + k) * block_j, acc)

    acc = jax.lax.fori_loop(0, num_j - (sj + 1), j_body, acc)
    for d in range(dim):
        out_row_ref[:, d:d + 1] = acc[d]


def accelerations_mxu(positions, gm_scalar, cfg: SimConfig,
                      block: int = 512, block_j: int | None = None,
                      dot_precision=jax.lax.Precision.HIGHEST):
    n, dim = positions.shape
    quantum = math.lcm(block, 128)
    if block_j is None:
        block_j = min(_round_up(1024, quantum),
                      _round_up(max(n, block), quantum))
    n_pad = _round_up(max(n, block_j), block_j)
    assert n_pad == n, "lab requires aligned N"

    positions = positions.astype(jnp.float32)
    ones = jnp.ones((n, 1), jnp.float32)
    recv_ext = jnp.concatenate([positions, ones], axis=1)   # (N, D+1)
    src_ext = recv_ext.T                                    # (D+1, N)
    soft = jnp.asarray(cfg.softening_sq, jnp.float32)
    bounds = jnp.stack([jnp.float32(0), jnp.float32(0), soft]
                       ).reshape(1, 3)

    kernel = functools.partial(_force_kernel_mxu, dim=dim, block_i=block,
                               block_j=block_j, n_pad=n_pad,
                               dot_precision=dot_precision)
    grid = (n_pad // block,)
    rows, cols = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dim + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 1, n_pad), lambda i: (0, 0),
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
            flops=20 * n_pad * n_pad * dim // 4,
            bytes_accessed=4 * n_pad * dim * 4,
            transcendentals=n_pad * n_pad // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=False,
    )(bounds, recv_ext, src_ext)

    return (rows + cols.T)[:n] * gm_scalar


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
        tag = ""
        if ref is not None:
            a = step_fn(pos0)
            rel = float(jnp.max(jnp.abs(a - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-30))
            tag = f" (max rel delta vs prod {rel:.2e})"
        t0 = time.time()
        fence(scan(pos0))
        print(f"{label}: warmup {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    best = None
    for _ in range(3):
        t0 = time.time()
        fence(scan(pos0))
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
    ms = best / STEPS * 1e3
    pairs = N * N * STEPS / best
    print(f"{label}: {ms:.2f} ms/step  {pairs:.3e} pairs/s{tag}",
          flush=True)
    return pairs


def main():
    print(f"backend={jax.default_backend()} N={N}", file=sys.stderr,
          flush=True)
    accuracy_study()
    if jax.default_backend() != "tpu":
        print("(throughput variants need the chip; accuracy study only)",
              flush=True)
        return
    cfg = SimConfig()
    pos, _, m = create_disk_galaxy(jax.random.PRNGKey(42), num_stars=N)
    gm = jnp.float32(cfg.G)
    q = Quantizer(Precision.FLOAT32)

    ref = pallas_accelerations_sym(pos, m, q, cfg, quantize_forces=False)
    measure("f32 prod(sym auto)",
            lambda p: pallas_accelerations_sym(p, m, q, cfg,
                                               quantize_forces=False), pos)
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                 jax.lax.Precision.DEFAULT):
        measure(f"C: mxu-accum (512,1024) dot={prec.name}",
                lambda p, pr=prec: accelerations_mxu(p, gm, cfg,
                                                     dot_precision=pr),
                pos, ref)


if __name__ == "__main__":
    main()
