"""Tiled Pallas TPU kernel for softened all-pairs gravity.

The production force path: replaces the reference's (N, N, 2) broadcast
tensor (reference: simulation.py:83-112, memory-infeasible beyond ~10k
particles) with a VMEM-tiled O(N^2)-compute / O(N)-memory kernel.

Layout strategy (chosen for the VPU's (sublane, lane) tiling and VMEM
padding rules — an (N, 2) array staged whole into VMEM pads its lane axis
2 -> 128, a 64x blowup, so source data must be lane-major):

* receivers (i) live on the *sublane* axis: each grid step stages one
  (BI, D) receiver block into VMEM, giving (BI, 1) coordinate columns
  directly — no in-kernel transposes;
* sources (j) live on the *lane* axis: one (D+1, N_pad) array holds the
  coordinate rows plus a G*m_j row, resident in VMEM for the entire grid
  (~4 MB at N = 131k), streamed in (1, BJ) slices by a fori_loop;
* padded tail sources carry zero mass AND sit at a far sentinel position
  (_PAD_FAR), which zeroes their force contribution exactly in every
  precision mode — no explicit mask, and no 0 * inf = NaN even for a real
  particle at the origin under zero softening;
* the per-dim accumulator is a (BI, 1) column updated by a lane-axis
  reduction of the (BI, BJ) tile;
* the precision hook (quantize_distance_squared) runs in-tile; the
  int-sim log-grid uses global bounds precomputed outside (analytic min +
  a max pass), preserving the reference's tensor-global normalisation
  (reference: quantization.py:112-121).

Per pair: ~16 VPU flops + 1 rsqrt; f32 accumulators.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.config import SimConfig
from nbody_tpu.ops.precision import (
    Precision,
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Padding positions sit at a far sentinel, not the origin: a REAL particle
# at exactly the origin under ZERO softening would otherwise hit d2 == 0
# against a zero-filled pad — rsqrt(0) = inf with gm_pad = 0 gives
# 0 * inf = NaN in a real output row (the id self-mask covers equal ids
# only). At the sentinel, w = rsqrt(d2)^3 underflows to exactly 0 in every
# precision mode (f16 overflows d2 to inf -> rsqrt = 0; the int log-grid
# arg saturates -> exp -> 0), so padded pairs contribute exactly zero with
# no per-pair mask. 2e18 keeps diff^2 ~ 4e36 finite in f32 for any
# plausible real coordinate (crash experiments push positions to ~1e6).
_PAD_FAR = 2.0e18

# Grid-resident VMEM budget for the sym kernels' source (+ reaction)
# arrays — the single authority for "does this source set fit resident,
# or must it chunk": used by pallas_accelerations_sym_chunked's chunk
# sizing here AND (via import) by parallel/ring's tile routing, so the
# two can never drift apart.
SYM_RESIDENT_VMEM_BUDGET = 10_500_000


def _pad_positions(positions, n_pad: int):
    n, dim = positions.shape
    return jnp.full((n_pad, dim), _PAD_FAR,
                    jnp.float32).at[:n].set(positions)


def check_uniform_gm(values, what: str = "masses") -> None:
    """Host-side guard for the ``uniform_gm=True`` equal-mass fast path.

    The fast-path kernels scale every pair by the FIRST entry's G*m —
    passing unequal masses would be silently wrong physics, not an error
    (this module's own round-3 docstrings said as much). Whenever the
    values are host-visible (concrete, i.e. outside any enclosing jit
    trace) they are cheap to inspect, so reject the mismatch loudly.
    Traced values (an outer jit/scan body) cannot be inspected: there the
    assertion remains the caller's, exactly as before — in practice that
    caller is DirectSimulation/ring's auto-detection, which already
    checked the concrete masses once at init.
    """
    if values is None or isinstance(values, jax.core.Tracer):
        return
    import numpy as np
    m = np.asarray(values)
    if m.size and not (m == m.flat[0]).all():
        raise ValueError(
            f"uniform_gm=True asserts ALL {what} are equal, but the "
            f"concrete {what} differ (min {m.min()!r}, max {m.max()!r}): "
            f"the fast path would silently scale every pair by "
            f"{what}[0]. Pass uniform_gm=False (the general kernel), or "
            f"let DirectSimulation auto-detect equal masses.")


def _guard_uniform_gm(*groups):
    """Decorator (applied OUTSIDE jax.jit) validating the uniform_gm
    fast-path assertion against concrete inputs before dispatch.

    Each group is ``(label, lookups)``: lookups are tried in order (a str
    looks up a keyword, an int a positional arg) and the FIRST non-None
    value is checked — e.g. an explicit ``gm=`` overrides ``masses``.
    Only fires when ``uniform_gm=True`` is passed by keyword (every call
    site in this repo does; a positional pass keeps the old
    caller-asserted semantics). Each group is checked independently: the
    pair tiles scale rows/columns by their own set's leading G*m, so
    per-set uniformity is the actual kernel contract."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if kwargs.get("uniform_gm"):
                for label, lookups in groups:
                    val = None
                    for lk in lookups:
                        v = (kwargs.get(lk) if isinstance(lk, str)
                             else (args[lk] if lk < len(args) else None))
                        if v is not None:
                            val = v
                            break
                    check_uniform_gm(val, what=label)
            return fn(*args, **kwargs)
        return wrapper
    return deco


def _pick_block_j(n_j: int, cap: int = 2048, max_waste: float = 0.125) -> int:
    """Largest power-of-two lane-slice width <= cap whose padding of an
    n_j-row source stays under max_waste. Padded source lanes are
    computed at full cost, so a fixed 2048 slice on e.g. a 2500-row ring
    shard would pad to 4096 (64% wasted pair work); this ladder picks
    512 there (2.4%) while keeping the fast 2048 slices whenever the
    source size cooperates."""
    for bj in (2048, 1024, 512, 256, 128):
        if bj > cap:
            continue
        pad = _round_up(max(n_j, bj), bj)
        if pad - n_j <= max_waste * n_j:
            return bj
    return min(cap, _round_up(max(n_j, 128), 128))


def _force_kernel(bounds_ref, pos_i_ref, src_ref, out_ref,
                  *, q: Quantizer, self_masked: bool, dim: int,
                  block_i: int, block_j: int, n_pad: int):
    """One grid step: accelerations for receiver block i over all sources.

    bounds_ref: (1, 3) SMEM — [log_lo, log_hi, softening_sq]; softening
        lives in SMEM so a traced sweep value reuses one compiled kernel
    pos_i_ref:  (BI, D) VMEM — this receiver block (sublane-major)
    src_ref:    (D+1, N_pad) VMEM — rows 0..D-1: coordinates; row D: G*m_j
    out_ref:    (BI, D) VMEM — acceleration of this receiver block
    """
    i0 = pl.program_id(0) * block_i
    num_j = n_pad // block_j

    # Receiver coordinates: (BI, 1) sublane columns, one per dimension.
    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]
    # Global receiver indices on the sublane axis.
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (block_i, 1), 0) + i0

    log_lo = bounds_ref[0, 0]
    log_hi = bounds_ref[0, 1]
    softening_sq = bounds_ref[0, 2]

    if q.is_int:
        # Fold the whole log-grid snap + inverse-cube into two per-pair
        # FMAs around the round (hoisted scalar algebra; see j_chunk):
        #   k          = round(log_d2 * norm_a + norm_b)
        #   arg        = min(k * arg_k + arg_0, arg_cap)
        #   factor     = gm_j * exp(arg)
        # A degenerate span (all distances equal to within 1e-10 in log
        # space) is handled by the span clamp alone: the snap error it
        # introduces is < 1e-10 in log(d^2), i.e. ~1.5e-10 relative in
        # the force — the reference's explicit passthrough branch
        # (quantization.py:112-121) is indistinguishable at f32.
        lvl = float(q.levels - 1)
        safe_span = jnp.maximum(log_hi - log_lo, 1e-10)
        norm_a = lvl / safe_span
        norm_b = -log_lo * norm_a
        arg_k = -1.5 * safe_span / lvl
        arg_0 = -1.5 * log_lo
        # log_q = max(log_snapped, log_min); x -1.5 flips it to a min.
        arg_cap = -1.5 * math.log(q.min_dist_sq)

    def j_chunk(jc, acc):
        j0 = jc * block_j
        # Source coordinates: (1, BJ) lane rows.
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        gm_j = src_ref[dim:dim + 1, pl.ds(j0, block_j)]  # (1, BJ)

        # (BI, BJ) pairwise tile.
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        d2 = d2 + softening_sq

        if q.is_int:
            # Log-space fast path: the quantizer already works in
            # log(d^2), and d^-3 = exp(-1.5 * log(d^2)) — snapping and
            # the inverse-cube both come out of the same log, skipping
            # the exp->rsqrt->cube round trip. All grid algebra is
            # pre-folded into the hoisted scalars above, leaving
            # max/log/fma/round/fma/min/exp/mul per pair (same math as
            # grid_quantize_safe o rsqrt^3; bit-level deltas only from
            # constant folding and the final exp rounding).
            log_d2 = jnp.log(jnp.maximum(d2, q.min_dist_sq))
            k = jnp.round(log_d2 * norm_a + norm_b)
            arg = jnp.minimum(k * arg_k + arg_0, arg_cap)
            factor = gm_j * jnp.exp(arg)
        else:
            d2q = quantize_distance_squared(d2, q)
            inv_d = jax.lax.rsqrt(d2q)
            factor = gm_j * (inv_d * inv_d * inv_d)  # (BI, BJ) broadcast

        # Self-interaction: when softening > 0 the diagonal term is
        # factor * diff with diff == 0 — exactly zero with no mask needed
        # (the reference's (1 - eye) mask, simulation.py:108, guards the
        # unsoftened inf * 0 = NaN case only). Masked when the static
        # softening is zero OR when softening is a traced sweep value.
        if self_masked:
            j_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, block_j), 1)
                     + j0)
            factor = jnp.where(j_ids == i_ids, 0.0, factor)

        # Lane-reduce over sources into (BI, 1) column accumulators.
        return tuple(
            acc[d] + jnp.sum(factor * diffs[d], axis=1, keepdims=True)
            for d in range(dim)
        )

    acc0 = tuple(jnp.zeros((block_i, 1), jnp.float32) for _ in range(dim))
    # 2-wide interleave (see _force_kernel_sym): two independent tiles
    # per iteration for cross-tile ILP; static trip count so the odd
    # tail is a plain Python branch. f16's cast temporaries x2 tiles
    # overflow the scoped VMEM stack — single-tile loop there.
    if q.mode.value == "float16":
        acc = jax.lax.fori_loop(0, num_j, j_chunk, acc0)
    else:
        def j_duo(k, acc):
            return j_chunk(2 * k + 1, j_chunk(2 * k, acc))

        acc = jax.lax.fori_loop(0, num_j // 2, j_duo, acc0)
        if num_j % 2:
            acc = j_chunk(num_j - 1, acc)
    for d in range(dim):
        out_ref[:, d:d + 1] = acc[d]


def _force_kernel_sym(bounds_ref, pos_i_ref, src_ref, out_row_ref,
                      out_col_ref, out_max_ref=None, *, q: Quantizer,
                      self_masked: bool, dim: int, block_i: int,
                      block_j: int, n_pad: int, uniform_gm: bool = False,
                      emit_max: bool = False):
    """Newton's-third-law force kernel: each cross-super-chunk unordered
    pair computed once.

    Receiver blocks are BI sublanes; sources stream in BJ-lane slices
    ("super-chunks", BJ a multiple of BI — 2048 lanes measured +24% over
    512 on chip). Receiver block I sweeps source super-chunks strictly
    after its own: the expensive pair work (d^2, quantize chain,
    inverse-cube) runs once per cross-chunk pair; the direct contribution
    accumulates into this block's rows while the reaction
    (-gm_i * w * diff) accumulates into a lane-major (D, N_pad) column
    buffer resident in VMEM across the whole grid (sequential 'arbitrary'
    grid semantics make the cross-step read-modify-write safe). The
    receiver's own super-chunk is computed as a full (BI, BJ) tile with
    row sums only — both directions of intra-super-chunk pairs are direct
    row work, duplicating ≤ BJ/N of the pair evaluations (1.6% at
    N=131k). Final acceleration = rows + cols^T.

    pos_i_ref: (BI, D+1) — receiver coords + a G*m_i column (sublane-major)
    src_ref:   (D+1, N_pad) — coords + G*m_j row (lane-major)
    out_row_ref: (BI, D) this block's direct sums
    out_col_ref: (D, N_pad) reaction sums, shared across grid steps

    ``uniform_gm=True`` (all G*m equal, N unpadded — asserted by the
    wrapper): the per-pair direct (gm_j*w) and reaction (gm_i*w) products
    collapse into one shared t_d = w*diff_d; gm scales ONCE in the
    wrapper's epilogue. 14 vector ops/pair instead of 18 — measured +24%
    f32 / +12% int4 at N=131k (docs/PERF.md). Inputs then carry no gm
    row/column: pos_i_ref is (BI, D), src_ref (D, N_pad).

    ``emit_max=True`` (int modes only) additionally reduces the RAW
    (pre-softening) pairwise d^2 max of every visited tile into
    out_max_ref[pid] — the tensor-global max the int-sim log grid needs,
    as a ~1 op/pair byproduct instead of the separate O(N^2/2) max pass
    (pallas_max_dist_sq: 15.1 ms at N=131k). The visited tiles cover
    every unordered pair (own super-chunk fully + strict upper chunks),
    so max(out_max_ref) is the global pairwise max; the wrapper pads with
    duplicates of particle 0 (the max pass's convention) so padded pairs
    are genuine pairs that can never inflate it — safe for int modes
    because pair_w clamps d^2 at min_dist_sq (no rsqrt(0)).
    """
    pid = pl.program_id(0)
    i0 = pid * block_i
    num_j = n_pad // block_j
    sj = i0 // block_j  # this receiver block's own super-chunk

    @pl.when(pid == 0)
    def _init_cols():
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]
    gm_i = None if uniform_gm else pos_i_ref[:, dim:dim + 1]  # (BI, 1)

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
        """Per-pair scalar weight w = quantized |r|^-3 (no mass folded)."""
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
        gm_j = (None if uniform_gm
                else src_ref[dim:dim + 1, pl.ds(j0, block_j)])  # (1, BJ)
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        return gm_j, diffs, pair_w(d2 + softening_sq), d2

    # Own super-chunk: full compute, row sums only (both pair directions
    # of intra-super-chunk pairs live in receiver-row tiles).
    gm_j, diffs, w, d2own = tile(sj * block_j)
    factor = w if uniform_gm else gm_j * w
    if self_masked:
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (block_i, 1), 0) + i0
        c_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, block_j), 1)
                 + sj * block_j)
        factor = jnp.where(r_ids == c_ids, 0.0, factor)
    acc0 = tuple(jnp.sum(factor * diffs[d], axis=1, keepdims=True)
                 for d in range(dim))
    bm0 = jnp.max(d2own) if emit_max else None

    def one_tile(j0, acc, bm=None):
        gm_j, diffs, w, d2 = tile(j0)
        if emit_max:
            bm = jnp.maximum(bm, jnp.max(d2))
        if uniform_gm:
            # Shared t_d: the direct row sum and the reaction column sum
            # reduce the SAME product (gm scales in the epilogue).
            new = []
            for d in range(dim):
                t = w * diffs[d]
                col = -jnp.sum(t, axis=0, keepdims=True)  # (1, BJ)
                out_col_ref[d:d + 1, pl.ds(j0, block_j)] += col
                new.append(acc[d] + jnp.sum(t, axis=1, keepdims=True))
            return (tuple(new), bm) if emit_max else tuple(new)
        fr = gm_j * w                       # direct: on this block's rows
        fc = gm_i * w                       # reaction: on chunk J's cols
        for d in range(dim):
            col = -jnp.sum(fc * diffs[d], axis=0, keepdims=True)  # (1, BJ)
            out_col_ref[d:d + 1, pl.ds(j0, block_j)] += col
        new = tuple(
            acc[d] + jnp.sum(fr * diffs[d], axis=1, keepdims=True)
            for d in range(dim)
        )
        return (new, bm) if emit_max else new

    # 2-wide interleave: two independent tiles per loop iteration give
    # the VPU scheduler cross-tile ILP (+3.9% f32 / +3.4% int4 at 131k,
    # tools/kernel_lab.py). The trip count is dynamic (starts after this
    # block's own super-chunk), so lax's unroll= is unavailable — manual
    # duo with a predicated odd-tail tile instead; the row write happens
    # inside both pl.when branches (pl.when bodies cannot return values).
    # FLOAT16 keeps the single-tile loop: its cast round-trip's extra
    # temporaries x2 concurrent tiles overflow the scoped VMEM stack
    # (compile-probed per mode; every other mode fits).
    if q.mode.value == "float16":
        acc = jax.lax.fori_loop(
            sj + 1, num_j, lambda jc, a: one_tile(jc * block_j, a), acc0)
        for d in range(dim):
            out_row_ref[:, d:d + 1] = acc[d]
        return

    total = num_j - (sj + 1)

    if emit_max:
        def j_duo(k, carry):
            acc, bm = carry
            j0 = (sj + 1 + 2 * k) * block_j
            acc, bm = one_tile(j0, acc, bm)
            return one_tile(j0 + block_j, acc, bm)

        acc, bm = jax.lax.fori_loop(0, total // 2, j_duo, (acc0, bm0))

        @pl.when(total % 2 == 1)
        def _odd_tail_max():
            a2, b2 = one_tile((num_j - 1) * block_j, acc, bm)
            for d in range(dim):
                out_row_ref[:, d:d + 1] = a2[d]
            out_max_ref[pid, 0] = b2

        @pl.when(total % 2 == 0)
        def _even_max():
            for d in range(dim):
                out_row_ref[:, d:d + 1] = acc[d]
            out_max_ref[pid, 0] = bm
        return

    def j_duo(k, acc):
        j0 = (sj + 1 + 2 * k) * block_j
        acc = one_tile(j0, acc)
        return one_tile(j0 + block_j, acc)

    acc = jax.lax.fori_loop(0, total // 2, j_duo, acc0)

    @pl.when(total % 2 == 1)
    def _odd_tail():
        a2 = one_tile((num_j - 1) * block_j, acc)
        for d in range(dim):
            out_row_ref[:, d:d + 1] = a2[d]

    @pl.when(total % 2 == 0)
    def _even():
        for d in range(dim):
            out_row_ref[:, d:d + 1] = acc[d]


@_guard_uniform_gm(("masses", ("gm", "masses", 1)))
@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block", "block_j",
                                             "interpret", "uniform_gm",
                                             "emit_max"))
def pallas_accelerations_sym(positions, masses, q: Quantizer,
                             cfg: SimConfig, quantize_forces: bool = True,
                             block: int | None = None,
                             block_j: int | None = None,
                             interpret: bool | None = None,
                             softening_sq=None,
                             log_lo=None, log_hi=None, gm=None,
                             uniform_gm: bool = False,
                             emit_max: bool = False):
    """Symmetric-pair variant of pallas_accelerations: ~2x fewer pair
    evaluations via Newton's third law. Same semantics (the reference
    evaluates the full (N, N) tensor, simulation.py:83-112; this computes
    identical sums with a different, still-deterministic association
    order — f32 rounding-level deltas only).

    ``block`` is the receiver (sublane) block; ``block_j`` the streamed
    source slice width (always a multiple of ``block`` so receiver
    blocks never straddle a source super-chunk). Defaults — receiver
    block 512 for float modes / 256 for int-sim modes, 1024-lane
    slices — measured best on chip for THIS resident-source kernel
    (unlike the disjoint-set pair kernel, where 2048-lane slices win by
    24%): (512, 2048) here exceeds the 16 MB VMEM scoped stack and
    (256, 2048) loses 17% (docs/PERF.md sweep table).

    ``log_lo``/``log_hi`` optionally supply EXTERNAL int-sim grid bounds
    (the half-ring schedule owns the global ring-wide bounds and uses
    this kernel for the diagonal shard block); ``gm`` optionally supplies
    precomputed G*m in place of ``masses``.

    ``uniform_gm=True`` is a caller-asserted fast path for equal masses
    (all G*m identical): the kernel reduces one shared w*diff product per
    dim and the scalar G*m[0] scales the result in the epilogue — +24%
    f32 / +12% int4 at N=131k (docs/PERF.md). Unequal CONCRETE masses
    (or gm) with uniform_gm=True raise ValueError at dispatch
    (_guard_uniform_gm); only values traced by an enclosing jit remain
    the caller's assertion (in-repo callers auto-detect on concrete
    masses first — DirectSimulation/run_steps).
    Automatically degrades to the general path when N needs padding
    (padded rows rely on gm=0 to stay inert).

    ``emit_max=True`` (int-sim modes only; requires explicit
    log_lo/log_hi) also returns the tensor-global max SOFTENED pairwise
    d^2 as a fused ~1 op/pair byproduct — ``(acc, max_d2)`` — replacing
    the separate pallas_max_dist_sq pass in the cached-bounds scan
    (models/direct.run_steps(bounds_mode='cached')). Padding switches to
    duplicates of particle 0 so padded pairs are genuine pairs (the max
    pass's convention; the int pair_w clamps d^2 at min_dist_sq so no
    rsqrt(0) hazard, and gm=0 keeps them force-inert)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if emit_max:
        if not q.is_int:
            raise ValueError("emit_max is only supported for int-sim "
                             "modes (float paths keep the far-sentinel "
                             "padding, which would poison the max)")
        if log_lo is None or log_hi is None:
            raise ValueError("emit_max requires explicit log_lo/log_hi "
                             "(the cached-bounds scan owns them)")
    dynamic_soft = softening_sq is not None
    if softening_sq is None:
        softening_sq = cfg.softening_sq

    n, dim = positions.shape
    if block is None:
        # On-chip sweep at N=131k: int4's longer per-pair chain prefers
        # 256-sublane receiver blocks (2.343e11 vs 2.286e11 pairs/s);
        # f32 prefers 512 (3.243e11 vs 3.150e11). The equal-mass path's
        # shorter chain flips int back to 512 (61.5 vs 63.2 ms/step).
        block = 256 if (q.is_int and not uniform_gm) else 512
        if dim >= 3 and (q.mode == Precision.FLOAT16 or q.is_int):
            # The third diff lane's extra per-tile temporaries (plus the
            # f16 RNE bit-emulation's, or the int log-grid chain's)
            # overflow the 16 MB scoped-VMEM stack at (512, 1024) tiles —
            # measured 16.27M (f16) / 16.40M (int8-uniform) > 16M at
            # N=131k. 256-sublane receiver blocks fit with headroom and
            # win the on-chip sweep: int4 2.781e11 at (256,1024) vs
            # 2.692e11 at (512,512); int8 2.748e11 vs 2.722e11.
            block = 256
    quantum = math.lcm(block, 128)
    if block_j is None:
        block_j = min(_round_up(1024, quantum),
                      _round_up(max(n, block), quantum))
    else:
        block_j = _round_up(block_j, quantum)
    n_pad = _round_up(max(n, block_j), block_j)
    if n_pad != n:
        # Padded rows depend on gm=0 to stay inert; the uniform path has
        # no per-pair gm factor, so it only serves unpadded shapes.
        uniform_gm = False

    positions = positions.astype(jnp.float32)
    if gm is None:
        gm = cfg.G * masses.astype(jnp.float32)
    if emit_max:
        # Duplicate-of-particle-0 padding: padded pairs are genuine pairs
        # for the fused max (gm stays 0 there, so forces are unaffected).
        pos_pad = jnp.broadcast_to(positions[0],
                                   (n_pad, positions.shape[1])
                                   ).at[:n].set(positions)
    else:
        pos_pad = _pad_positions(positions, n_pad)
    if uniform_gm:
        # No gm row/column: the scalar G*m[0] scales in the epilogue.
        recv = pos_pad
        src = pos_pad.T
    else:
        gm_pad = jnp.zeros((n_pad,), jnp.float32).at[:n].set(gm)
        # Receiver blocks carry their G*m as an extra sublane-major
        # column; sources stay lane-major with the G*m row.
        recv = jnp.concatenate([pos_pad, gm_pad[:, None]], axis=1)
        src = jnp.concatenate([pos_pad.T, gm_pad[None, :]], axis=0)

    soft = jnp.asarray(softening_sq, jnp.float32)
    if q.is_int:
        if log_lo is None or log_hi is None:
            # Candidate-pruned diameter pass: bitwise the same global max
            # as pallas_max_dist_sq at O(N) cost (forces.py; the fallback
            # cond inside covers degenerate geometries).
            from nbody_tpu.ops.forces import max_pairwise_dist_sq_pruned
            max_d2 = max_pairwise_dist_sq_pruned(
                positions, cfg, softening_sq=softening_sq)
            log_lo, log_hi = dist_sq_log_bounds(q, max_d2, softening_sq)
        bounds = jnp.stack(
            [jnp.asarray(log_lo, jnp.float32),
             jnp.asarray(log_hi, jnp.float32),
             soft]).reshape(1, 3).astype(jnp.float32)
    else:
        bounds = jnp.stack(
            [jnp.float32(0), jnp.float32(0), soft]).reshape(1, 3)

    kernel = functools.partial(
        _force_kernel_sym, q=q,
        self_masked=dynamic_soft or cfg.softening_sq <= 0.0, dim=dim,
        block_i=block, block_j=block_j, n_pad=n_pad, uniform_gm=uniform_gm,
        emit_max=emit_max)

    gm_rows = 0 if uniform_gm else 1
    grid = (n_pad // block,)
    out_specs = [
        pl.BlockSpec((block, dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dim, n_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
        jax.ShapeDtypeStruct((dim, n_pad), jnp.float32),
    ]
    if emit_max:
        out_specs.append(pl.BlockSpec((n_pad // block, 1),
                                      lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_pad // block, 1),
                                              jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, dim + gm_rows), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + gm_rows, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=16 * n_pad * n_pad * dim // 4,
            bytes_accessed=4 * n_pad * dim * 4,
            transcendentals=n_pad * n_pad // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, recv, src)
    rows, cols = outs[0], outs[1]

    acc = (rows + cols.T)[:n]
    if uniform_gm:
        acc = acc * gm[0]
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    if emit_max:
        # Same value pallas_max_dist_sq returns: max RAW pairwise d^2 +
        # softening (monotone rounding makes max-then-add bitwise equal
        # to add-then-max in f32).
        return acc, jnp.max(outs[2]) + soft
    return acc


def _force_kernel_streamed(bounds_ref, pos_i_ref, src_ref, out_ref,
                           *, q: Quantizer, self_masked: bool, dim: int,
                           block_i: int, block_j: int):
    """HBM-streaming row-sweep force kernel: 2-D grid (receivers x source
    chunks); each grid step stages ONE (D+1, BJ) source block into VMEM
    instead of keeping the whole (D+1, N) source array resident.

    Removes the resident-source VMEM cliff of the flagship kernels
    (~600k particles at 2-D on a 16 MB-VMEM chip): N is now bounded by
    HBM only. Re-fetch traffic is (N/BI) * N * (D+1) * 4 bytes per
    evaluation — at N=1M, 2-D, BI=512: ~24 GB against ~1e12 pair
    evaluations, still compute-bound by >10x. The output block for
    receiver block i is revisited consecutively across the inner j steps
    (init at j == 0, accumulate after)."""
    j = pl.program_id(1)
    i0 = pl.program_id(0) * block_i
    j0 = j * block_j

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (block_i, 1), 0) + i0

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

    xj = [src_ref[d:d + 1, :] for d in range(dim)]
    gm_j = src_ref[dim:dim + 1, :]  # (1, BJ)

    diffs = [xj[d] - xi[d] for d in range(dim)]
    d2 = diffs[0] * diffs[0]
    for d in range(1, dim):
        d2 = d2 + diffs[d] * diffs[d]
    d2 = d2 + softening_sq

    if q.is_int:
        log_d2 = jnp.log(jnp.maximum(d2, q.min_dist_sq))
        k = jnp.round(log_d2 * norm_a + norm_b)
        arg = jnp.minimum(k * arg_k + arg_0, arg_cap)
        factor = gm_j * jnp.exp(arg)
    else:
        d2q = quantize_distance_squared(d2, q)
        inv_d = jax.lax.rsqrt(d2q)
        factor = gm_j * (inv_d * inv_d * inv_d)

    if self_masked:
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_j), 1) + j0
        factor = jnp.where(j_ids == i_ids, 0.0, factor)

    for d in range(dim):
        out_ref[:, d:d + 1] += jnp.sum(factor * diffs[d], axis=1,
                                       keepdims=True)


def _max_kernel_streamed(pos_i_ref, src_ref, out_ref, *, dim: int,
                         block_i: int, block_j: int):
    """Streaming-source variant of the max pass (see _max_kernel for the
    duplicate-of-particle-0 padding trick). Upper triangle only: tiles
    wholly below the receiver block's own rows are skipped (the pair max
    is symmetric)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[i, 0] = 0.0

    @pl.when((j + 1) * block_j > i * block_i)
    def _tile():
        xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]
        xj = [src_ref[d:d + 1, :] for d in range(dim)]
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        out_ref[i, 0] = jnp.maximum(out_ref[i, 0], jnp.max(d2))


@functools.partial(jax.jit, static_argnames=("cfg", "block_i", "block_j",
                                             "interpret"))
def pallas_max_dist_sq_streamed(positions, cfg: SimConfig,
                                block_i: int = 1024, block_j: int = 4096,
                                interpret: bool | None = None,
                                softening_sq=None):
    """Global max softened pairwise dist^2 with streamed source blocks
    (no resident (D, N) VMEM array — the large-N bounds pass)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, dim = positions.shape
    n_pad = _round_up(max(n, block_i, block_j),
                      math.lcm(block_i, block_j, 128))
    positions = positions.astype(jnp.float32)
    pos_pad = jnp.broadcast_to(positions[0], (n_pad, dim)).at[:n].set(
        positions)
    src = pos_pad.T  # (D, N_pad) lane-major

    kernel = functools.partial(_max_kernel_streamed, dim=dim,
                               block_i=block_i, block_j=block_j)
    grid = (n_pad // block_i, n_pad // block_j)
    block_maxes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad // block_i, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // block_i, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(pos_pad, src)
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    return jnp.max(block_maxes) + softening_sq


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block_i", "block_j",
                                             "interpret"))
def pallas_accelerations_streamed(positions, masses, q: Quantizer,
                                  cfg: SimConfig,
                                  quantize_forces: bool = True,
                                  block_i: int = 512, block_j: int = 2048,
                                  interpret: bool | None = None,
                                  softening_sq=None):
    """Large-N force path: same semantics as pallas_accelerations, with
    source blocks STREAMED from HBM per grid step instead of resident in
    VMEM — N is bounded by HBM capacity, not the 16 MB VMEM stack.
    Auto-selected by models/direct above the sym kernel's residency
    limit (docs/PERF.md)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dynamic_soft = softening_sq is not None
    if softening_sq is None:
        softening_sq = cfg.softening_sq

    n, dim = positions.shape
    n_pad = _round_up(max(n, block_i, block_j),
                      math.lcm(block_i, block_j, 128))

    positions = positions.astype(jnp.float32)
    pos_pad = _pad_positions(positions, n_pad)
    gmass = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        cfg.G * masses.astype(jnp.float32))
    src = jnp.concatenate([pos_pad.T, gmass], axis=0)  # (D+1, N_pad)

    soft = jnp.asarray(softening_sq, jnp.float32)
    if q.is_int:
        from nbody_tpu.ops.forces import max_pairwise_dist_sq_pruned
        max_d2 = max_pairwise_dist_sq_pruned(
            positions, cfg, softening_sq=softening_sq)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, softening_sq)
        bounds = jnp.stack(
            [log_lo, log_hi, soft]).reshape(1, 3).astype(jnp.float32)
    else:
        bounds = jnp.stack(
            [jnp.float32(0), jnp.float32(0), soft]).reshape(1, 3)

    kernel = functools.partial(
        _force_kernel_streamed, q=q,
        self_masked=dynamic_soft or cfg.softening_sq <= 0.0, dim=dim,
        block_i=block_i, block_j=block_j)

    grid = (n_pad // block_i, n_pad // block_j)
    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 1, block_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, dim), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=16 * n_pad * n_pad * dim // 2,
            bytes_accessed=4 * n_pad * n_pad // block_i * (dim + 1),
            transcendentals=n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(bounds, pos_pad, src)

    acc = acc[:n]
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    return acc


@_guard_uniform_gm(("masses", ("gm", "masses", 1)))
@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "chunk", "interpret",
                                             "uniform_gm"))
def pallas_accelerations_sym_chunked(positions, masses, q: Quantizer,
                                     cfg: SimConfig,
                                     quantize_forces: bool = True,
                                     chunk: int | None = None,
                                     interpret: bool | None = None,
                                     softening_sq=None,
                                     uniform_gm: bool = False,
                                     log_lo=None, log_hi=None, gm=None):
    """Newton's-third-law force path for N beyond the sym kernel's VMEM
    residency limit: the single-chip analog of the half-ring schedule.

    Particles are split into C VMEM-sized column chunks. Each diagonal
    chunk runs the resident symmetric kernel; each unordered chunk pair
    (i < j) runs ONE pallas_pair_force_sym tile producing both the
    direct rows (chunk i) and the reactions (chunk j) — C(C+1)/2 kernel
    launches unrolled inside the jitted graph, ~N^2/2 pair evaluations
    total where the streamed row sweep pays N^2. Global int-sim bounds
    come from one streamed max pass.

    Falls back to the streamed row sweep for dynamic softening sweeps or
    zero softening (the sym pair tile has no traced-softening/self-mask
    path).

    ``uniform_gm=True`` is the caller-asserted equal-mass fast path (see
    pallas_accelerations_sym): it propagates to the diagonal and pair
    tiles of every chunk that contains no padded tail rows — only the
    LAST chunk can be padded, and it alone degrades to the general
    zero-gm-padding kernels.

    ``log_lo``/``log_hi`` optionally supply EXTERNAL int-sim grid bounds
    (the sharded ring owns the global ring-wide bounds when it routes
    large shards through this path); ``gm`` optionally supplies
    precomputed G*m in place of ``masses``."""
    if softening_sq is not None or cfg.softening_sq <= 0.0:
        return pallas_accelerations_streamed(
            positions, masses, q, cfg, quantize_forces=quantize_forces,
            interpret=interpret, softening_sq=softening_sq)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, dim = positions.shape
    if chunk is None:
        # Largest chunk whose grid-resident arrays (the (D+1, chunk)
        # source + (D, chunk) reaction buffer) fit the shared VMEM
        # residency budget, then the chunk count that minimises tail
        # padding. Measured at N=1M 2-D with the 256x2048 pair tiles:
        # 2x524288 chunks hit 3.49e11 pairs/s f32 (4x262144 and padded
        # 3-chunk layouts measured slower; docs/PERF.md).
        max_chunk = SYM_RESIDENT_VMEM_BUDGET // (4 * (2 * dim + 1))
        n_chunks = -(-n // max(max_chunk, 512))
        chunk = -(-n // n_chunks)
    chunk = _round_up(min(chunk, n), math.lcm(512, 128))
    n_pad = _round_up(n, chunk)
    n_chunks = n_pad // chunk

    positions = positions.astype(jnp.float32)
    pos_pad = _pad_positions(positions, n_pad)
    if gm is None:
        gm = cfg.G * masses.astype(jnp.float32)
    gm_pad = jnp.zeros((n_pad,), jnp.float32).at[:n].set(gm)

    if q.is_int and (log_lo is None or log_hi is None):
        from nbody_tpu.ops.forces import max_pairwise_dist_sq_pruned
        max_d2 = max_pairwise_dist_sq_pruned(positions, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
    elif not q.is_int:
        log_lo = log_hi = None

    def sl(i):
        return slice(i * chunk, (i + 1) * chunk)

    def unpadded(c):
        # Only the last chunk can hold padded (gm=0) tail rows.
        return (c + 1) * chunk <= n

    acc = jnp.zeros((n_pad, dim), jnp.float32)
    for i in range(n_chunks):
        pos_i, gm_i = pos_pad[sl(i)], gm_pad[sl(i)]
        acc_i = pallas_accelerations_sym(
            pos_i, None, q, cfg, quantize_forces=False,
            interpret=interpret, log_lo=log_lo, log_hi=log_hi, gm=gm_i,
            uniform_gm=uniform_gm and unpadded(i))
        for j in range(i + 1, n_chunks):
            rows, cols = pallas_pair_force_sym(
                pos_i, gm_i, pos_pad[sl(j)], gm_pad[sl(j)], q, cfg,
                log_lo=log_lo, log_hi=log_hi, interpret=interpret,
                uniform_gm=uniform_gm and unpadded(j))
            acc_i = acc_i + rows
            acc = acc.at[sl(j)].add(cols)
        acc = acc.at[sl(i)].add(acc_i)

    acc = acc[:n]
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    return acc


def _pair_force_sym_kernel(bounds_ref, recv_ref, src_ref, out_row_ref,
                           out_col_ref, *, q: Quantizer, dim: int,
                           block_i: int, block_j: int, nj_pad: int,
                           uniform_gm: bool = False):
    """Newton's-third-law pair tile for two DISJOINT particle sets.

    The half-ring schedule's per-step tile (parallel/ring.py): receivers
    are the device-resident block, sources the visiting block. Each pair's
    expensive work (d^2, quantize chain, inverse-cube) runs once; the
    direct force accumulates into the receiver rows while the reaction
    (-G*m_i * w * diff) accumulates into a lane-major (D, NJ_pad) column
    buffer that rides back around the ring to the sources' home device.

    recv_ref: (BI, D+1) — receiver coords + a G*m_i column (sublane-major)
    src_ref:  (D+1, NJ_pad) — source coords + G*m_j row (lane-major)
    out_row_ref: (BI, D) receiver accelerations
    out_col_ref: (D, NJ_pad) source reactions, shared across grid steps

    ``uniform_gm=True`` (all G*m equal, both sets unpadded — asserted by
    the wrapper): direct and reaction products collapse into one shared
    t_d = w*diff_d reduced along both axes; the G*m scalars scale in the
    wrapper's epilogue. Inputs then carry no gm row/column: recv_ref is
    (BI, D), src_ref (D, NJ_pad).
    """
    pid = pl.program_id(0)
    num_j = nj_pad // block_j

    @pl.when(pid == 0)
    def _init_cols():
        out_col_ref[...] = jnp.zeros_like(out_col_ref)

    xi = [recv_ref[:, d:d + 1] for d in range(dim)]
    gm_i = None if uniform_gm else recv_ref[:, dim:dim + 1]  # (BI, 1)

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

    def j_chunk(jc, acc):
        j0 = jc * block_j
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        gm_j = (None if uniform_gm
                else src_ref[dim:dim + 1, pl.ds(j0, block_j)])  # (1, BJ)
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        d2 = d2 + softening_sq
        if q.is_int:
            log_d2 = jnp.log(jnp.maximum(d2, q.min_dist_sq))
            k = jnp.round(log_d2 * norm_a + norm_b)
            arg = jnp.minimum(k * arg_k + arg_0, arg_cap)
            w = jnp.exp(arg)
        else:
            d2q = quantize_distance_squared(d2, q)
            inv_d = jax.lax.rsqrt(d2q)
            w = inv_d * inv_d * inv_d
        if uniform_gm:
            # Shared t_d: both reductions consume the SAME product (the
            # G*m scalars scale in the wrapper's epilogue).
            new = []
            for d in range(dim):
                t = w * diffs[d]
                col = -jnp.sum(t, axis=0, keepdims=True)  # (1, BJ)
                out_col_ref[d:d + 1, pl.ds(j0, block_j)] += col
                new.append(acc[d] + jnp.sum(t, axis=1, keepdims=True))
            return tuple(new)
        fr = gm_j * w                       # direct: receiver rows
        fc = gm_i * w                       # reaction: source cols
        for d in range(dim):
            col = -jnp.sum(fc * diffs[d], axis=0, keepdims=True)  # (1, BJ)
            out_col_ref[d:d + 1, pl.ds(j0, block_j)] += col
        return tuple(
            acc[d] + jnp.sum(fr * diffs[d], axis=1, keepdims=True)
            for d in range(dim)
        )

    acc0 = tuple(jnp.zeros((block_i, 1), jnp.float32) for _ in range(dim))
    # 2-wide interleave: two independent tiles per iteration give the VPU
    # scheduler cross-tile ILP (same win as the sym kernel's manual duo;
    # Mosaic does not lower lax's unroll=, so the duo is hand-rolled —
    # the trip count is static here, so the odd tail is a plain Python
    # branch). FLOAT16 keeps the single-tile loop (its cast round-trip's
    # temporaries x2 tiles overflow the scoped VMEM stack).
    if q.mode.value == "float16":
        acc = jax.lax.fori_loop(0, num_j, j_chunk, acc0)
    else:
        def j_duo(k, acc):
            return j_chunk(2 * k + 1, j_chunk(2 * k, acc))

        acc = jax.lax.fori_loop(0, num_j // 2, j_duo, acc0)
        if num_j % 2:
            acc = j_chunk(num_j - 1, acc)
    for d in range(dim):
        out_row_ref[:, d:d + 1] = acc[d]


@_guard_uniform_gm(("gm_recv", ("gm_recv", 1)), ("gm_src", ("gm_src", 3)))
@functools.partial(jax.jit, static_argnames=("q", "cfg", "block_i",
                                             "block_j", "interpret",
                                             "uniform_gm"))
def pallas_pair_force_sym(receivers, gm_recv, sources, gm_src,
                          q: Quantizer, cfg: SimConfig,
                          log_lo=None, log_hi=None,
                          block_i: int = 256, block_j: int | None = None,
                          interpret: bool | None = None,
                          uniform_gm: bool = False):
    """Pair forces between two disjoint sets with Newton's-third-law reuse.

    Returns ``(acc_recv, acc_src_reaction)`` — the accelerations of the
    receivers due to the sources AND the reactions on the sources due to
    the receivers, from one pass over the pair tile. Requires
    softening > 0 (coincident pairs then contribute exactly zero; the
    ring caller falls back to the masked jnp tile otherwise).

    ``uniform_gm=True`` is a caller-asserted equal-mass fast path (all
    G*m identical across BOTH sets): one shared w*diff product per dim,
    G*m scalars applied in the epilogue (gm_src[0] on the rows,
    gm_recv[0] on the columns). Automatically degrades to the general
    path whenever either set needs padding — padded rows rely on gm=0 to
    stay inert, which the uniform kernel has no per-pair factor to honor.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_i, dim = receivers.shape
    n_j = sources.shape[0]
    if block_j is None:
        # 2048-lane slices are +24% over 512 on chip (docs/PERF.md), but
        # only when the source size doesn't force pathological padding.
        # At dim>=3 the wide tiles lose BOTH ways: the third diff lane's
        # temporaries put the (256,2048) tile at 19.66M scoped VMEM
        # (>16M limit once XLA keeps the lane-major reaction output
        # VMEM-resident inside a fused step, as run_steps does), and the
        # on-chip sweep at 350k x 350k has 512 lanes fastest anyway
        # (f32 1.62e11 vs 1.35e11 at 1024; int4 1.33e11 vs 1.12e11).
        block_j = _pick_block_j(n_j, cap=512 if dim >= 3 else 2048)
    ni_pad = _round_up(max(n_i, block_i), block_i)
    nj_pad = _round_up(max(n_j, block_j, 128), math.lcm(block_j, 128))
    if ni_pad != n_i or nj_pad != n_j:
        uniform_gm = False

    if uniform_gm:
        # No gm column/row: the scalars scale in the epilogue.
        recv = receivers.astype(jnp.float32)
        src = sources.astype(jnp.float32).T
    else:
        recv = jnp.zeros((ni_pad, dim + 1), jnp.float32)
        recv = recv.at[:n_i, :dim].set(receivers.astype(jnp.float32))
        recv = recv.at[:n_i, dim].set(gm_recv.astype(jnp.float32))
        src = jnp.zeros((dim + 1, nj_pad), jnp.float32)
        src = src.at[:dim, :n_j].set(sources.astype(jnp.float32).T)
        src = src.at[dim, :n_j].set(gm_src.astype(jnp.float32))

    soft = jnp.asarray(cfg.softening_sq, jnp.float32)
    if q.is_int:
        if log_lo is None or log_hi is None:
            raise ValueError("int-sim modes need global log bounds from "
                             "the ring max pass")
        bounds = jnp.stack([jnp.asarray(log_lo, jnp.float32),
                            jnp.asarray(log_hi, jnp.float32),
                            soft]).reshape(1, 3)
    else:
        bounds = jnp.stack([jnp.float32(0), jnp.float32(0),
                            soft]).reshape(1, 3)

    kernel = functools.partial(
        _pair_force_sym_kernel, q=q, dim=dim,
        block_i=block_i, block_j=block_j, nj_pad=nj_pad,
        uniform_gm=uniform_gm)
    gm_rows = 0 if uniform_gm else 1
    rows, cols = pl.pallas_call(
        kernel,
        grid=(ni_pad // block_i,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dim + gm_rows), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + gm_rows, nj_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, nj_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ni_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((dim, nj_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, recv, src)
    if uniform_gm:
        return rows * gm_src[0], cols.T * gm_recv[0]
    return rows[:n_i], cols.T[:n_j]


def _pair_pe_kernel(soft_ref, recv_ref, src_ref, out_ref, *, dim: int,
                    block_i: int, block_j: int, nj_pad: int):
    """Per-receiver-row potential-energy partial sums over a source block.

    recv_ref: (BI, D+2) — coords + mass column + particle-id column (ids
        carried as f32: exact below 2^24, and only EQUALITY is tested)
    src_ref:  (D+2, NJ_pad) — coords + mass row + id row (lane-major)
    out_ref:  (BI, 1) — sum_j m_i * m_j / sqrt(|x_i-x_j|^2 + eps^2)

    Padded rows/lanes carry zero mass (zero contribution); the id mask
    zeroes the i==j self-pair exactly as the reference's triu discipline
    (reference: simulation.py:176-192 — here every unordered pair is
    visited twice across the ring and the caller halves the total).
    Row sums accumulate in plain f32 (~sqrt(B)*eps relative error — at
    B=1M that is ~6e-5 per row); the caller combines rows with a
    double-double reduction, preserving the compensated cross-row sum.
    """
    num_j = nj_pad // block_j
    xi = [recv_ref[:, d:d + 1] for d in range(dim)]
    m_i = recv_ref[:, dim:dim + 1]        # (BI, 1)
    id_i = recv_ref[:, dim + 1:dim + 2]   # (BI, 1)
    soft = soft_ref[0, 0]

    def j_chunk(jc, acc):
        j0 = jc * block_j
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        m_j = src_ref[dim:dim + 1, pl.ds(j0, block_j)]      # (1, BJ)
        id_j = src_ref[dim + 1:dim + 2, pl.ds(j0, block_j)]  # (1, BJ)
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        pair = (m_i * m_j) * jax.lax.rsqrt(d2 + soft)
        pair = jnp.where(id_i == id_j, 0.0, pair)
        return acc + jnp.sum(pair, axis=1, keepdims=True)

    acc = jax.lax.fori_loop(0, num_j, j_chunk,
                            jnp.zeros((block_i, 1), jnp.float32))
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "interpret"))
def pallas_pair_pe_rows(receivers, m_recv, ids_recv, sources, m_src,
                        ids_src, softening_sq,
                        block_i: int = 512, block_j: int | None = None,
                        interpret: bool | None = None):
    """Per-receiver potential-energy row sums against a source set.

    Returns a (n_recv,) f32 vector of sum_j m_i*m_j/sqrt(d2+eps2) — the
    compute-bound Pallas tile of the sharded energy ring
    (parallel/ring._ring_pe_local; the jnp broadcast tile is memory-bound
    at production shard sizes: ~0.4 s/eval at 131k vs ~60 ms here).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_i, dim = receivers.shape
    n_j = sources.shape[0]
    if block_j is None:
        block_j = _pick_block_j(n_j)
    ni_pad = _round_up(max(n_i, block_i), block_i)
    nj_pad = _round_up(max(n_j, block_j, 128), math.lcm(block_j, 128))

    recv = jnp.zeros((ni_pad, dim + 2), jnp.float32)
    recv = recv.at[:n_i, :dim].set(receivers.astype(jnp.float32))
    recv = recv.at[:n_i, dim].set(m_recv.astype(jnp.float32))
    recv = recv.at[:n_i, dim + 1].set(ids_recv.astype(jnp.float32))
    recv = recv.at[n_i:, dim + 1].set(-1.0)  # pads: zero mass, inert id
    src = jnp.zeros((dim + 2, nj_pad), jnp.float32)
    src = src.at[:dim, :n_j].set(sources.astype(jnp.float32).T)
    src = src.at[dim, :n_j].set(m_src.astype(jnp.float32))
    src = src.at[dim + 1, :n_j].set(ids_src.astype(jnp.float32))
    src = src.at[dim + 1, n_j:].set(-2.0)

    soft = jnp.asarray(softening_sq, jnp.float32).reshape(1, 1)
    kernel = functools.partial(_pair_pe_kernel, dim=dim, block_i=block_i,
                               block_j=block_j, nj_pad=nj_pad)
    rows = pl.pallas_call(
        kernel,
        grid=(ni_pad // block_i,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dim + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 2, nj_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni_pad, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(soft, recv, src)
    return rows[:n_i, 0]


def _max_kernel(pos_i_ref, src_ref, out_ref, *, dim: int, block_i: int,
                block_j: int, n_pad: int):
    """Per-receiver-block max of pairwise |x_i - x_j|^2 over all sources.

    Padded tail rows/columns duplicate particle 0 (done by the caller),
    so every padded pair is a genuine particle pair and can never inflate
    the max — no per-tile index masks needed (the masked version spent
    ~40% of its per-pair budget on iota/compare/select).
    """
    num_j = n_pad // block_j
    i0 = pl.program_id(0) * block_i
    xi = [pos_i_ref[:, d:d + 1] for d in range(dim)]

    def j_chunk(jc, best):
        j0 = jc * block_j
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        return jnp.maximum(best, jnp.max(d2))

    # dist^2 is symmetric: only the upper triangle is needed, so each
    # receiver block starts at the source chunk containing its own row
    # range (halves the pass on average).
    jc_start = i0 // block_j
    best = jax.lax.fori_loop(jc_start, num_j, j_chunk, jnp.float32(0.0))
    out_ref[pl.program_id(0), 0] = best


@functools.partial(jax.jit, static_argnames=("cfg", "block_i", "block_j",
                                             "interpret"))
def pallas_max_dist_sq(positions, cfg: SimConfig,
                       block_i: int = 1024, block_j: int = 4096,
                       interpret: bool | None = None, softening_sq=None):
    """Global max softened pairwise dist^2, as a compute-bound Pallas pass.

    Replaces the lax.map version for large N, where XLA materialises
    GB-scale (B, N, D) intermediates in HBM and the pass goes memory-bound.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, dim = positions.shape
    # pad to a common multiple so BOTH the receiver grid and the source
    # loop tile n_pad exactly (non-divisible block pairs would silently
    # skip rows/chunks otherwise)
    n_pad = _round_up(max(n, block_i, block_j),
                      math.lcm(block_i, block_j, 128))
    positions = positions.astype(jnp.float32)
    # Pad with duplicates of particle 0: padded pairs are then genuine
    # particle pairs, so the kernel needs no validity masks.
    pos_pad = jnp.broadcast_to(positions[0], (n_pad, dim)).at[:n].set(
        positions)
    src = pos_pad.T  # (D, N_pad) lane-major

    kernel = functools.partial(_max_kernel, dim=dim, block_i=block_i,
                               block_j=block_j, n_pad=n_pad)
    grid = (n_pad // block_i,)
    block_maxes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad // block_i, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // block_i, 1), jnp.float32),
        interpret=interpret,
    )(pos_pad, src)
    if softening_sq is None:
        softening_sq = cfg.softening_sq
    return jnp.max(block_maxes) + softening_sq


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces",
                                             "block_i", "block_j", "interpret"))
def pallas_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                         quantize_forces: bool = True,
                         block_i: int = 512, block_j: int = 2048,
                         interpret: bool | None = None,
                         softening_sq=None):
    """Drop-in replacement for forces.dense/tiled_accelerations on TPU.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path is unit-testable on the CPU mesh. ``softening_sq`` optionally
    overrides the static cfg value with a traced scalar (one compiled
    program serves a whole softening sweep)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dynamic_soft = softening_sq is not None
    if softening_sq is None:
        softening_sq = cfg.softening_sq

    n, dim = positions.shape
    n_pad = _round_up(max(n, block_i, block_j),
                      math.lcm(block_i, block_j, 128))

    positions = positions.astype(jnp.float32)
    pos_pad = _pad_positions(positions, n_pad)
    gmass = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        cfg.G * masses.astype(jnp.float32))
    # Rows 0..D-1: coordinates (lane-major); row D: G*m_j.
    src = jnp.concatenate([pos_pad.T, gmass], axis=0)  # (D+1, N_pad)

    soft = jnp.asarray(softening_sq, jnp.float32)
    if q.is_int:
        from nbody_tpu.ops.forces import max_pairwise_dist_sq_pruned
        max_d2 = max_pairwise_dist_sq_pruned(
            positions, cfg, softening_sq=softening_sq)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, softening_sq)
        bounds = jnp.stack(
            [log_lo, log_hi, soft]).reshape(1, 3).astype(jnp.float32)
    else:
        bounds = jnp.stack(
            [jnp.float32(0), jnp.float32(0), soft]).reshape(1, 3)

    kernel = functools.partial(
        _force_kernel, q=q,
        self_masked=dynamic_soft or cfg.softening_sq <= 0.0, dim=dim,
        block_i=block_i, block_j=block_j, n_pad=n_pad)

    grid = (n_pad // block_i,)
    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=16 * n_pad * n_pad * dim // 2,
            bytes_accessed=3 * n_pad * dim * 4,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(bounds, pos_pad, src)

    acc = acc[:n]
    if quantize_forces and q.is_int:
        acc = quantize_force(acc, q)
    return acc


def _pair_max_kernel(recv_ref, src_ref, out_ref, *, dim: int, block_i: int,
                     block_j: int, nj_pad: int):
    """Masked max of pairwise |x_i - x_j|^2 between two (possibly
    disjoint) sets — the ring max pass tile. Validity travels WITH the
    data (an extra receiver column / source row of 1.0 or 0.0), so no
    index iota is needed; invalid pairs contribute 0 via multiplication.
    """
    num_j = nj_pad // block_j
    xi = [recv_ref[:, d:d + 1] for d in range(dim)]
    vi = recv_ref[:, dim:dim + 1]  # (BI, 1) validity

    def j_chunk(jc, best):
        j0 = jc * block_j
        xj = [src_ref[d:d + 1, pl.ds(j0, block_j)] for d in range(dim)]
        vj = src_ref[dim:dim + 1, pl.ds(j0, block_j)]  # (1, BJ)
        diffs = [xj[d] - xi[d] for d in range(dim)]
        d2 = diffs[0] * diffs[0]
        for d in range(1, dim):
            d2 = d2 + diffs[d] * diffs[d]
        return jnp.maximum(best, jnp.max(d2 * (vi * vj)))

    best = jax.lax.fori_loop(0, num_j, j_chunk, jnp.float32(0.0))
    out_ref[pl.program_id(0), 0] = best


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "interpret"))
def pallas_pair_max(receivers, sources, valid_i, valid_j,
                    block_i: int = 512, block_j: int = 2048,
                    interpret: bool | None = None):
    """Max masked pairwise dist^2 between receivers and sources
    (the per-ring-step bound pass; jnp row-blocking at 131k shards costs
    ~190 ms/eval vs ~15 ms for this compute-bound kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_i, dim = receivers.shape
    n_j = sources.shape[0]
    ni_pad = _round_up(max(n_i, block_i), block_i)
    nj_pad = _round_up(max(n_j, block_j, 128), math.lcm(block_j, 128))

    recv = jnp.zeros((ni_pad, dim + 1), jnp.float32)
    recv = recv.at[:n_i, :dim].set(receivers.astype(jnp.float32))
    recv = recv.at[:n_i, dim].set(valid_i.astype(jnp.float32))
    src = jnp.zeros((dim + 1, nj_pad), jnp.float32)
    src = src.at[:dim, :n_j].set(sources.astype(jnp.float32).T)
    src = src.at[dim, :n_j].set(valid_j.astype(jnp.float32))

    kernel = functools.partial(_pair_max_kernel, dim=dim, block_i=block_i,
                               block_j=block_j, nj_pad=nj_pad)
    grid = (ni_pad // block_i,)
    block_maxes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, dim + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 1, nj_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ni_pad // block_i, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((ni_pad // block_i, 1), jnp.float32),
        interpret=interpret,
    )(recv, src)
    return jnp.max(block_maxes)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "block_i",
                                             "block_j", "interpret"))
def pallas_pair_force(receivers, sources, gm_sources, q: Quantizer,
                      cfg: SimConfig, log_lo=None, log_hi=None,
                      block_i: int = 512, block_j: int | None = None,
                      interpret: bool | None = None):
    """Accelerations of `receivers` due to `sources` (disjoint or equal
    sets) — the per-device tile of the multi-chip ring kernel
    (parallel/ring.py): each ring step is one of these calls instead of a
    broadcast (B, B, D) jnp tensor, keeping the local compute VMEM-tiled
    at production block sizes.

    gm_sources = G * m_j (precomputed). For int-sim modes pass the GLOBAL
    log bounds (from the ring max pass); receivers==sources overlap is
    safe with softening > 0 (zero diff -> zero contribution).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_i, dim = receivers.shape
    n_j = sources.shape[0]
    if block_j is None:
        block_j = _pick_block_j(n_j)
    ni_pad = _round_up(max(n_i, block_i), block_i)
    nj_pad = _round_up(max(n_j, block_j, 128), math.lcm(block_j, 128))

    pos_i = jnp.zeros((ni_pad, dim), jnp.float32).at[:n_i].set(
        receivers.astype(jnp.float32))
    src = jnp.zeros((dim + 1, nj_pad), jnp.float32)
    src = src.at[:dim, :n_j].set(sources.astype(jnp.float32).T)
    src = src.at[dim, :n_j].set(gm_sources.astype(jnp.float32))

    soft = jnp.asarray(cfg.softening_sq, jnp.float32)
    if q.is_int:
        if log_lo is None or log_hi is None:
            raise ValueError("int-sim modes need global log bounds from "
                             "the ring max pass")
        bounds = jnp.stack([jnp.asarray(log_lo, jnp.float32),
                            jnp.asarray(log_hi, jnp.float32),
                            soft]).reshape(1, 3)
    else:
        bounds = jnp.stack([jnp.float32(0), jnp.float32(0),
                            soft]).reshape(1, 3)

    kernel = functools.partial(
        _force_kernel, q=q, self_masked=False, dim=dim,
        block_i=block_i, block_j=block_j, n_pad=nj_pad)
    acc = pl.pallas_call(
        kernel,
        grid=(ni_pad // block_i,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim + 1, nj_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_i, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ni_pad, dim), jnp.float32),
        interpret=interpret,
    )(bounds, pos_i, src)
    return acc[:n_i]
