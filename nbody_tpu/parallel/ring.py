"""Multi-chip particle parallelism: ring-passed all-pairs forces over ICI.

The reference has no distributed execution at all (SURVEY.md §2.5; its
"cross-machine" feature is offline JSON exchange,
reference: ultimate_reality_engine.py:694-833). This module is the
TPU-native scaling axis: particles are sharded across a 1-D device mesh,
and the O(N^2) interaction is computed by rotating *source* blocks around
the ring with ``jax.lax.ppermute`` while each device accumulates forces on
its resident receiver block — structurally identical to ring attention /
blockwise context parallelism, with force accumulation in place of
attention combining.

Per ring step each device computes an (N/S, N/S) tile; after S steps every
pair has been visited exactly once per direction. Communication volume per
step is the block positions+masses (~N/S * (D+1) * 4 bytes), fully
overlapped by XLA with the tile compute.

Int-sim modes need the global log-grid bounds first; that is a second,
cheaper ring pass (max reduction) followed by a ``jax.lax.pmax``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.config import SimConfig
from nbody_tpu.diagnostics import metrics as metrics_lib
from nbody_tpu.models.state import BaselineState, ParticleState
from nbody_tpu.ops.pallas_nbody import _PAD_FAR, SYM_RESIDENT_VMEM_BUDGET
from nbody_tpu.ops import doubledouble as dd
from nbody_tpu.ops.precision import (
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)

AXIS = "shards"

# Grid-resident VMEM footprint budget for the sym kernels' source (+
# reaction) arrays. Shards whose resident arrays exceed it route through
# SOURCE-CHUNKED tiles (several kernel launches per ring step) instead of
# failing Mosaic compilation — the multi-chip analog of the single-device
# pallas_sym_chunked ladder (models/direct._resolve_impl). ~525k 2-D
# particles per shard at the default budget. The value is owned by
# ops/pallas_nbody (the kernels' own chunk sizing uses the same number);
# tests monkeypatch THIS module attribute to force the chunked routing
# at CPU scale.
_VMEM_RESIDENT_BUDGET = SYM_RESIDENT_VMEM_BUDGET

# HBM cap for the jnp broadcast tiles of the energy/dd ring passes: the
# (rb, B, D) intermediate at e.g. B=1M with the default 1024-row blocks
# would be an 8 GB allocation; rb is clamped so it stays under this.
_BCAST_TILE_BYTES = 512 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _guard_uniform_gm(mass_argnum: int):
    """Reject ``uniform_gm=True`` with concrete unequal masses at the
    sharded-runner surface (see ops.pallas_nbody.check_uniform_gm; the
    value at ``mass_argnum`` may be a ParticleState/BaselineState — its
    .masses leaf is checked — or a raw masses array)."""
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if kwargs.get("uniform_gm") and mass_argnum < len(args):
                from nbody_tpu.ops.pallas_nbody import check_uniform_gm
                val = args[mass_argnum]
                val = getattr(val, "masses", val)
                n_total = kwargs.get("n_total")
                # A chained resident state (shape > n_total) is padded to
                # the shard boundary with zero-mass phantom rows; the
                # runner auto-disables the fast path on any padded layout,
                # so there is nothing to guard there (and slicing the
                # explicitly-sharded tail here would be ill-sharded).
                padded = (n_total is not None and hasattr(val, "shape")
                          and val.shape[0] != n_total)
                if not padded:
                    check_uniform_gm(val)
            return fn(*args, **kwargs)
        return wrapper
    return deco


def _sym_resident_bytes(n: int, dim: int) -> int:
    """VMEM bytes of the sym kernels' grid-resident arrays: the
    (D+1, N) source plus the (D, N) reaction buffer."""
    return 4 * (2 * dim + 1) * n


# Floor on the source-chunk size (tests shrink it to exercise the chunked
# paths at CPU scale without heavyweight interpret-mode programs).
_SRC_CHUNK_FLOOR = 512


def _src_chunk_size(n: int, dim: int) -> int:
    """Balanced source-chunk size whose resident arrays fit the budget."""
    max_chunk = _VMEM_RESIDENT_BUDGET // (4 * (2 * dim + 1))
    n_chunks = -(-n // max(max_chunk, _SRC_CHUNK_FLOOR))
    return -(-n // n_chunks)


def _clamp_row_block(row_block: int, b: int, dim: int) -> int:
    """Row-block size keeping the (rb, B, D) jnp broadcast tile bounded."""
    return max(8, min(row_block, b, _BCAST_TILE_BYTES // max(b * dim * 4, 1)))


class EnergyStream(NamedTuple):
    """Per-chunk on-device energy diagnostics from a sharded run.

    Matches the reference's headline observable — total (KE+PE) energy
    drift (reference: simulation.py:170-196) — computed entirely under the
    mesh: KE as a psum of local compensated sums, PE via a second ppermute
    ring pass (see ring_potential_energy)."""

    kinetic: jnp.ndarray    # (n_chunks,)
    potential: jnp.ndarray  # (n_chunks,)
    total: jnp.ndarray      # (n_chunks,)


def make_particle_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=devices)


def _tile_force(xi, ids_i, xj, gm_j, ids_j, q, cfg, log_lo, log_hi,
                impl: str = "auto"):
    """(B, D) accelerations of receivers xi due to sources xj.

    impl='pallas' uses the VMEM-tiled pair-force kernel (the production
    multi-chip path: no (B, B, D) broadcast tensor per ring step, which at
    16k-particle shards would be a GB-scale HBM intermediate);
    impl='jnp' is the broadcast reference; 'auto' picks pallas on TPU for
    shards >= 1024.
    """
    if impl == "auto" or cfg.softening_sq <= 0.0:
        impl = _resolve_tile_impl(impl, xi.shape[0], cfg)
    if impl == "pallas":
        from nbody_tpu.ops.pallas_nbody import pallas_pair_force

        # softening > 0 makes receiver/source coincidences contribute
        # exactly zero, so no id mask is needed (see ops/pallas_nbody.py).
        # Small-shard block sizes are rounded up to the TPU tile quanta
        # (sublane 8 / lane 128) — Mosaic rejects ragged blocks on real
        # hardware; pallas_pair_force pads receivers/sources to the block.
        # block_j defaults to the padding-aware lane ladder
        # (ops/pallas_nbody._pick_block_j) — fast 2048 slices when the
        # shard size cooperates, narrower when padding would dominate.
        # Sources past the VMEM residency budget split into column
        # chunks (receivers stream from HBM at any size).
        nj, dim = xj.shape
        bi = min(512, _round_up(xi.shape[0], 8))
        # The rows tile stages only the (D+1, N) source array resident —
        # no (D, N) reaction buffer (that is the SYM tiles' footprint,
        # _sym_resident_bytes). Gate and chunk on its true residency so
        # shards are not split ~40% earlier than VMEM requires.
        if 4 * (dim + 1) * nj <= _VMEM_RESIDENT_BUDGET:
            return pallas_pair_force(xi, xj, gm_j, q, cfg,
                                     log_lo=log_lo, log_hi=log_hi,
                                     block_i=bi)
        max_chunk = max(_VMEM_RESIDENT_BUDGET // (4 * (dim + 1)),
                        _SRC_CHUNK_FLOOR)
        n_chunks = -(-nj // max_chunk)
        chunk = -(-nj // n_chunks)
        acc = None
        for c0 in range(0, nj, chunk):
            sl = slice(c0, min(c0 + chunk, nj))
            a = pallas_pair_force(xi, xj[sl], gm_j[sl], q, cfg,
                                  log_lo=log_lo, log_hi=log_hi,
                                  block_i=bi)
            acc = a if acc is None else acc + a
        return acc
    diff = xj[None, :, :] - xi[:, None, :]  # (B, B, D)
    d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
    d2q = quantize_distance_squared(d2, q, log_lo=log_lo, log_hi=log_hi)
    inv_d = jax.lax.rsqrt(d2q.astype(jnp.float32))
    factor = gm_j[None, :] * (inv_d * inv_d * inv_d)
    factor = jnp.where(ids_i[:, None] == ids_j[None, :], 0.0, factor)
    return jnp.einsum("bm,bmd->bd", factor, diff)


def _ring_max_d2(pos_local, ids_local, n_total, cfg, row_block: int = 512):
    """Global max pairwise dist^2 via a max-reduction ring pass.

    Row-blocked: the per-step pair tile is (row_block, B), never (B, B) —
    a full broadcast tile at production shard sizes is HBM-infeasible
    (131k^2 f32 = 68 GB on a mesh of 1). Both sides of each tile mask
    their padded entries (d2 -> 0) exactly as the reference bounds span
    only the real (N, N) tensor.

    Half-ring sweep: dist^2 is symmetric and the result is pmax'd across
    the mesh, so block pair {a, b} only needs ONE of the two devices to
    visit it — S//2 + 1 ring steps instead of S."""
    axis_size = jax.lax.psum(1, AXIS)
    b, dim = pos_local.shape
    rb = _clamp_row_block(row_block, b, dim)
    pad = (-b) % rb
    pos_i = jnp.pad(pos_local, ((0, pad), (0, 0)))
    vi = jnp.pad(ids_local < n_total, (0, pad))
    row_blocks = (pos_i.reshape(-1, rb, dim), vi.reshape(-1, rb))

    use_pallas = (jax.default_backend() == "tpu" and b >= 1024)
    if use_pallas:
        from nbody_tpu.ops.pallas_nbody import pallas_pair_max

    # pallas_pair_max stages a (D+1, B) source array resident in VMEM and
    # emits one SMEM row per receiver block; shards past the budget split
    # BOTH axes into chunks (sources for VMEM residency, receivers to keep
    # the per-block max output within the ~1 MB SMEM space).
    max_src = max(_VMEM_RESIDENT_BUDGET // (4 * (dim + 1)), 2048)
    n_src_chunks = -(-b // max_src)
    src_chunk = -(-b // n_src_chunks)
    recv_chunk = src_chunk

    def step(s, carry):
        best, pos_j, ids_j = carry
        if use_pallas:
            step_best = jnp.float32(0.0)
            for r0 in range(0, b, recv_chunk):
                rsl = slice(r0, min(r0 + recv_chunk, b))
                for c0 in range(0, b, src_chunk):
                    sl = slice(c0, min(c0 + src_chunk, b))
                    step_best = jnp.maximum(step_best, pallas_pair_max(
                        pos_local[rsl], pos_j[sl],
                        (ids_local < n_total)[rsl],
                        ids_j[sl] < n_total,
                        block_i=min(512, _round_up(recv_chunk, 8)),
                        block_j=min(2048, _round_up(src_chunk, 128))))
        else:
            valid_j = (ids_j < n_total)[None, :]

            def tile(args):
                p_i, v_i = args
                diff = pos_j[None, :, :] - p_i[:, None, :]
                d2 = jnp.sum(diff * diff, axis=-1)
                return jnp.max(jnp.where(v_i[:, None] & valid_j, d2, 0.0))

            if row_blocks[0].shape[0] == 1:
                step_best = tile((row_blocks[0][0], row_blocks[1][0]))
            else:
                step_best = jnp.max(jax.lax.map(tile, row_blocks))
        best = jnp.maximum(best, step_best)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        pos_j = jax.lax.ppermute(pos_j, AXIS, perm)
        ids_j = jax.lax.ppermute(ids_j, AXIS, perm)
        return best, pos_j, ids_j

    best, _, _ = jax.lax.fori_loop(
        0, axis_size // 2 + 1, step,
        (jnp.float32(0.0), pos_local, ids_local))
    return jax.lax.pmax(best, AXIS) + cfg.softening_sq


# Minimum shard size for the Pallas PE tile (below it, dispatch overhead
# beats the jnp broadcast tile) and an override for tests: "auto" picks
# the kernel on TPU at production shards; "pallas"/"jnp" force a path.
_PE_PALLAS_MIN_SHARD = 4096
_PE_TILE_IMPL = "auto"


def _pe_rows_pallas_chunked(pos_i, m_i, ids_i, pos_j, m_j, ids_j,
                            cfg: SimConfig):
    """(B,) PE row sums of receivers against sources via the Pallas pair-PE
    tile, source-chunked past the VMEM residency budget."""
    from nbody_tpu.ops.pallas_nbody import pallas_pair_pe_rows

    nj, dim = pos_j.shape
    bi = min(512, _round_up(pos_i.shape[0], 8))
    if 4 * (dim + 2) * nj <= _VMEM_RESIDENT_BUDGET:
        return pallas_pair_pe_rows(pos_i, m_i, ids_i, pos_j, m_j, ids_j,
                                   cfg.softening_sq, block_i=bi)
    max_chunk = max(_VMEM_RESIDENT_BUDGET // (4 * (dim + 2)),
                    _SRC_CHUNK_FLOOR)
    n_chunks = -(-nj // max_chunk)
    chunk = -(-nj // n_chunks)
    rows = None
    for c0 in range(0, nj, chunk):
        sl = slice(c0, min(c0 + chunk, nj))
        r = pallas_pair_pe_rows(pos_i, m_i, ids_i, pos_j[sl], m_j[sl],
                                ids_j[sl], cfg.softening_sq, block_i=bi)
        rows = r if rows is None else rows + r
    return rows


def _ring_pe_local(pos_local, m_local, ids_local, n_total, cfg: SimConfig,
                   row_block: int = 1024, ids_f32_exact: bool = True,
                   compensated: bool = False):
    """Pairwise potential energy via the same ppermute ring, per device.

    U = -G * sum_{i<j} m_i m_j / sqrt(|x_i - x_j|^2 + eps^2)
    (reference: simulation.py:176-192). Every unordered pair is visited
    twice across the ring sweep (once per direction), so the full masked
    sum is halved — the same discipline as the single-device
    diagnostics.metrics.potential_energy. Padded particles carry zero mass
    and contribute nothing. Accumulation is compensated (double-double
    carry over per-tile compensated sums; the Pallas path compensates
    across rows and ring steps, with plain-f32 within-row sums). Returns
    the replicated global scalar U (already psum'd).

    Production shards (>= _PE_PALLAS_MIN_SHARD on TPU) use the
    compute-bound Pallas pair-PE tile — the jnp broadcast tile is
    memory-bound (~0.4 s/eval at 131k shards, ~31 s at 1M); the kernel
    runs it at force-kernel rates (docs/PERF.md).
    """
    axis_size = jax.lax.psum(1, AXIS)
    b, dim = pos_local.shape

    # ids_f32_exact: the Pallas tile carries ids as f32 and tests
    # EQUALITY — exact only below 2^24, where the caller (which knows the
    # padded global N) must disable it or adjacent ids would collide and
    # silently drop real pair terms.
    # compensated=True (the emulated-f64 baseline's precision anchor)
    # forces the fully compensated jnp tile: the Pallas tile's plain-f32
    # within-row sums add ~sqrt(B)*eps per-row noise (~1e-5 relative at
    # 1M shards) the anchor must not carry (advisor r3).
    use_pallas_pe = not compensated and (
        cfg.softening_sq > 0.0) and ids_f32_exact and (
        _PE_TILE_IMPL == "pallas"
        or (_PE_TILE_IMPL == "auto" and jax.default_backend() == "tpu"
            and b >= _PE_PALLAS_MIN_SHARD))
    if use_pallas_pe:
        def pe_step(s, carry):
            acc, pos_j, m_j, ids_j = carry
            rows = _pe_rows_pallas_chunked(pos_local, m_local, ids_local,
                                           pos_j, m_j, ids_j, cfg)
            acc = dd.dd_add(acc, dd.dd_sum(rows))
            perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
            pos_j = jax.lax.ppermute(pos_j, AXIS, perm)
            m_j = jax.lax.ppermute(m_j, AXIS, perm)
            ids_j = jax.lax.ppermute(ids_j, AXIS, perm)
            return acc, pos_j, m_j, ids_j

        acc0 = dd.DD(jnp.float32(0.0), jnp.float32(0.0))
        acc, _, _, _ = jax.lax.fori_loop(
            0, axis_size, pe_step, (acc0, pos_local, m_local, ids_local))
        local = acc.hi + acc.lo
        return -0.5 * cfg.G * jax.lax.psum(local, AXIS)

    rb = _clamp_row_block(row_block, b, dim)
    pad = (-b) % rb
    # Row-block pads sit at the NEGATIVE far sentinel: zero-filled pads
    # at the origin hit rsqrt(0) = inf against a real particle at the
    # origin under zero softening (0 * inf = NaN poisons the whole sum),
    # and +_PAD_FAR would coincide with the shard's phantom rows — the
    # opposite sign keeps every pad/phantom/real distance finite.
    pos_i = jnp.pad(pos_local, ((0, pad), (0, 0)),
                    constant_values=-_PAD_FAR)
    # Padded receiver rows get zero mass so they drop out of the sum.
    m_i = jnp.pad(m_local, (0, pad))
    # Padded receiver ids collide with nothing (they sit past every real
    # and every shard-padding id), keeping the self-pair mask exact.
    ids_i = jnp.pad(ids_local, (0, pad), constant_values=jnp.iinfo(jnp.int32).max)
    row_blocks = (pos_i.reshape(-1, rb, dim), m_i.reshape(-1, rb),
                  ids_i.reshape(-1, rb))

    def ring_step(s, carry):
        acc, pos_j, m_j, ids_j = carry

        def tile(args):
            p_i, mm_i, ii = args
            diff = pos_j[None, :, :] - p_i[:, None, :]  # (rb, B, D)
            d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
            pair = mm_i[:, None] * m_j[None, :] * jax.lax.rsqrt(d2)
            # Self-pairs AND padding/phantom pairs are masked by id:
            # unlike the force tiles (per-row outputs, phantom rows
            # zeroed afterwards), this tile reduces to one scalar, so a
            # phantom-vs-phantom 0 * rsqrt(0) = NaN (coincident sentinel
            # positions under zero softening) would poison the whole sum.
            invalid = ((ii[:, None] == ids_j[None, :])
                       | (ii[:, None] >= n_total)
                       | (ids_j[None, :] >= n_total))
            pair = jnp.where(invalid, 0.0, pair)
            s_dd = dd.dd_sum_chunked(pair.reshape(-1))
            return s_dd.hi + s_dd.lo

        if row_blocks[0].shape[0] == 1:
            parts = tile((row_blocks[0][0], row_blocks[1][0],
                          row_blocks[2][0]))[None]
        else:
            parts = jax.lax.map(tile, row_blocks)
        step_sum = dd.dd_sum(parts)
        acc = dd.dd_add(acc, step_sum)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        pos_j = jax.lax.ppermute(pos_j, AXIS, perm)
        m_j = jax.lax.ppermute(m_j, AXIS, perm)
        ids_j = jax.lax.ppermute(ids_j, AXIS, perm)
        return acc, pos_j, m_j, ids_j

    acc0 = dd.DD(jnp.float32(0.0), jnp.float32(0.0))
    acc, _, _, _ = jax.lax.fori_loop(
        0, axis_size, ring_step, (acc0, pos_local, m_local, ids_local))
    local = acc.hi + acc.lo
    return -0.5 * cfg.G * jax.lax.psum(local, AXIS)


def _ring_accelerations_local(pos_local, gm_local, ids_local, n_total,
                              q: Quantizer, cfg: SimConfig,
                              quantize_forces: bool,
                              tile_impl: str = "auto"):
    """Per-device body: accelerations for the resident receiver block.

    Runs inside shard_map. ``ids_local`` are global particle indices
    (>= n_total marks padding; padded sources carry zero G*m).
    """
    axis_size = jax.lax.psum(1, AXIS)

    if q.is_int:
        max_d2 = _ring_max_d2(pos_local, ids_local, n_total, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
    else:
        log_lo = log_hi = None

    def step(s, carry):
        acc, pos_j, gm_j, ids_j = carry
        acc = acc + _tile_force(pos_local, ids_local, pos_j, gm_j, ids_j,
                                q, cfg, log_lo, log_hi, impl=tile_impl)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        pos_j = jax.lax.ppermute(pos_j, AXIS, perm)
        gm_j = jax.lax.ppermute(gm_j, AXIS, perm)
        ids_j = jax.lax.ppermute(ids_j, AXIS, perm)
        return acc, pos_j, gm_j, ids_j

    acc0 = jnp.zeros_like(pos_local)
    acc, _, _, _ = jax.lax.fori_loop(
        0, axis_size, step, (acc0, pos_local, gm_local, ids_local))

    # Freeze phantom (padding) receivers: they must neither integrate nor
    # contribute to the quantization bounds (reference bounds span exactly
    # the real (N, D) force tensor).
    valid = (ids_local < n_total)[:, None]
    acc = jnp.where(valid, acc, 0.0)

    if quantize_forces and q.is_int:
        # Reference semantics: linear grid over the *global* acc min/max
        # (reference: quantization.py:74-88 on the full (N, D) tensor).
        lo = jax.lax.pmin(jnp.min(jnp.where(valid, acc, jnp.inf)), AXIS)
        hi = jax.lax.pmax(jnp.max(jnp.where(valid, acc, -jnp.inf)), AXIS)
        acc = quantize_force(acc, q, lo=lo, hi=hi)
        acc = jnp.where(valid, acc, 0.0)
    return acc


def _resolve_tile_impl(tile_impl: str, shard_size: int,
                       cfg: SimConfig) -> str:
    if cfg.softening_sq <= 0.0:
        # unsoftened self-pairs need the id mask (inf * 0 = NaN otherwise)
        if tile_impl == "pallas":
            import warnings

            warnings.warn(
                "explicit tile_impl='pallas' downgraded to 'jnp': zero "
                "softening needs the id-masked broadcast tile, which "
                "builds (B, B, D) HBM intermediates — at production "
                "shard sizes this will OOM; use softening > 0 for the "
                "Pallas ring tile", stacklevel=3)
        return "jnp"
    if tile_impl == "auto":
        return ("pallas" if jax.default_backend() == "tpu"
                and shard_size >= 1024 else "jnp")
    return tile_impl


def _tile_force_sym(xi, gm_i, ids_i, xj, gm_j, ids_j, q, cfg,
                    log_lo, log_hi, impl: str, uniform_gm: bool = False):
    """Newton's-third-law pair tile between two disjoint blocks.

    Returns ``(acc_on_i, reaction_on_j)`` from ONE evaluation of the pair
    weights — the per-step tile of the half-ring schedule. ``impl`` must
    already be resolved ('pallas' | 'jnp'). ``uniform_gm`` is the
    caller-asserted equal-mass fast path (phantom-free shards only — see
    run_steps_sharded); the jnp tile ignores it (identical math either
    way)."""
    if impl == "pallas":
        from nbody_tpu.ops.pallas_nbody import pallas_pair_force_sym

        nj, dim = xj.shape
        bi = min(256, _round_up(xi.shape[0], 8))
        if _sym_resident_bytes(nj, dim) <= _VMEM_RESIDENT_BUDGET:
            return pallas_pair_force_sym(
                xi, gm_i, xj, gm_j, q, cfg, log_lo=log_lo, log_hi=log_hi,
                block_i=bi, uniform_gm=uniform_gm)
        # Source-chunked sym tile: shards past the pair tile's VMEM
        # residency limit split the VISITING block into column chunks
        # (receivers stream from HBM at any size; the reaction buffer is
        # what must stay resident, so it is chunked with its sources).
        chunk = _src_chunk_size(nj, dim)
        rows = None
        cols = []
        for c0 in range(0, nj, chunk):
            sl = slice(c0, min(c0 + chunk, nj))
            r, cc = pallas_pair_force_sym(
                xi, gm_i, xj[sl], gm_j[sl], q, cfg,
                log_lo=log_lo, log_hi=log_hi, block_i=bi,
                uniform_gm=uniform_gm)
            rows = r if rows is None else rows + r
            cols.append(cc)
        return rows, jnp.concatenate(cols, axis=0)
    diff = xj[None, :, :] - xi[:, None, :]  # (Bi, Bj, D)
    d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
    d2q = quantize_distance_squared(d2, q, log_lo=log_lo, log_hi=log_hi)
    inv_d = jax.lax.rsqrt(d2q.astype(jnp.float32))
    w = inv_d * inv_d * inv_d
    w = jnp.where(ids_i[:, None] == ids_j[None, :], 0.0, w)
    acc_i = jnp.einsum("bm,bmd->bd", gm_j[None, :] * w, diff)
    reac_j = -jnp.einsum("bm,bmd->md", gm_i[:, None] * w, diff)
    return acc_i, reac_j


def _ring_accelerations_sym_local(pos_local, gm_local, ids_local, n_total,
                                  q: Quantizer, cfg: SimConfig,
                                  quantize_forces: bool,
                                  tile_impl: str = "auto",
                                  ext_bounds=None,
                                  uniform_gm: bool = False):
    """Half-ring Newton's-third-law schedule: every unordered pair once.

    The plain ring (``_ring_accelerations_local``) rotates source blocks
    through all S positions, evaluating every ordered pair — reaction
    reuse cannot cross shard boundaries there because the partner lives
    on another device. This schedule closes that gap: source blocks
    travel only HALF way around the ring (S//2 hops), each visited tile
    is evaluated once for both its direct and reaction forces
    (ops/pallas_nbody.pallas_pair_force_sym), and the reaction
    accumulator rides along with the traveling block; one final
    ``ppermute`` by -S//2 delivers every block's reactions home. The
    diagonal block uses the single-device symmetric kernel. Total pair
    work: ~N^2/2 evaluations ring-wide vs the plain ring's N^2.

    For an even ring, the half-distance step is seen from both ends;
    only the lower half of the ring computes it (lax.cond — the skipped
    devices genuinely idle rather than compute-and-mask).
    """
    axis_size = jax.lax.psum(1, AXIS)
    my = jax.lax.axis_index(AXIS)

    if ext_bounds is not None:
        # bounds-reuse mode: the caller owns the log-grid bounds (see
        # run_steps_sharded's bounds_every)
        log_lo, log_hi = ext_bounds
    elif q.is_int:
        max_d2 = _ring_max_d2(pos_local, ids_local, n_total, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
    else:
        log_lo = log_hi = None

    impl = _resolve_tile_impl(tile_impl, pos_local.shape[0], cfg)

    # Diagonal (resident) block: intra-shard pairs, Newton-halved by the
    # single-device symmetric kernel when on TPU; shards past the sym
    # kernel's VMEM residency limit use the chunked ladder (same as the
    # single-device large-N path, with the ring's global int bounds).
    if impl == "pallas":
        b, dim_l = pos_local.shape
        if _sym_resident_bytes(b, dim_l) <= _VMEM_RESIDENT_BUDGET:
            from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym

            acc = pallas_accelerations_sym(
                pos_local, None, q, cfg, quantize_forces=False,
                block=min(512, _round_up(b, 8)),
                log_lo=log_lo, log_hi=log_hi, gm=gm_local,
                uniform_gm=uniform_gm)
        else:
            from nbody_tpu.ops.pallas_nbody import (
                pallas_accelerations_sym_chunked)

            acc = pallas_accelerations_sym_chunked(
                pos_local, None, q, cfg, quantize_forces=False,
                log_lo=log_lo, log_hi=log_hi, gm=gm_local,
                uniform_gm=uniform_gm)
    else:
        acc = _tile_force(pos_local, ids_local, pos_local, gm_local,
                          ids_local, q, cfg, log_lo, log_hi, impl="jnp")

    half = axis_size // 2
    perm_fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def rotate(pos_j, gm_j, ids_j, racc):
        pos_j = jax.lax.ppermute(pos_j, AXIS, perm_fwd)
        gm_j = jax.lax.ppermute(gm_j, AXIS, perm_fwd)
        ids_j = jax.lax.ppermute(ids_j, AXIS, perm_fwd)
        racc = jax.lax.ppermute(racc, AXIS, perm_fwd)
        return pos_j, gm_j, ids_j, racc

    def body(k, carry):
        acc, pos_j, gm_j, ids_j, racc = carry
        pos_j, gm_j, ids_j, racc = rotate(pos_j, gm_j, ids_j, racc)
        d_acc, d_reac = _tile_force_sym(pos_local, gm_local, ids_local,
                                        pos_j, gm_j, ids_j, q, cfg,
                                        log_lo, log_hi, impl,
                                        uniform_gm=uniform_gm)
        return acc + d_acc, pos_j, gm_j, ids_j, racc + d_reac

    racc0 = jnp.zeros_like(pos_local)
    carry = (acc, pos_local, gm_local, ids_local, racc0)
    # Unconditional steps: ring distances 1..half (odd S) / 1..half-1
    # (even S — the half-distance step is duplicated and handled below).
    n_uncond = half + 1 if axis_size % 2 == 1 else half
    carry = jax.lax.fori_loop(1, n_uncond, body, carry)
    acc, pos_j, gm_j, ids_j, racc = carry

    if axis_size % 2 == 0 and axis_size > 1:
        pos_j, gm_j, ids_j, racc = rotate(pos_j, gm_j, ids_j, racc)

        def compute(_):
            return _tile_force_sym(pos_local, gm_local, ids_local,
                                   pos_j, gm_j, ids_j, q, cfg,
                                   log_lo, log_hi, impl,
                                   uniform_gm=uniform_gm)

        def skip(_):
            return jnp.zeros_like(acc), jnp.zeros_like(racc)

        d_acc, d_reac = jax.lax.cond(my < half, compute, skip, None)
        acc = acc + d_acc
        racc = racc + d_reac

    # The traveling reaction buffer is `half` hops from home; one
    # permutation delivers every block's reactions back to its owner.
    if half:
        perm_back = [(i, (i - half) % axis_size) for i in range(axis_size)]
        acc = acc + jax.lax.ppermute(racc, AXIS, perm_back)

    valid = (ids_local < n_total)[:, None]
    acc = jnp.where(valid, acc, 0.0)

    if quantize_forces and q.is_int:
        lo = jax.lax.pmin(jnp.min(jnp.where(valid, acc, jnp.inf)), AXIS)
        hi = jax.lax.pmax(jnp.max(jnp.where(valid, acc, -jnp.inf)), AXIS)
        acc = quantize_force(acc, q, lo=lo, hi=hi)
        acc = jnp.where(valid, acc, 0.0)
    return acc


def _ring_accelerations_dd_local(pos_local, gm_local, ids_local, n_total,
                                 cfg: SimConfig, row_block: int = 512):
    """Ring force for the emulated-f64 baseline: compensated accumulation.

    Multi-chip equivalent of ``forces.baseline_accelerations_dd``
    (reference baseline semantics: simulation.py:104-118 under float64):
    f32 pairwise terms, double-double accumulation — per ring step a
    dd-summed partial over the visiting source block, dd-added into a
    traveling DD accumulator, so the cross-shard sum carries the same
    ~48-bit effective mantissa as the single-device baseline.

    ``pos_local`` is the f32 rounding of the local dd positions. Returns
    f32 accelerations for the local receiver block (phantom rows zeroed).
    """
    axis_size = jax.lax.psum(1, AXIS)
    b, dim = pos_local.shape
    rb = _clamp_row_block(row_block, b, dim)
    pad = (-b) % rb
    # Negative far-sentinel row pads: see _ring_pe_local.
    pos_i = jnp.pad(pos_local, ((0, pad), (0, 0)),
                    constant_values=-_PAD_FAR)
    ids_i = jnp.pad(ids_local, (0, pad),
                    constant_values=jnp.iinfo(jnp.int32).max)
    row_blocks = (pos_i.reshape(-1, rb, dim), ids_i.reshape(-1, rb))

    def ring_step(s, carry):
        acc_hi, acc_lo, pos_j, gm_j, ids_j = carry

        def tile(args):
            p_i, ii = args
            diff = pos_j[None, :, :] - p_i[:, None, :]  # (rb, B, D)
            d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
            inv_d = jax.lax.rsqrt(d2)
            factor = gm_j[None, :] * (inv_d * inv_d * inv_d)
            factor = jnp.where(ii[:, None] == ids_j[None, :], 0.0, factor)
            contrib = factor[:, :, None] * diff  # (rb, B, D)
            s_dd = dd.dd_sum_chunked(contrib, axis=1)  # DD (rb, D)
            return s_dd.hi, s_dd.lo

        if row_blocks[0].shape[0] == 1:
            hi, lo = tile((row_blocks[0][0], row_blocks[1][0]))
        else:
            hi, lo = jax.lax.map(tile, row_blocks)
        acc = dd.dd_add(dd.DD(acc_hi, acc_lo),
                        dd.DD(hi.reshape(-1, dim), lo.reshape(-1, dim)))
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        pos_j = jax.lax.ppermute(pos_j, AXIS, perm)
        gm_j = jax.lax.ppermute(gm_j, AXIS, perm)
        ids_j = jax.lax.ppermute(ids_j, AXIS, perm)
        return acc.hi, acc.lo, pos_j, gm_j, ids_j

    z = jnp.zeros((b + pad, dim), jnp.float32)
    acc_hi, acc_lo, _, _, _ = jax.lax.fori_loop(
        0, axis_size, ring_step, (z, z, pos_local, gm_local, ids_local))
    acc = (acc_hi + acc_lo)[:b]
    valid = (ids_local < n_total)[:, None]
    return jnp.where(valid, acc, 0.0)


def _pad_to_shards(x, n_shards, fill=0.0):
    """Pad the leading axis to a multiple of n_shards. POSITION arrays
    must pass fill=_PAD_FAR: a phantom at the origin under zero softening
    collides with any real particle at the origin (rsqrt(0) = inf, and
    0 * inf = NaN slips past the gm=0 guard — the same hazard the
    single-device kernels fixed with far-sentinel padding). At the far
    sentinel every phantom pair weight is finite/zero in all modes, and
    the bounds/PE masks already exclude phantoms by id."""
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
    return x


def _make_ring_force(q: Quantizer, cfg: SimConfig, gm_l, ids_l, n_total,
                     quantize_forces: bool, schedule: str,
                     bounds_reuse: bool, pos_l, uniform_gm: bool = False):
    """Per-device (force, bounds_of, b0) for the sharded leapfrog scans.

    ``force(p, b)`` ignores ``b`` unless bounds-reuse is active, where
    ``b`` is the externally owned log-grid bounds. The ring runners need
    a REAL b0 (unlike the single-device scans): the entry force at the
    pre-drift positions already consumes it. ``uniform_gm`` reaches the
    sym schedule's tiles only (the rows schedule has no shared-product
    path)."""
    def bounds_of(p):
        max_d2 = _ring_max_d2(p, ids_l, n_total, cfg)
        return dist_sq_log_bounds(q, max_d2, cfg.softening_sq)

    if bounds_reuse:
        def force(p, b):
            return _ring_accelerations_sym_local(
                p, gm_l, ids_l, n_total, q, cfg, quantize_forces,
                ext_bounds=b, uniform_gm=uniform_gm)

        b0 = bounds_of(pos_l)
    elif schedule == "sym":
        def force(p, b):
            return _ring_accelerations_sym_local(
                p, gm_l, ids_l, n_total, q, cfg, quantize_forces,
                uniform_gm=uniform_gm)

        b0 = (jnp.float32(0.0), jnp.float32(0.0))  # unused carry slot
    else:
        def force(p, b):
            return _ring_accelerations_local(p, gm_l, ids_l, n_total, q,
                                             cfg, quantize_forces)

        b0 = (jnp.float32(0.0), jnp.float32(0.0))  # unused carry slot
    return force, bounds_of, b0


def _make_ring_step(cfg: SimConfig, force, bounds_of, bounds_reuse: bool,
                    bounds_every: int):
    """KDK scan body over the sharded carry (p, v, a, bounds, step_idx)."""
    half_dt = cfg.dt * 0.5

    def one_step(carry, _):
        p, v, a, b, k = carry
        v = v + a * half_dt
        p = p + v * cfg.dt
        if bounds_reuse:
            # amortised global-bounds pass: recompute every k-th step on
            # the freshly drifted positions, reuse in between
            b = jax.lax.cond(k % bounds_every == 0, bounds_of,
                             lambda _: b, p)
        a = force(p, b)
        v = v + a * half_dt
        return (p, v, a, b, k + 1), None

    return one_step


@_guard_uniform_gm(0)
@functools.partial(jax.jit,
                   static_argnames=("q", "cfg", "quantize_forces", "mesh",
                                    "num_steps", "steps_per_chunk",
                                    "gather", "schedule", "n_total",
                                    "bounds_every", "uniform_gm"))
def run_steps_sharded(state: ParticleState, q: Quantizer, cfg: SimConfig,
                      mesh: Mesh, num_steps: int,
                      quantize_forces: bool = False,
                      steps_per_chunk: int = 0,
                      gather: bool = True,
                      schedule: str = "sym",
                      n_total: int | None = None,
                      bounds_every: int = 1,
                      uniform_gm: bool = False):
    """Sharded leapfrog run: scan over ticks with the ring force inside.

    Returns (final ParticleState, per-chunk EnergyStream of
    kinetic/potential/total energies — the reference's headline drift
    observable, simulation.py:170-196, computed under the mesh).
    ``steps_per_chunk=0`` disables energy snapshots. ``gather=False``
    leaves the returned state sharded and padded to the shard boundary
    (no per-call all-gather; padded rows carry zero mass).
    ``schedule='sym'`` (default) uses the half-ring Newton's-third-law
    schedule (~half the pair work of ``schedule='rows'``, the plain
    full-rotation ring kept for comparison/reproduction of round-1 runs).
    ``n_total`` marks the real particle count when ``state`` is already
    padded to the shard boundary (a resident gather=False state being
    chained); rows past it are phantoms excluded from quantization bounds.

    ``bounds_every=k`` (int-sim modes, sym schedule) recomputes the
    global log-grid bounds ring pass every k-th step instead of every
    force evaluation, amortising its cost. k=1 (default) is EXACT
    reference semantics (tensor-global bounds per evaluation,
    reference: quantization.py:112-121); k>1 trades a bounded bin-edge
    shift on non-recompute steps for throughput — see docs/PERF.md for
    the measured drift-envelope impact before enabling it.

    ``uniform_gm=True`` is the caller-asserted equal-mass fast path
    (see ops/pallas_nbody.pallas_accelerations_sym): the sym schedule's
    diagonal and pair tiles reduce one shared w*diff product per dim.
    Auto-disabled whenever the shard layout carries phantom padding rows
    (N % n_shards != 0) — phantoms rely on gm=0 to stay inert, which the
    uniform kernels have no per-pair factor to honor.
    """
    if n_total is None:
        n_total = state.positions.shape[0]
    dim = state.positions.shape[1]
    n_shards = mesh.shape[AXIS]

    pos = _pad_to_shards(state.positions, n_shards, fill=_PAD_FAR)
    if pos.shape[0] != n_total:
        uniform_gm = False  # phantom rows need gm=0 to stay inert
    vel = _pad_to_shards(state.velocities, n_shards)
    masses = _pad_to_shards(state.masses, n_shards)
    gmass = cfg.G * masses
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    pspec = P(AXIS)
    bounds_reuse = q.is_int and bounds_every > 1 and schedule == "sym"
    # Pallas PE tile carries ids as f32: exact only below 2^24 total rows.
    ids_exact = pos.shape[0] <= (1 << 24)

    def device_fn(pos_l, vel_l, gm_l, m_l, ids_l):
        force, bounds_of, b0 = _make_ring_force(
            q, cfg, gm_l, ids_l, n_total, quantize_forces, schedule,
            bounds_reuse, pos_l, uniform_gm)
        acc_l = force(pos_l, b0)
        one_step = _make_ring_step(cfg, force, bounds_of, bounds_reuse,
                                   bounds_every)

        def chunk(carry, _):
            carry, _ = jax.lax.scan(one_step, carry, None,
                                    length=max(min(steps_per_chunk,
                                                   num_steps), 1))
            p, v, a, _, _ = carry
            # On-device sharded total energy (the reference's headline
            # observable, simulation.py:170-196): KE via a psum of local
            # compensated sums, PE via a second ring pass.
            valid = (ids_l < n_total).astype(jnp.float32)
            v_sq = jnp.sum(v * v, axis=-1)
            ke_dd = dd.dd_dot_f32(m_l * valid, v_sq)
            ke = 0.5 * jax.lax.psum(ke_dd.hi + ke_dd.lo, AXIS)
            pe = _ring_pe_local(p, m_l, ids_l, n_total, cfg,
                                ids_f32_exact=ids_exact)
            return carry, EnergyStream(ke, pe, ke + pe)

        carry0 = (pos_l, vel_l, acc_l, b0, jnp.asarray(0, jnp.int32))
        if steps_per_chunk:
            spc = min(steps_per_chunk, num_steps)
            n_chunks = num_steps // spc
            remainder = num_steps - n_chunks * spc
            carry, energies = jax.lax.scan(chunk, carry0, None,
                                           length=n_chunks)
            if remainder:  # run the tail ticks (no snapshot for them)
                carry, _ = jax.lax.scan(one_step, carry, None,
                                        length=remainder)
        else:
            carry, _ = jax.lax.scan(one_step, carry0, None,
                                    length=num_steps)
            z = jnp.zeros((1,), jnp.float32)
            energies = EnergyStream(z, z, z)
        p, v, a, _, _ = carry
        return p, v, a, energies

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, pspec),
        out_specs=(pspec, pspec, pspec,
                   EnergyStream(P(), P(), P())),
        check_vma=False,
    )
    pos_out, vel_out, acc_out, energies = fn(pos, vel, gmass, masses, ids)

    if gather:
        def _trim(x):
            # Replicate (cheap all-gather of N*D floats) before the tail
            # slice: slicing a shard-misaligned boundary directly is
            # ill-sharded. The mesh axes are Explicit-typed, so use reshard
            # (a sharding constraint would be a no-op on an explicitly
            # sharded value).
            x = jax.sharding.reshard(x, NamedSharding(mesh, P()))
            return x[:n_total]
    else:
        # Keep the state sharded (padded to the shard boundary): at 1M+
        # particles the per-call all-gather dominates, and callers that
        # chain run_steps_sharded calls or export rarely should gather
        # only at the end (export_sharded_state / a final gather=True
        # call). Padded rows carry zero mass and zero force.
        def _trim(x):
            return x

    new_state = ParticleState(
        positions=_trim(pos_out),
        velocities=_trim(vel_out),
        masses=_trim(masses),  # replicate: plain pass-through may pick up
                               # a sharded layout from the mesh context
        accelerations=_trim(acc_out),
        tick=state.tick + num_steps,
    )
    return new_state, energies


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "n_total",
                                             "compensated"))
def ring_potential_energy(positions, masses, cfg: SimConfig, mesh: Mesh,
                          n_total: int | None = None,
                          compensated: bool = False):
    """Sharded pairwise potential energy (library entry).

    Multi-chip equivalent of diagnostics.metrics.potential_energy
    (reference semantics: simulation.py:176-192): particles sharded over
    the mesh, pair terms accumulated by a ppermute ring with compensated
    sums, halved full-matrix discipline, psum'd to a replicated scalar.

    ``n_total`` marks the real particle count when ``positions`` is an
    already-padded resident state (a gather=False run being probed):
    rows past it are phantoms and must be id-masked — inferring the
    count from the padded shape would treat coincident sentinel phantoms
    as real pairs (0 * rsqrt(0) = NaN under zero softening).

    ``compensated=True`` forces the fully compensated jnp tile (baseline
    precision-anchor probes; see _ring_pe_local).
    """
    if n_total is None:
        n_total = positions.shape[0]
    n_shards = mesh.shape[AXIS]
    pos = _pad_to_shards(positions, n_shards, fill=_PAD_FAR)
    m = _pad_to_shards(masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    fn = shard_map(
        functools.partial(_ring_pe_local, n_total=n_total, cfg=cfg,
                          ids_f32_exact=pos.shape[0] <= (1 << 24),
                          compensated=compensated),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(pos, m, ids)


@_guard_uniform_gm(1)
@functools.partial(jax.jit, static_argnames=("q", "cfg", "mesh",
                                             "quantize_forces",
                                             "tile_impl", "schedule",
                                             "uniform_gm"))
def ring_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                       mesh: Mesh, quantize_forces: bool = False,
                       tile_impl: str = "auto", schedule: str = "sym",
                       uniform_gm: bool = False):
    """One sharded force evaluation (library entry for tests/benchmarks).

    Module-level jit: an unjitted shard_map closure would retrace AND
    recompile on every call (measured ~4 s/call through this box's
    remote-compile service at N=131k). ``schedule='sym'`` is the
    half-ring Newton's-third-law schedule; 'rows' the plain ring.
    ``uniform_gm`` follows run_steps_sharded (sym schedule only;
    auto-disabled on phantom-padded layouts)."""
    n_total = positions.shape[0]
    n_shards = mesh.shape[AXIS]
    pos = _pad_to_shards(positions, n_shards, fill=_PAD_FAR)
    if pos.shape[0] != n_total:
        uniform_gm = False  # phantom rows need gm=0 to stay inert
    gmass = cfg.G * _pad_to_shards(masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    fn = shard_map(
        functools.partial(_ring_accelerations_sym_local,
                          n_total=n_total, q=q,
                          cfg=cfg, quantize_forces=quantize_forces,
                          tile_impl=tile_impl, uniform_gm=uniform_gm)
        if schedule == "sym" else
        functools.partial(_ring_accelerations_local,
                          n_total=n_total, q=q,
                          cfg=cfg, quantize_forces=quantize_forces,
                          tile_impl=tile_impl),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    )
    acc = fn(pos, gmass, ids)
    acc = jax.sharding.reshard(acc, NamedSharding(mesh, P()))
    return acc[:n_total]


# --------------------------------------------------------------------------
# Sharded flagship workflow: baseline (emulated-f64) runs + full-metric
# history runs (the reference's main.py precision-ladder compare,
# reference: main.py:99-208, simulation.py:199-250, under the mesh)
# --------------------------------------------------------------------------

def _pad_baseline_to_shards(state: BaselineState, n_shards: int):
    """Pad every leaf of a BaselineState to the shard boundary."""
    ph = _pad_to_shards(state.positions.hi, n_shards, fill=_PAD_FAR)
    pl = _pad_to_shards(state.positions.lo, n_shards)
    vh = _pad_to_shards(state.velocities.hi, n_shards)
    vl = _pad_to_shards(state.velocities.lo, n_shards)
    m = _pad_to_shards(state.masses, n_shards)
    return ph, pl, vh, vl, m


def _dd_one_step(cfg: SimConfig, force):
    """One KDK step in double-double state (models.direct.
    leapfrog_step_baseline semantics) as a scan body over flat leaves."""
    half_dt = jnp.float32(cfg.dt * 0.5)

    def one_step(carry, _):
        ph, pl, vh, vl, a = carry
        v = dd.dd_add_f32(dd.DD(vh, vl), a * half_dt)
        p = dd.dd_add(dd.DD(ph, pl), dd.dd_mul_f32(v, jnp.float32(cfg.dt)))
        a = force(p.hi + p.lo)
        v = dd.dd_add_f32(v, a * half_dt)
        return (p.hi, p.lo, v.hi, v.lo, a), None

    return one_step


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "num_steps",
                                             "gather", "n_total"))
def run_steps_sharded_baseline(state: BaselineState, cfg: SimConfig,
                               mesh: Mesh, num_steps: int,
                               gather: bool = True,
                               n_total: int | None = None) -> BaselineState:
    """Sharded leapfrog run of the emulated-f64 baseline.

    Double-double positions/velocities sharded over the ring; the force is
    ``_ring_accelerations_dd_local`` (compensated cross-shard accumulation
    matching ``forces.baseline_accelerations_dd``). ``gather=False`` keeps
    the returned state padded + sharded for chaining.
    """
    if n_total is None:
        n_total = state.positions.hi.shape[0]
    n_shards = mesh.shape[AXIS]
    ph, pl, vh, vl, m = _pad_baseline_to_shards(state, n_shards)
    gmass = cfg.G * m
    ids = jnp.arange(ph.shape[0], dtype=jnp.int32)
    pspec = P(AXIS)

    def device_fn(ph_l, pl_l, vh_l, vl_l, gm_l, ids_l):
        def force(p_f32):
            return _ring_accelerations_dd_local(p_f32, gm_l, ids_l,
                                                n_total, cfg)

        acc_l = force(ph_l + pl_l)
        carry, _ = jax.lax.scan(_dd_one_step(cfg, force),
                                (ph_l, pl_l, vh_l, vl_l, acc_l), None,
                                length=num_steps)
        return carry

    fn = shard_map(device_fn, mesh=mesh, in_specs=(pspec,) * 6,
                   out_specs=(pspec,) * 5, check_vma=False)
    ph_o, pl_o, vh_o, vl_o, acc_o = fn(ph, pl, vh, vl, gmass, ids)

    if gather:
        def _trim(x):
            x = jax.sharding.reshard(x, NamedSharding(mesh, P()))
            return x[:n_total]
    else:
        def _trim(x):
            return x

    return BaselineState(
        positions=dd.DD(_trim(ph_o), _trim(pl_o)),
        velocities=dd.DD(_trim(vh_o), _trim(vl_o)),
        masses=_trim(m),
        accelerations=_trim(acc_o),
        tick=state.tick + num_steps,
    )


def _struct_snapshot(pg, vg, m_full, tick, ke, pe, cfg: SimConfig,
                     num_bins: int) -> metrics_lib.Snapshot:
    """Full metrics Snapshot from replicated (gathered) trimmed state plus
    mesh-native energies. The structure diagnostics are O(N log N) on the
    gathered arrays — identical math to the single-device
    ``diagnostics.metrics.snapshot`` — while the O(N^2) potential energy
    comes from the sharded ring pass."""
    curve = metrics_lib.rotation_curve(pg, vg, num_bins=num_bins)
    return metrics_lib.Snapshot(
        tick=tick,
        kinetic=ke,
        potential=pe,
        total=ke + pe,
        radius_90=metrics_lib.galaxy_radius(pg, 90.0),
        bound_frac=metrics_lib.bound_fraction(pg, vg, m_full, cfg.G),
        dispersion=metrics_lib.velocity_dispersion(vg),
        curve_radii=curve.radii,
        curve_velocities=curve.velocities,
        curve_counts=curve.counts,
    )


_SNAP_REPLICATED = metrics_lib.Snapshot(*([P()] * 10))


@_guard_uniform_gm(0)
@functools.partial(jax.jit,
                   static_argnames=("q", "cfg", "mesh", "quantize_forces",
                                    "steps_per_chunk", "num_chunks",
                                    "num_bins", "schedule", "n_total",
                                    "bounds_every", "uniform_gm"))
def run_with_snapshots_sharded(state: ParticleState, q: Quantizer,
                               cfg: SimConfig, mesh: Mesh,
                               steps_per_chunk: int, num_chunks: int,
                               quantize_forces: bool = False,
                               num_bins: int = 20,
                               schedule: str = "sym",
                               n_total: int | None = None,
                               bounds_every: int = 1,
                               uniform_gm: bool = False):
    """Sharded history run: the multi-chip ``models.direct.
    run_with_snapshots`` (reference: simulation.py:145-196,229-242).

    One jitted program: per chunk, ``steps_per_chunk`` ring-force leapfrog
    ticks, then a full metrics Snapshot — KE from a compensated psum, PE
    from the ppermute energy ring (the EnergyStream observables), structure
    metrics from an all-gathered frame (2·N·D floats over ICI per chunk
    boundary, negligible next to the N^2/S force work). Returns
    ``(resident padded+sharded state, Snapshots stacked over chunks,
    position frames (num_chunks, n_total, D))``.
    """
    if n_total is None:
        n_total = state.positions.shape[0]
    n_shards = mesh.shape[AXIS]
    pos = _pad_to_shards(state.positions, n_shards, fill=_PAD_FAR)
    if pos.shape[0] != n_total:
        uniform_gm = False  # phantom rows need gm=0 to stay inert
    vel = _pad_to_shards(state.velocities, n_shards)
    masses = _pad_to_shards(state.masses, n_shards)
    gmass = cfg.G * masses
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    pspec = P(AXIS)
    bounds_reuse = q.is_int and bounds_every > 1 and schedule == "sym"
    ids_exact = pos.shape[0] <= (1 << 24)  # f32-id PE tile exactness

    def device_fn(pos_l, vel_l, gm_l, m_l, ids_l, tick0):
        force, bounds_of, b0 = _make_ring_force(
            q, cfg, gm_l, ids_l, n_total, quantize_forces, schedule,
            bounds_reuse, pos_l, uniform_gm)
        acc_l = force(pos_l, b0)
        m_full = jax.lax.all_gather(m_l, AXIS, tiled=True)[:n_total]
        one_step = _make_ring_step(cfg, force, bounds_of, bounds_reuse,
                                   bounds_every)

        def chunk(carry, i):
            carry, _ = jax.lax.scan(one_step, carry, None,
                                    length=steps_per_chunk)
            p, v, a = carry[:3]
            pg = jax.lax.all_gather(p, AXIS, tiled=True)[:n_total]
            vg = jax.lax.all_gather(v, AXIS, tiled=True)[:n_total]
            ke = metrics_lib.kinetic_energy(vg, m_full)
            pe = _ring_pe_local(p, m_l, ids_l, n_total, cfg,
                                ids_f32_exact=ids_exact)
            tick = tick0 + (i + 1) * steps_per_chunk
            snap = _struct_snapshot(pg, vg, m_full, tick, ke, pe, cfg,
                                    num_bins)
            return carry, (snap, pg)

        carry, (snaps, frames) = jax.lax.scan(
            chunk, (pos_l, vel_l, acc_l, b0, jnp.asarray(0, jnp.int32)),
            jnp.arange(num_chunks, dtype=jnp.int32))
        p, v, a = carry[:3]
        return p, v, a, snaps, frames

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, pspec, P()),
        out_specs=(pspec, pspec, pspec, _SNAP_REPLICATED, P()),
        check_vma=False,
    )
    pos_o, vel_o, acc_o, snaps, frames = fn(pos, vel, gmass, masses, ids,
                                            state.tick)
    new_state = ParticleState(
        positions=pos_o, velocities=vel_o, masses=masses,
        accelerations=acc_o,
        tick=state.tick + steps_per_chunk * num_chunks)
    return new_state, snaps, frames


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "steps_per_chunk",
                                    "num_chunks", "num_bins", "n_total"))
def run_with_snapshots_sharded_baseline(state: BaselineState, cfg: SimConfig,
                                        mesh: Mesh, steps_per_chunk: int,
                                        num_chunks: int, num_bins: int = 20,
                                        n_total: int | None = None):
    """Sharded history run of the emulated-f64 baseline (the ``float64``
    arm of the precision-ladder compare, reference: simulation.py:199-250).
    Same contract as ``run_with_snapshots_sharded``."""
    if n_total is None:
        n_total = state.positions.hi.shape[0]
    n_shards = mesh.shape[AXIS]
    ph, pl, vh, vl, m = _pad_baseline_to_shards(state, n_shards)
    gmass = cfg.G * m
    ids = jnp.arange(ph.shape[0], dtype=jnp.int32)
    pspec = P(AXIS)
    ids_exact = ph.shape[0] <= (1 << 24)  # f32-id PE tile exactness

    def device_fn(ph_l, pl_l, vh_l, vl_l, gm_l, m_l, ids_l, tick0):
        def force(p_f32):
            return _ring_accelerations_dd_local(p_f32, gm_l, ids_l,
                                                n_total, cfg)

        acc_l = force(ph_l + pl_l)
        m_full = jax.lax.all_gather(m_l, AXIS, tiled=True)[:n_total]
        one_step = _dd_one_step(cfg, force)

        def chunk(carry, i):
            carry, _ = jax.lax.scan(one_step, carry, None,
                                    length=steps_per_chunk)
            ph_c, pl_c, vh_c, vl_c, a = carry
            p32, v32 = ph_c + pl_c, vh_c + vl_c
            pg = jax.lax.all_gather(p32, AXIS, tiled=True)[:n_total]
            vg = jax.lax.all_gather(v32, AXIS, tiled=True)[:n_total]
            ke = metrics_lib.kinetic_energy(vg, m_full)
            # compensated: the baseline IS the precision anchor — its PE
            # must not pick up the Pallas tile's plain-f32 row-sum noise.
            pe = _ring_pe_local(p32, m_l, ids_l, n_total, cfg,
                                ids_f32_exact=ids_exact, compensated=True)
            tick = tick0 + (i + 1) * steps_per_chunk
            snap = _struct_snapshot(pg, vg, m_full, tick, ke, pe, cfg,
                                    num_bins)
            return carry, (snap, pg)

        carry, (snaps, frames) = jax.lax.scan(
            chunk, (ph_l, pl_l, vh_l, vl_l, acc_l),
            jnp.arange(num_chunks, dtype=jnp.int32))
        ph_c, pl_c, vh_c, vl_c, a = carry
        return ph_c, pl_c, vh_c, vl_c, a, snaps, frames

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(pspec,) * 7 + (P(),),
        out_specs=(pspec,) * 5 + (_SNAP_REPLICATED, P()),
        check_vma=False,
    )
    ph_o, pl_o, vh_o, vl_o, acc_o, snaps, frames = fn(
        ph, pl, vh, vl, gmass, m, ids, state.tick)
    new_state = BaselineState(
        positions=dd.DD(ph_o, pl_o), velocities=dd.DD(vh_o, vl_o),
        masses=m, accelerations=acc_o,
        tick=state.tick + steps_per_chunk * num_chunks)
    return new_state, snaps, frames
