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
from nbody_tpu.models.state import ParticleState
from nbody_tpu.ops import doubledouble as dd
from nbody_tpu.ops.precision import (
    Quantizer,
    dist_sq_log_bounds,
    quantize_distance_squared,
    quantize_force,
)

AXIS = "shards"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    if cfg.softening_sq <= 0.0:
        # unsoftened self-pairs need the id mask (inf * 0 = NaN otherwise)
        impl = "jnp"
    if impl == "auto":
        impl = ("pallas" if jax.default_backend() == "tpu"
                and xi.shape[0] >= 1024 else "jnp")
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
        return pallas_pair_force(xi, xj, gm_j, q, cfg,
                                 log_lo=log_lo, log_hi=log_hi,
                                 block_i=min(512, _round_up(xi.shape[0], 8)))
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
    rb = min(row_block, b)
    pad = (-b) % rb
    pos_i = jnp.pad(pos_local, ((0, pad), (0, 0)))
    vi = jnp.pad(ids_local < n_total, (0, pad))
    row_blocks = (pos_i.reshape(-1, rb, dim), vi.reshape(-1, rb))

    use_pallas = (jax.default_backend() == "tpu" and b >= 1024)
    if use_pallas:
        from nbody_tpu.ops.pallas_nbody import pallas_pair_max

    def step(s, carry):
        best, pos_j, ids_j = carry
        if use_pallas:
            step_best = pallas_pair_max(
                pos_local, pos_j, ids_local < n_total, ids_j < n_total,
                block_i=min(512, _round_up(b, 8)),
                block_j=min(2048, _round_up(b, 128)))
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


def _ring_pe_local(pos_local, m_local, ids_local, n_total, cfg: SimConfig,
                   row_block: int = 1024):
    """Pairwise potential energy via the same ppermute ring, per device.

    U = -G * sum_{i<j} m_i m_j / sqrt(|x_i - x_j|^2 + eps^2)
    (reference: simulation.py:176-192). Every unordered pair is visited
    twice across the ring sweep (once per direction), so the full masked
    sum is halved — the same discipline as the single-device
    diagnostics.metrics.potential_energy. Padded particles carry zero mass
    and contribute nothing. Accumulation is compensated (double-double
    carry over per-tile compensated sums). Returns the replicated global
    scalar U (already psum'd).
    """
    axis_size = jax.lax.psum(1, AXIS)
    b, dim = pos_local.shape
    rb = min(row_block, b)
    pad = (-b) % rb
    pos_i = jnp.pad(pos_local, ((0, pad), (0, 0)))
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
            pair = jnp.where(ii[:, None] == ids_j[None, :], 0.0, pair)
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
        return "jnp"
    if tile_impl == "auto":
        return ("pallas" if jax.default_backend() == "tpu"
                and shard_size >= 1024 else "jnp")
    return tile_impl


def _tile_force_sym(xi, gm_i, ids_i, xj, gm_j, ids_j, q, cfg,
                    log_lo, log_hi, impl: str):
    """Newton's-third-law pair tile between two disjoint blocks.

    Returns ``(acc_on_i, reaction_on_j)`` from ONE evaluation of the pair
    weights — the per-step tile of the half-ring schedule. ``impl`` must
    already be resolved ('pallas' | 'jnp')."""
    if impl == "pallas":
        from nbody_tpu.ops.pallas_nbody import pallas_pair_force_sym

        return pallas_pair_force_sym(
            xi, gm_i, xj, gm_j, q, cfg, log_lo=log_lo, log_hi=log_hi,
            block_i=min(256, _round_up(xi.shape[0], 8)))
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
                                  tile_impl: str = "auto"):
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

    if q.is_int:
        max_d2 = _ring_max_d2(pos_local, ids_local, n_total, cfg)
        log_lo, log_hi = dist_sq_log_bounds(q, max_d2, cfg.softening_sq)
    else:
        log_lo = log_hi = None

    impl = _resolve_tile_impl(tile_impl, pos_local.shape[0], cfg)

    # Diagonal (resident) block: intra-shard pairs, Newton-halved by the
    # single-device symmetric kernel when on TPU.
    if impl == "pallas":
        from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym

        acc = pallas_accelerations_sym(
            pos_local, None, q, cfg, quantize_forces=False,
            block=min(512, _round_up(pos_local.shape[0], 8)),
            log_lo=log_lo, log_hi=log_hi, gm=gm_local)
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
                                        log_lo, log_hi, impl)
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
                                   log_lo, log_hi, impl)

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


def _pad_to_shards(x, n_shards, fill=0.0):
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
    return x


@functools.partial(jax.jit,
                   static_argnames=("q", "cfg", "quantize_forces", "mesh",
                                    "num_steps", "steps_per_chunk",
                                    "gather", "schedule"))
def run_steps_sharded(state: ParticleState, q: Quantizer, cfg: SimConfig,
                      mesh: Mesh, num_steps: int,
                      quantize_forces: bool = False,
                      steps_per_chunk: int = 0,
                      gather: bool = True,
                      schedule: str = "sym"):
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
    """
    n_total, dim = state.positions.shape
    n_shards = mesh.shape[AXIS]

    pos = _pad_to_shards(state.positions, n_shards)
    vel = _pad_to_shards(state.velocities, n_shards)
    masses = _pad_to_shards(state.masses, n_shards)
    gmass = cfg.G * masses
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    pspec = P(AXIS)
    half_dt = cfg.dt * 0.5

    force_local = (_ring_accelerations_sym_local if schedule == "sym"
                   else _ring_accelerations_local)

    def device_fn(pos_l, vel_l, gm_l, m_l, ids_l):
        def force(p):
            return force_local(p, gm_l, ids_l, n_total, q, cfg,
                               quantize_forces)

        acc_l = force(pos_l)

        def one_step(carry, _):
            p, v, a = carry
            v = v + a * half_dt
            p = p + v * cfg.dt
            a = force(p)
            v = v + a * half_dt
            return (p, v, a), None

        def chunk(carry, _):
            carry, _ = jax.lax.scan(one_step, carry, None,
                                    length=max(min(steps_per_chunk,
                                                   num_steps), 1))
            p, v, a = carry
            # On-device sharded total energy (the reference's headline
            # observable, simulation.py:170-196): KE via a psum of local
            # compensated sums, PE via a second ring pass.
            valid = (ids_l < n_total).astype(jnp.float32)
            v_sq = jnp.sum(v * v, axis=-1)
            ke_dd = dd.dd_dot_f32(m_l * valid, v_sq)
            ke = 0.5 * jax.lax.psum(ke_dd.hi + ke_dd.lo, AXIS)
            pe = _ring_pe_local(p, m_l, ids_l, n_total, cfg)
            return carry, EnergyStream(ke, pe, ke + pe)

        if steps_per_chunk:
            spc = min(steps_per_chunk, num_steps)
            n_chunks = num_steps // spc
            remainder = num_steps - n_chunks * spc
            carry, energies = jax.lax.scan(chunk, (pos_l, vel_l, acc_l),
                                           None, length=n_chunks)
            if remainder:  # run the tail ticks (no snapshot for them)
                carry, _ = jax.lax.scan(one_step, carry, None,
                                        length=remainder)
        else:
            carry, _ = jax.lax.scan(one_step, (pos_l, vel_l, acc_l), None,
                                    length=num_steps)
            z = jnp.zeros((1,), jnp.float32)
            energies = EnergyStream(z, z, z)
        p, v, a = carry
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


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def ring_potential_energy(positions, masses, cfg: SimConfig, mesh: Mesh):
    """Sharded pairwise potential energy (library entry).

    Multi-chip equivalent of diagnostics.metrics.potential_energy
    (reference semantics: simulation.py:176-192): particles sharded over
    the mesh, pair terms accumulated by a ppermute ring with compensated
    sums, halved full-matrix discipline, psum'd to a replicated scalar.
    """
    n_total = positions.shape[0]
    n_shards = mesh.shape[AXIS]
    pos = _pad_to_shards(positions, n_shards)
    m = _pad_to_shards(masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    fn = shard_map(
        functools.partial(_ring_pe_local, n_total=n_total, cfg=cfg),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(pos, m, ids)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "mesh",
                                             "quantize_forces",
                                             "tile_impl", "schedule"))
def ring_accelerations(positions, masses, q: Quantizer, cfg: SimConfig,
                       mesh: Mesh, quantize_forces: bool = False,
                       tile_impl: str = "auto", schedule: str = "sym"):
    """One sharded force evaluation (library entry for tests/benchmarks).

    Module-level jit: an unjitted shard_map closure would retrace AND
    recompile on every call (measured ~4 s/call through this box's
    remote-compile service at N=131k). ``schedule='sym'`` is the
    half-ring Newton's-third-law schedule; 'rows' the plain ring."""
    n_total = positions.shape[0]
    n_shards = mesh.shape[AXIS]
    pos = _pad_to_shards(positions, n_shards)
    gmass = cfg.G * _pad_to_shards(masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    fn = shard_map(
        functools.partial(_ring_accelerations_sym_local if schedule == "sym"
                          else _ring_accelerations_local,
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
