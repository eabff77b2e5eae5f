"""Sharded particle-mesh pipeline: particle-parallel PM over ICI.

The reference PM engines are single-GPU with Python deposit loops
(reference: universe_2d.py:1027-1029); SURVEY.md §2.5 calls for a sharded
density grid + distributed FFT. Strategy here, chosen for the actual grid
sizes in play (32^3..128^2 = at most a few MB):

* particles are sharded over the 1-D mesh (the same axis as the ring
  force kernel);
* each device deposits its resident particles into a full-size local
  grid; one ``psum`` over the mesh produces the global density on every
  device (the grid is tiny compared to the particle set, so replicating
  it costs microseconds on ICI and removes all halo-exchange machinery);
* the FFT Poisson solve runs replicated (redundant but cheap:
  O(G log G) << O(N) deposit at production particle counts);
* gather back to the local particle shard is purely local.

For grids too large to replicate (512^3+), the pjit path at the bottom
shards the FFT itself over the mesh and lets XLA insert the collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_tpu.diagnostics import glitch as glitch_lib
from nbody_tpu.engines.cosmo import CosmoState, PMConfig, StepStream
from nbody_tpu.ops import pm
from nbody_tpu.ops.precision import Precision, Quantizer, quantize_force
from nbody_tpu.parallel.ring import AXIS, _pad_to_shards


def _local_pm_accel(pos_l, mass_l, valid_l, q: Quantizer, cfg: PMConfig,
                    scale):
    """Per-device PM force for the resident particle shard."""
    deposit = pm.cic_deposit if cfg.deposit == "cic" else pm.ngp_deposit
    gather = pm.cic_gather if cfg.deposit == "cic" else pm.ngp_gather

    local_density = deposit(pos_l, mass_l * valid_l, cfg.n_grid,
                            cfg.box_size)
    density = jax.lax.psum(local_density, AXIS)  # replicate global grid

    if cfg.dm_ratio > 0:
        dm = pm.dm_background_field(cfg.box_size, cfg.n_grid, cfg.dm_ratio,
                                    cfg.dim)
        density = density + dm * jnp.mean(density)

    grids = pm.poisson_accel_grids(density, cfg.box_size, cfg.n_grid, q,
                                   cfg.G, scale, cfg.dim)
    return gather(grids, pos_l, cfg.n_grid, cfg.box_size)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "mesh",
                                             "quantize_forces", "n_valid",
                                             "gather"))
def run_pm_steps_sharded(state: CosmoState, schedule, q: Quantizer,
                         cfg: PMConfig, mesh: Mesh,
                         quantize_forces: bool = True,
                         n_valid: int | None = None, gather: bool = True):
    """Sharded version of engines.cosmo.run_pm_steps: scan over the
    (z, dt, H, a) schedule with the particle-parallel PM force inside.

    Returns (state, StepStream) with the same per-step diagnostics the
    single-device runner streams (KE / momentum / subnormal census /
    redshift), so the engine's host-side glitch detectors consume either
    path identically.

    ``gather=False`` returns the state PADDED to a shard multiple and
    still sharded over the mesh (no per-chunk all-gather — the resident-
    sharded engine loop); pass such a state back in with
    ``n_valid=<real N>`` so phantom rows stay frozen. ``gather=True``
    (default) trims+replicates as before."""
    n_total = n_valid if n_valid is not None else state.positions.shape[0]
    n_shards = mesh.shape[AXIS]

    pos = _pad_to_shards(state.positions, n_shards)
    vel = _pad_to_shards(state.velocities, n_shards)
    masses = _pad_to_shards(state.masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)

    def device_fn(pos_l, vel_l, m_l, ids_l, schedule):
        valid = (ids_l < n_total).astype(jnp.float32)

        def step(carry, xs):
            p, v = carry
            zn, dtn, Hn, an = xs
            acc = _local_pm_accel(p, m_l, valid, q, cfg, an)
            # Freeze phantoms (padding): no integration, no influence on
            # the force-quantization bounds (reference bounds span exactly
            # the real (N, D) tensor).
            vmask = valid[:, None]
            acc = jnp.where(vmask > 0, acc, 0.0)
            # Same mode gate as engines.cosmo.pm_accelerations: the
            # reference quantizes PM forces for INT4/INT8 only.
            if quantize_forces and q.mode in (Precision.INT4_SIM,
                                              Precision.INT8_SIM):
                lo = jax.lax.pmin(
                    jnp.min(jnp.where(vmask > 0, acc, jnp.inf)), AXIS)
                hi = jax.lax.pmax(
                    jnp.max(jnp.where(vmask > 0, acc, -jnp.inf)), AXIS)
                acc = quantize_force(acc, q, lo=lo, hi=hi)
                acc = jnp.where(vmask > 0, acc, 0.0)
            v = (v + acc * dtn
                 - cfg.hubble_drag * Hn * v * dtn * cfg.unit_scale)
            p = (p + v * dtn / an * cfg.unit_scale) % cfg.box_size
            ke_l = 0.5 * jnp.sum(m_l * valid * jnp.sum(v * v, axis=-1))
            mom_l = jnp.sum((m_l * valid)[:, None] * v, axis=0)
            sub_l = glitch_lib.count_subnormals(
                jnp.where(vmask > 0, p, 1.0)).subnormal_count
            return (p, v), StepStream(
                jax.lax.psum(ke_l, AXIS), jax.lax.psum(mom_l, AXIS),
                jax.lax.psum(sub_l, AXIS), jnp.asarray(zn, jnp.float32))

        (p, v), stream = jax.lax.scan(step, (pos_l, vel_l), schedule)
        return p, v, stream

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), StepStream(P(), P(), P(), P())),
        check_vma=False,
    )
    pos_out, vel_out, stream = fn(pos, vel, masses, ids, schedule)

    def _trim(x):
        x = jax.sharding.reshard(x, NamedSharding(mesh, P()))
        return x[:n_total]

    num_steps = schedule[0].shape[0]
    if gather:
        pos_out, vel_out = _trim(pos_out), _trim(vel_out)
        masses_out = state.masses
    else:
        masses_out = masses  # padded + sharded, ready for the next chunk
    new_state = CosmoState(
        positions=pos_out,
        velocities=vel_out,
        masses=masses_out,
        redshift=jnp.asarray(schedule[0][-1], jnp.float32),
        tick=state.tick + num_steps,
    )
    return new_state, stream


def _deposit_scattered(positions, masses, valid, cfg: PMConfig, mesh: Mesh):
    """Deposit sharded particles into a grid SHARDED along axis 0.

    Each device deposits its resident particles into a transient local
    full grid, then a tiled ``psum_scatter`` leaves every device holding
    only its x-slab of the summed density — the reduce-scatter form of
    the replicated-deposit psum, O(grid/S) resident per device.
    """
    deposit = pm.cic_deposit if cfg.deposit == "cic" else pm.ngp_deposit

    def local(pos_l, w_l):
        grid = deposit(pos_l, w_l, cfg.n_grid, cfg.box_size)
        return jax.lax.psum_scatter(grid, AXIS, scatter_dimension=0,
                                    tiled=True)

    fn = shard_map(local, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                   out_specs=P(AXIS), check_vma=False)
    return fn(positions, masses * valid)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "mesh",
                                             "quantize_forces",
                                             "gather_mode", "n_valid",
                                             "gather"))
def run_pm_steps_sharded_fft(state: CosmoState, schedule, q: Quantizer,
                             cfg: PMConfig, mesh: Mesh,
                             quantize_forces: bool = True,
                             gather_mode: str = "auto",
                             n_valid: int | None = None,
                             gather: bool = True):
    """Large-grid sharded PM: the WHOLE pipeline under the mesh.

    deposit (reduce-scatter to x-slabs) -> distributed FFT Poisson solve
    with the quantized-|k|^2 hook (grid stays sharded; XLA inserts the
    FFT transpose collectives) -> spectral gradients -> particle gather.
    This is the n_grid >= 256 path SURVEY §2.5 calls for; the
    replicated-grid variant (run_pm_steps_sharded) stays the fast path
    for small grids.

    ``gather_mode`` controls the gradient-grid -> particle interpolation
    routing:

    * ``"replicate"``: all D gradient grids replicate over ICI
      (D * n_grid^dim floats per force evaluation), then a purely local
      per-shard gather;
    * ``"slab"``: the grids STAY slab-sharded; every device all-gathers
      the (N, D) positions, interpolates the stencil corners that land in
      its own slab (ops/pm.{ngp,cic}_gather_slab), and a tiled
      ``psum_scatter`` over the particle axis both completes cross-slab
      stencils and delivers each device exactly its particle shard.
      Interconnect traffic: 2 * N * D floats instead of D * n_grid^dim —
      at 512^3 with 1M particles that is ~65x less;
    * ``"auto"``: slab when the grid outweighs the particle rows.

    Same schedule/integration semantics as engines.cosmo.run_pm_steps
    (reference: universe_2d.py:1196-1209). ``n_valid``/``gather`` follow
    run_pm_steps_sharded: gather=False keeps the returned state padded +
    sharded for the resident-sharded engine loop.
    """
    n_total = n_valid if n_valid is not None else state.positions.shape[0]
    n_shards = mesh.shape[AXIS]

    if cfg.n_grid % n_shards:
        # The whole slab machinery (deposit reduce-scatter, sharded FFT,
        # slab-routed gather) needs n_grid divisible by the mesh. An
        # explicit 'slab' request is an error; 'auto'/'replicate' degrade
        # to the replicated-grid pipeline (identical physics, parity
        # tested), so odd meshes keep working at any grid size.
        if gather_mode == "slab":
            raise ValueError(
                f"slab gather needs n_grid divisible by the mesh "
                f"(n_grid={cfg.n_grid}, shards={n_shards}); use "
                f"gather_mode='auto' to fall back to the replicated grid")
        return run_pm_steps_sharded(state, schedule, q, cfg, mesh,
                                    quantize_forces=quantize_forces,
                                    n_valid=n_valid, gather=gather)

    if gather_mode == "auto":
        gather_mode = ("slab" if cfg.n_grid ** cfg.dim > 2 * n_total
                       else "replicate")

    pos = _pad_to_shards(state.positions, n_shards)
    vel = _pad_to_shards(state.velocities, n_shards)
    masses = _pad_to_shards(state.masses, n_shards)
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    valid = (ids < n_total).astype(jnp.float32)

    shard = NamedSharding(mesh, P(AXIS))
    grid_shard = NamedSharding(mesh, P(AXIS, *([None] * (cfg.dim - 1))))
    repl = NamedSharding(mesh, P())
    pos = jax.sharding.reshard(pos, shard)
    vel = jax.sharding.reshard(vel, shard)
    masses = jax.sharding.reshard(masses, shard)
    valid = jax.sharding.reshard(valid, shard)

    # NB: named gather_fn, NOT `gather` — that would shadow the
    # gather/keep-sharded flag and silently defeat the resident loop.
    gather_fn = pm.cic_gather if cfg.deposit == "cic" else pm.ngp_gather

    def force(p, scale):
        density = _deposit_scattered(p, masses, valid, cfg, mesh)
        density = jax.sharding.reshard(density, grid_shard)
        if cfg.dm_ratio > 0:
            dm = pm.dm_background_field(cfg.box_size, cfg.n_grid,
                                        cfg.dm_ratio, cfg.dim)
            density = density + dm * jnp.mean(density)
        # Sharded spectral solve: fftn/ifftn on the slab-sharded grid —
        # GSPMD inserts the all-to-all transposes over ICI.
        grids = pm.poisson_accel_grids(density, cfg.box_size, cfg.n_grid,
                                       q, cfg.G, scale, cfg.dim)
        if gather_mode == "slab":
            # Slab-routed gather: grids stay sharded; positions all-gather
            # (N*D floats), each device interpolates the stencil corners
            # inside its slab, and the tiled psum_scatter over the
            # particle axis completes cross-slab stencils AND returns
            # exactly this device's particle shard.
            grids = [jax.sharding.reshard(g, grid_shard) for g in grids]
            gather_slab = (pm.cic_gather_slab if cfg.deposit == "cic"
                           else pm.ngp_gather_slab)
            slab = cfg.n_grid // n_shards

            def slab_body(p_l, *slabs):
                p_full = jax.lax.all_gather(p_l, AXIS, tiled=True)
                start = jax.lax.axis_index(AXIS) * slab
                part = gather_slab(list(slabs), p_full, cfg.n_grid,
                                   cfg.box_size, start)
                return jax.lax.psum_scatter(part, AXIS,
                                            scatter_dimension=0,
                                            tiled=True)

            acc = shard_map(
                slab_body, mesh=mesh,
                in_specs=(P(AXIS),) + (P(AXIS, *([None] * (cfg.dim - 1))),
                                       ) * cfg.dim,
                out_specs=P(AXIS),
                check_vma=False,
            )(p, *grids)
        else:
            # Gradient grids replicate for the purely-local particle
            # gather (D * grid floats over ICI per evaluation). The gather
            # itself runs per particle shard under shard_map (a
            # global-view take of a replicated grid at sharded indices has
            # no unambiguous explicit out-sharding).
            grids = [jax.sharding.reshard(g, repl) for g in grids]
            acc = shard_map(
                lambda p_l, *gs: gather_fn(list(gs), p_l, cfg.n_grid,
                                           cfg.box_size),
                mesh=mesh,
                in_specs=(P(AXIS),) + (P(),) * cfg.dim,
                out_specs=P(AXIS),
                check_vma=False,
            )(p, *grids)
        acc = acc * valid[:, None]
        if quantize_forces and q.mode in (Precision.INT4_SIM,
                                          Precision.INT8_SIM):
            lo = jnp.min(jnp.where(valid[:, None] > 0, acc, jnp.inf))
            hi = jnp.max(jnp.where(valid[:, None] > 0, acc, -jnp.inf))
            acc = quantize_force(acc, q, lo=lo, hi=hi)
            acc = acc * valid[:, None]
        return acc

    def step(carry, xs):
        p, v = carry
        zn, dtn, Hn, an = xs
        acc = force(p, an)
        v = (v + acc * dtn
             - cfg.hubble_drag * Hn * v * dtn * cfg.unit_scale)
        p = (p + v * dtn / an * cfg.unit_scale) % cfg.box_size
        ke = 0.5 * jnp.sum(masses * valid * jnp.sum(v * v, axis=-1))
        mom = jnp.sum((masses * valid)[:, None] * v, axis=0)
        sub = glitch_lib.count_subnormals(
            jnp.where(valid[:, None] > 0, p, 1.0)).subnormal_count
        return (p, v), StepStream(ke, mom, sub,
                                  jnp.asarray(zn, jnp.float32))

    (pos_out, vel_out), stream = jax.lax.scan(step, (pos, vel), schedule)

    def _trim(x):
        return jax.sharding.reshard(x, repl)[:n_total]

    num_steps = schedule[0].shape[0]
    if gather:
        pos_out, vel_out = _trim(pos_out), _trim(vel_out)
        masses_out = state.masses
    else:
        masses_out = masses  # padded + sharded, ready for the next chunk
    new_state = CosmoState(
        positions=pos_out,
        velocities=vel_out,
        masses=masses_out,
        redshift=jnp.asarray(schedule[0][-1], jnp.float32),
        tick=state.tick + num_steps,
    )
    return new_state, stream


@functools.lru_cache(maxsize=None)
def _sharded_fft_impl(mesh: Mesh):
    """Per-mesh jitted distributed-FFT program (cached so repeated calls
    hit the compile cache instead of retracing per invocation)."""

    @functools.partial(jax.jit, static_argnames=("n_grid", "box_size"))
    def _impl(positions, weights, n_grid, box_size):
        density = pm.ngp_deposit(positions, weights, n_grid, box_size)
        density = jax.sharding.reshard(
            density, NamedSharding(mesh, P(AXIS, *([None] *
                                                   (density.ndim - 1)))))
        return jnp.fft.fftn(density)

    return _impl


def sharded_fft_density(positions, weights, n_grid: int, box_size: float,
                        mesh: Mesh):
    """Large-grid path: density FFT with the grid itself sharded over the
    mesh's axis (XLA inserts the transpose collectives for the FFT).
    Runs inside the mesh context (explicit-sharding resharding needs it)."""
    with jax.set_mesh(mesh):
        return _sharded_fft_impl(mesh)(positions, weights, n_grid, box_size)
