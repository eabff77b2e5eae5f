"""Direct O(N^2) N-body engine: kick-drift-kick leapfrog under lax.scan.

Re-design of the reference engine (reference: simulation.py:12-250). The
step is a pure function of a state pytree; a whole run is a jitted
``lax.scan`` over chunks with fused on-device metric snapshots at chunk
boundaries — the reference's per-callback ``.item()`` device syncs
(simulation.py:174,192) disappear.

Precision ladder:
* degraded modes (f32/bf16/f16/int8/int4/custom) run on ``ParticleState``
  (f32 state) with the quantization hook inside the force kernel;
* the float64 baseline runs on ``BaselineState`` (double-double state,
  compensated force accumulation) because TPUs have no f64 ALU.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from nbody_tpu.config import DEFAULT_SIM, SimConfig
from nbody_tpu.diagnostics import metrics as metrics_lib
from nbody_tpu.models.state import (
    BaselineState,
    ParticleState,
    make_baseline_state,
    make_state,
)
from nbody_tpu.ops import doubledouble as dd
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer


def _sym_vmem_resident_bytes(n: int, dim: int = 2) -> int:
    """VMEM footprint of the sym kernel's grid-resident arrays: the
    (D+1, N) source array plus the (D, N) reaction column buffer."""
    return 4 * (2 * dim + 1) * n


def _resolve_impl(impl: str, n: int, dim: int = 2) -> str:
    """Resolve 'auto' to a concrete implementation name."""
    if impl == "auto":
        if jax.default_backend() == "tpu" and n >= 512:
            impl = ("pallas"
                    if _sym_vmem_resident_bytes(n, dim) <= 12_000_000
                    else "pallas_sym_chunked")
        else:
            impl = "dense" if n <= 2048 else "tiled"
    return impl


def _force_fn(impl: str, n: int, dim: int = 2, uniform_gm: bool = False):
    """Pick a force implementation. 'auto' = the Pallas kernel on TPU
    (symmetric while its grid-resident arrays fit VMEM, the HBM-streaming
    row kernel beyond), dense at small N / tiled at large N elsewhere
    (Pallas interpret mode on CPU is debug-speed only).

    ``uniform_gm=True`` asserts all masses are equal (detected eagerly by
    DirectSimulation on its concrete masses): the sym kernels then take
    their shared-product fast path (+24% f32 at N=131k, docs/PERF.md)."""
    impl = _resolve_impl(impl, n, dim)
    if impl == "dense":
        return forces.dense_accelerations
    if impl == "tiled":
        return forces.tiled_accelerations
    if impl == "pallas":
        # Newton's-third-law kernel: each unordered pair evaluated once
        # (~1.45x over the row-sweep kernel on chip; see docs/PERF.md).
        from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym
        if uniform_gm:
            return functools.partial(pallas_accelerations_sym,
                                     uniform_gm=True)
        return pallas_accelerations_sym
    if impl == "pallas_rows":
        # Row-sweep variant (every ordered pair): kept for the ring tile
        # (disjoint receiver/source sets) and as a comparison point.
        from nbody_tpu.ops.pallas_nbody import pallas_accelerations
        return pallas_accelerations
    if impl == "pallas_streamed":
        # Large-N row sweep with HBM-streamed source blocks: no resident
        # (D+1, N) VMEM array, so N is bounded by HBM not VMEM.
        from nbody_tpu.ops.pallas_nbody import pallas_accelerations_streamed
        return pallas_accelerations_streamed
    if impl == "pallas_sym_chunked":
        # Large-N Newton's-third-law path: VMEM-sized column chunks, one
        # sym pair tile per unordered chunk pair (~N^2/2 evaluations vs
        # the streamed row sweep's N^2). Falls back to streamed for
        # dynamic-softening sweeps / zero softening.
        from nbody_tpu.ops.pallas_nbody import (
            pallas_accelerations_sym_chunked)
        if uniform_gm:
            return functools.partial(pallas_accelerations_sym_chunked,
                                     uniform_gm=True)
        return pallas_accelerations_sym_chunked
    raise ValueError(f"unknown force impl: {impl}")


# --------------------------------------------------------------------------
# Functional core
# --------------------------------------------------------------------------

def leapfrog_step(state: ParticleState, q: Quantizer, cfg: SimConfig,
                  force: Callable, quantize_forces: bool,
                  dt=None, softening_sq=None) -> ParticleState:
    """One KDK step (reference: simulation.py:120-143). ``dt`` and
    ``softening_sq`` optionally override the static cfg with traced
    scalars so parameter sweeps share one compiled program."""
    dt = cfg.dt if dt is None else dt
    half_dt = dt * 0.5
    vel = state.velocities + state.accelerations * half_dt
    pos = state.positions + vel * dt
    acc = force(pos, state.masses, q, cfg, quantize_forces=quantize_forces,
                softening_sq=softening_sq)
    vel = vel + acc * half_dt
    return ParticleState(pos, vel, state.masses, acc, state.tick + 1)


def leapfrog_step_baseline(state: BaselineState, cfg: SimConfig) -> BaselineState:
    """One KDK step in double-double state (emulated-f64 baseline)."""
    half_dt = jnp.float32(cfg.dt * 0.5)
    vel = dd.dd_add_f32(state.velocities, state.accelerations * half_dt)
    pos = dd.dd_add(state.positions, dd.dd_mul_f32(vel, jnp.float32(cfg.dt)))
    acc = forces.baseline_accelerations_dd(pos.to_f32(), state.masses, cfg)
    vel = dd.dd_add_f32(vel, acc * half_dt)
    return BaselineState(pos, vel, state.masses, acc, state.tick + 1)


_BOUNDS_REUSE_IMPLS = ("dense", "tiled", "pallas")


def _guard_state_uniform_gm(fn):
    """Reject ``uniform_gm=True`` with concrete unequal masses at the
    run-loop surface (the kernels guard their own direct callers; this
    covers the ParticleState-shaped entries). Traced states skip the
    check, as before (see ops.pallas_nbody.check_uniform_gm)."""
    @functools.wraps(fn)
    def wrapper(state, *args, **kwargs):
        if kwargs.get("uniform_gm"):
            from nbody_tpu.ops.pallas_nbody import check_uniform_gm
            check_uniform_gm(getattr(state, "masses", None))
        return fn(state, *args, **kwargs)
    return wrapper


def _prevalidated(fn):
    """The inner (unguarded) callable of a uniform_gm-guarded wrapper.

    DirectSimulation validates the concrete masses ONCE at construction
    (the auto-detect in __init__ reads them host-side); re-running the
    guard on every dispatch would np.asarray the state's device-resident
    masses — a blocking host fetch per call that serializes the pipelined
    ticks_per_dispatch chunking. External callers of the public module
    functions still hit the guards."""
    return getattr(fn, "__wrapped__", fn)


def _bounds_reuse_scan(q: Quantizer, cfg: SimConfig, impl: str,
                       quantize_forces: bool, n: int, dim: int,
                       bounds_every: int, dt=None, softening_sq=None,
                       uniform_gm: bool = False):
    """Shared scaffolding for the int-sim bounds-reuse scan: returns
    ``(body, carry0)`` where carry = (ParticleState, bounds, step_idx).

    The first iteration (k=0) recomputes the bounds on the freshly
    drifted positions, so the carry seeds with DUMMY bounds — computing
    real ones up front would add exactly the O(N^2) max pass this path
    exists to amortise."""
    force = _force_fn(impl, n, dim, uniform_gm)
    resolved = _resolve_impl(impl, n, dim)
    if resolved not in _BOUNDS_REUSE_IMPLS:
        raise ValueError(f"bounds_every > 1 is not supported for "
                         f"force impl '{resolved}' (no external-bounds "
                         f"hook); use one of {_BOUNDS_REUSE_IMPLS}")

    from nbody_tpu.ops.precision import dist_sq_log_bounds

    def bounds_of(p):
        if resolved == "pallas":
            # Exact (bitwise) max via the candidate-pruned diameter pass.
            max_d2 = forces.max_pairwise_dist_sq_pruned(
                p, cfg, softening_sq=softening_sq)
        else:
            max_d2 = forces.max_pairwise_dist_sq(
                p, cfg, softening_sq=softening_sq)
        return dist_sq_log_bounds(
            q, max_d2,
            cfg.softening_sq if softening_sq is None else softening_sq)

    dt_ = cfg.dt if dt is None else dt
    half_dt = dt_ * 0.5

    def body(carry, _):
        s, b, k = carry
        vel = s.velocities + s.accelerations * half_dt
        pos = s.positions + vel * dt_
        b = jax.lax.cond(k % bounds_every == 0, bounds_of,
                         lambda _: b, pos)
        acc = force(pos, s.masses, q, cfg, quantize_forces=quantize_forces,
                    softening_sq=softening_sq, log_lo=b[0], log_hi=b[1])
        vel = vel + acc * half_dt
        s = ParticleState(pos, vel, s.masses, acc, s.tick + 1)
        return (s, b, k + 1), None

    def carry0(state):
        z = jnp.float32(0.0)
        return (state, (z, z), jnp.asarray(0, jnp.int32))

    return body, carry0


def _cached_bounds_scan(q: Quantizer, cfg: SimConfig, impl: str,
                        quantize_forces: bool, n: int, dim: int,
                        headroom: float, dt=None, softening_sq=None,
                        uniform_gm: bool = False):
    """Speculate-and-verify int-sim bounds: the separate O(N^2/2) max
    pass disappears from the steady state.

    Each force evaluation runs the sym kernel with the CACHED grid hi and
    emits the true tensor-global max as a fused ~1 op/pair byproduct
    (ops.pallas_nbody emit_max). If the observed max escapes the cached
    hi (grid would clip — the semantic failure of blind bounds reuse) or
    falls more than 3x the headroom below it (grid gone slack), the step
    recomputes its forces with fresh bounds hi = log(max) + headroom and
    re-caches. Steady-state cost: the fused max (~3 ms at N=131k) plus
    one extra force evaluation per violation, instead of a 15.1 ms max
    pass every step.

    Semantics: the grid stays TENSOR-GLOBAL and is guaranteed to contain
    every pair (no clipping, unlike bounds_every>1), but its hi carries
    up to ``headroom`` of log-space staleness between refreshes, which
    shifts bin boundaries by <= headroom/span (~0.4% of one int4 bin per
    0.05 headroom at canonical scale). docs/PERF.md quantifies the drift
    parity vs per-step bounds; the canonical int4 gate stays green (the
    staleness perturbation is far below the reference's own
    summation-order chaos envelope).

    Carry: (ParticleState, log_hi_cache, violation_count). The first
    step always "violates" (cache seeds at -inf) and establishes real
    bounds."""
    resolved = _resolve_impl(impl, n, dim)
    if resolved != "pallas":
        raise ValueError(f"bounds_mode='cached' requires the resident "
                         f"sym Pallas kernel (resolved impl "
                         f"'{resolved}'); use bounds_every or impl="
                         f"'pallas'")
    if not q.is_int:
        raise ValueError("bounds_mode='cached' only applies to int-sim "
                         "modes")
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym

    soft = (cfg.softening_sq if softening_sq is None else softening_sq)
    dt_ = cfg.dt if dt is None else dt
    half_dt = dt_ * 0.5

    lo = jnp.maximum(jnp.asarray(soft, jnp.float32),
                     jnp.float32(q.min_dist_sq))
    log_lo = jnp.log(lo)

    def force_max(pos, masses, hi):
        return pallas_accelerations_sym(
            pos, masses, q, cfg, quantize_forces=quantize_forces,
            softening_sq=softening_sq, log_lo=log_lo, log_hi=hi,
            uniform_gm=uniform_gm, emit_max=True)

    def body(carry, _):
        s, hi, nviol = carry
        vel = s.velocities + s.accelerations * half_dt
        pos = s.positions + vel * dt_
        acc, max_d2 = force_max(pos, s.masses, hi)
        log_max = jnp.log(jnp.maximum(max_d2, lo))
        violated = ((log_max > hi)
                    | (log_max < hi - 3.0 * jnp.float32(headroom)))

        def redo(_):
            new_hi = log_max + jnp.float32(headroom)
            acc2, _ = force_max(pos, s.masses, new_hi)
            return acc2, new_hi

        acc, hi = jax.lax.cond(violated, redo,
                               lambda _: (acc, hi), None)
        vel = vel + acc * half_dt
        s = ParticleState(pos, vel, s.masses, acc, s.tick + 1)
        return (s, hi, nviol + violated.astype(jnp.int32)), None

    def carry0(state):
        return (state, jnp.float32(-jnp.inf), jnp.asarray(0, jnp.int32))

    return body, carry0


@_guard_state_uniform_gm
@functools.partial(jax.jit, static_argnames=("q", "cfg", "impl",
                                             "quantize_forces", "num_steps",
                                             "bounds_every", "uniform_gm",
                                             "bounds_mode", "headroom"))
def run_steps(state: ParticleState, q: Quantizer, cfg: SimConfig,
              impl: str, quantize_forces: bool, num_steps: int,
              dt=None, softening_sq=None,
              bounds_every: int = 1,
              uniform_gm: bool = False,
              bounds_mode: str = "exact",
              headroom: float = 0.05) -> ParticleState:
    """num_steps leapfrog steps as one fused on-device scan. Optional
    traced dt/softening_sq: one compiled program serves a whole sweep.

    Int-sim grid-bounds policies (the tensor-global log grid needs the
    pairwise max, quantization.py:112-121):

    * ``bounds_mode='exact'`` (default): a dedicated max pass before
      every force evaluation — per-step reference semantics.
    * ``bounds_mode='cached'``: speculate with the previous bounds, emit
      the true max from the force kernel itself, recompute the step's
      forces only when the observed max escapes the grid (or the grid
      goes slack by 3x ``headroom``) — guaranteed no clipping, grid hi
      within ``headroom`` log-units of exact (see _cached_bounds_scan).
    * ``bounds_every=k>1`` (legacy): blind bounds reuse for k steps —
      fastest, but stale bounds can clip; documented semantic delta.

    ``uniform_gm=True`` asserts equal masses (see _force_fn)."""
    n, dim = state.positions.shape
    if bounds_mode == "cached" and not q.is_int:
        raise ValueError("bounds_mode='cached' only applies to int-sim "
                         "modes (float modes have no log grid)")
    if q.is_int and bounds_mode == "cached":
        if bounds_every != 1:
            raise ValueError("bounds_mode='cached' and bounds_every>1 "
                             "are mutually exclusive bounds policies")
        body, carry0 = _cached_bounds_scan(q, cfg, impl, quantize_forces,
                                           n, dim, headroom, dt,
                                           softening_sq, uniform_gm)
        (state, _, _), _ = jax.lax.scan(body, carry0(state), None,
                                        length=num_steps)
        return state
    if q.is_int and bounds_every > 1:
        body, carry0 = _bounds_reuse_scan(q, cfg, impl, quantize_forces,
                                          n, dim, bounds_every, dt,
                                          softening_sq, uniform_gm)
        (state, _, _), _ = jax.lax.scan(body, carry0(state), None,
                                        length=num_steps)
        return state

    force = _force_fn(impl, n, dim, uniform_gm)

    def body(s, _):
        return leapfrog_step(s, q, cfg, force, quantize_forces,
                             dt=dt, softening_sq=softening_sq), None

    state, _ = jax.lax.scan(body, state, None, length=num_steps)
    return state


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
def run_steps_baseline(state: BaselineState, cfg: SimConfig,
                       num_steps: int) -> BaselineState:
    def body(s, _):
        return leapfrog_step_baseline(s, cfg), None

    state, _ = jax.lax.scan(body, state, None, length=num_steps)
    return state


@_guard_state_uniform_gm
@functools.partial(jax.jit, static_argnames=("q", "cfg", "impl",
                                             "quantize_forces", "steps_per_chunk",
                                             "num_chunks", "num_bins",
                                             "bounds_every", "uniform_gm",
                                             "bounds_mode", "headroom"))
def run_with_snapshots(state: ParticleState, q: Quantizer, cfg: SimConfig,
                       impl: str, quantize_forces: bool,
                       steps_per_chunk: int, num_chunks: int,
                       num_bins: int = 20, dt=None, softening_sq=None,
                       bounds_every: int = 1, uniform_gm: bool = False,
                       bounds_mode: str = "exact", headroom: float = 0.05):
    """Run num_chunks * steps_per_chunk ticks; emit a fused metrics Snapshot
    and a position frame after each chunk. Entirely on-device: one jitted
    program, outputs stacked along a leading chunk axis. Optional traced
    dt/softening_sq override the static cfg (dynamic-sweep mode);
    ``bounds_every``/``bounds_mode``/``headroom`` follow run_steps."""
    n, dim = state.positions.shape
    if bounds_mode == "cached" and not q.is_int:
        raise ValueError("bounds_mode='cached' only applies to int-sim "
                         "modes (float modes have no log grid)")
    if q.is_int and bounds_mode == "cached":
        body, carry0_fn = _cached_bounds_scan(q, cfg, impl, quantize_forces,
                                              n, dim, headroom, dt,
                                              softening_sq, uniform_gm)
        carry0 = carry0_fn(state)
    elif q.is_int and bounds_every > 1:
        body, carry0_fn = _bounds_reuse_scan(q, cfg, impl, quantize_forces,
                                             n, dim, bounds_every, dt,
                                             softening_sq, uniform_gm)
        carry0 = carry0_fn(state)
    else:
        force = _force_fn(impl, n, dim, uniform_gm)

        def body(carry, _):
            return (leapfrog_step(carry[0], q, cfg, force, quantize_forces,
                                  dt=dt, softening_sq=softening_sq),
                    carry[1], carry[2]), None

        carry0 = (state, jnp.float32(0.0), jnp.asarray(0, jnp.int32))

    def chunk(carry, _):
        carry, _ = jax.lax.scan(body, carry, None, length=steps_per_chunk)
        s = carry[0]
        snap = metrics_lib.snapshot(s.positions, s.velocities, s.masses,
                                    s.tick, cfg, num_bins=num_bins)
        return carry, (snap, s.positions)

    carry, (snaps, frames) = jax.lax.scan(chunk, carry0, None,
                                          length=num_chunks)
    return carry[0], snaps, frames


@functools.partial(jax.jit, static_argnames=("cfg", "steps_per_chunk",
                                             "num_chunks", "num_bins"))
def run_with_snapshots_baseline(state: BaselineState, cfg: SimConfig,
                                steps_per_chunk: int, num_chunks: int,
                                num_bins: int = 20):
    def chunk(s, _):
        def body(ss, __):
            return leapfrog_step_baseline(ss, cfg), None

        s, _ = jax.lax.scan(body, s, None, length=steps_per_chunk)
        f32 = s.to_f32()
        snap = metrics_lib.snapshot(f32.positions, f32.velocities, f32.masses,
                                    f32.tick, cfg, num_bins=num_bins)
        return s, (snap, f32.positions)

    state, (snaps, frames) = jax.lax.scan(chunk, state, None, length=num_chunks)
    return state, snaps, frames


def _concat_chunk_parts(parts):
    """Concatenate (snaps, frames) pairs from chained history dispatches
    along the chunk axis."""
    if len(parts) == 1:
        return parts[0]
    snaps = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                         *[p[0] for p in parts])
    frames = jnp.concatenate([p[1] for p in parts], axis=0)
    return snaps, frames


# --------------------------------------------------------------------------
# Engine wrapper (reference-parity API)
# --------------------------------------------------------------------------

class DirectSimulation:
    """Thin stateful wrapper mirroring the reference's GalaxySimulation API
    (reference: simulation.py:12-196): step / run / get_state / energies —
    while all computation stays in the jitted functional core."""

    def __init__(self, positions, velocities, masses,
                 precision: Quantizer | Precision | str = Precision.FLOAT32,
                 cfg: SimConfig = DEFAULT_SIM,
                 G: Optional[float] = None,
                 softening: Optional[float] = None,
                 dt: Optional[float] = None,
                 force_impl: str = "auto",
                 quantize_forces: Optional[bool] = None,
                 custom_levels: int = 64,
                 dynamic_params: bool = False,
                 mesh=None,
                 schedule: str = "sym",
                 bounds_every: int = 1,
                 ticks_per_dispatch: Optional[int] = None):
        if isinstance(precision, str):
            precision = Quantizer.from_string(precision, custom_levels)
        elif isinstance(precision, Precision):
            precision = Quantizer(mode=precision, custom_levels=custom_levels)
        self.quantizer = precision
        self._dyn_dt = None
        self._dyn_soft_sq = None
        if dynamic_params and (isinstance(precision, Quantizer)
                               and precision.mode == Precision.FLOAT64
                               or precision == Precision.FLOAT64):
            raise ValueError("dynamic_params is not supported for the "
                             "float64 baseline (double-double path uses "
                             "the static cfg); sweep with static configs")
        if dynamic_params:
            # dt/softening become traced runtime scalars: any sweep over
            # them reuses ONE compiled program (G stays static; it simply
            # scales the precomputed G*m source row).
            self._dyn_dt = jnp.float32(dt if dt is not None else cfg.dt)
            s = softening if softening is not None else cfg.softening
            self._dyn_soft_sq = jnp.float32(s * s)
            if G is not None:
                cfg = SimConfig(G=G, softening=cfg.softening, dt=cfg.dt)
        elif G is not None or softening is not None or dt is not None:
            cfg = SimConfig(G=G if G is not None else cfg.G,
                            softening=softening if softening is not None else cfg.softening,
                            dt=dt if dt is not None else cfg.dt)
        self.cfg = cfg
        self.force_impl = force_impl
        if quantize_forces is None:
            # Reference applies force quantization only for int8/int4
            # (simulation.py:115-116), not CUSTOM.
            quantize_forces = self.quantizer.mode in (Precision.INT4_SIM,
                                                      Precision.INT8_SIM)
        self.quantize_forces = quantize_forces
        self.is_baseline = self.quantizer.mode == Precision.FLOAT64

        # Multi-chip mode: particles sharded over a 1-D mesh, forces via
        # the ppermute half-ring (parallel/ring.py). The state stays
        # resident on the mesh (padded to the shard boundary) between
        # calls; every user surface below trims/gathers transparently.
        self.mesh = mesh
        self.schedule = schedule
        self.bounds_every = bounds_every
        # Host-level dispatch bound for mesh history runs: some
        # environments kill a single device dispatch past a wall-clock
        # watchdog (this box's TPU tunnel: ~70-90 s — at N=1M that is
        # ~20 f32 ticks). None (default) keeps the fully fused
        # one-dispatch design; an int caps the ticks folded into each
        # jitted call (whole snapshot chunks), with identical physics —
        # the only cost is one extra entry force evaluation per dispatch
        # (acceleration is a pure function of positions).
        self.ticks_per_dispatch = ticks_per_dispatch
        if ticks_per_dispatch is not None and mesh is None:
            raise ValueError("ticks_per_dispatch only applies to mesh "
                             "runs (single-device scans are already "
                             "host-chunkable via step()/run())")
        if ticks_per_dispatch is not None and ticks_per_dispatch < 1:
            # 0 would spin step()'s capped loop forever (min(0, rest)
            # never advances) and divide-by-zero the history split
            raise ValueError("ticks_per_dispatch must be >= 1")
        if ticks_per_dispatch is not None and bounds_every > 1:
            # The bounds-reuse counter and cached grid bounds reset at
            # every dispatch boundary (each call recomputes entry bounds
            # and restarts k at 0), so the chained run is NOT the fused
            # run's semantics for int-sim bounds reuse. bounds_every=1
            # (exact per-evaluation bounds) is dispatch-invariant.
            raise ValueError("ticks_per_dispatch cannot be combined with "
                             "bounds_every > 1: the bounds-reuse cadence "
                             "resets at each dispatch boundary, silently "
                             "changing the quantization-bounds semantics")
        self._n_total = int(jnp.shape(positions)[0])
        # Equal-mass detection (one host fetch at init): unlocks the sym
        # kernels' shared-product fast path (+24% f32 at N=131k). The ring
        # runners honor it too and auto-disable whenever the shard layout
        # needs zero-mass phantom padding rows (N % n_shards != 0).
        import numpy as _np
        _m = _np.asarray(masses)
        self._uniform_gm = bool(_m.size > 0 and (_m == _m.flat[0]).all())
        if mesh is not None and dynamic_params:
            raise ValueError("dynamic_params is not supported with mesh= "
                             "(the ring runners compile static dt/softening)")
        if mesh is not None and force_impl != "auto":
            # the ring runners pick their own tile kernels; accepting the
            # flag silently would run a different config than the one the
            # user named
            raise ValueError("force_impl is single-device only; mesh runs "
                             "use the ring tile ladder (pass "
                             "force_impl='auto' with mesh=)")
        if bounds_every > 1 and mesh is not None and schedule != "sym":
            raise ValueError("bounds_every > 1 needs schedule='sym' on a "
                             "mesh (the rows schedule has no external-"
                             "bounds hook); it would otherwise be "
                             "silently ignored")

        if self.is_baseline:
            self.state = make_baseline_state(positions, velocities, masses)
            if mesh is None:
                acc = forces.baseline_accelerations_dd(
                    self.state.positions.hi, self.state.masses, cfg)
                self.state = self.state._replace(accelerations=acc)
            # mesh mode: the sharded runners recompute the acceleration
            # from positions at entry (a pure function of state), so the
            # stored zeros never reach the integrator.
        else:
            self.state = make_state(positions, velocities, masses)
            if mesh is None:
                force = _force_fn(force_impl, self.state.num_particles,
                                  self.state.positions.shape[1],
                                  self._uniform_gm)
                acc = force(self.state.positions, self.state.masses,
                            self.quantizer, cfg,
                            quantize_forces=self.quantize_forces,
                            softening_sq=self._dyn_soft_sq)
                self.state = self.state._replace(accelerations=acc)

    # -- stepping -----------------------------------------------------------

    @property
    def tick(self) -> int:
        return int(self.state.tick)

    def _trim(self, x):
        """Strip mesh-mode phantom padding (no-op single-device).

        Replicate before the tail slice: slicing a shard-misaligned
        boundary on an explicitly sharded array is ill-sharded (same
        discipline as parallel/ring.py's gather path)."""
        if self.mesh is not None and x.shape[0] != self._n_total:
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.sharding.reshard(x, NamedSharding(self.mesh, P()))
            return x[:self._n_total]
        return x

    @property
    def positions(self):
        return self._trim(self.state.positions.to_f32() if self.is_baseline
                          else self.state.positions)

    @property
    def velocities(self):
        return self._trim(self.state.velocities.to_f32() if self.is_baseline
                          else self.state.velocities)

    @property
    def masses(self):
        return self._trim(self.state.masses)

    def step(self, num_steps: int = 1):
        if (self.mesh is not None and self.ticks_per_dispatch is not None
                and num_steps > self.ticks_per_dispatch):
            # Dispatch-duration bound (see __init__): split into <=cap
            # jitted calls; identical physics (the entry force recompute
            # is a pure function of positions).
            done = 0
            while done < num_steps:
                n = min(self.ticks_per_dispatch, num_steps - done)
                self._step_dispatch(n)
                done += n
            return
        self._step_dispatch(num_steps)

    def _step_dispatch(self, num_steps: int):
        if self.mesh is not None:
            from nbody_tpu.parallel import ring
            if self.is_baseline:
                self.state = ring.run_steps_sharded_baseline(
                    self.state, self.cfg, self.mesh, num_steps,
                    gather=False, n_total=self._n_total)
            else:
                self.state, _ = _prevalidated(ring.run_steps_sharded)(
                    self.state, self.quantizer, self.cfg, self.mesh,
                    num_steps, quantize_forces=self.quantize_forces,
                    gather=False, schedule=self.schedule,
                    n_total=self._n_total,
                    bounds_every=self.bounds_every,
                    uniform_gm=self._uniform_gm)
        elif self.is_baseline:
            self.state = run_steps_baseline(self.state, self.cfg, num_steps)
        else:
            self.state = _prevalidated(run_steps)(
                self.state, self.quantizer, self.cfg,
                self.force_impl, self.quantize_forces,
                num_steps, dt=self._dyn_dt,
                softening_sq=self._dyn_soft_sq,
                bounds_every=self.bounds_every,
                uniform_gm=self._uniform_gm)

    def run(self, num_ticks: int, callback: Optional[Callable] = None,
            callback_interval: int = 100):
        """Chunked run with an optional host callback at interval boundaries
        (reference: simulation.py:145-158). Without a callback this is one
        fused scan."""
        if callback is None:
            self.step(num_ticks)
            return
        done = 0
        while done < num_ticks:
            chunk = min(callback_interval, num_ticks - done)
            self.step(chunk)
            done += chunk
            callback(self, self.tick)

    def run_with_history(self, num_ticks: int, snapshot_interval: int = 100,
                         num_bins: int = 20):
        """Fully on-device run; returns (snapshots, position_frames) stacked
        over snapshot boundaries — the TPU-native replacement for the
        reference's record_callback history (simulation.py:229-242).

        Snapshots land at interval multiples; any remainder ticks are still
        run (the reference advances the full num_ticks even when the last
        callback interval is partial, simulation.py:154-158)."""
        num_chunks = max(num_ticks // snapshot_interval, 1)
        steps = snapshot_interval if num_ticks >= snapshot_interval else num_ticks
        if self.mesh is not None:
            from nbody_tpu.parallel import ring

            def one_call(n_chunks, chunk_steps):
                if self.is_baseline:
                    st, sn, fr = ring.run_with_snapshots_sharded_baseline(
                        self.state, self.cfg, self.mesh, chunk_steps,
                        n_chunks, num_bins=num_bins, n_total=self._n_total)
                else:
                    st, sn, fr = _prevalidated(
                        ring.run_with_snapshots_sharded)(
                        self.state, self.quantizer, self.cfg, self.mesh,
                        chunk_steps, n_chunks,
                        quantize_forces=self.quantize_forces,
                        num_bins=num_bins, schedule=self.schedule,
                        n_total=self._n_total,
                        bounds_every=self.bounds_every,
                        uniform_gm=self._uniform_gm)
                self.state = st
                return sn, fr

            tpd = self.ticks_per_dispatch
            if tpd is None:
                snaps, frames = one_call(num_chunks, steps)
            elif steps <= tpd:
                # Whole snapshot chunks per jitted call (as many as fit
                # the cap), resident sharded state chained across calls,
                # outputs concatenated on the chunk axis.
                per = max(tpd // steps, 1)
                parts = []
                done = 0
                while done < num_chunks:
                    n = min(per, num_chunks - done)
                    parts.append(one_call(n, steps))
                    done += n
                snaps, frames = _concat_chunk_parts(parts)
            else:
                # Cap below the snapshot interval: advance each chunk's
                # leading ticks with capped step() dispatches, then one
                # <=cap snapshot call lands the Snapshot exactly at the
                # chunk boundary (its tick counter rides state.tick).
                tail = steps % tpd or tpd
                parts = []
                for _ in range(num_chunks):
                    self.step(steps - tail)
                    parts.append(one_call(1, tail))
                snaps, frames = _concat_chunk_parts(parts)
        elif self.is_baseline:
            self.state, snaps, frames = run_with_snapshots_baseline(
                self.state, self.cfg, steps, num_chunks, num_bins)
        else:
            self.state, snaps, frames = _prevalidated(run_with_snapshots)(
                self.state, self.quantizer, self.cfg, self.force_impl,
                self.quantize_forces, steps, num_chunks, num_bins,
                dt=self._dyn_dt, softening_sq=self._dyn_soft_sq,
                bounds_every=self.bounds_every,
                uniform_gm=self._uniform_gm)
        remainder = num_ticks - steps * num_chunks
        if remainder > 0:
            self.step(remainder)
        return snaps, frames

    # -- diagnostics --------------------------------------------------------

    def get_kinetic_energy(self) -> float:
        return float(metrics_lib.kinetic_energy(self.velocities, self.masses))

    def get_potential_energy(self) -> float:
        if self.mesh is not None:
            # O(N^2) pair sum stays sharded (ppermute energy ring);
            # phantom padding rows are id-masked past n_total (the
            # resident state is padded after the first step()).
            from nbody_tpu.parallel import ring
            return float(ring.ring_potential_energy(
                self.state.positions.to_f32() if self.is_baseline
                else self.state.positions,
                self.state.masses, self.cfg, self.mesh,
                n_total=self._n_total, compensated=self.is_baseline))
        return float(metrics_lib.potential_energy(
            self.positions, self.masses, self.cfg,
            softening_sq=self._dyn_soft_sq))

    def get_total_energy(self) -> float:
        if self.mesh is not None:
            return self.get_kinetic_energy() + self.get_potential_energy()
        return float(metrics_lib.total_energy(
            self.positions, self.velocities, self.masses, self.cfg,
            softening_sq=self._dyn_soft_sq))

    def get_state(self) -> dict:
        """Reference-parity state export (reference: simulation.py:160-168)."""
        return {
            "positions": self.positions,
            "velocities": self.velocities,
            "masses": self.masses,
            "tick": self.tick,
            "precision_mode": self.quantizer.mode.value,
        }


def run_comparison(positions, velocities, masses, modes,
                   num_ticks: int = 1000, snapshot_interval: int = 100,
                   **sim_kwargs):
    """Same ICs under several precision modes
    (reference: simulation.py:199-250). Returns {mode_value: {...}}."""
    results = {}
    for mode in modes:
        sim = DirectSimulation(positions, velocities, masses,
                               precision=mode, **sim_kwargs)
        e0 = sim.get_total_energy()
        snaps, frames = sim.run_with_history(num_ticks, snapshot_interval)
        results[sim.quantizer.mode.value] = {
            "final_state": sim.get_state(),
            "snapshots": snaps,
            "frames": frames,
            "initial_energy": e0,
            "simulation": sim,
        }
    return results
