"""Unified cosmological particle-mesh engine (2-D and 3-D).

One parameterised engine replaces the reference's five near-duplicate
cosmology classes (reference: universe_2d.py:884-1289,
universe_3d.py:1087-1351, universe_genesis.py:217-511,
ultimate_reality_engine.py:165-526, realtime_reality_engine.py:187-345).
Differences from the reference are architectural, not behavioral:

* the whole evolution is a jitted ``lax.scan`` over a precomputed
  (z, dt, H, a) schedule — per-step Python, per-particle loops, and
  ``.item()`` syncs are gone;
* per-step scalars (kinetic energy, momentum, subnormal census) stream
  out of the scan; host-side GlitchDetector / PhysicsExploitEngine consume
  them between chunks (reference runs entropy checks every 10 ticks and
  exploit probes every 20 — the chunk length);
* the precision hook is the same quantized-|k|^2 Poisson solve + optional
  force quantization (reference: universe_2d.py:1050-1072).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import PLANCK18, Cosmology
from nbody_tpu.diagnostics import glitch as glitch_lib
from nbody_tpu.engines.epochs import EPOCHS, get_current_epoch
from nbody_tpu.ops import pm
from nbody_tpu.ops.precision import (
    Precision,
    Quantizer,
    describe_mode,
    quantize_force,
)

logger = logging.getLogger("nbody_tpu.cosmo")

G_NEWTON = 4.302e-6  # (km/s)^2 Mpc / M_sun (reference: universe_2d.py:176)
RHO_CRIT = 2.775e11  # M_sun / (Mpc/h)^3 (reference: universe_2d.py:1009)


@dataclasses.dataclass(frozen=True)
class PMConfig:
    """Static engine geometry/physics knobs (hashable, jit-static)."""

    dim: int = 2
    n_grid: int = 128
    box_size: float = 200.0
    dm_ratio: float = 5.0
    deposit: str = "ngp"          # "ngp" (reference parity) or "cic"
    G: float = G_NEWTON
    min_redshift: float = 0.01
    hubble_drag: float = 2.0      # drag coefficient (reference: 2*H*v)
    unit_scale: float = 1e-3      # the reference's ad-hoc kpc/km unit fudge


class CosmoState(NamedTuple):
    positions: jnp.ndarray   # (N, D), comoving Mpc in [0, box)
    velocities: jnp.ndarray  # (N, D)
    masses: jnp.ndarray      # (N,)
    redshift: jnp.ndarray    # f32 scalar
    tick: jnp.ndarray        # i32 scalar


class StepStream(NamedTuple):
    """Per-step scalars streamed out of the scan for the host detectors."""

    kinetic: jnp.ndarray      # (steps,)
    momentum: jnp.ndarray     # (steps, D)
    subnormals: jnp.ndarray   # (steps,) int32
    redshift: jnp.ndarray     # (steps,)


class ProbeBundle(NamedTuple):
    """Per-chunk structure + exploit metrics, all from ONE device program
    (reference computes these in separate per-call torch/numpy passes:
    BAO/clustering universe_2d.py:1203-1255, exploit probes :818-877)."""

    k_centers: jnp.ndarray    # (num_bins-1,) power-spectrum bin centers
    pk: jnp.ndarray           # (num_bins-1,) binned P(k)
    clustering: jnp.ndarray   # scalar density contrast std/mean
    exploit: glitch_lib.ExploitDeviceMetrics


@functools.partial(jax.jit, static_argnames=("box_size", "c_sim", "fov_cos"))
def probe_bundle(positions, velocities, prev_positions, obs_pos, obs_dir,
                 box_size: float, c_sim: float, fov_cos: float) -> ProbeBundle:
    """Fuse the power spectrum, clustering metric, and exploit device
    metrics into a single dispatch so the pipelined engine pays one launch
    + one async fetch per chunk. (Padded resident-sharded state goes
    through probe_bundle_sharded instead.)"""
    k, pk = pm.power_spectrum(positions, box_size)
    clus = pm.clustering_metric(positions, box_size)
    dm = glitch_lib.exploit_device_metrics(positions, velocities,
                                           prev_positions, obs_pos, obs_dir,
                                           c_sim, fov_cos)
    return ProbeBundle(k, pk, clus, dm)


@functools.partial(jax.jit, static_argnames=("box_size", "c_sim", "fov_cos",
                                             "n_valid", "mesh"))
def probe_bundle_sharded(positions, velocities, prev_positions,
                         obs_pos, obs_dir, box_size: float, c_sim: float,
                         fov_cos: float, n_valid: int,
                         mesh) -> ProbeBundle:
    """probe_bundle for resident-sharded (padded) state: per-shard NGP
    deposits + psum'd grids (O(grid) interconnect traffic, never a
    particle gather) and masked partial sums for the exploit scalars.
    Matches probe_bundle on trimmed state up to f32 summation order."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from nbody_tpu.parallel.ring import AXIS

    def local(p_l, v_l, pv_l, ids_l, obs_pos, obs_dir):
        valid = ids_l < n_valid
        w = valid.astype(jnp.float32)
        d64 = jax.lax.psum(pm.ngp_deposit(p_l, w, 64, box_size), AXIS)
        d32 = jax.lax.psum(pm.ngp_deposit(p_l, w, 32, box_size), AXIS)
        k, pk = pm.pk_from_density(d64, box_size)
        clus = jnp.std(d32) / (jnp.mean(d32) + 1e-10)

        # Per-row probe formulas shared with the single-device path
        # (glitch.exploit_row_metrics); only the reductions differ here
        # (masked partial sums + psum/pmax).
        gamma, beta, v_mag, in_frustum, snapped = \
            glitch_lib.exploit_row_metrics(p_l, v_l, pv_l, obs_pos,
                                           obs_dir, c_sim, fov_cos)

        dim = v_l.shape[1]
        cnt = jnp.maximum(jax.lax.psum(jnp.sum(w), AXIS), 1.0)
        # Stable two-pass variance (one-pass E[x^2]-mu^2 cancels
        # catastrophically in f32 for drifted velocity fields).
        comp_sum = jax.lax.psum(jnp.sum(v_l * w[:, None]), AXIS)
        mu = comp_sum / (cnt * dim)
        var = jax.lax.psum(
            jnp.sum(((v_l - mu) ** 2) * w[:, None]), AXIS) / (cnt * dim)
        dm = glitch_lib.ExploitDeviceMetrics(
            max_gamma=jax.lax.pmax(
                jnp.max(jnp.where(valid, gamma, 1.0)), AXIS),
            near_c_09=jax.lax.psum(
                jnp.sum((beta > 0.9) & valid), AXIS).astype(jnp.int32),
            near_c_099=jax.lax.psum(
                jnp.sum((beta > 0.99) & valid), AXIS).astype(jnp.int32),
            v_mean=jax.lax.psum(jnp.sum(v_mag * w), AXIS) / cnt,
            v_std=jnp.sqrt(var),
            in_frustum=jax.lax.psum(
                jnp.sum(in_frustum & valid), AXIS).astype(jnp.int32),
            snap_events=jax.lax.psum(
                jnp.sum(snapped & valid), AXIS).astype(jnp.int32),
        )
        return ProbeBundle(k, pk, clus, dm)

    ids = jnp.arange(positions.shape[0], dtype=jnp.int32)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=ProbeBundle(P(), P(), P(),
                              glitch_lib.ExploitDeviceMetrics(
                                  *([P()] * 7))),
        check_vma=False,
    )
    return fn(positions, velocities, prev_positions, ids, obs_pos, obs_dir)


class PendingChunk(NamedTuple):
    """Device handles + host metadata for one dispatched-but-uncollected
    chunk (dispatch_step -> collect_step)."""

    num_steps: int
    tick_start: int           # host tick BEFORE the chunk
    z_end: float              # f32-exact end-of-chunk redshift
    stream: StepStream        # device (async host copy in flight)
    probes: ProbeBundle       # device (async host copy in flight)
    positions: jnp.ndarray    # post-chunk state refs (async copy in flight)
    velocities: jnp.ndarray
    snap_stride: int = 1      # >1: snapshot already trimmed + decimated
                              # on device (snapshot_cap)


def _spec_sharded(x) -> bool:
    """True if the array carries a NamedSharding with a non-trivial
    PartitionSpec. The spec (not ``is_fully_replicated``) is what
    matters: on a mesh of ONE device a P('shards') array is trivially
    'fully replicated', but its explicit-sharding type still names the
    mesh axis and breaks jitted consumers outside the mesh context."""
    sh = getattr(x, "sharding", None)
    return (isinstance(sh, jax.sharding.NamedSharding)
            and any(p is not None for p in tuple(sh.spec)))


# --------------------------------------------------------------------------
# Initial conditions: gridded particles + P(k)-with-BAO Zel'dovich offsets
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_side", "cfg",
                                             "start_redshift", "cosmo"))
def make_zeldovich_ics(key, num_side: int, cfg: PMConfig,
                       start_redshift: float,
                       cosmo: Cosmology = PLANCK18):
    """Perturbed-lattice ICs (reference: universe_2d.py:949-1013):
    uniform grid + FFT-synthesised displacement field from a power
    spectrum with BAO wiggles, Zel'dovich-scaled by the growth factor,
    with velocities proportional to the displacement (a H f psi)."""
    dim, box = cfg.dim, cfg.box_size
    n = num_side

    spacing = box / n
    axis = jnp.linspace(spacing / 2, box - spacing / 2, n)
    mesh = jnp.meshgrid(*([axis] * dim), indexing="ij")
    positions = jnp.stack([m.reshape(-1) for m in mesh], axis=1)

    k1d = jnp.fft.fftfreq(n, d=box / n) * 2 * jnp.pi
    kvecs = jnp.meshgrid(*([k1d] * dim), indexing="ij")
    k_mag = jnp.sqrt(sum(k * k for k in kvecs) + 1e-10)

    # P(k) with BAO wiggles (reference: universe_2d.py:978-982)
    k_bao = 2 * jnp.pi / cosmo.bao_scale_mpc
    pk = (k_mag / 0.1 + 1e-10) ** (cosmo.n_s - 4.0) * jnp.exp(-(k_mag / 0.5) ** 2)
    pk = pk * (1.0 + 0.15 * jnp.cos(k_mag / k_bao * jnp.pi))

    phases = jax.random.uniform(key, k_mag.shape) * 2 * jnp.pi
    delta_k = jnp.sqrt(pk) * jnp.exp(1j * phases)

    psi_k = delta_k / (k_mag ** 2 + 1e-10)
    psi_k = psi_k.at[(0,) * dim].set(0.0)

    disps = [jnp.real(jnp.fft.ifftn(-1j * kv * psi_k)).reshape(-1)
             for kv in kvecs]
    displacement = jnp.stack(disps, axis=1)

    D = cosmo.growth_factor(start_redshift)
    amplitude = 5.0 * D
    positions = (positions + displacement * amplitude) % box

    f_growth = cosmo.omega_m ** 0.55
    H_z = cosmo.hubble_parameter(start_redshift)
    a = 1.0 / (1.0 + start_redshift)
    velocities = a * H_z * f_growth * displacement * amplitude * cfg.unit_scale

    # Masses: effective mean matter density over the box
    # (reference: universe_2d.py:1008-1011)
    if dim == 2:
        total_mass = cosmo.omega_m * RHO_CRIT * box ** 2 * 10.0
    else:
        total_mass = cosmo.omega_m * RHO_CRIT * box ** 3
    masses = jnp.full((n ** dim,), total_mass / n ** dim, jnp.float32)

    return (positions.astype(jnp.float32), velocities.astype(jnp.float32),
            masses)


# --------------------------------------------------------------------------
# Functional PM step
# --------------------------------------------------------------------------

def pm_accelerations(positions, masses, q: Quantizer, cfg: PMConfig,
                     scale, quantize_forces: bool):
    """One PM force evaluation (reference: universe_2d.py:1015-1075)."""
    deposit = pm.cic_deposit if cfg.deposit == "cic" else pm.ngp_deposit
    gather = pm.cic_gather if cfg.deposit == "cic" else pm.ngp_gather

    density = deposit(positions, masses, cfg.n_grid, cfg.box_size)
    if cfg.dm_ratio > 0:
        dm = pm.dm_background_field(cfg.box_size, cfg.n_grid, cfg.dm_ratio,
                                    cfg.dim)
        density = density + dm * jnp.mean(density)

    grids = pm.poisson_accel_grids(density, cfg.box_size, cfg.n_grid, q,
                                   cfg.G, scale, cfg.dim)
    acc = gather(grids, positions, cfg.n_grid, cfg.box_size)
    # Reference PM engines apply quantize_force only for INT4/INT8
    # (universe_2d.py:1071-1072), NOT for CUSTOM level counts — gate on
    # the mode, not q.is_int (which includes CUSTOM).
    if quantize_forces and q.mode in (Precision.INT4_SIM, Precision.INT8_SIM):
        acc = quantize_force(acc, q)
    return acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("q", "cfg", "quantize_forces"))
def run_pm_steps(state: CosmoState, schedule, q: Quantizer, cfg: PMConfig,
                 quantize_forces: bool = True):
    """Scan over a precomputed (z_new, dt_gyr, H, a) schedule.

    Integration (reference: universe_2d.py:1196-1209):
        v += a_grav * dt - hubble_drag * H * v * dt * unit_scale
        x  = (x + v * dt / a * unit_scale) mod box
    """
    z_new, dt, H, a = schedule

    def step(s: CosmoState, xs):
        zn, dtn, Hn, an = xs
        acc = pm_accelerations(s.positions, s.masses, q, cfg, an,
                               quantize_forces)
        vel = (s.velocities + acc * dtn
               - cfg.hubble_drag * Hn * s.velocities * dtn * cfg.unit_scale)
        pos = (s.positions + vel * dtn / an * cfg.unit_scale) % cfg.box_size
        new = CosmoState(pos, vel, s.masses,
                         jnp.asarray(zn, jnp.float32), s.tick + 1)
        ke = 0.5 * jnp.sum(s.masses * jnp.sum(vel * vel, axis=-1))
        mom = jnp.sum(s.masses[:, None] * vel, axis=0)
        sub = glitch_lib.count_subnormals(pos).subnormal_count
        return new, StepStream(ke, mom, sub, jnp.asarray(zn, jnp.float32))

    state, stream = jax.lax.scan(step, state, (z_new, dt, H, a))
    return state, stream


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------

class CosmologicalEngine:
    """Stateful wrapper with the reference's Universe2D/3D API surface:
    step / run_to_completion / power spectrum / BAO / clustering /
    glitch + exploit histories (reference: universe_2d.py:884-1293)."""

    def __init__(self, num_particles: int = 10000, box_size_mpc: float = 200.0,
                 start_redshift: float = 50.0, precision: str = "float32",
                 dm_ratio: float = 5.0, seed: int = 42, dim: int = 2,
                 n_grid: Optional[int] = None, deposit: str = "ngp",
                 cosmo: Cosmology = PLANCK18, min_redshift: float = 0.01,
                 glitch_threshold: float = 0.05, ic_fn=None, mesh=None,
                 snapshot_cap: Optional[int] = None):
        self.cosmo = cosmo
        if n_grid is None:
            n_grid = 128 if dim == 2 else 32
        self.cfg = PMConfig(dim=dim, n_grid=n_grid, box_size=box_size_mpc,
                            dm_ratio=dm_ratio, deposit=deposit,
                            # Normalize to the f32-representable value:
                            # the schedule clamps z at min_redshift in
                            # f64 but the state stores f32, so a
                            # min_redshift that rounds UP in f32 (0.1,
                            # 0.3, ...) would leave state.redshift
                            # strictly above the raw threshold and
                            # run_to_completion would spin forever on
                            # 1-step chunks.
                            min_redshift=float(np.float32(min_redshift)))
        self.quantizer = Quantizer.from_string(precision)
        self.precision_str = precision
        # Optional 1-D particle mesh: every step runs the sharded PM
        # pipeline (replicated grid below 256^dim, fully sharded FFT
        # above — parallel/pm_sharded.py).
        self.mesh = mesh
        # Optional cap on the per-chunk diagnostic snapshot: above the
        # cap the post-chunk (positions, velocities) handed to the host
        # detectors are DECIMATED ON DEVICE with a uniform stride before
        # the host copy starts. The physics state is untouched; the
        # entropy / Landauer probes then run on the strided subsample
        # (a documented proxy — both compare like-for-like across the
        # run) and streaming consumers (realtime monitors, dashboards)
        # receive the subsample. At 1M particles this turns a ~16 MB
        # per-frame tunnel transfer + 1M-row host probes into a
        # cap-sized one (the reference ships full state every frame but
        # caps itself at 10k particles, realtime_reality_engine.py:187-345).
        self.snapshot_cap = (int(snapshot_cap)
                             if snapshot_cap and snapshot_cap > 0 else None)

        num_side = max(2, round(num_particles ** (1.0 / dim)))
        self.num_particles = num_side ** dim
        self.num_side = num_side
        self.seed = seed

        self.start_redshift = float(start_redshift)
        self.glitch_detector = glitch_lib.GlitchDetector(glitch_threshold)
        self.exploit_engine = glitch_lib.PhysicsExploitEngine()
        self.completed = False
        self.running = True
        self.current_epoch = get_current_epoch(start_redshift)

        key = jax.random.PRNGKey(seed)
        ic_fn = ic_fn or make_zeldovich_ics
        pos, vel, masses = ic_fn(key, num_side, self.cfg,
                                 self.start_redshift, cosmo)

        # Normalize masses to O(1) and fold the physical mass unit into G.
        # Reference masses carry raw RHO_CRIT-scale units (~1e22 M_sun per
        # particle, universe_2d.py:1008-1011), which pushes f32 KE/momentum
        # diagnostics within 4x of overflow. Because the PM force is linear
        # in the mass scale (acc ~ G * mean_rho * delta), accelerations —
        # and therefore every position/velocity trajectory and physics
        # verdict — are unchanged (up to f32 rounding). Device reductions
        # run in the safe normalized units; the HOST boundary (collect_step,
        # get_kinetic_energy, get_total_momentum) multiplies mass_unit_msun
        # back in, so histories, the glitch detector (whose momentum check
        # uses the reference's ABSOLUTE M_sun-weighted threshold,
        # universe_2d.py:388-401), and exports all see reference units.
        self.mass_unit_msun = float(jnp.mean(masses))
        if self.mass_unit_msun > 0:
            masses = masses / self.mass_unit_msun
            self.cfg = dataclasses.replace(
                self.cfg, G=self.cfg.G * self.mass_unit_msun)
        else:  # degenerate ICs (massless test fixtures): no normalization,
            self.mass_unit_msun = 1.0  # and the host-side restore is a no-op
        self.state = CosmoState(pos, vel, masses,
                                jnp.asarray(start_redshift, jnp.float32),
                                jnp.asarray(0, jnp.int32))

        self.history = {
            "redshift": [self.redshift],
            "time_gyr": [self.time_gyr],
            "bao_scale": [],
            "clustering": [],
            "glitches": [],
            "energy": [],
            "exploits": [],
        }
        logger.info("CosmologicalEngine: %dD, %d particles, grid %d^%d, "
                    "box %.0f Mpc, z=%.1f, %s", dim, self.num_particles,
                    n_grid, dim, box_size_mpc, start_redshift,
                    describe_mode(self.quantizer.mode))

    # -- properties ---------------------------------------------------------
    #
    # redshift/tick are served from host-side shadows kept exactly in sync
    # with the device schedule, so reading them never blocks on in-flight
    # device work (essential for the pipelined dispatch/collect path).
    # Assigning .state from outside (checkpoint restore, tests) invalidates
    # the shadows; the next read syncs them from the device once.

    @property
    def state(self) -> CosmoState:
        return self._state

    @state.setter
    def state(self, s: CosmoState):
        self._state = s
        self._shadow_valid = False

    def _sync_shadows(self):
        self._z_host = float(self._state.redshift)
        self._tick_host = int(self._state.tick)
        self._shadow_valid = True

    @property
    def redshift(self) -> float:
        if not self._shadow_valid:
            self._sync_shadows()
        return self._z_host

    @property
    def scale(self) -> float:
        return 1.0 / (1.0 + self.redshift)

    @property
    def time_gyr(self) -> float:
        return self.cosmo.cosmic_time_gyr(max(self.redshift, 0.0))

    @property
    def tick(self) -> int:
        if not self._shadow_valid:
            self._sync_shadows()
        return self._tick_host

    # The resident-sharded mesh loop keeps state padded to a shard
    # multiple; these views always expose exactly the real rows (a no-op
    # when the state is unpadded — the usual case). A padded SHARDED
    # array cannot be sliced to a non-divisible length, so it is
    # replicated first (explicit gather: these are export/diagnostic
    # views, not the step loop).

    def _trim_rows(self, x):
        # Replicate whenever the array is mesh-sharded — even when N
        # divides the mesh (no padding), a 'shards'-spec'd array must
        # not leak into jitted consumers outside the mesh context.
        n = self.num_particles
        if _spec_sharded(x):
            x = jax.device_put(
                x, jax.sharding.NamedSharding(
                    x.sharding.mesh, jax.sharding.PartitionSpec()))
        return x if x.shape[0] == n else x[:n]

    @property
    def positions(self):
        return self._trim_rows(self.state.positions)

    @property
    def velocities(self):
        return self._trim_rows(self.state.velocities)

    @property
    def masses(self):
        return self._trim_rows(self.state.masses)

    @property
    def snapshot_stride(self) -> int:
        """Decimation stride applied to every snapshot shipped to host
        under ``snapshot_cap`` — the single authority for the cap
        semantics (dispatch_step and any initial-frame publisher must
        agree, or monitor buffers sized off the first frame break)."""
        if (self.snapshot_cap is not None
                and self.num_particles > self.snapshot_cap):
            return -(-self.num_particles // self.snapshot_cap)
        return 1

    def _trimmed_state(self) -> CosmoState:
        """State with padding removed (checkpoint/export form). One
        batched device_put replicates all three particle arrays (three
        property reads would issue three sequential gathers)."""
        st = self._state
        n = self.num_particles
        sharded = _spec_sharded(st.positions)
        if st.positions.shape[0] == n and not sharded:
            return st
        arrays = (st.positions, st.velocities, st.masses)
        if sharded:
            arrays = jax.device_put(
                arrays, jax.sharding.NamedSharding(
                    st.positions.sharding.mesh,
                    jax.sharding.PartitionSpec()))
        pos, vel, masses = (a if a.shape[0] == n else a[:n]
                            for a in arrays)
        return CosmoState(pos, vel, masses, st.redshift, st.tick)

    # -- schedule -----------------------------------------------------------

    def _build_schedule(self, dz: float, num_steps: int):
        """Host-side (z, dt, H, a) table for the next num_steps steps.

        Returns ``(schedule_arrays, z_end)`` where ``z_end`` is the
        f32-exact end-of-chunk redshift (identical to what the scan will
        store in ``state.redshift``) — the single source for the host
        shadows, so the schedule and the shadow can never diverge."""
        z = self.redshift
        zs, dts, Hs, As = [], [], [], []
        for _ in range(num_steps):
            z_new = max(self.cfg.min_redshift, z - dz)
            dt = abs(self.cosmo.cosmic_time_gyr(z_new)
                     - self.cosmo.cosmic_time_gyr(z))
            zs.append(z_new)
            dts.append(dt)
            Hs.append(self.cosmo.hubble_parameter(z))
            As.append(1.0 / (1.0 + z))
            z = z_new
        arrays = (jnp.asarray(zs, jnp.float32), jnp.asarray(dts, jnp.float32),
                  jnp.asarray(Hs, jnp.float32), jnp.asarray(As, jnp.float32))
        return arrays, float(np.float32(zs[-1]))

    # -- stepping -----------------------------------------------------------

    def step(self, dz: float = 1.0, num_steps: int = 1):
        """Advance num_steps redshift steps in one fused scan, then run the
        host-side detectors over the streamed diagnostics."""
        pending = self.dispatch_step(dz, num_steps)
        if pending is not None:
            self.collect_step(pending)

    def dispatch_step(self, dz: float = 1.0,
                      num_steps: int = 1) -> Optional[PendingChunk]:
        """Device half of step(): launch the fused scan chunk plus the
        probe bundle and start async device->host copies. Returns a handle
        for collect_step(), or None once the run is complete.

        dispatch/collect lets run_to_completion(pipelined=True) overlap
        chunk k's host detectors with chunk k+1's device compute — nothing
        here blocks on device results."""
        if self.completed or self.redshift <= self.cfg.min_redshift:
            self._mark_complete()
            return None

        schedule, z_end = self._build_schedule(dz, num_steps)
        if self.mesh is not None:
            from nbody_tpu.parallel import pm_sharded

            runner = (pm_sharded.run_pm_steps_sharded_fft
                      if self.cfg.n_grid >= 256
                      else pm_sharded.run_pm_steps_sharded)
            # Resident-sharded loop: gather=False keeps the state padded
            # + sharded between chunks — no per-chunk all-gather of the
            # particle set over ICI (the runner's pad/reshard become
            # no-ops once the state is already padded and sharded). The
            # mesh context is required once inputs arrive sharded
            # (explicit-sharding reshard resolves axis names against it).
            # Fresh/restored states may live on a single device — put
            # them on the mesh once (replicated; the runner shards).
            mesh_devs = set(self.mesh.devices.flat)
            if set(self._state.positions.devices()) != mesh_devs:
                repl = jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec())
                self._state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, repl), self._state)
            with jax.set_mesh(self.mesh):
                self._state, stream = runner(
                    self._state, schedule, self.quantizer, self.cfg,
                    self.mesh, quantize_forces=self.quantizer.is_int,
                    n_valid=self.num_particles, gather=False)
        else:
            self._state, stream = run_pm_steps(self._state, schedule,
                                               self.quantizer, self.cfg)

        eng = self.exploit_engine
        prev, obs_pos, obs_dir = eng.probe_inputs(self._state.positions)
        if self.mesh is not None:
            with jax.set_mesh(self.mesh):
                probes = probe_bundle_sharded(
                    self._state.positions, self._state.velocities,
                    prev, obs_pos, obs_dir, self.cfg.box_size,
                    eng.c_sim, eng.fov_cos,
                    n_valid=self.num_particles, mesh=self.mesh)
        else:
            probes = probe_bundle(
                self._state.positions, self._state.velocities,
                prev, obs_pos, obs_dir, self.cfg.box_size,
                eng.c_sim, eng.fov_cos)
        # Observer rotates once per chunk, after the probe that used it
        # (reference cadence: universe_2d.py:877).
        eng.rotate_observer(5.0)

        # Advance the host shadows from the schedule itself (z_end is the
        # f32-exact value the scan stores in state.redshift).
        self._z_host = z_end
        self._tick_host = self._tick_host + num_steps

        snap_pos, snap_vel = self._state.positions, self._state.velocities
        if self.mesh is not None:
            # Replicate the diagnostic snapshot on-device (one fast ICI
            # all-gather) — fetching a sharded array to host goes through
            # a much slower per-shard assembly path on this platform.
            # The STATE stays resident-sharded; only the snapshot copies
            # replicate.
            repl = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec())
            snap_pos = jax.device_put(snap_pos, repl)
            snap_vel = jax.device_put(snap_vel, repl)
        snap_stride = self.snapshot_stride
        if snap_stride > 1:
            # Device-side decimation: trim padding and take a uniform
            # stride in one strided slice (cheap device op; the host
            # copy below then ships only cap-sized arrays).
            snap_pos = snap_pos[:self.num_particles:snap_stride]
            snap_vel = snap_vel[:self.num_particles:snap_stride]
        pending = PendingChunk(
            num_steps=num_steps, tick_start=self._tick_host - num_steps,
            z_end=z_end, stream=stream, probes=probes,
            positions=snap_pos, velocities=snap_vel,
            snap_stride=snap_stride)
        for leaf in jax.tree_util.tree_leaves(
                (pending.stream, pending.probes, pending.positions,
                 pending.velocities)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        if self._z_host <= self.cfg.min_redshift:
            self._mark_complete()
        return pending

    def collect_step(self, pending: PendingChunk):
        """Host half of step(): run the glitch detectors, entropy probe,
        structure measurements, and exploit probes over one fetched chunk.
        History semantics are identical to the sequential step().

        Returns the chunk's post-state host copies ``(positions,
        velocities)`` so streaming consumers (realtime pump, dashboards)
        can publish a history-consistent frame without a second
        device->host transfer."""
        # ONE fused fetch for everything the host half consumes: the four
        # transfers were started async at dispatch, but waiting on them
        # sequentially costs a tunnel round trip each (~10 ms/fetch on
        # this box's PJRT tunnel — it dominated the realtime pump at
        # small N).
        stream, probes, pos_h, vel_h = jax.device_get(
            (pending.stream, pending.probes,
             pending.positions, pending.velocities))
        # Resident-sharded state is padded to a shard multiple; the host
        # consumers (entropy probe, Landauer bits, streaming frames) see
        # only the real rows. Under snapshot_cap the snapshot arrived
        # already trimmed + stride-decimated from the device, and the
        # entropy/Landauer probes below run on that strided subsample.
        if pending.snap_stride == 1:
            pos_h = pos_h[:self.num_particles]
            vel_h = vel_h[:self.num_particles]
        num_steps = pending.num_steps
        tick_end = pending.tick_start + num_steps
        z_end = pending.z_end
        prev_energy = (self.history["energy"][-1]
                       if self.history["energy"] else 0.0)

        for i in range(num_steps):
            tick = pending.tick_start + 1 + i
            z = float(stream.redshift[i])
            # Restore M_sun-weighted units at the host boundary (device
            # sums run on normalized masses; the detector's momentum
            # threshold is absolute in reference units).
            ke = float(stream.kinetic[i]) * self.mass_unit_msun
            mom = tuple(float(x) * self.mass_unit_msun
                        for x in stream.momentum[i])
            self.history["energy"].append(ke)
            for ev in (
                self.glitch_detector.check_energy_conservation(ke, tick, z),
                self.glitch_detector.check_momentum(mom, tick, z),
            ):
                if ev:
                    self.history["glitches"].append(ev)
            # Unconditional per-step call (the reference checks every step,
            # universe_2d.py:1148) so subnormal_history stays a dense
            # per-step series; zero counts emit no event.
            sub = glitch_lib.SubnormalMetrics(
                subnormal_count=int(stream.subnormals[i]),
                zero_count=0, min_nonzero=float("inf"))
            ev = self.glitch_detector.check_subnormals(sub, tick, z)
            if ev:
                self.history["glitches"].append(ev)
            self.history["redshift"].append(z)
            self.history["time_gyr"].append(
                self.cosmo.cosmic_time_gyr(max(z, 0.0)))

            new_epoch = get_current_epoch(z)
            if new_epoch != self.current_epoch:
                info = EPOCHS[new_epoch]
                logger.info("EPOCH TRANSITION: %s (z=%.2f): %s", info.name,
                            z, info.description)
                self.current_epoch = new_epoch
                self._on_epoch_transition(tick, z, new_epoch)

        # entropy check on the post-chunk state (reference: every 10 ticks);
        # above 20k particles the native single-pass probe replaces the
        # zlib proxy (~90x cheaper per check, same spike semantics)
        entropy_fn = (glitch_lib.fast_state_entropy
                      if self.num_particles > 20000
                      else glitch_lib.measure_state_entropy)
        ent = entropy_fn(pos_h, vel_h)
        ev = self.glitch_detector.check_entropy(ent.compression_ratio,
                                                tick_end, z_end)
        if ev:
            self.history["glitches"].append(ev)

        # per-chunk structure measurements (reference logs BAO/clustering
        # every 10 ticks, universe_2d.py:1203-1207)
        self.history["bao_scale"].append(
            pm.bao_scale_from_pk(probes.k_centers, probes.pk))
        self.history["clustering"].append(float(probes.clustering))

        # exploit probes (reference: every 20 ticks)
        ke_now = self.history["energy"][-1]
        results = self.exploit_engine.finish_probes(
            probes.exploit, pos_h, vel_h,
            gpu_power=0.0, energy_delta=ke_now - prev_energy,
            n_total=self.num_particles)
        self.history["exploits"].append(
            {"tick": tick_end, "redshift": z_end, **results})
        return pos_h, vel_h

    def _on_epoch_transition(self, tick: int, z: float, epoch):
        """Hook for engine subclasses (genesis records a timeline)."""

    def _mark_complete(self):
        if not self.completed:
            self.completed = True
            self.running = False
            logger.info("SIMULATION COMPLETE at z=%.4f, t=%.3f Gyr",
                        self.redshift, self.time_gyr)

    def run_to_completion(self, dz: float = 1.0, chunk: int = 10,
                          callback=None, pipelined: bool = False):
        """Evolve to min_redshift in fused chunks
        (chunk=10 matches the reference's entropy-check cadence).

        pipelined=True overlaps chunk k's host-side detectors with chunk
        k+1's device compute (one chunk of latency between dispatch and
        history append; histories are bit-identical to the sequential
        path and fully drained on return). Note for callbacks: in
        pipelined mode the callback fires after chunk k's histories are
        appended but chunk k+1 is already dispatched, so live properties
        (``engine.tick``/``redshift``/``positions``) are one chunk AHEAD
        of the histories — consume ``engine.history`` (authoritative,
        self-consistent) rather than pairing it with live properties."""
        if not pipelined:
            while not self.completed:
                remaining = (self.redshift - self.cfg.min_redshift) / dz
                n = max(1, min(chunk, int(math.ceil(remaining))))
                self.step(dz, num_steps=n)
                if callback:
                    callback(self)
            return

        pending = None
        while not self.completed:
            remaining = (self.redshift - self.cfg.min_redshift) / dz
            n = max(1, min(chunk, int(math.ceil(remaining))))
            nxt = self.dispatch_step(dz, num_steps=n)
            if pending is not None:
                self.collect_step(pending)
                if callback:
                    callback(self)
            pending = nxt
        if pending is not None:
            self.collect_step(pending)
            if callback:
                callback(self)

    # -- diagnostics --------------------------------------------------------

    def get_kinetic_energy(self) -> float:
        # Raw (possibly padded) state is safe here: phantom rows carry
        # zero mass, so mass-weighted sums need no trim/gather. The device
        # sum runs on normalized masses; M_sun units restored on host.
        v_sq = jnp.sum(self.state.velocities ** 2, axis=-1)
        return float(0.5 * jnp.sum(self.state.masses * v_sq)) \
            * self.mass_unit_msun

    def get_total_momentum(self):
        mom = jnp.sum(self.state.masses[:, None] * self.state.velocities,
                      axis=0)
        return tuple(float(x) * self.mass_unit_msun
                     for x in np.asarray(mom))

    def compute_power_spectrum(self, n_grid: int = 64, num_bins: int = 20):
        k, pk = pm.power_spectrum(self.positions, self.cfg.box_size,
                                  n_grid, num_bins)
        return np.asarray(k), np.asarray(pk)

    def get_bao_scale(self) -> float:
        k, pk = self.compute_power_spectrum()
        return pm.bao_scale_from_pk(k, pk)

    def get_clustering(self) -> float:
        return float(pm.clustering_metric(self.positions,
                                          self.cfg.box_size))

    # -- checkpointing --------------------------------------------------

    # Dataclass types inside history["exploits"] entries and the exploit
    # engine's own per-metric history (json round-trip needs explicit
    # reconstruction: json.dumps(default=str) would silently stringify).
    _EXPLOIT_TYPES = {"relativity": glitch_lib.RelativityMetrics,
                      "fluid": glitch_lib.FluidMetrics,
                      "landauer": glitch_lib.LandauerMetrics,
                      "frustum": glitch_lib.FrustumMetrics}

    @classmethod
    def _exploit_to_json(cls, entry: dict) -> dict:
        return {k: (dataclasses.asdict(v) if dataclasses.is_dataclass(v)
                    else v) for k, v in entry.items()}

    @classmethod
    def _exploit_from_json(cls, entry: dict) -> dict:
        return {k: (cls._EXPLOIT_TYPES[k](**v)
                    if k in cls._EXPLOIT_TYPES and isinstance(v, dict)
                    else v) for k, v in entry.items()}

    def _history_blob(self) -> dict:
        """JSON form of the run histories + glitch-detector + exploit-
        engine state, saved with every checkpoint so a resumed run
        reproduces the FULL drift curve, glitch log and exploit log from
        its own state (the reference's headline observable spans the
        whole run, simulation.py:170-196)."""
        d = self.glitch_detector
        x = self.exploit_engine
        return {
            "history": {
                **{k: v for k, v in self.history.items()
                   if k not in ("glitches", "exploits")},
                "glitches": [dataclasses.asdict(g)
                             for g in self.history["glitches"]],
                "exploits": [self._exploit_to_json(e)
                             for e in self.history["exploits"]],
            },
            "detector": {
                "energy_history": d.energy_history,
                "momentum_history": [list(m) for m in d.momentum_history],
                "subnormal_history": d.subnormal_history,
                "entropy_history": d.entropy_history,
                "events": [dataclasses.asdict(g) for g in d.events],
            },
            "exploit_engine": {
                "initial_bits": x.initial_bits,
                "exploit_events": list(x.exploit_events),
                "gamma_history": list(x.gamma_history),
                "power_vs_gamma": [list(t) for t in x.power_vs_gamma],
                "history": {k: [dataclasses.asdict(m) for m in v]
                            for k, v in x.history.items()},
                # probe frame state: the rotating observer and whether a
                # previous-positions buffer existed. The buffer itself is
                # NOT stored — probe_inputs records the post-chunk
                # positions, so at a chunk boundary it equals the
                # checkpointed state and restore rebuilds it from there.
                "observer_pos": [float(v) for v in x.observer_pos],
                "observer_dir": [float(v) for v in x.observer_dir],
                "has_prev": x.prev_positions is not None,
            },
        }

    def _restore_history_blob(self, blob: dict) -> None:
        h = blob.get("history")
        if h:
            # merge: keys the running engine initializes but an older
            # blob lacks must survive (a wholesale replace would KeyError
            # on the next chunk's append)
            for k, v in h.items():
                self.history[k] = list(v)
            self.history["glitches"] = [
                glitch_lib.GlitchEvent(**g) for g in h.get("glitches", [])]
            self.history["exploits"] = [
                self._exploit_from_json(e) for e in h.get("exploits", [])]
        det = blob.get("detector")
        if det:
            d = self.glitch_detector
            d.energy_history = [float(x) for x in det["energy_history"]]
            d.momentum_history = [tuple(m)
                                  for m in det["momentum_history"]]
            d.subnormal_history = [int(x)
                                   for x in det["subnormal_history"]]
            d.entropy_history = [float(x) for x in det["entropy_history"]]
            d.events = [glitch_lib.GlitchEvent(**g)
                        for g in det.get("events", [])]
        eng = blob.get("exploit_engine")
        if eng:
            x = self.exploit_engine
            x.initial_bits = int(eng["initial_bits"])
            x.exploit_events = [str(s) for s in eng["exploit_events"]]
            x.gamma_history = [float(g) for g in eng["gamma_history"]]
            x.power_vs_gamma = [tuple(t) for t in eng["power_vs_gamma"]]
            x.history = {k: [self._EXPLOIT_TYPES[k](**m) for m in v]
                         for k, v in eng["history"].items()}
            if "observer_pos" in eng:
                x.observer_pos = np.asarray(eng["observer_pos"],
                                            np.float32)
                x.observer_dir = np.asarray(eng["observer_dir"],
                                            np.float32)
            if eng.get("has_prev"):
                # prev == post-chunk positions == the checkpointed state;
                # mesh engines keep it padded to the shard boundary (the
                # probe bundle masks phantom rows by n_valid)
                prev = self._trimmed_state().positions
                if self.mesh is not None:
                    n_shards = int(np.prod(list(self.mesh.shape.values())))
                    pad = (-prev.shape[0]) % n_shards
                    if pad:
                        prev = jnp.concatenate(
                            [prev, jnp.zeros((pad, prev.shape[1]),
                                             prev.dtype)], axis=0)
                    # restored arrays live on one device; the probe jit
                    # runs under the mesh context
                    prev = jax.device_put(prev, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()))
                x.prev_positions = prev

    def save_checkpoint(self, manager) -> int:
        """Write the CosmoState at the current tick (utils.checkpoint).
        Resident-sharded padding is stripped so checkpoints are
        mesh-shape-independent. Run histories ride in the metadata so a
        resumed run owns the full pre-crash drift curve."""
        manager.save(self.tick, self._trimmed_state(), {
            "precision": self.precision_str,
            "redshift": self.redshift,
            "num_particles": self.num_particles,
            "histories": self._history_blob(),
        })
        return self.tick

    def restore_latest(self, manager) -> Optional[int]:
        """Resume from the newest checkpoint, if any. Returns its tick."""
        step = manager.latest_step()
        if step is None:
            return None
        self.state = manager.restore(step, self._trimmed_state())
        self.completed = self.redshift <= self.cfg.min_redshift
        # re-sync derived run state with the restored redshift so the next
        # step does not log a bogus epoch transition
        self.current_epoch = get_current_epoch(self.redshift)
        blob = manager.load_metadata(step).get("histories")
        if blob:
            # full pre-crash histories (drift curve, glitch log, detector
            # thresholds state) come back with the checkpoint
            self._restore_history_blob(blob)
        else:
            # legacy checkpoint without histories: continue from the
            # resume point (pre-crash history lives with the writer)
            self.history["redshift"].append(self.redshift)
            self.history["time_gyr"].append(self.time_gyr)
        logger.info("resumed from checkpoint at tick %d (z=%.3f)", step,
                    self.redshift)
        return step

    def get_state_dict(self) -> dict:
        """Exportable state (reference: universe_genesis.py:500-511)."""
        st = self._trimmed_state()
        return {
            "positions": np.asarray(st.positions),
            "velocities": np.asarray(st.velocities),
            "masses": np.asarray(st.masses),
            "redshift": self.redshift,
            "time_gyr": self.time_gyr,
            "tick": self.tick,
            "precision": self.precision_str,
            "epoch": self.current_epoch.value,
            "num_particles": self.num_particles,
            "box_size_mpc": self.cfg.box_size,
            "mass_unit_msun": self.mass_unit_msun,
            "glitch_count": self.glitch_detector.get_glitch_count(),
        }
