"""Sharded PM pipeline vs the single-device engine (8-device CPU mesh).

Note on tolerances: the sharded deposit sums per-shard partial grids and
psums them, which rounds differently from the single segment_sum; in a
chaotic N-body system that f32-level difference amplifies per step, so
parity is asserted over short horizons with periodic-wrap-aware distances
(positions live on a torus — a particle at 199.9 vs 0.1 is 0.2 apart, not
199.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.engines import cosmo
from nbody_tpu.parallel import pm_sharded, ring


@pytest.fixture(scope="module")
def mesh8():
    return ring.make_particle_mesh(8)


def _engine(n=1024, precision="float32"):
    return cosmo.CosmologicalEngine(num_particles=n, start_redshift=20.0,
                                    precision=precision, dim=2, n_grid=32,
                                    seed=3)


def _periodic_dist(a, b, box):
    d = np.abs(np.asarray(a) - np.asarray(b))
    return np.minimum(d, box - d)


def test_sharded_single_force_eval_exact(mesh8):
    """One force evaluation must match the single-device PM bitwise-ish."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    e = _engine()
    st = e.state
    a_single = cosmo.pm_accelerations(st.positions, st.masses, e.quantizer,
                                      e.cfg, 1.0 / 21.0, False)
    ids = jnp.arange(st.positions.shape[0], dtype=jnp.int32)
    fn = shard_map(
        lambda p, m, i: pm_sharded._local_pm_accel(
            p, m, (i < ids.shape[0]).astype(jnp.float32), e.quantizer,
            e.cfg, 1.0 / 21.0),
        mesh=mesh8, in_specs=(P(ring.AXIS), P(ring.AXIS), P(ring.AXIS)),
        out_specs=P(ring.AXIS), check_vma=False)
    a_shard = fn(st.positions, st.masses, ids)
    np.testing.assert_allclose(np.asarray(a_shard), np.asarray(a_single),
                               rtol=1e-5, atol=1e-6)


def _tame_state(n=1024):
    """State with O(1) masses so per-step displacements are small and a
    rounding-level deposit difference cannot chaos-amplify within the
    test horizon (the engine's astronomical masses move particles across
    the whole box per step at these test sizes)."""
    e = _engine(n=n)
    st = e.state._replace(
        masses=jnp.ones_like(e.state.masses),
        velocities=e.state.velocities * 0.0)
    return e, st


@pytest.mark.parametrize("precision", ["float32", "int4"])
def test_sharded_pm_short_horizon(mesh8, precision):
    e = _engine(precision=precision)
    _, st = _tame_state()
    st = st._replace(positions=e.state.positions)
    schedule, _ = e._build_schedule(1.0, 3)
    sharded, sh_stream = pm_sharded.run_pm_steps_sharded(
        st, schedule, e.quantizer, e.cfg, mesh8,
        quantize_forces=e.quantizer.is_int)
    single, stream = cosmo.run_pm_steps(st, schedule, e.quantizer, e.cfg,
                                        quantize_forces=e.quantizer.is_int)
    d = _periodic_dist(sharded.positions, single.positions,
                       e.cfg.box_size)
    assert np.max(d) < 1e-2, f"max periodic deviation {np.max(d)}"
    np.testing.assert_allclose(np.asarray(sh_stream.kinetic),
                               np.asarray(stream.kinetic),
                               rtol=1e-3, atol=1e-6)
    # Total momentum nearly cancels (symmetric ICs): per-shard summation
    # order shifts the near-zero total by rounding-level amounts relative
    # to the ~1e11 per-particle magnitudes, so tolerate an absolute slack
    # proportional to those magnitudes.
    np.testing.assert_allclose(np.asarray(sh_stream.momentum),
                               np.asarray(stream.momentum),
                               rtol=1e-3, atol=1e7)
    np.testing.assert_array_equal(np.asarray(sh_stream.redshift),
                                  np.asarray(stream.redshift))


def test_sharded_pm_unaligned_particles(mesh8):
    """Particle count not divisible by shard count (padding path)."""
    e, st = _tame_state(n=900)  # 30^2 = 900, not divisible by 8
    schedule, _ = e._build_schedule(1.0, 2)
    sharded, sh_stream = pm_sharded.run_pm_steps_sharded(
        st, schedule, e.quantizer, e.cfg, mesh8)
    single, stream = cosmo.run_pm_steps(st, schedule, e.quantizer, e.cfg)
    d = _periodic_dist(sharded.positions, single.positions,
                       e.cfg.box_size)
    assert np.max(d) < 1e-2
    np.testing.assert_allclose(np.asarray(sh_stream.kinetic),
                               np.asarray(stream.kinetic),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("precision", ["float32", "int4"])
def test_sharded_fft_pm_matches_replicated(mesh8, precision):
    """The fully sharded FFT pipeline (reduce-scatter deposit ->
    distributed Poisson solve -> gather) must match the replicated-grid
    path at small grids — the parity gate for the n_grid >= 256 path.

    The engine's folded astronomical G gives per-step displacements of
    many box lengths, where the two paths' rounding-level deposit-order
    difference is amplified through the periodic wrap to O(ulp) of the
    raw displacement — so the parity run uses an unfolded G (O(1)
    dynamics); the pipeline stages themselves are asserted bit-exact in
    test_sharded_single_force_eval_exact."""
    import dataclasses

    e = _engine(precision=precision)
    cfg = dataclasses.replace(e.cfg, G=cosmo.G_NEWTON)
    _, st = _tame_state()
    st = st._replace(positions=e.state.positions)
    schedule, _ = e._build_schedule(1.0, 3)
    qf = e.quantizer.is_int
    fft_state, fft_stream = pm_sharded.run_pm_steps_sharded_fft(
        st, schedule, e.quantizer, cfg, mesh8, quantize_forces=qf)
    rep_state, rep_stream = pm_sharded.run_pm_steps_sharded(
        st, schedule, e.quantizer, cfg, mesh8, quantize_forces=qf)
    d = _periodic_dist(fft_state.positions, rep_state.positions,
                       cfg.box_size)
    assert np.max(d) < 1e-3, f"max periodic deviation {np.max(d)}"
    np.testing.assert_allclose(np.asarray(fft_stream.kinetic),
                               np.asarray(rep_stream.kinetic),
                               rtol=1e-4, atol=1e-9)


def test_engine_runs_sharded_when_mesh_given(mesh8):
    """CosmologicalEngine(mesh=...) routes every step through the sharded
    PM pipeline with identical host-side detector semantics."""
    kw = dict(num_particles=1024, start_redshift=20.0, precision="int4",
              dim=2, n_grid=32, seed=3)
    e_mesh = cosmo.CosmologicalEngine(mesh=mesh8, **kw)
    e_single = cosmo.CosmologicalEngine(**kw)
    e_mesh.step(1.0, num_steps=3)
    e_single.step(1.0, num_steps=3)
    assert e_mesh.tick == 3
    assert abs(e_mesh.redshift - e_single.redshift) < 1e-5
    assert len(e_mesh.history["energy"]) == 3
    assert len(e_mesh.glitch_detector.subnormal_history) == 3
    d = _periodic_dist(e_mesh.positions, e_single.positions,
                       e_mesh.cfg.box_size)
    assert np.isfinite(np.asarray(e_mesh.positions)).all()
    # identical ICs, same physics; deposit rounding differences only
    assert np.max(d) < 1.0


def test_sharded_fft_density(mesh8):
    """Large-grid path: FFT over a mesh-sharded density grid matches the
    unsharded FFT."""
    pos = jax.random.uniform(jax.random.PRNGKey(5), (2048, 2)) * 100.0
    w = jnp.ones(2048)
    from nbody_tpu.ops import pm as pm_ops

    sharded = pm_sharded.sharded_fft_density(pos, w, 64, 100.0, mesh8)
    dense = jnp.fft.fftn(pm_ops.ngp_deposit(pos, w, 64, 100.0))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("deposit", ["ngp", "cic"])
def test_slab_gather_partials_reconstruct_full(deposit):
    """Summing each slab's partial interpolation must equal the full
    gather (the slab-routed large-grid path's core invariant), including
    particles whose CIC stencil straddles a slab boundary."""
    from nbody_tpu.ops import pm as pm_ops

    n_grid, box, dim, n_slabs = 32, 100.0, 2, 8
    key = jax.random.PRNGKey(7)
    pos = jax.random.uniform(key, (512, dim)) * box
    # Pin some particles exactly onto slab boundaries.
    pos = pos.at[:8, 0].set(jnp.arange(8) * (box / n_slabs))
    grids = [jax.random.normal(jax.random.PRNGKey(d), (n_grid,) * dim)
             for d in range(dim)]

    full_fn = pm_ops.cic_gather if deposit == "cic" else pm_ops.ngp_gather
    slab_fn = (pm_ops.cic_gather_slab if deposit == "cic"
               else pm_ops.ngp_gather_slab)
    full = full_fn(grids, pos, n_grid, box)

    slab = n_grid // n_slabs
    total = jnp.zeros_like(full)
    for s in range(n_slabs):
        slabs = [g[s * slab:(s + 1) * slab] for g in grids]
        total = total + slab_fn(slabs, pos, n_grid, box, s * slab)
    # f32 summation-order deltas only (partials regroup the corner sums)
    np.testing.assert_allclose(np.asarray(total), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("precision", ["float32", "int4"])
def test_slab_gather_matches_replicate_gather(mesh8, precision):
    """The slab-routed gather (grids stay sharded; psum_scatter over the
    particle axis) must reproduce the replicated-grid gather end-to-end."""
    import dataclasses

    e = _engine(precision=precision)
    cfg = dataclasses.replace(e.cfg, G=cosmo.G_NEWTON)
    _, st = _tame_state()
    st = st._replace(positions=e.state.positions)
    schedule, _ = e._build_schedule(1.0, 3)
    qf = e.quantizer.is_int
    slab_state, slab_stream = pm_sharded.run_pm_steps_sharded_fft(
        st, schedule, e.quantizer, cfg, mesh8, quantize_forces=qf,
        gather_mode="slab")
    rep_state, rep_stream = pm_sharded.run_pm_steps_sharded_fft(
        st, schedule, e.quantizer, cfg, mesh8, quantize_forces=qf,
        gather_mode="replicate")
    d = _periodic_dist(slab_state.positions, rep_state.positions,
                       cfg.box_size)
    assert np.max(d) < 1e-4, f"max periodic deviation {np.max(d)}"
    np.testing.assert_allclose(np.asarray(slab_stream.kinetic),
                               np.asarray(rep_stream.kinetic),
                               rtol=1e-5, atol=1e-10)


def test_mesh_engine_pipelined_matches_sequential(mesh8):
    """The dispatch/collect pipeline must be history-identical to the
    sequential step() on the SHARDED engine path too (probe bundle +
    async copies over sharded arrays)."""
    kw = dict(num_particles=1024, start_redshift=8.0, precision="int4",
              dim=2, n_grid=32, seed=5)
    seq = cosmo.CosmologicalEngine(mesh=mesh8, **kw)
    pipe = cosmo.CosmologicalEngine(mesh=mesh8, **kw)
    seq.run_to_completion(dz=1.0, chunk=3)
    pipe.run_to_completion(dz=1.0, chunk=3, pipelined=True)
    assert pipe.completed
    np.testing.assert_array_equal(np.asarray(seq.positions),
                                  np.asarray(pipe.positions))
    for key in ("energy", "redshift", "bao_scale", "clustering"):
        assert seq.history[key] == pipe.history[key], key
    assert ([g.glitch_type for g in seq.history["glitches"]]
            == [g.glitch_type for g in pipe.history["glitches"]])


def test_mesh_engine_resident_sharded_loop(mesh8):
    """The mesh engine keeps its state padded+sharded between chunks
    (no per-chunk all-gather): internal state is a shard multiple while
    the public views expose exactly the real rows, including with a
    particle count not divisible by the mesh."""
    e = cosmo.CosmologicalEngine(num_particles=900, start_redshift=6.0,
                                 precision="int4", dim=2, n_grid=32,
                                 seed=7, mesh=mesh8)
    assert e.num_particles == 900  # 30^2, not divisible by 8
    e.step(1.0, num_steps=2)
    assert e._state.positions.shape[0] == 904  # padded internally
    assert e.positions.shape == (900, 2)
    assert np.isfinite(np.asarray(e.positions)).all()
    assert np.isfinite(e.get_kinetic_energy())
    assert np.isfinite(e.get_bao_scale())
    e.step(1.0, num_steps=2)  # second chunk consumes the padded state
    assert e._state.positions.shape[0] == 904
    assert len(e.history["energy"]) == 4
    sd = e.get_state_dict()
    assert sd["positions"].shape == (900, 2)


def test_mesh_engine_checkpoint_strips_padding(mesh8, tmp_path):
    """Checkpoints from a resident-sharded run are mesh-shape-independent
    (padding stripped on save; restore re-pads on the next dispatch)."""
    from nbody_tpu.utils.checkpoint import CheckpointManager

    kw = dict(num_particles=900, start_redshift=6.0, precision="float32",
              dim=2, n_grid=32, seed=9)
    e = cosmo.CosmologicalEngine(mesh=mesh8, **kw)
    e.step(1.0, num_steps=2)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    e.save_checkpoint(mgr)

    r = cosmo.CosmologicalEngine(mesh=mesh8, **kw)
    step = r.restore_latest(mgr)
    assert step == e.tick
    np.testing.assert_array_equal(np.asarray(r.positions),
                                  np.asarray(e.positions))
    r.step(1.0, num_steps=1)  # resumed state re-enters the sharded loop
    assert np.isfinite(np.asarray(r.positions)).all()


def test_mesh_engine_divisible_n_diagnostics(mesh8):
    """With N divisible by the mesh there is no padding, but the state is
    still sharded — diagnostic/export consumers (power spectrum, BAO,
    state dict, checkpoint form) must not leak a 'shards'-spec'd array
    into jits outside the mesh context (caught live: universe2d --mesh
    crashed in render_frame's compute_power_spectrum)."""
    e = cosmo.CosmologicalEngine(num_particles=1024, start_redshift=6.0,
                                 precision="int4", dim=2, n_grid=32,
                                 seed=13, mesh=mesh8)
    e.step(1.0, num_steps=2)
    k, pk = e.compute_power_spectrum()
    assert np.isfinite(pk).all()
    assert np.isfinite(e.get_bao_scale())
    assert np.isfinite(e.get_clustering())
    sd = e.get_state_dict()
    assert sd["positions"].shape == (1024, 2)
    st = e._trimmed_state()
    assert st.positions.sharding.is_fully_replicated


def test_fft_pm_odd_mesh_falls_back_to_replicated():
    """n_grid NOT divisible by the mesh: gather_mode='auto' must degrade
    to the replicated-grid pipeline instead of raising (n_grid=48 on a
    5-device mesh); an explicit 'slab' request is a clear error."""
    mesh5 = ring.make_particle_mesh(5)
    e = cosmo.CosmologicalEngine(num_particles=640, start_redshift=20.0,
                                 precision="float32", dim=2, n_grid=48,
                                 seed=3)
    schedule, _ = e._build_schedule(1.0, 2)
    fft_state, fft_stream = pm_sharded.run_pm_steps_sharded_fft(
        e.state, schedule, e.quantizer, e.cfg, mesh5,
        quantize_forces=False)
    rep_state, rep_stream = pm_sharded.run_pm_steps_sharded(
        e.state, schedule, e.quantizer, e.cfg, mesh5,
        quantize_forces=False)
    np.testing.assert_array_equal(np.asarray(fft_state.positions),
                                  np.asarray(rep_state.positions))
    np.testing.assert_array_equal(np.asarray(fft_stream.kinetic),
                                  np.asarray(rep_stream.kinetic))

    with pytest.raises(ValueError, match="divisible"):
        pm_sharded.run_pm_steps_sharded_fft(
            e.state, schedule, e.quantizer, e.cfg, mesh5,
            quantize_forces=False, gather_mode="slab")
