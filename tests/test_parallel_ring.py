"""Multi-device ring-force tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models import galaxy
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.state import make_state
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer
from nbody_tpu.parallel import ring

CFG = SimConfig()


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return ring.make_particle_mesh(8)


def _ics(n, seed=0):
    return galaxy.create_disk_galaxy(jax.random.PRNGKey(seed), num_stars=n)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_ring_force_matches_dense(mesh8, mode):
    pos, vel, m = _ics(256)
    q = Quantizer(mode)
    a_ring = ring.ring_accelerations(pos, m, q, CFG, mesh8,
                                     quantize_forces=q.is_int)
    a_ref = forces.dense_accelerations(pos, m, q, CFG,
                                       quantize_forces=q.is_int)
    np.testing.assert_allclose(np.asarray(a_ring), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_ring_force_unaligned_n(mesh8):
    """N not divisible by the shard count exercises the padding path."""
    pos, vel, m = _ics(250)
    q = Quantizer(Precision.FLOAT32)
    a_ring = ring.ring_accelerations(pos, m, q, CFG, mesh8)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_ring), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_ring_zero_softening_origin_particle_with_phantoms(mesh8):
    """Zero softening + unaligned N (phantom padding rows) + a real
    particle at exactly the origin: origin-filled phantoms would produce
    0*inf = NaN in real force rows and in the PE ring (phantom-phantom
    rsqrt(0)); the far-sentinel phantom fill must keep both exact."""
    from nbody_tpu.diagnostics.metrics import potential_energy

    cfg0 = SimConfig(softening=0.0)
    pos, vel, m = _ics(250)
    pos = pos.at[0].set(0.0)
    q = Quantizer(Precision.FLOAT32)
    a_ring = ring.ring_accelerations(pos, m, q, cfg0, mesh8)
    assert np.isfinite(np.asarray(a_ring)).all()
    a_ref = forces.dense_accelerations(pos, m, q, cfg0)
    np.testing.assert_allclose(np.asarray(a_ring), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)
    pe_ring = float(ring.ring_potential_energy(pos, m, cfg0, mesh8))
    pe_ref = float(potential_energy(pos, m, cfg0))
    assert np.isfinite(pe_ring)
    np.testing.assert_allclose(pe_ring, pe_ref, rtol=1e-5)


def test_sharded_run_matches_single_device(mesh8):
    """A sharded leapfrog run must track the single-device engine."""
    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.FLOAT32)
    out, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=20)

    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           force_impl="dense")
    sim.step(20)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(sim.positions),
                               rtol=1e-4, atol=1e-4)


def test_sharded_run_energy_stream(mesh8):
    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.FLOAT32)
    out, es = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=20,
                                     steps_per_chunk=5)
    assert es.kinetic.shape == (4,)
    assert es.total.shape == (4,)
    for arr in es:
        assert np.isfinite(np.asarray(arr)).all()
    np.testing.assert_allclose(np.asarray(es.total),
                               np.asarray(es.kinetic + es.potential),
                               rtol=1e-6)
    # The stream must agree with the single-device diagnostics on the
    # final state.
    from nbody_tpu.diagnostics.metrics import kinetic_energy, potential_energy
    ke_direct = float(kinetic_energy(out.velocities, out.masses))
    pe_direct = float(potential_energy(out.positions, out.masses, CFG))
    np.testing.assert_allclose(float(es.kinetic[-1]), ke_direct, rtol=1e-3)
    np.testing.assert_allclose(float(es.potential[-1]), pe_direct,
                               rtol=1e-3)


def test_ring_potential_energy_matches_single_device(mesh8):
    """Sharded PE (ring pass) vs the single-device tiled reduction,
    including the unaligned-N padding path."""
    from nbody_tpu.diagnostics.metrics import potential_energy

    for n in (256, 250):
        pos, vel, m = _ics(n)
        pe_ring = float(ring.ring_potential_energy(pos, m, CFG, mesh8))
        pe_ref = float(potential_energy(pos, m, CFG))
        np.testing.assert_allclose(pe_ring, pe_ref, rtol=1e-5)


def test_ring_potential_energy_pallas_tile(monkeypatch):
    """The Pallas pair-PE tile (production TPU path, interpret mode on
    CPU) must match the single-device reduction, including unaligned N
    (phantom padding) and the source-chunked large-shard path.

    NOTE on the monkeypatched module globals (_PE_TILE_IMPL, budget,
    chunk floor): they are read at TRACE time, and the jitted wrappers
    cache by (function, shapes, statics) — these (mesh2, N) combos must
    stay unique to this test or a cached trace from another test would
    silently bypass the patched path (and vice versa)."""
    from nbody_tpu.diagnostics.metrics import potential_energy

    monkeypatch.setattr(ring, "_PE_TILE_IMPL", "pallas")
    monkeypatch.setattr(ring, "_VMEM_RESIDENT_BUDGET", 4 * 4 * 64)
    monkeypatch.setattr(ring, "_SRC_CHUNK_FLOOR", 64)
    mesh2 = ring.make_particle_mesh(2)
    for n in (320, 250):
        pos, vel, m = _ics(n)
        pe_ring = float(ring.ring_potential_energy(pos, m, CFG, mesh2))
        pe_ref = float(potential_energy(pos, m, CFG))
        np.testing.assert_allclose(pe_ring, pe_ref, rtol=1e-5)


def test_sharded_total_energy_drift_matches_single_device(mesh8):
    """The headline observable: total-energy drift trajectories from the
    sharded path must match the single-device engine
    (reference semantics: simulation.py:176-196)."""
    pos, vel, m = _ics(256)
    q = Quantizer(Precision.FLOAT32)
    _, es = ring.run_steps_sharded(make_state(pos, vel, m), q, CFG, mesh8,
                                   num_steps=20, steps_per_chunk=5)

    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           force_impl="dense")
    e0 = sim.get_total_energy()
    singles = []
    for _ in range(4):
        sim.step(5)
        singles.append(sim.get_total_energy())
    np.testing.assert_allclose(np.asarray(es.total), np.asarray(singles),
                               rtol=2e-4, atol=2e-4 * abs(e0))


def test_sharded_run_gather_false_keeps_sharded_state(mesh8):
    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.FLOAT32)
    out_s, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=5,
                                      gather=False)
    out_g, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=5)
    # Sharded output: one shard per device, same physics after gather.
    assert len(out_s.positions.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out_s.positions)[:256],
                               np.asarray(out_g.positions),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n_dev", [1, 2, 3, 5, 8])
@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_sym_schedule_matches_rows(n_dev, mode):
    """The half-ring Newton's-third-law schedule must reproduce the plain
    ring on every mesh size (odd rings take the unconditional path; even
    rings exercise the duplicated half-distance step + lax.cond)."""
    mesh = ring.make_particle_mesh(n_dev)
    pos, vel, m = _ics(250)  # unaligned N exercises padding too
    q = Quantizer(mode)
    a_sym = ring.ring_accelerations(pos, m, q, CFG, mesh,
                                    quantize_forces=q.is_int,
                                    schedule="sym")
    a_rows = ring.ring_accelerations(pos, m, q, CFG, mesh,
                                     quantize_forces=q.is_int,
                                     schedule="rows")
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_rows),
                               rtol=5e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_sym_schedule_pallas_tile(mesh8, mode):
    """Production sym path: Pallas pair-force-sym tiles (interpret mode on
    CPU) must match the jnp sym tiles."""
    pos, vel, m = _ics(256)
    q = Quantizer(mode)
    a_jnp = ring.ring_accelerations(pos, m, q, CFG, mesh8, tile_impl="jnp",
                                    quantize_forces=q.is_int,
                                    schedule="sym")
    a_pal = ring.ring_accelerations(pos, m, q, CFG, mesh8,
                                    tile_impl="pallas",
                                    quantize_forces=q.is_int,
                                    schedule="sym")
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_jnp),
                               rtol=5e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_ring_uniform_gm_matches_general(mode):
    """Equal-mass fast path on the sym ring must match the general path.

    128-particle shards (N=256 on 2 devices) keep every Pallas tile
    padding-free, so the uniform kernels genuinely run (smaller shards
    would silently degrade to the general path inside the wrappers)."""
    mesh2 = ring.make_particle_mesh(2)
    pos, vel, m = _ics(256)  # disk-galaxy masses are uniform (all 1.0)
    q = Quantizer(mode)
    a_gen = ring.ring_accelerations(pos, m, q, CFG, mesh2,
                                    tile_impl="pallas",
                                    quantize_forces=q.is_int,
                                    schedule="sym")
    a_uni = ring.ring_accelerations(pos, m, q, CFG, mesh2,
                                    tile_impl="pallas",
                                    quantize_forces=q.is_int,
                                    schedule="sym", uniform_gm=True)
    np.testing.assert_allclose(np.asarray(a_uni), np.asarray(a_gen),
                               rtol=5e-5, atol=2e-6)


def test_ring_uniform_gm_unaligned_auto_disables(mesh8):
    """uniform_gm on a phantom-padded layout (N % shards != 0) must be
    auto-disabled: phantom rows rely on gm=0 to stay inert, which the
    uniform kernels cannot honor. Result must still be exact."""
    pos, vel, m = _ics(250)
    q = Quantizer(Precision.FLOAT32)
    a_uni = ring.ring_accelerations(pos, m, q, CFG, mesh8, uniform_gm=True)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_uni), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_uniform_gm_sharded_run_matches_general(mesh8):
    """End-to-end sharded leapfrog with uniform_gm=True must track the
    general sharded run (jnp tiles on CPU ignore the flag; this pins the
    runner plumbing — carry shapes, bounds-reuse interaction)."""
    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.INT4_SIM)
    out_u, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=10,
                                      quantize_forces=True,
                                      uniform_gm=True)
    out_g, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=10,
                                      quantize_forces=True)
    np.testing.assert_allclose(np.asarray(out_u.positions),
                               np.asarray(out_g.positions),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_ring_source_chunked_tiles_match(monkeypatch, mode):
    """Shards past the VMEM residency budget split every ring tile into
    source chunks (diagonal via the chunked sym ladder, pair tiles via
    column chunks). A shrunken budget + chunk floor forces the chunked
    paths at CPU scale; results must match the dense reference."""
    monkeypatch.setattr(ring, "_VMEM_RESIDENT_BUDGET", 4 * 5 * 64)
    monkeypatch.setattr(ring, "_SRC_CHUNK_FLOOR", 64)
    mesh2 = ring.make_particle_mesh(2)
    pos, vel, m = _ics(320)  # 160-particle shards -> 3 source chunks
    q = Quantizer(mode)
    a = ring.ring_accelerations(pos, m, q, CFG, mesh2, tile_impl="pallas",
                                quantize_forces=q.is_int, schedule="sym")
    ref = forces.dense_accelerations(pos, m, q, CFG,
                                     quantize_forces=q.is_int)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=5e-5, atol=2e-6)


def test_ring_source_chunked_rows_schedule(monkeypatch):
    """The plain rows schedule's pair tile chunks its sources too."""
    monkeypatch.setattr(ring, "_VMEM_RESIDENT_BUDGET", 4 * 5 * 64)
    monkeypatch.setattr(ring, "_SRC_CHUNK_FLOOR", 64)
    mesh2 = ring.make_particle_mesh(2)
    pos, vel, m = _ics(320)
    q = Quantizer(Precision.FLOAT32)
    a = ring.ring_accelerations(pos, m, q, CFG, mesh2, tile_impl="pallas",
                                schedule="rows")
    ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=5e-5, atol=2e-6)


def test_pallas_pair_force_sym_reaction():
    """The sym pair tile's reaction output must equal the direct force
    computed with roles swapped (Newton's third law by construction)."""
    from nbody_tpu.ops.pallas_nbody import pallas_pair_force, \
        pallas_pair_force_sym

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, (96, 2)) * 5.0
    xj = jax.random.normal(k2, (64, 2)) * 5.0 + 1.0
    gm_i = jnp.abs(jax.random.normal(k1, (96,))) * CFG.G
    gm_j = jnp.abs(jax.random.normal(k2, (64,))) * CFG.G
    q = Quantizer(Precision.FLOAT32)

    acc_i, reac_j = pallas_pair_force_sym(xi, gm_i, xj, gm_j, q, CFG)
    acc_i_ref = pallas_pair_force(xi, xj, gm_j, q, CFG)
    acc_j_ref = pallas_pair_force(xj, xi, gm_i, q, CFG)
    np.testing.assert_allclose(np.asarray(acc_i), np.asarray(acc_i_ref),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(reac_j), np.asarray(acc_j_ref),
                               rtol=5e-5, atol=1e-6)


def test_sym_sharded_run_tracks_single_device(mesh8):
    """End-to-end sym-schedule leapfrog run vs the single-device engine."""
    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.FLOAT32)
    out, es = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=20,
                                     steps_per_chunk=5, schedule="sym")
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           force_impl="dense")
    sim.step(20)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(sim.positions),
                               rtol=1e-4, atol=1e-4)
    for arr in es:
        assert np.isfinite(np.asarray(arr)).all()


def test_ring_force_pallas_tile(mesh8):
    """The production tile path (Pallas pair-force per ring step) must
    match the jnp broadcast path (interpret mode on the CPU mesh)."""
    pos, vel, m = _ics(256)
    q = Quantizer(Precision.FLOAT32)
    a_jnp = ring.ring_accelerations(pos, m, q, CFG, mesh8, tile_impl="jnp")
    a_pal = ring.ring_accelerations(pos, m, q, CFG, mesh8,
                                    tile_impl="pallas")
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_jnp),
                               rtol=5e-5, atol=2e-6)


def test_sharded_checkpoint_resume(mesh8, tmp_path):
    """Multi-chip checkpoint/resume: save a sharded (gather=False) state,
    restore it onto the mesh (and onto a DIFFERENT mesh size), continue,
    and match the uninterrupted run."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nbody_tpu.utils.checkpoint import CheckpointManager

    pos, vel, m = _ics(256)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.FLOAT32)

    # Uninterrupted 20-step run.
    full, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=20)

    # 10 steps, checkpoint (sharded state), restore, 10 more.
    half, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=10,
                                     gather=False)
    mgr = CheckpointManager(str(tmp_path / "shard_ckpt"), use_orbax=False)
    mgr.save(10, half, {"n_total": 256})

    shard = NamedSharding(mesh8, P(ring.AXIS))
    restored = mgr.restore_to_sharding(10, half, shard)
    assert len(restored.positions.sharding.device_set) == 8
    resumed, _ = ring.run_steps_sharded(restored, q, CFG, mesh8,
                                        num_steps=10)
    np.testing.assert_allclose(np.asarray(resumed.positions)[:256],
                               np.asarray(full.positions),
                               rtol=1e-5, atol=1e-6)

    # Pod-slice portability: the same checkpoint resumes on a 4-device
    # mesh and still reproduces the physics.
    mesh4 = ring.make_particle_mesh(4)
    shard4 = NamedSharding(mesh4, P(ring.AXIS))
    restored4 = mgr.restore_to_sharding(10, half, shard4)
    assert len(restored4.positions.sharding.device_set) == 4
    resumed4, _ = ring.run_steps_sharded(restored4, q, CFG, mesh4,
                                         num_steps=10)
    np.testing.assert_allclose(np.asarray(resumed4.positions)[:256],
                               np.asarray(full.positions),
                               rtol=1e-4, atol=1e-5)


def test_explicit_pallas_tile_zero_softening_warns(mesh8):
    """An explicitly requested Pallas ring tile is downgraded to the
    id-masked jnp tile when softening == 0 (unsoftened self-pairs need
    the mask); the downgrade must be loud, not silent — at production
    shard sizes the broadcast tile would OOM instead."""
    import warnings

    cfg0 = SimConfig(softening=0.0, G=0.00123)  # unique cfg: fresh trace
    pos, vel, m = _ics(128)
    q = Quantizer(Precision.FLOAT32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        a = ring.ring_accelerations(pos, m, q, cfg0, mesh8,
                                    tile_impl="pallas", schedule="sym")
    assert any("downgraded" in str(w.message) for w in rec)
    a_ref = forces.dense_accelerations(pos, m, q, cfg0,
                                       quantize_forces=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("n_dev", [1, 8])
def test_bounds_reuse_tracks_exact(n_dev):
    """bounds_every=k amortises the int-sim global-bounds ring pass.
    k=1 must be bit-identical to the default path; k>1 is a semantic
    delta (bin edges move between recomputes) that must stay within the
    chaotic f32 envelope at short horizons."""
    mesh = ring.make_particle_mesh(n_dev)
    pos, vel, m = _ics(250)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.INT4_SIM)

    exact, es1 = ring.run_steps_sharded(st, q, CFG, mesh, num_steps=12,
                                        quantize_forces=True,
                                        steps_per_chunk=4)
    same, _ = ring.run_steps_sharded(st, q, CFG, mesh, num_steps=12,
                                     quantize_forces=True,
                                     steps_per_chunk=4, bounds_every=1)
    np.testing.assert_array_equal(np.asarray(exact.positions),
                                  np.asarray(same.positions))

    reused, es4 = ring.run_steps_sharded(st, q, CFG, mesh, num_steps=12,
                                         quantize_forces=True,
                                         steps_per_chunk=4, bounds_every=4)
    np.testing.assert_allclose(np.asarray(reused.positions),
                               np.asarray(exact.positions),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(es4.total),
                               np.asarray(es1.total),
                               rtol=5e-3,
                               atol=5e-3 * abs(float(es1.total[0])))


def test_ring_uniform_gm_guard(mesh8):
    """uniform_gm=True with concrete unequal masses raises at the sharded
    surfaces; a chained RESIDENT state (zero-mass phantom padding past
    n_total) must NOT trip the guard — only real rows carry the
    assertion."""
    pos, vel, m = _ics(256)
    m_bad = jnp.linspace(1.0, 2.0, 256, dtype=jnp.float32)
    q = Quantizer(Precision.FLOAT32)
    st_bad = make_state(pos, vel, m_bad)
    with pytest.raises(ValueError, match="uniform_gm"):
        ring.run_steps_sharded(st_bad, q, CFG, mesh8, num_steps=1,
                               uniform_gm=True)
    with pytest.raises(ValueError, match="uniform_gm"):
        ring.ring_accelerations(pos, m_bad, q, CFG, mesh8, uniform_gm=True)
    with pytest.raises(ValueError, match="uniform_gm"):
        ring.run_with_snapshots_sharded(st_bad, q, CFG, mesh8, 1, 1,
                                        uniform_gm=True)

    # Resident padded layout: N=250 on 8 shards pads to 256 with six
    # zero-mass phantoms; chaining with uniform_gm=True stays legal.
    pos2, vel2, m2 = _ics(250)
    st = make_state(pos2, vel2, m2)
    out, _ = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=2,
                                    gather=False, uniform_gm=True)
    assert out.positions.shape[0] == 256  # resident padded
    out2, _ = ring.run_steps_sharded(out, q, CFG, mesh8, num_steps=2,
                                     gather=True, n_total=250,
                                     uniform_gm=True)
    assert np.isfinite(np.asarray(out2.positions)).all()


def test_ring_pe_compensated_forces_jnp_tile(mesh8, monkeypatch):
    """compensated=True (the baseline precision anchor) must bypass the
    Pallas PE tile even where the auto gate would pick it, and still
    match the single-device reduction (advisor r3 finding 1)."""
    from nbody_tpu.diagnostics.metrics import potential_energy

    calls = []
    real = ring._pe_rows_pallas_chunked

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(ring, "_pe_rows_pallas_chunked", spy)
    monkeypatch.setattr(ring, "_PE_TILE_IMPL", "pallas")
    mesh4 = ring.make_particle_mesh(4)
    pos, vel, m = _ics(288)  # unique (mesh4, 288) trace key (see note in
    # test_ring_potential_energy_pallas_tile on jit caching vs monkeypatch)
    pe_comp = float(ring.ring_potential_energy(pos, m, CFG, mesh4,
                                               compensated=True))
    assert not calls, "compensated PE must not route through the Pallas tile"
    pe_ref = float(potential_energy(pos, m, CFG))
    np.testing.assert_allclose(pe_comp, pe_ref, rtol=1e-5)
    # sanity: the auto gate WOULD have taken the tile for this shape
    pe_fast = float(ring.ring_potential_energy(pos, m, CFG, mesh4))
    assert calls, "auto gate should route through the Pallas tile here"
    np.testing.assert_allclose(pe_fast, pe_ref, rtol=1e-5)
