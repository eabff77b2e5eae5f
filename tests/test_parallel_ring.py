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
    out, kes = ring.run_steps_sharded(st, q, CFG, mesh8, num_steps=20,
                                      steps_per_chunk=5)
    assert kes.shape == (4,)
    assert np.isfinite(np.asarray(kes)).all()
    # KE should be in the same ballpark as the direct engine's
    from nbody_tpu.diagnostics.metrics import kinetic_energy
    ke_direct = float(kinetic_energy(out.velocities, out.masses))
    np.testing.assert_allclose(float(kes[-1]), ke_direct, rtol=1e-3)


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
