"""Multi-chip surface of the flagship direct-engine workflow.

The canonical precision-ladder compare (reference: main.py:99-208,
simulation.py:199-250) run through ``DirectSimulation(mesh=...)`` must
reproduce the single-device engine's drift histories for EVERY precision
mode, including the emulated-f64 baseline, at small N on the virtual
8-device CPU mesh (odd N exercises the phantom-padding path).
"""

import jax
import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models import galaxy
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.ops.precision import Precision
from nbody_tpu.parallel import ring

CFG = SimConfig()

ALL_MODES = [Precision.FLOAT64, Precision.FLOAT32, Precision.BFLOAT16,
             Precision.FLOAT16, Precision.INT8_SIM, Precision.INT4_SIM,
             Precision.CUSTOM]


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return ring.make_particle_mesh(8)


def _ics(n, seed=0):
    return galaxy.create_disk_galaxy(jax.random.PRNGKey(seed), num_stars=n)


def _pair(mode, mesh, n=250):
    """(mesh sim, single-device sim) with identical ICs. Odd N (250 over 8
    shards) exercises padding."""
    pos, vel, m = _ics(n)
    sim_m = DirectSimulation(pos, vel, m, precision=mode, mesh=mesh)
    sim_s = DirectSimulation(pos, vel, m, precision=mode,
                             force_impl="dense")
    return sim_m, sim_s


@pytest.mark.parametrize("mode", ALL_MODES, ids=lambda m: m.value)
def test_mesh_history_matches_single_device(mesh8, mode):
    """run_with_history drift curves (the headline observable) from the
    sharded path vs the single-device engine, all precision modes."""
    sim_m, sim_s = _pair(mode, mesh8)
    e0 = sim_s.get_total_energy()
    snaps_m, frames_m = sim_m.run_with_history(12, snapshot_interval=4)
    snaps_s, frames_s = sim_s.run_with_history(12, snapshot_interval=4)

    assert snaps_m.total.shape == snaps_s.total.shape == (3,)
    np.testing.assert_array_equal(np.asarray(snaps_m.tick),
                                  np.asarray(snaps_s.tick))
    # Energies: identical physics, different summation/tile order.
    tol = abs(e0) * 5e-4
    np.testing.assert_allclose(np.asarray(snaps_m.total),
                               np.asarray(snaps_s.total), atol=tol)
    np.testing.assert_allclose(np.asarray(snaps_m.kinetic),
                               np.asarray(snaps_s.kinetic),
                               rtol=5e-4, atol=tol)
    # Structure metrics and frames.
    np.testing.assert_allclose(np.asarray(snaps_m.radius_90),
                               np.asarray(snaps_s.radius_90),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(snaps_m.curve_velocities),
                               np.asarray(snaps_s.curve_velocities),
                               rtol=5e-3, atol=5e-3)
    assert frames_m.shape == frames_s.shape == (3, 250, 2)
    np.testing.assert_allclose(np.asarray(frames_m), np.asarray(frames_s),
                               rtol=2e-3, atol=2e-3)
    # Final positions (trimmed transparently by the property).
    np.testing.assert_allclose(np.asarray(sim_m.positions),
                               np.asarray(sim_s.positions),
                               rtol=2e-3, atol=2e-3)
    assert sim_m.tick == sim_s.tick == 12


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.FLOAT64,
                                  Precision.INT4_SIM],
                         ids=lambda m: m.value)
def test_mesh_step_and_energies(mesh8, mode):
    """step() keeps resident sharded state; energy getters ride the
    sharded ring (PE) and match the single-device diagnostics."""
    sim_m, sim_s = _pair(mode, mesh8)
    np.testing.assert_allclose(sim_m.get_total_energy(),
                               sim_s.get_total_energy(), rtol=1e-5)
    sim_m.step(5)
    sim_s.step(5)
    assert sim_m.tick == sim_s.tick == 5
    # state is resident: padded to the shard boundary, spread over 8 devices
    pos_attr = (sim_m.state.positions.hi if sim_m.is_baseline
                else sim_m.state.positions)
    assert pos_attr.shape[0] % 8 == 0
    assert len(pos_attr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sim_m.positions),
                               np.asarray(sim_s.positions),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(sim_m.get_kinetic_energy(),
                               sim_s.get_kinetic_energy(), rtol=1e-3)
    np.testing.assert_allclose(sim_m.get_potential_energy(),
                               sim_s.get_potential_energy(), rtol=1e-3)


def test_mesh_history_remainder_ticks(mesh8):
    """Ticks not divisible by the interval still advance fully
    (reference: simulation.py:154-158)."""
    sim_m, _ = _pair(Precision.FLOAT32, mesh8)
    snaps, _ = sim_m.run_with_history(11, snapshot_interval=4)
    assert snaps.total.shape == (2,)
    assert sim_m.tick == 11


@pytest.mark.parametrize("tpd", [5, 3])
def test_mesh_ticks_per_dispatch_matches_fused(mesh8, tpd):
    """Host-level dispatch chunking (the tunnel-watchdog escape hatch)
    must reproduce the fused one-dispatch history run exactly: same
    snapshots, frames, final state, and tick counters — both for whole
    chunks per call (tpd=interval) and for caps BELOW the snapshot
    interval (tpd=3 < 5: capped step() pre-ticks + a <=cap snapshot
    call per chunk)."""
    pos, vel, m = _ics(250)
    sim_f = DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8)
    snaps_f, frames_f = sim_f.run_with_history(20, snapshot_interval=5)
    sim_c = DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8,
                             ticks_per_dispatch=tpd)
    snaps_c, frames_c = sim_c.run_with_history(20, snapshot_interval=5)
    assert snaps_c.total.shape == snaps_f.total.shape == (4,)
    np.testing.assert_allclose(np.asarray(snaps_c.tick),
                               np.asarray(snaps_f.tick))
    np.testing.assert_allclose(np.asarray(snaps_c.total),
                               np.asarray(snaps_f.total),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(frames_c), np.asarray(frames_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sim_c.positions),
                               np.asarray(sim_f.positions),
                               rtol=1e-5, atol=1e-6)
    assert sim_c.tick == sim_f.tick == 20


def test_mesh_ticks_per_dispatch_caps_step(mesh8):
    """step() must honor the dispatch cap too (the watchdog applies to
    any entry point, not just history runs)."""
    pos, vel, m = _ics(250)
    sim_f = DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8)
    sim_f.step(10)
    sim_c = DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8,
                             ticks_per_dispatch=4)  # 4 + 4 + 2
    sim_c.step(10)
    assert sim_c.tick == sim_f.tick == 10
    np.testing.assert_allclose(np.asarray(sim_c.positions),
                               np.asarray(sim_f.positions),
                               rtol=1e-5, atol=1e-6)


def test_ticks_per_dispatch_rejected_single_device():
    pos, vel, m = _ics(32)
    with pytest.raises(ValueError):
        DirectSimulation(pos, vel, m, precision="float32",
                         ticks_per_dispatch=10)


def test_ticks_per_dispatch_rejects_nonpositive(mesh8):
    """0 would spin step()'s capped loop forever and divide-by-zero the
    history split — must be rejected at construction."""
    pos, vel, m = _ics(32)
    with pytest.raises(ValueError):
        DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8,
                         ticks_per_dispatch=0)


def test_mesh_resident_state_energy_zero_softening(mesh8):
    """get_potential_energy on the RESIDENT (padded) state after step():
    n_total must be threaded so the coincident-sentinel phantom rows are
    id-masked — inferring it from the padded shape returned NaN under
    zero softening (0 * rsqrt(0) phantom pairs)."""
    pos, vel, m = _ics(250)  # 250 % 8 != 0 -> phantoms after step()
    sim = DirectSimulation(pos, vel, m, precision="float32", mesh=mesh8,
                           softening=0.0)
    pe0 = sim.get_potential_energy()
    assert np.isfinite(pe0)
    sim.step(2)  # state now padded + resident
    pe1 = sim.get_potential_energy()
    assert np.isfinite(pe1)
    ref = DirectSimulation(pos, vel, m, precision="float32",
                           force_impl="dense", softening=0.0)
    ref.step(2)
    np.testing.assert_allclose(pe1, ref.get_potential_energy(), rtol=1e-4)


def test_ticks_per_dispatch_rejects_bounds_reuse(mesh8):
    """The bounds-reuse cadence resets at dispatch boundaries, so the
    combination silently changes int-sim semantics — must be loud."""
    pos, vel, m = _ics(64)
    with pytest.raises(ValueError):
        DirectSimulation(pos, vel, m, precision="int4", mesh=mesh8,
                         bounds_every=4, ticks_per_dispatch=10)


def test_mesh_rejects_dynamic_params(mesh8):
    pos, vel, m = _ics(64)
    with pytest.raises(ValueError):
        DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                         mesh=mesh8, dynamic_params=True)


def test_cli_mesh_flag(mesh8, tmp_path):
    """End-to-end: python main.py --mesh produces the comparison artifacts
    from the sharded path (reference workflow: main.py:99-208)."""
    import matplotlib
    matplotlib.use("Agg")
    from nbody_tpu import cli

    args = cli.build_parser().parse_args(
        ["--stars", "96", "--ticks", "20", "--snapshot-interval", "5",
         "--compare", "float64,int4", "--mesh", "--output",
         str(tmp_path / "out")])
    histories = cli.run_compare(args)
    assert set(histories) == {"float64", "int4_sim"}
    for h in histories.values():
        assert np.isfinite(np.asarray(h.total_energy)).all()
    assert (tmp_path / "out").exists()


def test_mesh_history_bounds_reuse(mesh8):
    """bounds_every flows through run_with_history on both backends:
    k=1 identical to default, k=3 within the short-horizon envelope."""
    pos, vel, m = _ics(250)
    hist = {}
    for k in (1, 3):
        sim = DirectSimulation(pos, vel, m, precision=Precision.INT4_SIM,
                               mesh=mesh8, bounds_every=k)
        snaps, _ = sim.run_with_history(8, snapshot_interval=4)
        hist[k] = np.asarray(snaps.total)
        sim_s = DirectSimulation(pos, vel, m,
                                 precision=Precision.INT4_SIM,
                                 force_impl="dense", bounds_every=k)
        snaps_s, _ = sim_s.run_with_history(8, snapshot_interval=4)
        np.testing.assert_allclose(np.asarray(snaps_s.total), hist[k],
                                   rtol=5e-3,
                                   atol=5e-3 * abs(hist[k][0]))
    np.testing.assert_allclose(hist[3], hist[1], rtol=5e-3,
                               atol=5e-3 * abs(hist[1][0]))


def test_mesh_rejects_inert_knobs(mesh8):
    """Knobs that cannot reach the mesh runners refuse loudly instead of
    silently running a different configuration than the one named."""
    pos, vel, m = _ics(64)
    with pytest.raises(ValueError, match="force_impl"):
        DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                         mesh=mesh8, force_impl="dense")
    with pytest.raises(ValueError, match="bounds_every"):
        DirectSimulation(pos, vel, m, precision=Precision.INT4_SIM,
                         mesh=mesh8, schedule="rows", bounds_every=4)
