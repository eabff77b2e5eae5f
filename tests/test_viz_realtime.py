"""Tests for viz/history adapters and the realtime engine's host pieces."""

import numpy as np
import pytest


def _fake_snaps(n_chunks=3, n_bins=5):
    import jax.numpy as jnp

    from nbody_tpu.diagnostics.metrics import Snapshot

    def arr(vals):
        return jnp.asarray(vals, jnp.float32)

    return Snapshot(
        tick=jnp.arange(1, n_chunks + 1) * 50,
        kinetic=arr([1.0, 1.1, 1.2]),
        potential=arr([-3.0, -3.0, -2.9]),
        total=arr([-2.0, -1.9, -1.7]),
        radius_90=arr([8.0, 8.1, 8.2]),
        bound_frac=arr([0.9, 0.88, 0.85]),
        dispersion=arr([0.1, 0.12, 0.13]),
        curve_radii=jnp.tile(jnp.linspace(1, 10, n_bins), (n_chunks, 1)),
        curve_velocities=jnp.ones((n_chunks, n_bins)) * 0.5,
        curve_counts=jnp.ones((n_chunks, n_bins), jnp.int32) * 10,
    )


def test_metrics_history_from_snapshots():
    from nbody_tpu.utils.history import MetricsHistory

    h = MetricsHistory.from_snapshots(_fake_snaps())
    assert h.ticks == [50, 100, 150]
    assert len(h.rotation_curves) == 3
    np.testing.assert_allclose(h.energy_drift_pct, (-1.7 + 2.0) / 2.0 * 100,
                               rtol=1e-5)


def test_plot_full_comparison(tmp_path):
    from nbody_tpu.utils.history import MetricsHistory
    from nbody_tpu.utils.viz import plot_full_comparison, print_summary

    h = MetricsHistory.from_snapshots(_fake_snaps())
    rng = np.random.default_rng(0)
    finals = {"float32": rng.normal(size=(100, 2)) * 5,
              "int4_sim": rng.normal(size=(100, 2)) * 5}
    plot_full_comparison(finals, {"float32": h, "int4_sim": h},
                         save_dir=str(tmp_path))
    for name in ("galaxy_comparison", "rotation_curves",
                 "energy_evolution", "radius_evolution"):
        assert (tmp_path / f"{name}.png").stat().st_size > 10_000
    print_summary({"float32": h})  # must not raise


def test_global_clock_desync():
    import time

    from nbody_tpu.realtime.engine import GlobalClock

    clock = GlobalClock()
    clock.beat("a")
    assert not clock.check_sync_violation()  # one subsystem: no skew
    clock.beat("b")
    assert not clock.check_sync_violation()  # fresh beats
    time.sleep(0.15)
    clock.beat("a")  # b is now >100ms stale relative to a
    assert clock.check_sync_violation()
    assert clock.desync_count == 1


def test_shared_state_energy_glitch():
    from nbody_tpu.realtime.engine import SharedState

    s = SharedState()
    p = np.zeros((10, 2))
    s.publish_snapshot(p, p, 1, 50.0, 100.0)
    s.publish_snapshot(p, p, 2, 49.0, 101.0)   # +1%: fine
    assert s.metrics.glitch_count == 0
    s.publish_snapshot(p, p, 3, 48.0, 150.0)   # +48%: glitch
    assert s.metrics.glitch_count == 1
    assert s.events[0]["type"] == "energy_glitch"


def test_bao_solver_scale_estimate():
    """The BAO solver's host P(k) peak finder recovers a planted scale."""
    from nbody_tpu.realtime.engine import BAOSolver, SharedState

    rng = np.random.default_rng(0)
    # plant a sinusoidal density pattern at wavelength ~80 within window
    n = 20000
    x = rng.uniform(0, 200, n)
    accept = 0.5 * (1 + np.sin(2 * np.pi * x / 80.0))
    keep = rng.random(n) < accept
    pos = np.stack([x[keep], rng.uniform(0, 200, keep.sum())], axis=1)
    solver = BAOSolver(SharedState())
    scale = solver._bao_scale(pos.astype(np.float32))
    assert 50 < scale < 120  # ~80 expected


def test_run_all_subset(tmp_path):
    """The run-everything driver isolates suites and writes a summary."""
    from nbody_tpu.experiments import run_all

    summary = run_all.main(["--only", "sparc_test",
                            "--output", str(tmp_path)])
    assert summary["sparc_test"]["status"] == "ok"
    assert (tmp_path / "run_all_summary.json").exists()


def test_dashboard3d_render(tmp_path):
    from nbody_tpu.engines.dashboard3d import Dashboard3D
    from nbody_tpu.engines.universe3d import Universe3D

    u = Universe3D(num_particles=64, start_redshift=10.0,
                   precision="float32")
    u.step(1.0, 2)
    dash = Dashboard3D(u, str(tmp_path))
    path = dash.render_frame()
    assert path.stat().st_size > 10_000


def test_realtime_pump_publishes_lagged_snapshot():
    """End-to-end: after two pumps the SharedState holds the first
    pump's state; drain() publishes the last."""
    from nbody_tpu.realtime.engine import CosmicWebEngine, SharedState

    st = SharedState()
    prod = CosmicWebEngine(st, num_particles=256, precision="float32",
                           seed=1, target_fps=1000.0, steps_per_frame=1)
    prod.start()
    tick0 = st.metrics.tick
    prod.pump()   # publishes nothing new (frame in flight)
    prod.pump()   # publishes pump-1's state
    assert st.metrics.tick == tick0 + 1
    prod.drain()  # publishes pump-2's state
    assert st.metrics.tick == tick0 + 2
    assert st.positions is not None
    assert np.isfinite(st.positions).all()


def test_realtime_pump_frames_are_history_consistent():
    """The pipelined pump must publish (tick, z, ke, state) bundles that
    agree with the engine's own histories — the published ke is the
    energy history entry for exactly the published tick, and the
    published state is the post-chunk state of that tick."""
    from nbody_tpu.realtime.engine import CosmicWebEngine, SharedState

    st = SharedState()
    prod = CosmicWebEngine(st, num_particles=256, precision="int4",
                           seed=2, target_fps=1000.0, steps_per_frame=2)
    prod.start()
    for _ in range(4):
        prod.pump()
    prod.drain()
    eng = prod.engine
    assert st.metrics.tick == eng.tick
    assert st.metrics.kinetic_energy == eng.history["energy"][-1]
    assert abs(st.metrics.redshift - eng.redshift) < 1e-6
    np.testing.assert_array_equal(st.positions,
                                  np.asarray(eng.positions))


def test_realtime_pump_mesh_matches_single_device():
    """CosmicWebEngine(mesh=...) runs the live loop through the
    resident-sharded engine path and publishes the same
    history-consistent frames as the single-device producer
    (reference live loop: realtime_reality_engine.py:187-345)."""
    import jax

    from nbody_tpu.parallel import ring
    from nbody_tpu.realtime.engine import CosmicWebEngine, SharedState

    assert len(jax.devices()) >= 8
    mesh = ring.make_particle_mesh(8)

    results = {}
    for key, m in (("mesh", mesh), ("single", None)):
        st = SharedState()
        prod = CosmicWebEngine(st, num_particles=225, precision="float32",
                               seed=5, target_fps=1000.0,
                               steps_per_frame=2, mesh=m)
        prod.start()
        for _ in range(3):
            prod.pump()
        prod.drain()
        assert st.metrics.tick == prod.engine.tick
        assert st.positions.shape == (225, 2)  # 15^2 lattice, unaligned vs 8 shards
        results[key] = (st.positions.copy(), st.metrics.kinetic_energy)

    np.testing.assert_allclose(results["mesh"][0], results["single"][0],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(results["mesh"][1], results["single"][1],
                               rtol=1e-3)


def test_engine_snapshot_cap_decimates_without_changing_physics():
    """snapshot_cap decimates the per-chunk diagnostic snapshot ON DEVICE
    (exact strided subsample of the full snapshot) while every physics
    history — energy, BAO, clustering — stays identical to the uncapped
    engine. Covers the monitor-decimation path the realtime engine uses
    at 1M particles (reference caps its SIMULATION at 10k instead,
    realtime_reality_engine.py:187-345)."""
    from nbody_tpu.engines.cosmo import CosmologicalEngine

    full = CosmologicalEngine(num_particles=1024, dim=2, n_grid=32, seed=1)
    capped = CosmologicalEngine(num_particles=1024, dim=2, n_grid=32,
                                seed=1, snapshot_cap=100)
    p_full = full.dispatch_step(0.5, num_steps=4)
    pos_f, vel_f = full.collect_step(p_full)
    p_cap = capped.dispatch_step(0.5, num_steps=4)
    pos_c, vel_c = capped.collect_step(p_cap)

    stride = p_cap.snap_stride
    assert stride == 11  # ceil(1024 / 100)
    assert pos_c.shape[0] == -(-1024 // stride)
    np.testing.assert_array_equal(np.asarray(pos_f)[::stride], pos_c)
    np.testing.assert_array_equal(np.asarray(vel_f)[::stride], vel_c)
    assert full.history["energy"] == capped.history["energy"]
    assert full.history["bao_scale"] == capped.history["bao_scale"]
    assert full.history["clustering"] == capped.history["clustering"]


def test_engine_snapshot_cap_mesh_padded_rows_excluded():
    """On a mesh whose shard count does not divide N, the resident state
    is padded; the capped snapshot must stride over only the REAL rows
    (padding trimmed before decimation)."""
    import jax

    from nbody_tpu.engines.cosmo import CosmologicalEngine
    from nbody_tpu.parallel import ring

    assert len(jax.devices()) >= 8
    mesh = ring.make_particle_mesh(8)
    single = CosmologicalEngine(num_particles=225, dim=2, n_grid=32, seed=5)
    capped = CosmologicalEngine(num_particles=225, dim=2, n_grid=32, seed=5,
                                mesh=mesh, snapshot_cap=50)
    ps = single.dispatch_step(0.5, num_steps=2)
    pos_s, _ = single.collect_step(ps)
    pc = capped.dispatch_step(0.5, num_steps=2)
    pos_c, _ = capped.collect_step(pc)
    stride = pc.snap_stride
    assert stride == 5  # ceil(225 / 50)
    assert pos_c.shape[0] == 45
    np.testing.assert_allclose(np.asarray(pos_s)[::stride], pos_c,
                               rtol=2e-3, atol=2e-3)


def test_realtime_snapshot_cap_publishes_decimated_and_device_bao():
    """With snapshot_cap set the realtime producer publishes cap-sized
    frames plus the device-grid BAO/clustering measurements, and the BAO
    monitor consumes the published value instead of re-histogramming."""
    from nbody_tpu.realtime.engine import BAOSolver, CosmicWebEngine, \
        SharedState

    st = SharedState()
    prod = CosmicWebEngine(st, num_particles=1024, precision="float32",
                           seed=3, target_fps=1000.0, steps_per_frame=2,
                           snapshot_cap=128)
    prod.start()
    assert st.positions.shape[0] == 128  # 1024 / stride 8
    for _ in range(3):
        prod.pump()
    prod.drain()
    eng = prod.engine
    assert st.positions.shape[0] == 128
    assert st.device_bao is not None
    assert st.device_bao == eng.history["bao_scale"][-1]
    assert st.metrics.clustering == eng.history["clustering"][-1]
    # The monitor thresholds the device value directly
    solver = BAOSolver(st)
    st.running = True
    solver.start()
    import time as _time
    _time.sleep(0.3)
    st.running = False
    solver.join(timeout=2.0)
    assert st.metrics.bao_scale == st.device_bao
