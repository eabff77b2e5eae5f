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
