"""Tests for glitch detection, multiverse, orbital math, checkpointing,
ultimate-engine estimators, and reproducibility utilities."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.diagnostics import glitch
from nbody_tpu.models import galaxy
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.state import make_state
from nbody_tpu.ops.precision import Precision


def test_count_subnormals():
    # Build true denormal bit patterns via bitcast (XLA backends may flush
    # denormal *literals* to zero — itself the FTZ fingerprint the census
    # exists to document).
    bits = jnp.array([0, 1, 0x00400000, 0x3F800000], dtype=jnp.int32)
    x = jax.lax.bitcast_convert_type(bits, jnp.float32)
    m = glitch.count_subnormals(x)
    sub, zero = int(m.subnormal_count), int(m.zero_count)
    # Either the denormals are visible (sub=2, zero=1) or the backend
    # flushes them on read (sub=0, zero=3); both are valid censuses.
    assert (sub, zero) in ((2, 1), (0, 3))


def test_glitch_detector_energy_jump():
    det = glitch.GlitchDetector(threshold=0.05)
    assert det.check_energy_conservation(100.0, 1, 10.0) is None
    assert det.check_energy_conservation(101.0, 2, 9.0) is None
    ev = det.check_energy_conservation(150.0, 3, 8.0)  # +48% jump
    assert ev is not None and ev.glitch_type == "energy_jump"
    assert det.get_glitch_count() == 1
    assert det.get_glitch_summary() == {"energy_jump": 1}


def test_glitch_detector_momentum():
    det = glitch.GlitchDetector(threshold=0.05)
    det.check_momentum((0.0, 0.0), 1, 10.0)
    ev = det.check_momentum((100.0, 0.0), 2, 9.0)  # > threshold*1000=50
    assert ev is not None and ev.glitch_type == "momentum_drift"


def test_entropy_measurement():
    rng = np.random.default_rng(0)
    random_state = rng.normal(size=(500, 2)).astype(np.float32)
    repeated_state = np.ones((500, 2), np.float32)
    e_random = glitch.measure_state_entropy(random_state, random_state)
    e_repeat = glitch.measure_state_entropy(repeated_state, repeated_state)
    assert e_repeat.compression_ratio > e_random.compression_ratio * 2


def test_exploit_engine_runs():
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (200, 2)) * 10
    vel = jax.random.normal(key, (200, 2))
    eng = glitch.PhysicsExploitEngine()
    res = eng.run_all_probes(pos, vel)
    assert res["relativity"].max_gamma >= 1.0
    assert res["landauer"].total_bits_initial > 0
    assert (res["frustum"].in_frustum_count
            + res["frustum"].out_frustum_count) == 200
    # second call: snap detection against prev positions
    res2 = eng.run_all_probes(pos + 1.0, vel)
    assert res2["frustum"].snap_events >= 0


def test_finish_probes_decimated_snapshot_uses_n_total():
    """Under snapshot_cap the engine computes the device metrics over the
    FULL resident state but ships only a strided snapshot to host; the
    frustum census must be sized by n_total, not the subsample length
    (regression: out_frustum_count went negative and the culling trigger
    fired 16x too easily at 1M with the default 65536 cap)."""
    key = jax.random.PRNGKey(1)
    n_total, cap = 2000, 125
    pos = jax.random.normal(key, (n_total, 2)) * 10
    vel = jax.random.normal(key, (n_total, 2)) * 0.1
    eng = glitch.PhysicsExploitEngine()
    prev, obs_pos, obs_dir = eng.probe_inputs(pos)
    dm = jax.device_get(glitch.exploit_device_metrics(
        pos, vel, prev, obs_pos, obs_dir, eng.c_sim, eng.fov_cos))
    pos_h = np.asarray(pos)[::n_total // cap]
    vel_h = np.asarray(vel)[::n_total // cap]
    res = eng.finish_probes(dm, pos_h, vel_h, n_total=n_total)
    fr = res["frustum"]
    assert fr.out_frustum_count >= 0
    assert fr.in_frustum_count + fr.out_frustum_count == n_total
    # Culling threshold is population-level: snap_events over the full
    # state must be compared against 1% of n_total, not 1% of the cap.
    assert fr.culling_detected == (fr.snap_events > n_total * 0.01)


def test_multiverse_divergence_grows():
    from nbody_tpu.diagnostics.multiverse import MultiverseSim

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 128)
    mv = MultiverseSim(pos, vel, m)
    rep = mv.run(num_ticks=60, interval=20)
    assert len(rep.divergence_reversed) == 3
    # reversed-sum universe must eventually diverge from standard
    assert rep.divergence_reversed[-1] >= 0
    assert np.isfinite(rep.heisenberg_product)


def test_orbital_elements_roundtrip():
    from nbody_tpu.experiments.orbital_audit import (
        TLE_FIXTURES,
        elements_to_state,
        parse_tle,
    )

    el = parse_tle(*TLE_FIXTURES["ISS"])
    # ISS: a ~ 6790 km, i ~ 51.64 deg
    assert 6600 < el["semi_major_axis_km"] < 7000
    assert abs(el["inclination_deg"] - 51.64) < 0.01
    pos, vel = elements_to_state(el)
    r = np.linalg.norm(pos)
    v = np.linalg.norm(vel)
    assert 6600 < r < 7000
    assert 7.0 < v < 8.2  # km/s orbital speed


def test_orbital_propagator_circular():
    from nbody_tpu.experiments.orbital_audit import (
        MU_EARTH,
        propagate_rk4,
    )
    from nbody_tpu.ops.precision import Quantizer

    r0 = 7000.0
    v0 = float(np.sqrt(MU_EARTH / r0))
    samples, under, over = propagate_rk4(
        jnp.array([r0, 0.0, 0.0]), jnp.array([0.0, v0, 0.0]), 10.0,
        Quantizer(Precision.FLOAT32), 500, 50)
    r = np.linalg.norm(np.asarray(samples), axis=1)
    np.testing.assert_allclose(r, r0, rtol=2e-2)  # circular stays circular
    assert int(under) == 0 and int(over) == 0


def test_2point_correlation_uniform_is_flat():
    from nbody_tpu.engines.ultimate import compute_2point_correlation

    pos = jax.random.uniform(jax.random.PRNGKey(0), (4096, 3)) * 200.0
    r, xi = compute_2point_correlation(pos, 200.0,
                                       r_bins=np.array([5.0, 10.0, 20.0]))
    # uniform points: xi ~ 0 everywhere
    assert np.abs(xi).max() < 0.3


def test_checkpoint_roundtrip(tmp_path):
    from nbody_tpu.utils.checkpoint import CheckpointManager

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 64)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    sim.step(10)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), use_orbax=False)
    mgr.save(10, sim.state, {"precision": "float32"})
    assert mgr.latest_step() == 10

    template = make_state(pos, vel, m)
    restored = mgr.restore(10, template)
    np.testing.assert_array_equal(np.asarray(restored.positions),
                                  np.asarray(sim.state.positions))
    assert mgr.load_metadata(10)["precision"] == "float32"


@pytest.mark.skipif(
    not __import__("nbody_tpu.utils.checkpoint",
                   fromlist=["HAS_ORBAX"]).HAS_ORBAX,
    reason="orbax not installed")
def test_checkpoint_orbax_roundtrip(tmp_path):
    from nbody_tpu.utils.checkpoint import CheckpointManager

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(1), 32)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    sim.step(5)
    mgr = CheckpointManager(str(tmp_path / "ockpt"), use_orbax=True)
    mgr.save(5, sim.state)
    assert mgr.latest_step() == 5
    restored = mgr.restore(5, make_state(pos, vel, m))
    np.testing.assert_array_equal(np.asarray(restored.positions),
                                  np.asarray(sim.state.positions))


def test_resumable_run(tmp_path):
    from nbody_tpu.utils.checkpoint import CheckpointManager, ResumableRun

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 64)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    mgr = CheckpointManager(str(tmp_path / "run"), use_orbax=False)
    ResumableRun(sim, mgr, checkpoint_every=25).run(50)
    assert int(sim.state.tick) == 50
    assert mgr.latest_step() == 50

    # simulate a crash: new sim resumes from checkpoint, not from zero
    sim2 = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    ResumableRun(sim2, mgr, checkpoint_every=25).run(75)
    assert int(sim2.state.tick) == 75


def test_reproducibility_manifest(tmp_path):
    from nbody_tpu.utils import reproducibility as R

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 64)
    cfg = R.ExperimentConfig("test", "float32", 64, 100, 42, 0.01, 0.1,
                             0.001)
    man = R.create_manifest(cfg, pos, vel, pos, vel)
    assert len(man.initial_state_hash) == 16
    assert man.initial_state_hash == man.results_hash
    path = tmp_path / "manifest.json"
    R.save_manifest(man, str(path))
    loaded = json.loads(path.read_text())
    assert loaded["config"]["num_stars"] == 64


def test_hash_state_sensitivity():
    from nbody_tpu.utils.reproducibility import hash_state

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 64)
    h1 = hash_state(pos, vel)
    h2 = hash_state(pos, vel)
    assert h1 == h2
    h3 = hash_state(np.asarray(pos) + 1e-6, vel)
    assert h1 != h3


def test_run_with_confidence():
    from nbody_tpu.utils.reproducibility import run_with_confidence

    res = run_with_confidence(lambda seed: float(seed % 3), n_seeds=6,
                              base_seed=0, metric_name="m")
    assert res.n_samples == 6
    assert res.ci_95_low <= res.mean <= res.ci_95_high


def test_profiler_basics():
    from nbody_tpu.utils.profiler import DeviceProfiler

    prof = DeviceProfiler(sample_interval_ms=20)
    prof.start()
    x = jnp.ones((256, 256))
    for _ in range(3):
        prof.time_step(lambda: (x @ x).sum())
    import time
    time.sleep(0.1)
    prof.stop()
    a = prof.analyze()
    assert a.step_count == 3
    assert a.mean_step_ms is not None and a.mean_step_ms > 0
    assert "power_watts" in a.unavailable_channels


def test_native_fastent():
    from nbody_tpu import native

    rng = np.random.default_rng(0)
    buf = rng.normal(size=10000).astype(np.float32).tobytes()
    e, d = native.byte_entropy(buf)
    # cross-check against the numpy formula
    arr = np.frombuffer(buf, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    q = counts[counts > 0] / arr.size
    np.testing.assert_allclose(e, float(-(q * np.log2(q)).sum()),
                               rtol=1e-10)
    special = np.array([np.nan, np.inf, -np.inf, 0.0, 1e-40, 1.0],
                       dtype=np.float32).tobytes()
    nan, inf, sub, zero, mn = native.float_census(special)
    assert (nan, inf, sub, zero) == (1, 2, 1, 1)
    assert 0 < mn < 1e-38


def test_fast_state_entropy_spike_semantics():
    from nbody_tpu.diagnostics.glitch import (
        fast_state_entropy,
        measure_state_entropy,
    )

    rng = np.random.default_rng(1)
    random_state = rng.normal(size=(500, 2)).astype(np.float32)
    repeated = np.ones((500, 2), np.float32)
    # both probes must rank compressibility the same way
    for fn in (fast_state_entropy, measure_state_entropy):
        assert (fn(repeated, repeated).compression_ratio
                > fn(random_state, random_state).compression_ratio * 2)
