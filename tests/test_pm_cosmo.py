"""Tests for the PM operators and the unified cosmological engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.config import PLANCK18
from nbody_tpu.engines import cosmo
from nbody_tpu.engines.epochs import CosmicEpoch, get_current_epoch
from nbody_tpu.ops import pm
from nbody_tpu.ops.precision import Precision, Quantizer


# --------------------------------------------------------------------------
# PM operators
# --------------------------------------------------------------------------

def test_ngp_deposit_conserves_mass():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (1000, 2)) * 100.0
    w = jax.random.uniform(jax.random.PRNGKey(1), (1000,)) + 0.5
    grid = pm.ngp_deposit(pos, w, n_grid=32, box_size=100.0)
    np.testing.assert_allclose(float(grid.sum()), float(w.sum()), rtol=1e-5)


def test_cic_deposit_conserves_mass_and_is_smoother():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (2000, 2)) * 100.0
    w = jnp.ones(2000)
    ngp = pm.ngp_deposit(pos, w, n_grid=32, box_size=100.0)
    cic = pm.cic_deposit(pos, w, n_grid=32, box_size=100.0)
    np.testing.assert_allclose(float(cic.sum()), 2000.0, rtol=1e-4)
    assert float(cic.std()) <= float(ngp.std())  # CIC reduces shot noise


def test_ngp_deposit_matches_loop_oracle():
    pos = jax.random.uniform(jax.random.PRNGKey(2), (200, 2)) * 50.0
    w = jnp.arange(1.0, 201.0)
    grid = np.asarray(pm.ngp_deposit(pos, w, n_grid=16, box_size=50.0))
    want = np.zeros((16, 16))
    ij = np.floor(np.asarray(pos) / 50.0 * 16).astype(int) % 16
    for (i, j), ww in zip(ij, np.asarray(w)):
        want[i, j] += ww
    np.testing.assert_allclose(grid, want, rtol=1e-5)


def test_poisson_solver_point_mass_attracts():
    """A point overdensity must produce accelerations pointing toward it."""
    n_grid, box = 64, 100.0
    density = jnp.ones((n_grid, n_grid))
    density = density.at[32, 32].add(1000.0)
    q = Quantizer(Precision.FLOAT32)
    ax, ay = pm.poisson_accel_grids(density, box, n_grid, q, G=1.0,
                                    scale=1.0, dim=2)
    # Sample a point to the left of the mass: acceleration must point +x.
    assert float(ax[20, 32]) > 0
    assert float(ax[44, 32]) < 0
    assert float(ay[32, 20]) > 0


def test_gather_roundtrip():
    n_grid, box = 16, 32.0
    gx = jnp.arange(n_grid * n_grid, dtype=jnp.float32).reshape(n_grid, n_grid)
    pos = jnp.array([[1.0, 3.0], [31.0, 31.0]])
    out = pm.ngp_gather([gx], pos, n_grid, box)
    flat, _ = pm.cell_index(pos, box, n_grid)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(gx.reshape(-1)[flat]))


def test_quantized_k_sq_changes_forces():
    """The int4 hook must actually alter the PM accelerations."""
    n_grid, box = 32, 100.0
    density = jax.random.uniform(jax.random.PRNGKey(3), (n_grid, n_grid)) + 1.0
    a32 = pm.poisson_accel_grids(density, box, n_grid,
                                 Quantizer(Precision.FLOAT32), 1.0, 1.0, 2)
    a4 = pm.poisson_accel_grids(density, box, n_grid,
                                Quantizer(Precision.INT4_SIM), 1.0, 1.0, 2)
    diff = np.abs(np.asarray(a32[0]) - np.asarray(a4[0])).max()
    assert diff > 0
    assert np.isfinite(np.asarray(a4[0])).all()


def test_power_spectrum_flat_vs_clustered():
    """Clustered particles must show more large-scale power than uniform."""
    key = jax.random.PRNGKey(4)
    uniform = jax.random.uniform(key, (4096, 2)) * 100.0
    clustered = (jax.random.normal(key, (4096, 2)) * 5.0 + 50.0) % 100.0
    k_u, pk_u = pm.power_spectrum(uniform, 100.0, n_grid=64)
    k_c, pk_c = pm.power_spectrum(clustered, 100.0, n_grid=64)
    assert float(pk_c[:5].sum()) > float(pk_u[:5].sum())


def test_bao_scale_from_pk():
    k = np.linspace(0.02, 0.3, 50)
    pk = np.exp(-((k - 0.043) / 0.01) ** 2)  # peak at k_bao
    scale = pm.bao_scale_from_pk(k, pk)
    assert 100 < scale < 200  # 2*pi/0.043 ~ 146 Mpc


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------

def test_genesis_timeline_matches_reference_epoch_enum():
    """GENESIS_TIMELINE must carry every member of the reference's
    CosmicEpoch enum (reference: universe_genesis.py:100-114 — 15
    members, Planck through Present Day), in redshift order."""
    from nbody_tpu.engines.genesis import GENESIS_TIMELINE

    reference_members = [
        "Planck", "Inflation", "Quark", "Hadron", "Nucleosynthesis",
        "Radiation", "Matter", "Recombination", "Dark Ages",
        "First Stars", "Reionization", "Galaxy Formation",
        "Peak Star Formation", "Dark Energy", "Present",
    ]
    assert len(GENESIS_TIMELINE) == len(reference_members) == 15
    names = [e.name for e in GENESIS_TIMELINE]
    for want in reference_members:
        assert any(want.lower() in n.lower() for n in names), want
    zs = [e.redshift for e in GENESIS_TIMELINE]
    assert zs == sorted(zs, reverse=True)


def test_epoch_thresholds():
    assert get_current_epoch(1100) == CosmicEpoch.RECOMBINATION
    assert get_current_epoch(50) == CosmicEpoch.DARK_AGES
    assert get_current_epoch(0.1) == CosmicEpoch.PRESENT


def test_cosmic_time_reference_values():
    """Anchor values from the reference table (universe_2d.py:186-216)."""
    t0 = PLANCK18.cosmic_time_gyr(0.0)
    assert 13.0 < t0 < 14.5
    t1 = PLANCK18.cosmic_time_gyr(1.0)
    assert 5.5 < t1 < 6.3
    t20 = PLANCK18.cosmic_time_gyr(20.0)
    assert 0.1 < t20 < 0.25


@pytest.fixture(scope="module")
def engine2d():
    return cosmo.CosmologicalEngine(num_particles=1024, box_size_mpc=200.0,
                                    start_redshift=50.0, precision="int4",
                                    dim=2, n_grid=32, seed=42)


def test_engine_ics(engine2d):
    e = engine2d
    assert e.num_particles == 1024
    p = np.asarray(e.positions)
    assert p.shape == (1024, 2)
    assert (p >= 0).all() and (p < 200.0).all()
    assert e.redshift == 50.0
    assert e.current_epoch == CosmicEpoch.DARK_AGES


def test_engine_evolves(engine2d):
    e = engine2d
    e.step(dz=1.0, num_steps=5)
    assert e.tick == 5
    assert abs(e.redshift - 45.0) < 1e-4
    p = np.asarray(e.positions)
    assert np.isfinite(p).all()
    assert (p >= 0).all() and (p < 200.0).all()  # periodic wrap
    assert len(e.history["energy"]) == 5
    assert len(e.history["exploits"]) == 1


def test_engine_mass_units_leave_f32_headroom(engine2d):
    """Masses are normalized to O(1) with the physical unit folded into G,
    so KE/momentum diagnostics sit far below f32 max (the raw
    RHO_CRIT-scale units of the reference put KE within 4x of overflow)."""
    e = engine2d
    m = np.asarray(e.masses)
    np.testing.assert_allclose(m.mean(), 1.0, rtol=1e-5)
    assert e.mass_unit_msun > 1e12  # physical unit preserved for export
    assert e.get_state_dict()["mass_unit_msun"] == e.mass_unit_msun
    # The DEVICE f32 reductions run on the normalized masses — that sum
    # is the thing that must keep >= 8 orders of headroom below f32 max
    # (raw reference units sat within 4x of overflow). The HOST boundary
    # (get_kinetic_energy / get_total_momentum / history) multiplies
    # mass_unit_msun back in, in python f64 — reference M_sun units with
    # no overflow risk.
    import jax.numpy as jnp
    ke_device = float(0.5 * jnp.sum(
        e.state.masses * jnp.sum(e.state.velocities ** 2, axis=-1)))
    assert np.isfinite(ke_device) and abs(ke_device) < 1e30
    ke = e.get_kinetic_energy()
    assert np.isfinite(ke)
    np.testing.assert_allclose(ke, ke_device * e.mass_unit_msun,
                               rtol=1e-6)
    assert all(np.isfinite(p) for p in e.get_total_momentum())
    if e.history["energy"]:
        assert all(np.isfinite(x) for x in e.history["energy"])


def test_engine_subnormal_history_is_dense(engine2d):
    """check_subnormals runs every streamed step (reference checks per
    step, universe_2d.py:1148), so the history is a per-step series."""
    e = engine2d
    before = len(e.glitch_detector.subnormal_history)
    e.step(dz=0.1, num_steps=4)
    assert len(e.glitch_detector.subnormal_history) == before + 4


def test_engine_completes():
    e = cosmo.CosmologicalEngine(num_particles=256, start_redshift=5.0,
                                 precision="float32", dim=2, n_grid=16)
    e.run_to_completion(dz=1.0, chunk=10)
    assert e.completed
    assert e.redshift <= e.cfg.min_redshift + 1e-6
    sd = e.get_state_dict()
    assert sd["num_particles"] == 256
    assert np.isfinite(sd["positions"]).all()


def test_engine_3d():
    e = cosmo.CosmologicalEngine(num_particles=512, start_redshift=10.0,
                                 precision="int8", dim=3, n_grid=16)
    assert e.positions.shape == (512, 3)
    e.step(dz=1.0, num_steps=3)
    assert np.isfinite(np.asarray(e.positions)).all()
    k, pk = e.compute_power_spectrum(n_grid=16)
    assert np.isfinite(pk).all()


def test_engine_determinism():
    kw = dict(num_particles=256, start_redshift=10.0, precision="int4",
              dim=2, n_grid=16, seed=7)
    a = cosmo.CosmologicalEngine(**kw)
    b = cosmo.CosmologicalEngine(**kw)
    a.step(1.0, 3)
    b.step(1.0, 3)
    np.testing.assert_array_equal(np.asarray(a.positions),
                                  np.asarray(b.positions))


def test_clustering_grows():
    """Gravity must amplify structure: clustering metric grows with time."""
    e = cosmo.CosmologicalEngine(num_particles=4096, start_redshift=30.0,
                                 precision="float32", dim=2, n_grid=64,
                                 dm_ratio=5.0)
    c0 = e.get_clustering()
    e.step(dz=1.0, num_steps=25)
    c1 = e.get_clustering()
    assert np.isfinite(c1)
    assert c1 > c0 * 0.5  # structure should not wash out


def test_engine_checkpoint_resume(tmp_path):
    """Engine-level checkpoint/resume round-trips the CosmoState."""
    from nbody_tpu.utils.checkpoint import CheckpointManager

    kw = dict(num_particles=256, start_redshift=10.0, precision="int4",
              dim=2, n_grid=16, seed=11)
    a = cosmo.CosmologicalEngine(**kw)
    mgr = CheckpointManager(str(tmp_path / "ck"), use_orbax=False)
    a.step(1.0, 4)
    a.save_checkpoint(mgr)
    a.step(1.0, 3)
    final = np.asarray(a.positions)

    b = cosmo.CosmologicalEngine(**kw)
    assert b.restore_latest(mgr) == 4
    assert b.tick == 4
    b.step(1.0, 3)
    np.testing.assert_array_equal(np.asarray(b.positions), final)


def test_poisson_gradient_matches_analytic_plane_wave():
    """The half-spectrum (rfftn) Poisson solve must recover the analytic
    acceleration of a single plane-wave density perturbation:
    delta = eps*cos(k.x) -> a_d = -4 pi G rho_mean eps k_d sin(k.x)/k^2."""
    import jax.numpy as jnp
    from nbody_tpu.ops import pm as pm_ops
    from nbody_tpu.ops.precision import Precision, Quantizer

    n, box, G = 32, 100.0, 2.5
    x = jnp.arange(n) * (box / n)
    xx, yy = jnp.meshgrid(x, x, indexing="ij")
    kx = 2 * jnp.pi * 3 / box   # mode (3, 1)
    ky = 2 * jnp.pi * 1 / box
    eps, rho0 = 0.01, 1.7
    density = rho0 * (1.0 + eps * jnp.cos(kx * xx + ky * yy))

    grids = pm_ops.poisson_accel_grids(density, box, n,
                                       Quantizer(Precision.FLOAT32),
                                       G, 1.0, dim=2)
    k_sq = kx * kx + ky * ky
    phase = jnp.sin(kx * xx + ky * yy)
    expect = [-4 * jnp.pi * G * rho0 * eps * k / k_sq * phase
              for k in (kx, ky)]
    for got, want in zip(grids, expect):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5 * float(jnp.max(
                                       jnp.abs(want))))


def test_pipelined_run_matches_sequential():
    """run_to_completion(pipelined=True) overlaps host detectors with the
    next chunk's device work, but the collected histories (energy,
    redshift, BAO, clustering, glitches, exploit ticks) must be
    bit-identical to the sequential path."""
    kw = dict(num_particles=1024, start_redshift=12.0, precision="int4",
              dim=2, n_grid=32, seed=3)
    seq = cosmo.CosmologicalEngine(**kw)
    pipe = cosmo.CosmologicalEngine(**kw)
    seq.run_to_completion(dz=1.0, chunk=4)
    calls = []
    pipe.run_to_completion(dz=1.0, chunk=4, pipelined=True,
                           callback=lambda e: calls.append(e.tick))
    assert pipe.completed
    assert calls  # callback fires once per collected chunk
    np.testing.assert_array_equal(np.asarray(seq.positions),
                                  np.asarray(pipe.positions))
    for key in ("energy", "redshift", "time_gyr", "bao_scale",
                "clustering"):
        assert seq.history[key] == pipe.history[key], key
    assert len(seq.history["exploits"]) == len(pipe.history["exploits"])
    for a, b in zip(seq.history["exploits"], pipe.history["exploits"]):
        assert a["tick"] == b["tick"]
        assert a["redshift"] == b["redshift"]
        assert a["relativity"].max_gamma == b["relativity"].max_gamma
        assert (a["landauer"].total_bits_current
                == b["landauer"].total_bits_current)
    assert ([e.glitch_type for e in seq.history["glitches"]]
            == [e.glitch_type for e in pipe.history["glitches"]])
    assert (seq.glitch_detector.subnormal_history
            == pipe.glitch_detector.subnormal_history)


def test_dispatch_collect_split_equals_step():
    """step() is exactly dispatch_step()+collect_step(); interleaving two
    dispatches before their collects must preserve history order."""
    kw = dict(num_particles=256, start_redshift=10.0, precision="float32",
              dim=2, n_grid=16, seed=11)
    a = cosmo.CosmologicalEngine(**kw)
    b = cosmo.CosmologicalEngine(**kw)
    a.step(1.0, 2)
    a.step(1.0, 3)
    p1 = b.dispatch_step(1.0, 2)
    p2 = b.dispatch_step(1.0, 3)  # dispatched before p1 is collected
    assert b.tick == 5 and abs(b.redshift - 5.0) < 1e-5  # no device sync
    b.collect_step(p1)
    b.collect_step(p2)
    assert a.history["energy"] == b.history["energy"]
    assert a.history["clustering"] == b.history["clustering"]
    np.testing.assert_array_equal(np.asarray(a.positions),
                                  np.asarray(b.positions))


def test_completion_with_f32_rounding_min_redshift():
    """min_redshift values that round UP in f32 (0.1, 0.3, ...) must
    still complete: the engine normalizes the threshold to its f32
    value so the f64 schedule clamp and the f32 state agree (otherwise
    run_to_completion spins forever on 1-step chunks)."""
    e = cosmo.CosmologicalEngine(num_particles=64, start_redshift=3.0,
                                 precision="float32", dim=2, n_grid=16,
                                 min_redshift=0.1)
    for _ in range(20):  # bounded manual loop so a regression can't hang CI
        e.step(1.0, num_steps=2)
        if e.completed:
            break
    assert e.completed
    assert abs(e.redshift - 0.1) < 1e-6


def test_checkpoint_resume_reproduces_full_history(tmp_path):
    """Kill-and-resume must reproduce the FULL drift curve: histories and
    glitch-detector state ride with the checkpoint, so the resumed run's
    final history equals the uninterrupted run's
    (reference headline observable: simulation.py:170-196)."""
    from nbody_tpu.utils.checkpoint import CheckpointManager

    kw = dict(num_particles=256, start_redshift=10.0, precision="int4",
              dim=2, n_grid=16, seed=11)
    a = cosmo.CosmologicalEngine(**kw)
    a.step(1.0, 4)
    mgr = CheckpointManager(str(tmp_path / "ck"), use_orbax=False)
    a.save_checkpoint(mgr)
    a.step(1.0, 3)

    b = cosmo.CosmologicalEngine(**kw)  # "crashed" process restarts
    assert b.restore_latest(mgr) == 4
    b.step(1.0, 3)

    for key in ("energy", "redshift", "time_gyr", "bao_scale",
                "clustering"):
        np.testing.assert_array_equal(np.asarray(a.history[key]),
                                      np.asarray(b.history[key]), err_msg=key)
    assert [g.__dict__ for g in a.history["glitches"]] == \
        [g.__dict__ for g in b.history["glitches"]]
    # exploit entries round-trip as real metric dataclasses, not strings
    import dataclasses as dc
    for ea, eb in zip(a.history["exploits"], b.history["exploits"]):
        assert ea.keys() == eb.keys()
        for k in ea:
            va, vb = ea[k], eb[k]
            if dc.is_dataclass(va):
                assert type(va) is type(vb), k
                assert dc.asdict(va) == dc.asdict(vb), k
            else:
                assert va == vb, k
    # detector threshold state restored too (no bogus resume-edge events)
    assert a.glitch_detector.energy_history == \
        b.glitch_detector.energy_history
    assert len(a.glitch_detector.events) == len(b.glitch_detector.events)
    # exploit-engine state continuity (Landauer baseline, gamma history)
    assert a.exploit_engine.initial_bits == b.exploit_engine.initial_bits
    assert a.exploit_engine.gamma_history == b.exploit_engine.gamma_history
