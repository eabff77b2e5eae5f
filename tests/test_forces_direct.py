"""Tests for force kernels and the direct engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models import galaxy
from nbody_tpu.models.direct import DirectSimulation, run_comparison
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer

CFG = SimConfig()


def _ics(n=256, seed=0):
    return galaxy.create_disk_galaxy(jax.random.PRNGKey(seed), num_stars=n)


# --------------------------------------------------------------------------
# Force kernel correctness
# --------------------------------------------------------------------------

def test_dense_force_matches_numpy_oracle():
    """Dense kernel vs a plain float64 numpy all-pairs computation."""
    pos, vel, m = _ics(64)
    q = Quantizer(Precision.FLOAT32)
    acc = np.asarray(forces.dense_accelerations(pos, m, q, CFG))

    p = np.asarray(pos, dtype=np.float64)
    mm = np.asarray(m, dtype=np.float64)
    diff = p[None, :, :] - p[:, None, :]
    d2 = (diff ** 2).sum(-1) + CFG.softening_sq
    f = CFG.G * mm[None, :] / d2 ** 1.5
    np.fill_diagonal(f, 0.0)
    want = (f[:, :, None] * diff).sum(axis=1)
    np.testing.assert_allclose(acc, want, rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.BFLOAT16,
                                  Precision.INT8_SIM, Precision.INT4_SIM])
def test_tiled_matches_dense(mode):
    """The O(N)-memory tiled kernel must agree with the dense oracle in
    every precision mode (incl. the global-bounds int quantizer path)."""
    pos, vel, m = _ics(300)  # deliberately not a multiple of the block
    q = Quantizer(mode)
    a_dense = forces.dense_accelerations(pos, m, q, CFG)
    a_tiled = forces.tiled_accelerations(pos, m, q, CFG, block=128)
    np.testing.assert_allclose(np.asarray(a_tiled), np.asarray(a_dense),
                               rtol=2e-5, atol=1e-6)


def test_max_pairwise_dist_sq():
    pos, _, _ = _ics(200)
    got = float(forces.max_pairwise_dist_sq(pos, CFG, block=64))
    p = np.asarray(pos)
    d2 = ((p[None] - p[:, None]) ** 2).sum(-1)
    want = d2.max() + CFG.softening_sq
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_int4_force_is_degraded_but_bounded():
    pos, vel, m = _ics(128)
    a32 = forces.dense_accelerations(pos, m, Quantizer(Precision.FLOAT32), CFG)
    a4 = forces.dense_accelerations(pos, m, Quantizer(Precision.INT4_SIM), CFG)
    diff = np.abs(np.asarray(a4) - np.asarray(a32))
    assert diff.max() > 0  # must actually degrade
    assert np.isfinite(np.asarray(a4)).all()  # but never blow up


def test_baseline_dd_force_close_to_f64():
    pos, vel, m = _ics(128)
    a_dd = np.asarray(forces.baseline_accelerations_dd(pos, m, CFG, block=64))
    p = np.asarray(pos, dtype=np.float64)
    mm = np.asarray(m, dtype=np.float64)
    diff = p[None] - p[:, None]
    d2 = (diff ** 2).sum(-1) + CFG.softening_sq
    f = CFG.G * mm[None, :] / d2 ** 1.5
    np.fill_diagonal(f, 0.0)
    want = (f[:, :, None] * diff).sum(axis=1)
    np.testing.assert_allclose(a_dd, want, rtol=2e-4, atol=1e-8)


# --------------------------------------------------------------------------
# Integrator / engine
# --------------------------------------------------------------------------

def test_two_body_circular_orbit():
    """A two-body circular orbit must stay circular over one period."""
    # masses 1+1, separation 2, each at r=1 around the COM.
    # v_circ^2 / r = G * m_other * r_sep / (r_sep^2 + eps^2)^{3/2}
    cfg = SimConfig(G=1.0, softening=1e-3, dt=1e-3)
    r_sep = 2.0
    a_mag = 1.0 * r_sep / (r_sep ** 2 + cfg.softening_sq) ** 1.5
    v = np.sqrt(a_mag * 1.0)
    pos = jnp.array([[-1.0, 0.0], [1.0, 0.0]])
    vel = jnp.array([[0.0, -v], [0.0, v]])
    m = jnp.ones(2)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32, cfg=cfg,
                           force_impl="dense")
    period = 2 * np.pi * 1.0 / v
    sim.step(int(period / cfg.dt))
    r_final = np.linalg.norm(np.asarray(sim.positions), axis=1)
    np.testing.assert_allclose(r_final, 1.0, rtol=2e-2)


def test_energy_conservation_f32():
    """f32 energy drift over 200 ticks must be small for a disk galaxy."""
    pos, vel, m = _ics(256)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    e0 = sim.get_total_energy()
    sim.step(200)
    e1 = sim.get_total_energy()
    drift = abs((e1 - e0) / e0) * 100
    assert drift < 1.0, f"f32 drift {drift:.3f}% too large"


def test_precision_ladder_drift_ordering():
    """int4 must inject more energy drift than the f64-emulated baseline —
    the core scientific claim of the reference (stability_test.py)."""
    pos, vel, m = _ics(256)
    drifts = {}
    for mode in (Precision.FLOAT64, Precision.INT4_SIM):
        sim = DirectSimulation(pos, vel, m, precision=mode)
        e0 = sim.get_total_energy()
        sim.step(300)
        drifts[mode] = abs((sim.get_total_energy() - e0) / e0)
    assert drifts[Precision.INT4_SIM] > drifts[Precision.FLOAT64]


def test_baseline_beats_f32_drift():
    """The dd-emulated f64 baseline must conserve energy at least as well
    as plain f32 over a long run."""
    pos, vel, m = _ics(128)
    drifts = {}
    for mode in (Precision.FLOAT64, Precision.FLOAT32):
        sim = DirectSimulation(pos, vel, m, precision=mode)
        e0 = sim.get_total_energy()
        sim.step(500)
        drifts[mode] = abs((sim.get_total_energy() - e0) / (abs(e0) + 1e-12))
    assert drifts[Precision.FLOAT64] <= drifts[Precision.FLOAT32] * 1.5


def test_run_with_history_shapes():
    pos, vel, m = _ics(128)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    snaps, frames = sim.run_with_history(200, snapshot_interval=50)
    assert frames.shape == (4, 128, 2)
    assert snaps.total.shape == (4,)
    assert snaps.curve_velocities.shape == (4, 20)
    assert int(snaps.tick[-1]) == 200


def test_run_callback_interface():
    pos, vel, m = _ics(64)
    sim = DirectSimulation(pos, vel, m)
    ticks = []
    sim.run(100, callback=lambda s, t: ticks.append(t), callback_interval=25)
    assert ticks == [25, 50, 75, 100]


def test_run_comparison():
    pos, vel, m = _ics(64)
    res = run_comparison(pos, vel, m, ["float32", "int4"], num_ticks=100,
                         snapshot_interval=50)
    assert set(res) == {"float32", "int4_sim"}
    assert res["int4_sim"]["final_state"]["tick"] == 100


def test_determinism():
    """Same ICs + same mode => bit-identical trajectories."""
    pos, vel, m = _ics(128)
    sims = [DirectSimulation(pos, vel, m, precision=Precision.INT4_SIM)
            for _ in range(2)]
    for s in sims:
        s.step(100)
    np.testing.assert_array_equal(np.asarray(sims[0].positions),
                                  np.asarray(sims[1].positions))


# --------------------------------------------------------------------------
# ICs
# --------------------------------------------------------------------------

def test_disk_galaxy_shapes_and_stats():
    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0), 2000)
    assert pos.shape == (2000, 2) and vel.shape == (2000, 2)
    r = np.linalg.norm(np.asarray(pos), axis=1)
    assert r.min() >= 0.1 - 1e-6 and r.max() <= 20.0 + 1e-5
    # mostly tangential motion: specific angular momentum mostly one sign
    lz = np.asarray(pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0])
    assert (lz > 0).mean() > 0.9


def test_halo_galaxy_flattens_rotation_curve():
    """NFW halo ICs must produce a flatter outer rotation curve than the
    bare disk (reference: galaxy.py:142-211 purpose)."""
    from nbody_tpu.diagnostics.metrics import rotation_curve

    key = jax.random.PRNGKey(0)
    pos_d, vel_d, _ = galaxy.create_disk_galaxy(key, 4000)
    pos_h, vel_h, _ = galaxy.create_galaxy_with_halo(key, 4000,
                                                    dm_mass_ratio=10.0)
    c_d = rotation_curve(pos_d, vel_d, num_bins=10, max_radius=20.0)
    c_h = rotation_curve(pos_h, vel_h, num_bins=10, max_radius=20.0)
    # outer bins: halo curve should be higher relative to its peak
    vd, vh = np.asarray(c_d.velocities), np.asarray(c_h.velocities)
    outer_ratio_d = np.nanmean(vd[6:]) / np.nanmax(vd)
    outer_ratio_h = np.nanmean(vh[6:]) / np.nanmax(vh)
    assert outer_ratio_h > outer_ratio_d


def test_plummer_sphere_shapes_and_profile():
    """3-D Plummer ICs: correct shapes, the analytic half-mass radius
    r_half = a / sqrt(2^(2/3) - 1) ~= 1.305 a, and bound virial-scale
    velocities (no star beyond ~2x local escape speed)."""
    a = 10.0
    pos, vel, m = galaxy.create_plummer_sphere(jax.random.PRNGKey(0),
                                               4000, scale_radius=a)
    assert pos.shape == (4000, 3) and vel.shape == (4000, 3)
    assert m.shape == (4000,) and np.asarray(m == 1.0).all()
    r = np.linalg.norm(np.asarray(pos), axis=1)
    assert r.max() <= 10.0 * a + 1e-3
    r_half = np.median(r)
    # truncation at 10a removes ~3% of the mass, biasing the sample
    # median slightly low; accept a 10% window around 1.305a
    assert abs(r_half - 1.305 * a) < 0.13 * 1.305 * a
    # isotropy: mean specific angular momentum ~ 0 (unlike the disk ICs)
    lz = np.asarray(pos[:, 0] * vel[:, 1] - pos[:, 1] * vel[:, 0])
    assert abs(lz.mean()) < 3.0 * lz.std() / np.sqrt(len(lz))
    v = np.linalg.norm(np.asarray(vel), axis=1)
    v_esc = np.sqrt(2.0 * 0.001 * 4000.0 / np.sqrt(r * r + a * a))
    assert (v < 2.0 * v_esc).all()


def test_plummer_sphere_integrates_stably():
    """200 f32 ticks on the 3-D equilibrium model: bounded energy drift
    and no blow-up (the 3-D analogue of the disk stability gate)."""
    from nbody_tpu.diagnostics.metrics import total_energy

    pos, vel, m = galaxy.create_plummer_sphere(jax.random.PRNGKey(1), 256)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    e0 = float(total_energy(sim.state.positions, sim.state.velocities,
                            sim.state.masses, sim.cfg))
    sim.step(200)
    e1 = float(total_energy(sim.state.positions, sim.state.velocities,
                            sim.state.masses, sim.cfg))
    assert np.isfinite(np.asarray(sim.positions)).all()
    assert abs(e1 - e0) / abs(e0) < 0.02


def test_nfw_enclosed_mass_monotone():
    r = jnp.linspace(0.1, 100.0, 200)
    M = galaxy.nfw_enclosed_mass(r, 1000.0, 30.0)
    assert np.all(np.diff(np.asarray(M)) > 0)


def test_run_with_history_remainder_ticks():
    """num_ticks not divisible by the interval still advances fully
    (reference runs all ticks; callbacks just land on multiples)."""
    pos, vel, m = _ics(64)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    snaps, frames = sim.run_with_history(250, snapshot_interval=100)
    assert int(sim.state.tick) == 250
    assert int(snaps.tick[-1]) == 200  # snapshots at interval multiples


def test_momentum_conservation_f32():
    """Pairwise symmetric forces: total momentum drift stays tiny."""
    pos, vel, m = _ics(256)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    p0 = np.asarray(jnp.sum(sim.velocities * sim.masses[:, None], axis=0))
    sim.step(300)
    p1 = np.asarray(jnp.sum(sim.velocities * sim.masses[:, None], axis=0))
    # velocities are O(0.1), N=256: drift should be far below 1e-2
    assert np.abs(p1 - p0).max() < 1e-2


def test_angular_momentum_conservation_f32():
    """Central-force dynamics conserves total L_z."""
    pos, vel, m = _ics(256)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)

    def lz(s):
        p = np.asarray(s.positions)
        v = np.asarray(s.velocities)
        mm = np.asarray(s.masses)
        return float((mm * (p[:, 0] * v[:, 1] - p[:, 1] * v[:, 0])).sum())

    l0 = lz(sim)
    sim.step(300)
    l1 = lz(sim)
    assert abs(l1 - l0) / abs(l0) < 1e-3


def test_int4_breaks_momentum_symmetry():
    """Force quantization on acc components breaks Newton's third law —
    int4 momentum drift must exceed f32's (the reference's momentum-glitch
    mechanism)."""
    pos, vel, m = _ics(256)
    drifts = {}
    for mode in (Precision.FLOAT32, Precision.INT4_SIM):
        sim = DirectSimulation(pos, vel, m, precision=mode)
        p0 = np.asarray(jnp.sum(sim.velocities * sim.masses[:, None],
                                axis=0))
        sim.step(300)
        p1 = np.asarray(jnp.sum(sim.velocities * sim.masses[:, None],
                                axis=0))
        drifts[mode] = float(np.abs(p1 - p0).max())
    assert drifts[Precision.INT4_SIM] > drifts[Precision.FLOAT32]


def test_run_steps_bounds_every_single_device():
    """Single-device bounds reuse: k=1 is bit-identical to the default
    path; k=4 stays within the short-horizon chaotic envelope; impls
    without an external-bounds hook refuse loudly."""
    import pytest

    from nbody_tpu.models.direct import run_steps
    from nbody_tpu.models.state import make_state

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(4),
                                            num_stars=192)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.INT4_SIM)

    base = run_steps(st, q, CFG, "dense", True, 10)
    same = run_steps(st, q, CFG, "dense", True, 10, bounds_every=1)
    np.testing.assert_array_equal(np.asarray(base.positions),
                                  np.asarray(same.positions))

    reused = run_steps(st, q, CFG, "dense", True, 10, bounds_every=4)
    np.testing.assert_allclose(np.asarray(reused.positions),
                               np.asarray(base.positions),
                               rtol=5e-3, atol=5e-3)

    with pytest.raises(ValueError, match="bounds_every"):
        run_steps(st, q, CFG, "pallas_streamed", True, 2, bounds_every=4)


def test_uniform_gm_detection():
    """DirectSimulation detects equal masses eagerly (one host fetch at
    init) and disables the fast path for varied masses or sharded runs
    (ring shards pad with zero-mass phantom rows)."""
    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0),
                                            num_stars=64)
    assert DirectSimulation(pos, vel, m)._uniform_gm
    m2 = m.at[3].set(2.0)
    assert not DirectSimulation(pos, vel, m2)._uniform_gm
