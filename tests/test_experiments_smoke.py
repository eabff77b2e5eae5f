"""Smoke tests: every experiment CLI runs end-to-end at tiny scale on CPU.

These guard the L8 layer's import graph, argument parsing, verdict logic
and report writing — the scientific assertions live in the dedicated unit
tests and in the TPU runs.
"""

import json

import pytest


def _json_exists(tmp_path, name):
    p = tmp_path / name
    assert p.exists(), f"missing report {name}"
    return json.loads(p.read_text())


def test_stability_suite(tmp_path, capsys):
    from nbody_tpu.experiments import stability_test

    stability_test.main(["--stars", "48", "--ticks", "100",
                         "--output", str(tmp_path)])
    rep = _json_exists(tmp_path, "stability_results.json")
    assert len(rep["results"]) == 6
    out = capsys.readouterr().out
    assert "STABILITY FLOOR RESULTS" in out


def test_sensitivity_sweep(tmp_path):
    from nbody_tpu.experiments import sensitivity_test

    results, mono = sensitivity_test.run_sensitivity_sweep(
        num_stars=48, num_ticks=60, levels=[4, 64, 100000],
        out_dir=str(tmp_path))
    assert len(results) == 3
    # coarse must drift more than fine
    assert abs(results[0].energy_drift_pct) > abs(
        results[-1].energy_drift_pct)


def test_falsification_convergence():
    from nbody_tpu.experiments import falsification_tests

    rep = falsification_tests.test_convergence(num_stars=48, num_ticks=60)
    assert rep["converges"]


def test_dark_matter(tmp_path):
    from nbody_tpu.experiments import dark_matter_test

    res = dark_matter_test.run_dm_comparison(num_stars=128, num_ticks=40)
    assert set(res) == {"DM 0x", "DM 2x", "DM 5x", "DM 10x"}


def test_sparc(tmp_path):
    from nbody_tpu.experiments import sparc_test

    sparc_test.main(["--stars", "64", "--ticks", "40",
                     "--output", str(tmp_path)])
    rep = _json_exists(tmp_path, "sparc_results.json")
    assert len(rep["results"]) == 4


def test_crash_point_velocity():
    from nbody_tpu.experiments import crash_point_test

    rep = crash_point_test.find_velocity_crash_point(48, 40, 42)
    assert "sweep" in rep and len(rep["sweep"]) >= 1


def test_jitter_measure():
    import jax

    from nbody_tpu.experiments import jitter_test
    from nbody_tpu.models.galaxy import create_disk_galaxy

    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(0), 48)
    pj, vj, drift = jitter_test.measure_jitter(pos, vel, m, dt=0.01,
                                               total_time=0.5,
                                               num_samples=10)
    assert pj >= 0 and vj >= 0
    assert abs(drift) < 100.0  # f32 short run: bounded energy drift


def test_density_scaling_analysis():
    from nbody_tpu.experiments import density_limit_test

    results = density_limit_test.run_density_sweep([32, 64],
                                                   ticks_per_size=20)
    assert len(results) == 4  # 2 modes x 2 sizes
    density_limit_test.analyze_scaling(results)


def test_density_scaling_dim3():
    """dim=3 sweeps the same kernels on Plummer ICs (VERDICT r4 #5:
    the reference's 3-D engine is first-class, universe_3d.py)."""
    from nbody_tpu.experiments import density_limit_test

    results = density_limit_test.run_density_sweep([32, 64],
                                                   ticks_per_size=20, dim=3)
    assert len(results) == 4
    assert all(r["dim"] == 3 for r in results)
    assert not any(r["crashed"] for r in results)
    density_limit_test.analyze_scaling(results)


def test_reality_glitch_aliasing():
    from nbody_tpu.experiments import reality_glitch_tests

    rep = reality_glitch_tests.spatial_aliasing_test(wall_stars=50,
                                                     num_ticks=20)
    assert rep["clip_through"]  # 5.0 step vs 0.5 slab must tunnel


def test_breakout_memory_leak():
    from nbody_tpu.experiments import breakout_tests

    rep = breakout_tests.memory_leak_test()
    assert rep["overflow_inf_iter"] == 128  # f32 max = 2^127*~2


def test_extreme_count_values():
    import jax.numpy as jnp

    from nbody_tpu.experiments import extreme_mode

    census = extreme_mode.count_extreme_values(
        jnp.array([1.0, jnp.inf, -jnp.inf, jnp.nan, 0.0]))
    assert census["nan"] == 1 and census["inf"] == 2 and census["zero"] == 1


def test_omniverse_neural_bridge():
    from nbody_tpu.experiments import omniverse_tests

    rep = omniverse_tests.neural_hardware_bridge(num_sequences=120,
                                                 epochs=8, seed=0)
    assert rep["accuracy"] > 0.6  # pattern is learnable even tiny


def test_omega_temporal_aliasing():
    from nbody_tpu.experiments import omega_point_test

    rep = omega_point_test.temporal_aliasing_test(quick=True, seed=0)
    assert rep["critical_dt"] is None or rep["critical_dt"] > 0.01


def test_orbital_flop_cost():
    from nbody_tpu.experiments import orbital_audit

    rep = orbital_audit.flop_cost_audit()
    assert rep["ratio"] > 1


def test_red_team_rsi_compute():
    from nbody_tpu.experiments.red_team_proof import compute_rsi

    rsi = compute_rsi({"cv": 0.1}, {"final_divergence": 1e-6},
                      {"drift": 0.01}, {"slowdown_percent": 2.0})
    assert 80 < rsi <= 100


def test_collision_tick_auditor():
    from nbody_tpu.engines.universe3d import CollisionTickAuditor

    res = CollisionTickAuditor(wall_thickness=1.0, dt=0.01).run()
    assert res.tunneling_confirmed
    assert abs(res.clip_velocity - 100.0) < 5.0


def test_ultimate_structures():
    from nbody_tpu.engines.ultimate import UltimateEngine

    e = UltimateEngine(num_particles=512, start_redshift=10.0,
                       precision="float32", n_grid=16)
    s = e.detect_structures(n_grid=8)
    assert 0.0 <= s["void_fraction"] <= 1.0


def test_omega_heatmap_and_constants(tmp_path):
    from nbody_tpu.experiments import omega_point_test as omega

    cells = [{"precision": "float32", "vel_mult": 1.0, "radius": 10.0,
              "drift": 0.01, "stable": True},
             {"precision": "int4_sim", "vel_mult": 20.0, "radius": 2.0,
              "drift": 5.0, "stable": False}]
    path = omega.generate_reality_heatmap(cells, tmp_path / "heat.png")
    assert (tmp_path / "heat.png").exists()
    table = omega.generate_physical_comparison(
        {"collapse_density": 150.0}, {"critical_dt": 0.5},
        {"rate_per_tick": 1e-5}, {"cells": cells})
    assert set(table) == {"Max Velocity", "Time Step (dt)",
                          "Min Precision", "Ghost Energy Rate",
                          "Max Density"}
    assert "Planck time" in table["Time Step (dt)"]["physical_equivalent"]


def test_orbital_tle_fetch_fallback(monkeypatch):
    """--fetch tries CelesTrak and degrades to the cached fixtures on any
    failure (reference pattern: orbital_audit.py:89-111); a successful
    fetch replaces matching fixtures."""
    from nbody_tpu.experiments import orbital_audit as oa

    # zero-egress: the real call must fall back, not raise
    tles, src = oa.fetch_tles(timeout_s=0.2)
    assert tles == oa.TLE_FIXTURES
    assert "cached fixtures" in src

    # mocked success path: ISS line replaced, others kept
    iss_l1 = "1 25544U 98067A   24180.50000000  .00016717  00000-0  10270-3 0  9999"
    iss_l2 = ("2 25544  51.6400 100.0000 0006317  69.9862 290.2000 "
              "15.49550000430000")
    payload = f"ISS (ZARYA)\n{iss_l1}\n{iss_l2}\n".encode()

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return payload

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen",
                        lambda url, timeout: FakeResp())
    tles, src = oa.fetch_tles()
    assert tles["ISS"] == (iss_l1, iss_l2)
    assert tles["LAGEOS-1"] == oa.TLE_FIXTURES["LAGEOS-1"]
    assert "live CelesTrak" in src
