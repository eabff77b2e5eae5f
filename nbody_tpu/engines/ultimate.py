"""Ultimate reality engine: the batch "run everything" test.

TPU-native equivalent of the reference batch engine
(reference: ultimate_reality_engine.py:165-1826):

* cosmological evolution on the unified PM engine (3-D);
* ``run_bao_test`` — BAO scale across epochs; the reference correlates it
  with GPU clock (the "Matrix proof", reference: :546-653) — here the
  degraded-telemetry observable is per-epoch step time;
* structure detection — void census with the "Great Void match" heuristic
  (reference: :443-508);
* SDSS two-point-correlation comparison (vectorised device estimator
  replacing the reference's O(N*1000) Python loop, reference: :1213-1317)
  and CMB acoustic-peak comparison (reference: :1320-1411);
* cross-substrate mirror: state export + comparison with hashes and
  position/velocity correlations (reference: :694-833);
* ``run_ultimate_reality_test`` — 5 phases + score + verdict + JSON
  (reference: :888-1146); ``run_all_tests`` additionally chains the
  sensitivity / omniverse / orbital suites (reference: :1447-1728).

Usage:
    python -m nbody_tpu.engines.ultimate --mode full --quick
    python -m nbody_tpu.engines.ultimate --mode compare --other a.json
"""

from __future__ import annotations

import argparse
import json
import platform
import sys
import time
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.engines.cosmo import CosmologicalEngine
from nbody_tpu.utils.reproducibility import hash_state
from nbody_tpu.utils.profiler import fence

# Reference cosmological data (Planck 2018 / SDSS DR16 anchors,
# reference: ultimate_reality_engine.py:1195-1210)
SDSS_BAO_SCALE = 147.09
SDSS_BAO_ERROR = 0.26
SDSS_XI_R = {1: 40.0, 2: 15.0, 5: 4.0, 10: 1.5, 20: 0.5, 50: 0.1,
             100: 0.02}
CMB_PEAKS = {"first": 220, "second": 546, "third": 800}


class UltimateEngine(CosmologicalEngine):
    """3-D batch preset (reference: ultimate_reality_engine.py:165-526)."""

    def __init__(self, num_particles: int = 32768,
                 box_size_mpc: float = 500.0, start_redshift: float = 50.0,
                 precision: str = "float32", seed: int = 42, **kw):
        kw.setdefault("n_grid", 64)
        super().__init__(num_particles=num_particles,
                         box_size_mpc=box_size_mpc,
                         start_redshift=start_redshift,
                         precision=precision, seed=seed, dim=3, **kw)

    # -- structure detection ------------------------------------------------

    def detect_structures(self, n_grid: int = 16) -> dict:
        """Void/filament census (reference: :443-508)."""
        from nbody_tpu.ops.pm import ngp_deposit

        density = np.asarray(ngp_deposit(
            self.positions,
            jnp.ones(self.num_particles, jnp.float32), n_grid,
            self.cfg.box_size))
        mean = density.mean()
        voids = density < 0.2 * mean
        filaments = density > 3.0 * mean
        void_frac = float(voids.mean())
        cell_mpc = self.cfg.box_size / n_grid
        # largest void extent along any axis (greedy scan)
        biggest_run = 0
        for axis in range(3):
            proj = voids.any(axis=tuple(a for a in range(3) if a != axis))
            run = best = 0
            for v in proj:
                run = run + 1 if v else 0
                best = max(best, run)
            biggest_run = max(biggest_run, best)
        void_extent_mpc = biggest_run * cell_mpc
        # Bootes-like "Great Void" is ~100 Mpc across
        great_void_match = 60.0 < void_extent_mpc < 200.0
        return {
            "void_fraction": void_frac,
            "filament_fraction": float(filaments.mean()),
            "largest_void_extent_mpc": void_extent_mpc,
            "great_void_match": bool(great_void_match),
        }

    # -- state export -------------------------------------------------------

    def get_export_state(self) -> dict:
        sd = self.get_state_dict()
        sd["state_hash"] = hash_state(sd["positions"], sd["velocities"])
        return sd


# --------------------------------------------------------------------------
# BAO test
# --------------------------------------------------------------------------

def run_bao_test(engine: UltimateEngine, epochs: int = 5,
                 dz_per_epoch: float = 8.0) -> dict:
    """(reference: ultimate_reality_engine.py:546-653). The GPU-clock
    correlation becomes a step-time correlation (degraded telemetry)."""
    print("\n--- PHASE: BAO EVOLUTION TEST ---")
    rows = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        engine.step(dz=dz_per_epoch / 10.0, num_steps=10)
        fence(engine.state.positions)
        wall = time.perf_counter() - t0
        bao = engine.get_bao_scale()
        rows.append({"epoch": epoch, "redshift": engine.redshift,
                     "bao_scale_mpc": bao, "step_time_s": wall})
        print(f"  epoch {epoch}: z={engine.redshift:6.2f} "
              f"BAO={bao:6.1f} Mpc  ({wall:.2f}s)")
    baos = [r["bao_scale_mpc"] for r in rows if r["bao_scale_mpc"] > 0]
    times = [r["step_time_s"] for r in rows if r["bao_scale_mpc"] > 0]
    if len(baos) >= 3 and np.std(baos) > 0 and np.std(times) > 0:
        corr = float(np.corrcoef(baos, times)[0, 1])
    else:
        corr = 0.0  # degenerate series: no correlation measurable
    final_dev = (abs(baos[-1] - SDSS_BAO_SCALE) / SDSS_BAO_SCALE
                 if baos else 1.0)
    print(f"  BAO-vs-steptime correlation: {corr:+.3f} "
          f"(matrix proof requires |corr| ~ 1)")
    return {"rows": rows, "bao_steptime_correlation": corr,
            "final_bao_mpc": baos[-1] if baos else 0.0,
            "sdss_deviation": final_dev}


# --------------------------------------------------------------------------
# SDSS / CMB comparisons
# --------------------------------------------------------------------------

def compute_2point_correlation(positions, box_size: float,
                               r_bins=None, num_anchors: int = 1024,
                               anchor_chunk: int = 128):
    """Vectorised xi(r) estimator (reference: :1213-1256 vectorised):
    counts pairs in shells around sampled anchors vs the random
    expectation, with periodic minimum-image distances. Anchors are
    processed in fused chunks (lax.map under jit) so peak memory stays
    ~anchor_chunk * N * D instead of num_anchors * N * D."""
    if r_bins is None:
        r_bins = np.array([1, 2, 5, 10, 20, 50, 100], float)
    pos = jnp.asarray(positions)
    n = pos.shape[0]
    anchors = pos[:: max(n // num_anchors, 1)][:num_anchors]
    n_anchor = anchors.shape[0]
    pad = (-n_anchor) % anchor_chunk
    if pad:
        anchors = jnp.concatenate(
            [anchors, jnp.full((pad, pos.shape[1]), -1e9)], axis=0)

    edges = tuple((max(r - r * 0.2, 1e-6), r + r * 0.2) for r in r_bins)

    @jax.jit
    def shell_counts(anchors):
        def chunk_counts(anchor_chunk_pos):
            diff = pos[None, :, :] - anchor_chunk_pos[:, None, :]
            diff = jnp.where(diff > box_size / 2, diff - box_size, diff)
            diff = jnp.where(diff < -box_size / 2, diff + box_size, diff)
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            # padded anchors sit at -1e9: every wrapped distance is large,
            # falling outside all shells
            return jnp.stack([
                jnp.sum((dist > lo) & (dist < hi) & (dist > 0))
                for lo, hi in edges])

        chunks = anchors.reshape(-1, anchor_chunk, pos.shape[1])
        return jnp.sum(jax.lax.map(chunk_counts, chunks), axis=0)

    counts = np.asarray(shell_counts(anchors))
    density = n / box_size ** 3
    xi = []
    for (lo, hi), count in zip(edges, counts):
        shell_vol = 4.0 / 3.0 * np.pi * (hi ** 3 - lo ** 3)
        expected = n_anchor * density * shell_vol
        xi.append(float(count) / expected - 1.0 if expected > 0 else 0.0)
    return r_bins, np.asarray(xi)


def compare_to_sdss(engine: UltimateEngine) -> dict:
    """(reference: :1259-1317)"""
    print("\n--- PHASE: SDSS 2-POINT CORRELATION ---")
    r, xi = compute_2point_correlation(engine.positions,
                                       engine.cfg.box_size)
    ref = np.asarray([SDSS_XI_R[int(rr)] for rr in r])
    valid = (xi > 0) & (ref > 0)
    if valid.sum() >= 3:
        log_rms = float(np.sqrt(np.mean(
            (np.log10(xi[valid]) - np.log10(ref[valid])) ** 2)))
    else:
        log_rms = float("inf")
    slope_ok = bool(xi[0] > xi[-1])
    for rr, x, rf in zip(r, xi, ref):
        print(f"  r={rr:5.0f} Mpc: xi_sim={x:8.3f}  xi_SDSS={rf:8.3f}")
    print(f"  log-RMS deviation: {log_rms:.2f} dex; "
          f"declining with r: {slope_ok}")
    return {"r_mpc": r.tolist(), "xi_sim": xi.tolist(),
            "xi_sdss": ref.tolist(), "log_rms_dex": log_rms,
            "shape_consistent": slope_ok}


def compare_to_cmb(engine: UltimateEngine) -> dict:
    """(reference: :1320-1411): map the simulated P(k) peak structure onto
    acoustic-peak multipoles via l ~ k * D_A (comoving distance to last
    scattering ~ 14000 Mpc)."""
    print("\n--- PHASE: CMB ACOUSTIC PEAKS ---")
    k, pk = engine.compute_power_spectrum(n_grid=32)
    d_a = 14000.0
    valid = pk > 0
    if valid.sum() < 4:
        return {"skipped": True}
    k_peak = float(k[valid][np.argmax(pk[valid])])
    l_equiv = k_peak * d_a
    # closest Planck peak
    nearest = min(CMB_PEAKS.values(), key=lambda l: abs(l - l_equiv))
    dev = abs(l_equiv - nearest) / nearest
    print(f"  dominant k={k_peak:.4f} -> l~{l_equiv:.0f}; nearest Planck "
          f"peak {nearest} (dev {dev:.0%})")
    return {"k_peak": k_peak, "l_equivalent": l_equiv,
            "nearest_planck_peak": nearest, "deviation": dev,
            "peak_match": bool(dev < 0.5)}


# --------------------------------------------------------------------------
# Cross-substrate mirror
# --------------------------------------------------------------------------

def export_state_for_comparison(engine: UltimateEngine, filepath: str) -> str:
    """(reference: :694-729)"""
    sd = engine.get_export_state()
    payload = {
        "timestamp": datetime.now().isoformat(),
        "platform": {
            "os": platform.system(),
            "python": sys.version.split()[0],
            "jax": jax.__version__,
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
        "simulation": {
            "seed": engine.seed,
            "precision": sd["precision"],
            "num_particles": sd["num_particles"],
            "redshift": sd["redshift"],
            "time_gyr": sd["time_gyr"],
            "state_hash": sd["state_hash"],
        },
        "positions": np.asarray(sd["positions"]).tolist(),
        "velocities": np.asarray(sd["velocities"]).tolist(),
        "masses": np.asarray(sd["masses"]).tolist(),
    }
    Path(filepath).write_text(json.dumps(payload))
    print(f"  exported state to {filepath} (hash {sd['state_hash']})")
    return sd["state_hash"]


def compare_substrate_states(path_a: str, path_b: str) -> dict:
    """(reference: :732-833): the 'Matrix proof' — different hardware
    agreeing bit-exactly implies enforced determinism. (With the
    counter-based JAX PRNG, bit-exact ICs across hosts are *expected*;
    the interesting signal is divergence during evolution.)"""
    a = json.loads(Path(path_a).read_text())
    b = json.loads(Path(path_b).read_text())
    print(f"\n{'=' * 60}\nCROSS-SUBSTRATE MIRROR TEST\n{'=' * 60}")
    print(f"  A: {a['platform']['device']} ({a['platform']['backend']})")
    print(f"  B: {b['platform']['device']} ({b['platform']['backend']})")
    hash_match = (a["simulation"]["state_hash"]
                  == b["simulation"]["state_hash"])
    pa, pb = np.asarray(a["positions"]), np.asarray(b["positions"])
    va, vb = np.asarray(a["velocities"]), np.asarray(b["velocities"])
    result = {"hash_match": bool(hash_match)}
    if pa.shape == pb.shape:
        result["position_correlation"] = float(np.corrcoef(
            pa.reshape(-1), pb.reshape(-1))[0, 1])
        result["velocity_correlation"] = float(np.corrcoef(
            va.reshape(-1), vb.reshape(-1))[0, 1])
        result["max_position_delta"] = float(np.abs(pa - pb).max())
    same_hw = a["platform"]["device"] == b["platform"]["device"]
    result["admin_intervention_suspected"] = bool(
        hash_match and not same_hw)
    print(f"  hash match: {hash_match}; "
          f"pos corr: {result.get('position_correlation')}")
    if result["admin_intervention_suspected"]:
        print("  !! Different hardware produced IDENTICAL states — "
              "enforced determinism ('admin intervention') suspected")
    return result


# --------------------------------------------------------------------------
# Orchestration
# --------------------------------------------------------------------------

def run_ultimate_reality_test(num_particles: int = 32768,
                              precision: str = "int4", seed: int = 42,
                              quick: bool = False,
                              out_dir: str = "output/ultimate") -> dict:
    """5 phases + score + verdict (reference: :888-1146)."""
    print("\n" + "=" * 64)
    print("ULTIMATE REALITY TEST")
    print("=" * 64)
    if quick:
        num_particles = 4096
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    engine = UltimateEngine(num_particles=num_particles,
                            precision=precision, seed=seed)
    report: dict = {"precision": precision,
                    "num_particles": engine.num_particles}

    print("\n--- PHASE: EVOLUTION ---")
    t0 = time.time()
    report["bao_test"] = run_bao_test(engine)
    engine.run_to_completion(dz=1.0, chunk=10, pipelined=True)
    report["evolution_wall_s"] = time.time() - t0
    report["glitch_summary"] = engine.glitch_detector.get_glitch_summary()
    report["structures"] = engine.detect_structures()
    report["sdss"] = compare_to_sdss(engine)
    report["cmb"] = compare_to_cmb(engine)
    report["state_hash"] = export_state_for_comparison(
        engine, str(out / "substrate_state.json"))

    # scoring (reference: :1100-1146)
    checks = {
        "bao_within_50pct": report["bao_test"]["sdss_deviation"] < 0.5,
        "structures_formed": report["structures"]["void_fraction"] > 0.05,
        "sdss_shape": report["sdss"]["shape_consistent"],
        "cmb_peak": report["cmb"].get("peak_match", False),
        "glitches_recorded": sum(report["glitch_summary"].values()) > 0,
    }
    score = sum(checks.values()) / len(checks) * 100
    report["checks"] = checks
    report["reality_score"] = score
    report["verdict"] = (
        "SIMULATION ARTIFACTS CONFIRMED: lossy physics reproduces "
        "cosmological phenomenology" if score >= 60 else
        "INCONCLUSIVE: degraded physics does not match observations")
    print(f"\n  REALITY SCORE: {score:.0f}/100 — {report['verdict']}")
    (out / "ultimate_report.json").write_text(
        json.dumps(report, indent=2, default=str))
    return report


def run_all_tests(quick: bool = True, seed: int = 42,
                  out_dir: str = "output/ultimate") -> dict:
    """(reference: :1447-1728): ultimate + sensitivity + omniverse +
    orbital, with graceful per-suite failure capture."""
    results = {"ultimate": run_ultimate_reality_test(quick=quick,
                                                     seed=seed,
                                                     out_dir=out_dir)}
    for name, runner in (
        ("sensitivity", lambda: __import__(
            "nbody_tpu.experiments.sensitivity_test",
            fromlist=["run_sensitivity_sweep"]).run_sensitivity_sweep(
                800 if quick else 1500, 200 if quick else 500,
                out_dir=str(Path(out_dir) / "sensitivity"))),
        ("omniverse", lambda: __import__(
            "nbody_tpu.experiments.omniverse_tests",
            fromlist=["run_omniverse_suite"]).run_omniverse_suite(
                quick=quick, seed=seed)),
        ("orbital", lambda: __import__(
            "nbody_tpu.experiments.orbital_audit",
            fromlist=["run_full_orbital_audit"]).run_full_orbital_audit(
                quick=quick)),
    ):
        try:
            results[name] = runner()
        except Exception as e:  # noqa: BLE001 (suite isolation)
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  suite '{name}' failed: {e}")
    out = Path(out_dir)
    (out / "comprehensive_report.json").write_text(
        json.dumps(results, indent=2, default=str))
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="Ultimate reality engine")
    p.add_argument("--mode", choices=["full", "all", "bao", "substrate",
                                      "compare"], default="full")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--precision", type=str, default="int4")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/ultimate")
    p.add_argument("--other-platform", type=str, default=None,
                   help="path to another substrate_state.json for compare")
    args = p.parse_args(argv)

    if args.mode == "compare":
        mine = Path(args.output) / "substrate_state.json"
        if not mine.exists() or not args.other_platform:
            print("need --other-platform and an existing export; run "
                  "--mode substrate first")
            return
        compare_substrate_states(str(mine), args.other_platform)
    elif args.mode == "substrate":
        engine = UltimateEngine(num_particles=4096 if args.quick else 32768,
                                precision=args.precision, seed=args.seed)
        engine.step(dz=1.0, num_steps=10)
        out = Path(args.output)
        out.mkdir(parents=True, exist_ok=True)
        export_state_for_comparison(engine,
                                    str(out / "substrate_state.json"))
    elif args.mode == "bao":
        engine = UltimateEngine(num_particles=4096 if args.quick else 32768,
                                precision=args.precision, seed=args.seed)
        run_bao_test(engine)
    elif args.mode == "all":
        run_all_tests(quick=args.quick, seed=args.seed,
                      out_dir=args.output)
    else:
        run_ultimate_reality_test(precision=args.precision, seed=args.seed,
                                  quick=args.quick, out_dir=args.output)


if __name__ == "__main__":
    main()
