"""Density/scaling limit test: wall time and energy cost vs particle count.

TPU-native equivalent of the reference scaling study
(reference: density_limit_test.py:43-544): star counts swept upward under a
clean (float32) and an int4-quantized configuration, measuring per-tick
wall time; a log-log power-law fit of time vs N flags anomalous scaling
(exponent > 2 would mean super-quadratic cost — "reality slows down
superlinearly with density").

Telemetry note: the reference's per-star/per-interaction *power* figures
come from NVML, which has no TPU analogue; this build substitutes the
documented degraded mode (time-based observables only,
SURVEY.md §7 'NVML-shaped features') and reports energy channels as null.

Usage:
    python -m nbody_tpu.experiments.density_limit_test --quick
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np

from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy, create_plummer_sphere
from nbody_tpu.ops.precision import Precision
from nbody_tpu.utils.profiler import DeviceProfiler, fence

DEFAULT_COUNTS = [100, 250, 500, 1000, 2000, 4000, 8000]
# On TPU, everything below ~16k is dispatch-dominated (the kernel finishes
# faster than the host can issue the next scan); the reference's question —
# does time grow WORSE than N^2 with density (density_limit_test.py:270-316)
# — is only answerable in the compute-bound regime, so the on-chip default
# sweep extends to 1M (~6 compute-bound octaves; per-row tick counts are
# bounded by _ticks_for so the 1M tail stays ~10 s of measured work).
DEFAULT_COUNTS_TPU = [1000, 4000, 8000, 16384, 32768, 65536,
                      131072, 262144, 524288, 1048576]


def _ticks_for(n: int, ticks_per_size: int) -> int:
    """Bound the measured pair work per row so the large-N tail stays
    minutes, not hours; small N keep the full tick count.

    The per-row budget must ALSO amortise the per-dispatch host/tunnel
    latency (~50 ms on this box): each row is timed as ONE fused scan
    dispatch, so a row whose total compute is only ~100 ms would report
    ~2x its true ms/tick and bend the exponent fit sub-quadratic. On
    TPU the budget is 6e11 pairs (>= ~1 s of kernel work per mid-N row,
    dispatch overhead < 5%); elsewhere 3e10 keeps CPU sweeps bounded.
    The 1M tail stays 5 ticks (~12 s) either way, safely under this
    box's ~70-90 s tunnel dispatch watchdog."""
    budget = 6e11 if jax.default_backend() == "tpu" else 3e10
    return max(5, min(ticks_per_size, int(budget / max(n * n, 1))))


def run_density_sweep(counts=None, ticks_per_size: int = 1000, seed: int = 42,
                      dim: int = 2):
    """(reference: density_limit_test.py:206-267)

    ``dim=3`` sweeps the same kernels on Plummer-sphere ICs (the per-pair
    op count differs at dim=3: one more subtract/square/fma lane — the
    3-D engine is first-class in the reference, universe_3d.py)."""
    if counts is None:
        counts = (DEFAULT_COUNTS_TPU if jax.default_backend() == "tpu"
                  else DEFAULT_COUNTS)
    if dim not in (2, 3):
        raise ValueError(f"dim must be 2 or 3, got {dim}")
    make_ics = create_disk_galaxy if dim == 2 else create_plummer_sphere
    print(f"\n{'=' * 60}\nDENSITY LIMIT TEST (dim={dim})\n{'=' * 60}")
    print(f"counts: {counts}, ticks each: <= {ticks_per_size}")

    results = []
    for mode_name, precision in (("clean_float32", Precision.FLOAT32),
                                 ("int4_broken", Precision.INT4_SIM)):
        print(f"\n  --- {mode_name} ---")
        for n in counts:
            ticks = _ticks_for(n, ticks_per_size)
            pos, vel, m = make_ics(jax.random.PRNGKey(seed), num_stars=n)
            sim = DirectSimulation(pos, vel, m, precision=precision)
            # warm the EXACT program measured below (num_steps is a
            # static jit arg: a different count compiles a different
            # program and the timed region would include compilation)
            sim.step(ticks)
            fence(sim.state.positions)

            prof = DeviceProfiler(sample_interval_ms=50,
                                  experiment_name=f"{mode_name}_N{n}")
            prof.start()
            t0 = time.perf_counter()
            sim.step(ticks)
            fence(sim.state.positions)
            wall = time.perf_counter() - t0
            prof.stop()
            analysis = prof.analyze()

            ms_per_tick = wall / ticks * 1e3
            crashed = not np.isfinite(np.asarray(sim.positions)).all()
            results.append({
                "mode": mode_name,
                "dim": dim,
                "num_stars": n,
                "ticks": ticks,
                "ms_per_tick": ms_per_tick,
                "pairs_per_sec": n * n * ticks / wall,
                "peak_memory_mb": analysis.peak_memory_mb,
                "power_watts": None,           # NVML channel: unavailable
                "power_per_star": None,        # degraded-mode placeholder
                "crashed": bool(crashed),
            })
            print(f"    N={n:6d}: {ms_per_tick:8.3f} ms/tick "
                  f"({n * n / (ms_per_tick / 1e3):.2e} pairs/s)"
                  + ("  CRASHED" if crashed else ""))
            if crashed:
                break
    return results


def analyze_scaling(results) -> dict:
    """Log-log power-law fit on the COMPUTE-BOUND tail
    (reference: density_limit_test.py:270-316).

    On TPU the small-N rows sit on a fixed dispatch floor (host issue +
    tunnel latency; the kernel itself is microseconds), where a power-law
    fit would report exponent ~0 and the super-quadratic anomaly check is
    vacuous. Rows are classified by their distance from the observed
    floor: only rows >= 4x the cheapest tick cost enter the fit. Each
    result row is annotated with its regime."""
    verdicts = {}
    for mode in ("clean_float32", "int4_broken"):
        rows = [r for r in results if r["mode"] == mode and not r["crashed"]]
        if len(rows) < 3:
            continue
        n = np.array([r["num_stars"] for r in rows], float)
        t = np.array([r["ms_per_tick"] for r in rows], float)
        floor = float(t.min())
        compute_bound = t >= 4.0 * floor
        for r, cb in zip(rows, compute_bound):
            r["regime"] = "compute_bound" if cb else "dispatch_floor"
        if compute_bound.sum() >= 3:
            sel = compute_bound
            regime_note = (f"fit on {int(sel.sum())} compute-bound rows "
                           f"(dispatch floor {floor:.2f} ms/tick)")
        else:
            # whole sweep sits on the floor (CPU CI / tiny sweeps): fall
            # back to the asymptotic-median tail but SAY the verdict is
            # dispatch-dominated rather than reporting a physical exponent
            sel = n >= np.median(n)
            regime_note = ("dispatch-dominated sweep: no compute-bound "
                           "rows; exponent reflects host dispatch, not "
                           "pair physics — extend --counts upward")
        x, y = np.log(n[sel]), np.log(t[sel])
        (exponent, intercept) = np.polyfit(x, y, 1)
        exponent = float(exponent)
        # 95% CI on the fitted exponent (t-distributed slope error; the
        # reference fits with no uncertainty at all,
        # density_limit_test.py:270-316)
        ci95 = None
        dof = int(sel.sum()) - 2
        if dof >= 1 and np.ptp(x) > 0:
            resid = y - (exponent * x + intercept)
            se = float(np.sqrt((resid ** 2).sum() / dof
                               / ((x - x.mean()) ** 2).sum()))
            try:
                from scipy import stats
                tcrit = float(stats.t.ppf(0.975, dof))
            except Exception:
                tcrit = 1.96  # normal approximation
            ci95 = tcrit * se
        verdicts[mode] = {
            "exponent": exponent,
            "exponent_ci95": ci95,
            "dispatch_floor_ms": floor,
            "compute_bound_rows": int(compute_bound.sum()),
            "regime_note": regime_note,
            "anomalous": bool(compute_bound.sum() >= 3 and exponent > 2.2),
            "interpretation": (
                "SUPER-QUADRATIC — density slows reality beyond O(N^2)"
                if compute_bound.sum() >= 3 and exponent > 2.2 else
                f"scaling exponent {exponent:.2f} (<= 2: at or below the "
                "theoretical O(N^2) pairwise cost)"
                if compute_bound.sum() >= 3 else
                "dispatch-dominated: anomaly check not meaningful at this "
                "scale"),
        }
        ci_str = f" +/- {ci95:.2f}" if ci95 is not None else ""
        print(f"  {mode}: time ~ N^{exponent:.2f}{ci_str} [{regime_note}] "
              f"({verdicts[mode]['interpretation']})")
    return verdicts


def main(argv=None):
    p = argparse.ArgumentParser(description="Density/scaling limit test")
    p.add_argument("--counts", type=str, default=None,
                   help="comma-separated star counts")
    p.add_argument("--ticks", type=int, default=1000,
                   help="per-row tick cap (the pair budget in _ticks_for "
                        "bounds large-N rows below this)")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3),
                   help="2: disk-galaxy ICs (reference default); "
                        "3: Plummer-sphere ICs")
    p.add_argument("--output", type=str, default="output/density_limit")
    args = p.parse_args(argv)

    counts = ([int(c) for c in args.counts.split(",")] if args.counts
              else None)  # None -> backend-appropriate default sweep
    if args.quick:
        counts = [100, 250, 500, 1000, 2000]
        args.ticks = 50

    results = run_density_sweep(counts, args.ticks, args.seed, dim=args.dim)
    print(f"\n{'=' * 60}\nSCALING ANALYSIS\n{'=' * 60}")
    verdicts = analyze_scaling(results)

    if args.dim == 3 and args.output == "output/density_limit":
        args.output = "output/density_limit_3d"  # don't clobber the 2-D report
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "density_limit_report.json").write_text(json.dumps({
        "results": results, "scaling": verdicts,
        "telemetry_note": "power channels unavailable on TPU (no NVML); "
                          "degraded mode uses wall-clock observables only",
    }, indent=2))


if __name__ == "__main__":
    main()
