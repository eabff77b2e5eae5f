#!/usr/bin/env python
"""Precision-ladder throughput bench: ms/step + pairs/s per mode.

Produces the PERF.md ladder tables (2-D disk-galaxy or 3-D
Plummer-sphere ICs) on whatever backend is live. Each mode is measured
as the fused in-scan leapfrog (the production configuration, zero host
round-trips between ticks), warmed first, then best-of-k wall time with
a host-fetch fence — the same protocol as bench.py.

Usage:
    python tools/ladder_bench.py --n 131072 --dim 3 --steps 30
    python tools/ladder_bench.py --modes float32,int4 --dim 3 --n 1048576 --steps 5
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DEFAULT_MODES = "float32,bfloat16,float16,int8,int4,custom,float64"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=131072)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--steps", type=int, default=30,
                   help="ticks per timed dispatch (size so each dispatch "
                        "is >=0.6 s of kernel work: ~50 ms tunnel latency "
                        "must stay <5% of the wall)")
    p.add_argument("--modes", type=str, default=DEFAULT_MODES)
    p.add_argument("--best-of", type=int, default=3)
    p.add_argument("--impl", type=str, default=None,
                   help="force kernel impl (default: pallas on TPU, "
                        "tiled elsewhere)")
    p.add_argument("--f64-steps", type=int, default=None,
                   help="override steps for the double-double baseline "
                        "(defaults to max(2, steps//10): ~12x f32 cost)")
    p.add_argument("--output", type=str, default=None,
                   help="also write a JSON report here")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.direct import DirectSimulation
    from nbody_tpu.models.galaxy import (create_disk_galaxy,
                                         create_plummer_sphere)

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    impl = args.impl or ("pallas" if on_tpu else "tiled")
    n = args.n if on_tpu else min(args.n, 2048)

    make_ics = create_disk_galaxy if args.dim == 2 else create_plummer_sphere
    pos, vel, m = make_ics(jax.random.PRNGKey(42), num_stars=n)

    rows = []
    for mode in args.modes.split(","):
        mode = mode.strip()
        steps = args.steps
        if mode in ("float64", "f64"):
            # double-double pays ~12x f32: keep the dispatch under the
            # tunnel watchdog
            steps = args.f64_steps or max(2, args.steps // 10)
        sim = DirectSimulation(pos, vel, m, precision=mode,
                               cfg=SimConfig(), force_impl=impl)
        t0 = time.time()
        sim.step(steps)
        np.asarray(sim.positions[:1])
        log(f"{mode}: warmup (compile + {steps} steps) "
            f"{time.time() - t0:.1f}s")
        wall = None
        for _ in range(args.best_of):
            t0 = time.time()
            sim.step(steps)
            np.asarray(sim.positions[:1])
            w = time.time() - t0
            wall = w if wall is None else min(wall, w)
        ms = wall / steps * 1e3
        pairs = n * n * steps / wall
        log(f"{mode}: dim={args.dim} N={n}: {ms:.1f} ms/step  "
            f"{pairs:.3e} pairs/s")
        rows.append({"mode": mode, "dim": args.dim, "n": n, "steps": steps,
                     "ms_per_step": ms, "pairs_per_sec": pairs})

    print(json.dumps({"backend": jax.default_backend(), "impl": impl,
                      "rows": rows}))
    if args.output:
        Path(args.output).parent.mkdir(parents=True, exist_ok=True)
        Path(args.output).write_text(json.dumps(
            {"backend": jax.default_backend(), "impl": impl, "rows": rows},
            indent=2))


if __name__ == "__main__":
    main()
