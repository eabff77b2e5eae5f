"""One-time generation of a canonical-scale reference trajectory.

Runs the torch reference (CPU) at canonical scale (5000 stars x 2000
ticks, reference: main.py defaults, simulation.py:199-250) for the given
precision mode and caches it under tools/reference_cache/ for the parity
gate (tools/reference_parity.py). With --perturb, generates the
permuted-order TWIN (fixed seed-42 permutation — identical physics,
perturbed summation order) that bounds the reference's own
reduction-order chaos. ~1-2 h single-core per trajectory; run once.

Usage:
    python tools/gen_canonical_ref.py --mode float16
    python tools/gen_canonical_ref.py --mode float16 --perturb
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nbody_tpu.models.galaxy import create_disk_galaxy
from tools.reference_parity import (canonical_reference_mode,
                                    run_reference_cached)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True)
    p.add_argument("--perturb", action="store_true")
    p.add_argument("--stars", type=int, default=5000)
    p.add_argument("--ticks", type=int, default=2000)
    p.add_argument("--interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    mode = canonical_reference_mode(args.mode)
    with jax.default_device(jax.devices("cpu")[0]):
        pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(args.seed),
                                         num_stars=args.stars)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    perm = (np.random.default_rng(args.seed).permutation(args.stars)
            if args.perturb else None)
    drifts, _, _ = run_reference_cached(pos, vel, m, mode, args.ticks,
                                        args.interval, args.seed, perm=perm)
    tag = " permuted twin" if args.perturb else ""
    print(f"{mode}{tag} final drift: {drifts[-1]:+.4f}%")


if __name__ == "__main__":
    main()
