"""One-time generation of the f16 canonical permuted-order reference twin.

Runs the torch reference (CPU) at canonical scale (5000 stars x 2000
ticks, reference: main.py defaults, simulation.py:199-250) with the fixed
seed-42 particle permutation — identical physics, perturbed summation
order — and caches it under tools/reference_cache/ for the parity gate
(tools/reference_parity.py --perturb). ~1 h single-core; run once.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nbody_tpu.models.galaxy import create_disk_galaxy
from tools.reference_parity import run_reference_cached


def main():
    stars, ticks, interval, seed = 5000, 2000, 100, 42
    with jax.default_device(jax.devices("cpu")[0]):
        pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed),
                                         num_stars=stars)
    pos, vel, m = map(np.asarray, (pos, vel, m))
    perm = np.random.default_rng(seed).permutation(stars)
    drifts, _, _ = run_reference_cached(pos, vel, m, "f16", ticks, interval,
                                        seed, perm=perm)
    print(f"f16 permuted twin final drift: {drifts[-1]:+.4f}%")


if __name__ == "__main__":
    main()
