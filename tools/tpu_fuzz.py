#!/usr/bin/env python
"""On-TPU randomized kernel fuzz: Mosaic-compiled kernels vs the dense oracle.

CI's property fuzz (tests/test_fuzz_kernels.py) runs the Pallas kernels in
interpreter mode on CPU; tools/tpu_parity.py gates a FIXED config matrix on
the chip. This driver closes the remaining gap: it replays the same seeded
randomized case space (adversarial clouds, prime/near-block N, random block
shapes, zero softening, unequal masses) against the MOSAIC-compiled kernels
on the real TPU, where interpreter mode cannot stand in for the compiler.

Single-device only — the mesh/ring cases need >1 chip and stay CPU-tested.
Each distinct (shape, mode, block) point costs one remote compile (~seconds)
on first run; the persistent cache makes reruns fast.

Usage: python tools/tpu_fuzz.py [num_cases] [seed]
Exit code 0 = every case matches the dense oracle.
"""

import os
import sys


def main() -> int:
    num_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260819

    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (CI fuzzes interpret mode; this is the "
              "Mosaic gate)")
        return 0

    import jax.numpy as jnp
    import numpy as np

    # Reuse the seeded case space + oracle comparison from the CI harness
    # (tests/ has no __init__; path-import it directly).
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import test_fuzz_kernels as fz

    from nbody_tpu.config import SimConfig
    from nbody_tpu.ops import forces
    from nbody_tpu.ops import pallas_nbody as pk
    from nbody_tpu.ops.precision import Quantizer

    rng_base = seed
    failures = []
    for idx in range(num_cases):
        rng = np.random.RandomState(rng_base + idx)
        case = fz._draw_case(rng)
        cfg = SimConfig(softening=case["softening"])
        q = Quantizer(case["mode"],
                      custom_levels=int(rng.choice([16, 64, 4096])))
        label = (f"case {idx}: N={case['n']} dim={case['dim']} "
                 f"{case['mode'].value} soft={case['softening']} "
                 f"impl={case['impl']} eq_m={case['equal_masses']} "
                 f"blk={case['block']}/{case['block_j']}")
        want = forces.dense_accelerations(jnp.asarray(case["pos"]),
                                          jnp.asarray(case["m"]), q, cfg,
                                          quantize_forces=q.is_int)
        try:
            got = fz._force(case, cfg, q)
            fz._assert_matches_dense(got, want, q, label)
            # Bounds max pass on the same adversarial cloud.
            pos = jnp.asarray(case["pos"])
            want_max = float(forces.max_pairwise_dist_sq(pos, cfg))
            got_res = float(pk.pallas_max_dist_sq(pos, cfg))
            got_str = float(pk.pallas_max_dist_sq_streamed(pos, cfg))
            np.testing.assert_allclose(got_res, want_max, rtol=1e-6,
                                       err_msg=f"{label}: resident max")
            np.testing.assert_allclose(got_str, want_max, rtol=1e-6,
                                       err_msg=f"{label}: streamed max")
            print(f"  ok   {label}", flush=True)
        except AssertionError as e:
            failures.append(label)
            print(f"  FAIL {label}\n       {str(e)[:400]}", flush=True)

    print(f"\n{num_cases - len(failures)}/{num_cases} on-chip fuzz cases "
          f"pass (seed {seed})")
    if failures:
        for f in failures:
            print(f"  FAILED: {f}")
        return 1
    print("TPU FUZZ: ALL PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
