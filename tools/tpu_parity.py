#!/usr/bin/env python
"""On-TPU Pallas parity check: Mosaic-compiled kernels vs the jnp paths.

CI (tests/) forces the CPU backend, so the Pallas kernels are unit-tested
there in interpreter mode only; this script is the hardware gate the
verify skill runs to catch Mosaic-compilation regressions. It compares
the symmetric production kernel, the row-sweep kernel, and the max pass
against the dense jnp reference on the real chip for every precision
mode, odd N, 3-D, and zero softening.

Exit code 0 = all parities hold. Run it like any TPU script on this box
(background, no SIGKILL).
"""

import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (this is the hardware gate; CI covers "
              "interpret mode)")
        return 0

    from nbody_tpu.config import SimConfig
    from nbody_tpu.models.galaxy import create_disk_galaxy
    from nbody_tpu.ops import forces
    from nbody_tpu.ops.pallas_nbody import (
        pallas_accelerations,
        pallas_accelerations_streamed,
        pallas_accelerations_sym,
        pallas_accelerations_sym_chunked,
        pallas_max_dist_sq,
        pallas_max_dist_sq_streamed,
    )
    from nbody_tpu.ops.precision import Precision, Quantizer

    cfg = SimConfig()
    failures = []

    def check(label, got, want, rtol=5e-5, atol=2e-6):
        got, want = np.asarray(got), np.asarray(want)
        if not np.isfinite(got).all():
            failures.append(f"{label}: non-finite output")
            print(f"  FAIL {label}: non-finite")
            return
        err = np.max(np.abs(got - want) / (np.max(np.abs(want)) + 1e-30))
        ok = np.allclose(got, want, rtol=rtol, atol=atol)
        print(f"  {'ok  ' if ok else 'FAIL'} {label}: max rel err {err:.2e}")
        if not ok:
            failures.append(f"{label}: rel err {err:.2e}")

    modes = [Precision.FLOAT32, Precision.BFLOAT16, Precision.FLOAT16,
             Precision.INT8_SIM, Precision.INT4_SIM]

    for n, dim in ((2048, 2), (1531, 2), (1024, 3)):
        if dim == 2:
            pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(0),
                                             num_stars=n)
        else:
            pos = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 5.0
            m = jnp.ones(n)
        print(f"N={n} dim={dim}:")
        for mode in modes:
            q = Quantizer(mode)
            qf = q.is_int
            ref = forces.dense_accelerations(pos, m, q, cfg,
                                             quantize_forces=qf)
            check(f"sym/{mode.value}",
                  pallas_accelerations_sym(pos, m, q, cfg,
                                           quantize_forces=qf), ref)
            # Equal-mass fast path (all these ICs use unit masses):
            # active when N is unpadded (2048, 1024-3D), auto-degrading
            # at N=1531 — both must match the dense oracle compiled.
            check(f"sym-uniform/{mode.value}",
                  pallas_accelerations_sym(pos, m, q, cfg,
                                           quantize_forces=qf,
                                           uniform_gm=True), ref)
            check(f"rows/{mode.value}",
                  pallas_accelerations(pos, m, q, cfg, quantize_forces=qf),
                  ref)
            check(f"streamed/{mode.value}",
                  pallas_accelerations_streamed(pos, m, q, cfg,
                                                quantize_forces=qf), ref)
            check(f"sym_chunked/{mode.value}",
                  pallas_accelerations_sym_chunked(pos, m, q, cfg,
                                                   quantize_forces=qf,
                                                   chunk=512), ref)
            check(f"sym_chunked-uniform/{mode.value}",
                  pallas_accelerations_sym_chunked(pos, m, q, cfg,
                                                   quantize_forces=qf,
                                                   chunk=512,
                                                   uniform_gm=True), ref)
        diff = pos[None, :, :] - pos[:, None, :]
        want_max = jnp.max(jnp.sum(diff * diff, -1)) + cfg.softening_sq
        check("max_pass", pallas_max_dist_sq(pos, cfg)[None],
              np.asarray(want_max)[None], rtol=1e-6, atol=0.0)
        check("max_pass_streamed",
              pallas_max_dist_sq_streamed(pos, cfg)[None],
              np.asarray(want_max)[None], rtol=1e-6, atol=0.0)

    # zero softening (self-mask path)
    cfg0 = SimConfig(softening=0.0)
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(2), num_stars=512)
    check("sym/zero-softening",
          pallas_accelerations_sym(pos, m, Quantizer(), cfg0),
          forces.dense_accelerations(pos, m, Quantizer(), cfg0))

    if failures:
        print(f"\n{len(failures)} PARITY FAILURE(S):")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("\nALL ON-TPU PARITIES HOLD")
    return 0


if __name__ == "__main__":
    sys.exit(main())
