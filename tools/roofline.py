"""Measured device ceilings for the force-kernel roofline (docs/PERF.md).

The force kernels are VPU subtract-form by design (the MXU dot-form d²
catastrophically cancels — see docs/PERF.md), so their speed-of-light is
set by VPU vector-op issue and the transcendental unit, not the MXU.
This tool MEASURES those ceilings on the actual chip instead of quoting
datasheet numbers that do not exist publicly for the VPU.

Methodology: each benchmark scans a tuple of ILP independent arrays,
each advancing its own serial op chain — the independent streams let the
VPU pipeline overlap chains, so at sufficient ILP the measured rate is
the ISSUE throughput, not the pipeline latency (a single serial chain
under-reports by the pipeline depth — measured 5-6x on this chip).
Timing fences the warm call's OUTPUT (not just the input) and takes the
best of 3 fenced repeats.

Usage:  python tools/roofline.py          # on the TPU (axon) platform
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nbody_tpu.utils.profiler import fence  # noqa: E402

SHAPE = (512, 2048)         # 1M f32 lanes per stream: VMEM-friendly
CHAIN = 128                 # serial links per scan iteration per stream
ITERS = 32                  # scan length


def _timed_best(fn, args, repeats: int = 3) -> float:
    out = fn(*args)          # compile + warm
    fence(out)               # wait for the WARM RUN itself
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _bench(body_op, ilp: int, label: str) -> float:
    """Element-ops/s of `ilp` interleaved independent serial chains."""

    @jax.jit
    def run(*xs):
        def it(ys, _):
            ys = list(ys)
            for _ in range(CHAIN):
                ys = [body_op(y) for y in ys]
            return tuple(ys), None

        ys, _ = jax.lax.scan(it, tuple(xs), None, length=ITERS)
        return ys

    xs = [jnp.full(SHAPE, 1.000001 + 1e-4 * i, jnp.float32)
          for i in range(ilp)]
    dt = _timed_best(run, xs)
    n_elem = SHAPE[0] * SHAPE[1]
    rate = n_elem * CHAIN * ITERS * ilp / dt
    print(f"  {label:40s}: {rate:.3e} op/s  ({dt * 1e3:.1f} ms)")
    return rate


def main():
    dev = jax.devices()[0]
    print(f"Roofline microbenchmarks on {dev.device_kind} "
          f"({jax.default_backend()})  shape={SHAPE} chain={CHAIN} "
          f"iters={ITERS}")

    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    results = {}
    for ilp in (1, 4, 8):
        results[f"fma_ilp{ilp}"] = _bench(
            lambda y: a * y + b, ilp, f"f32 FMA chains (ILP={ilp})")
    for ilp in (1, 4, 8):
        results[f"rsqrt_ilp{ilp}"] = _bench(
            lambda y: jax.lax.rsqrt(y) + jnp.float32(1.0), ilp,
            f"f32 rsqrt+add chains (ILP={ilp})")

    fma_peak = max(v for k, v in results.items() if k.startswith("fma"))
    rsqrt_peak = max(v for k, v in results.items()
                     if k.startswith("rsqrt"))
    # rsqrt+add chain: count the add against the FMA port, i.e. the pure
    # transcendental rate is at least the measured chain rate
    report = {
        "device": dev.device_kind,
        **results,
        "fma_issue_ceiling_per_s": fma_peak,
        "rsqrt_issue_ceiling_per_s": rsqrt_peak,
        # sym-kernel per-unordered-pair budget at D=2 (ops/pallas_nbody):
        # diff 2, d² 4, cube 2, w·gm 1, direct acc 4, reaction 4,
        # accumulate 4 => ~21 vector ops + 1 rsqrt
        "vec_ops_per_pair": 21,
        "pairs_ceiling_fma_bound_per_s": 2.0 * fma_peak / 21.0,
        "pairs_ceiling_rsqrt_bound_per_s": 2.0 * rsqrt_peak,
        "note": ("ceilings in ORDERED pairs/s (N^2 per force evaluation; "
                 "the sym kernel evaluates N^2/2 unordered pairs). The "
                 "binding ceiling is min(fma_bound, rsqrt_bound)."),
    }
    print(json.dumps(report, indent=2))
    out = Path("output/roofline.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
