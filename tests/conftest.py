"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
tested against 8 simulated host devices, the standard JAX pattern for
testing pjit/shard_map code without a pod.
"""

import os

# Force CPU: the box env pre-sets JAX_PLATFORMS=axon (the real-TPU tunnel),
# so a setdefault would silently run the whole suite on the one TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in _flags:
    # XLA:CPU hard-aborts the whole process (rendezvous.cc F-check) when a
    # device thread arrives >40 s late at a collective. This box has ONE
    # core timesharing 8 virtual device threads, so long per-chunk programs
    # (PE ring + gathered metrics) can legitimately skew past that under
    # load — raise the termination timeout; real stuck tests still die via
    # the pytest/CI timeout.
    _flags += (" --xla_cpu_collective_timeout_seconds=1200"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402  (import after env is set)

# The TPU-tunnel sitecustomize on this box imports jax at interpreter start
# and sets jax_platforms="axon,cpu" at the *config* level, which overrides
# the env var — force it back so tests never claim (and serialize on) the
# single real TPU chip.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)

# NO persistent compilation cache here — deliberately. Deserialized
# multi-device (shard_map/collective) XLA:CPU executables can deadlock this
# box: every thread (8 per-device Eigen workers + runtime) parks on a futex
# with nothing runnable and the process wedges mid-test (diagnosed via
# /proc wchan + pytest faulthandler; reproducer was
# `pytest tests/test_parallel_ring.py tests/test_direct_mesh.py` on a warm
# cache). Freshly COMPILED programs never exhibit it — compile latency
# naturally serializes the first dispatches — and cold runs pass 100% of
# the time, so the suite always compiles. Ruled out experimentally:
# synchronous CPU dispatch, --xla_cpu_use_thunk_runtime=false, per-module
# jax.extend.backend.clear_backends() — all still deadlocked warm.
# nbody_tpu/__init__.py skips its cache setup when it sees the forced-
# device-count flag this file sets, covering test and dryrun processes
# alike.
