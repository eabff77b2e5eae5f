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

# Persistent compilation cache: this box has a single vCPU and XLA compiles
# dominate test wall time; cache them across runs.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
