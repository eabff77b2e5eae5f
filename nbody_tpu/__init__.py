"""nbody_tpu — TPU-native N-body / cosmological precision-study framework.

A ground-up JAX / XLA / Pallas re-design with the capabilities of the
reference repo ``nuclearbombmods/nbody-cosmological-simulation`` (a
PyTorch/CUDA N-body engine studying how numerical precision breaks
conservation laws). See SURVEY.md at the repo root for the full blueprint.

Layout:
    ops/          precision ladder, double-double arithmetic, force kernels
                  (dense / tiled / Pallas), particle-mesh operators
    models/       particle state pytrees, initial conditions, engines
    diagnostics/  on-device metrics, power spectra, glitch/anomaly suite
    parallel/     mesh + shard_map ring force, sharded PM
    utils/        reproducibility, profiling, plotting
    engines/      cosmological orchestration engines (2D/3D/genesis/...)
    experiments/  experiment CLIs (stability, sensitivity, falsification...)
    realtime/     streaming realtime engine
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: compiles on this environment go through a
# remote TPU compile service with multi-second latency (and the emulated-f64
# baseline programs are expensive to build); cache every executable on disk.
#
# EXCEPT on forced-multi-device CPU (the virtual-mesh test/dryrun
# environment, marked by xla_force_host_platform_device_count in
# XLA_FLAGS): deserialized multi-device XLA:CPU executables can hit a
# lost-wakeup race in the collective runtime on this box — every thread
# futex-parks with nothing runnable and the process wedges. Freshly
# COMPILED programs never exhibit it (compile latency naturally serializes
# the first dispatches), so virtual-mesh runs always compile
# (see tests/conftest.py for the full diagnosis).
def _multi_device_cpu_configured() -> bool:
    """True when the process is configured for a multi-device virtual CPU
    mesh by ANY of the supported knobs — not just the XLA_FLAGS literal
    (advisor r3: jax_num_cpu_devices configures the same topology without
    touching XLA_FLAGS and must disable the cache the same way). Checked
    without initializing backends (config reads only)."""
    if "xla_force_host_platform_device_count" in _os.environ.get(
            "XLA_FLAGS", ""):
        return True
    try:
        env = int(_os.environ.get("JAX_NUM_CPU_DEVICES", "") or 0)
    except ValueError:
        env = 0
    if env > 1:
        return True
    try:
        cfg = int(getattr(_jax.config, "jax_num_cpu_devices", 0) or 0)
    except Exception:  # pragma: no cover - config knob absent
        cfg = 0
    return cfg > 1


_virtual_mesh_cpu = _multi_device_cpu_configured()
if not _os.environ.get("NBODY_TPU_NO_CACHE") and not _virtual_mesh_cpu:
    _cache_dir = _os.environ.get(
        "NBODY_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these knobs
        pass

from nbody_tpu.config import DEFAULT_SIM, PLANCK18, Cosmology, SimConfig
from nbody_tpu.ops.precision import (
    Precision,
    Quantizer,
    describe_mode,
    get_mode_from_string,
)

__all__ = [
    "DEFAULT_SIM",
    "PLANCK18",
    "Cosmology",
    "SimConfig",
    "Precision",
    "Quantizer",
    "describe_mode",
    "get_mode_from_string",
]
