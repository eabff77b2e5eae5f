"""Determinism, manifests, state hashing, multi-seed statistics.

TPU-native re-design of the reference reproducibility module
(reference: reproducibility.py:60-507). Differences:

* JAX PRNG is explicit-key, so "set all seeds" becomes ``seed_key`` (one
  key threads the whole experiment) plus numpy seeding for host-side
  fixtures — there is no hidden global RNG to pin, which is itself the
  reproducibility win;
* hardware manifests describe the JAX device fleet (TPU kind/platform and
  host CPU/RAM) instead of NVML fields; the NVML-shaped ``DeviceState``
  keeps the reference's schema with explicit None for telemetry this
  platform does not expose (power/clocks/throttle), so downstream tables
  degrade visibly rather than silently;
* state hashing is identical in spirit: SHA-256 over positions+velocities
  bytes, 16 hex chars (reference: reproducibility.py:227-232).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import platform
from datetime import datetime
from typing import Callable, List, Optional

import jax
import numpy as np


# --------------------------------------------------------------------------
# Seeds / keys
# --------------------------------------------------------------------------

def set_all_seeds(seed: int):
    """Seed every *implicit* RNG in play (numpy for host fixtures); JAX
    randomness is explicit-key — use ``seed_key`` (reference analogue:
    reproducibility.py:235-244)."""
    np.random.seed(seed)


def seed_key(seed: int) -> jax.Array:
    """Root PRNG key for an experiment."""
    return jax.random.PRNGKey(seed)


# --------------------------------------------------------------------------
# Manifests
# --------------------------------------------------------------------------

@dataclasses.dataclass
class HardwareManifest:
    platform: str
    device_kind: str
    num_devices: int
    cpu_model: str
    cpu_cores: int
    ram_gb: float
    hostname: str


@dataclasses.dataclass
class SoftwareManifest:
    python_version: str
    jax_version: str
    jaxlib_backend: str
    numpy_version: str
    os_version: str


@dataclasses.dataclass
class ExperimentConfig:
    experiment_name: str
    precision_mode: str
    num_stars: int
    num_ticks: int
    random_seed: int
    dt: float
    softening: float
    G: float
    quantization_levels: Optional[int] = None


@dataclasses.dataclass
class DeviceState:
    """Telemetry snapshot, schema-compatible with the reference's NVML
    GPUState (reference: reproducibility.py:67-77). Fields the TPU
    platform does not expose are None — never fabricated."""

    device_kind: str
    memory_used_mb: Optional[float]
    memory_total_mb: Optional[float]
    clock_speed_mhz: Optional[int] = None
    power_draw_watts: Optional[float] = None
    temperature_c: Optional[float] = None
    utilization_percent: Optional[float] = None
    performance_state: Optional[str] = None
    throttle_reasons: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class ReproducibilityManifest:
    timestamp: str
    experiment_id: str
    hardware: HardwareManifest
    software: SoftwareManifest
    config: ExperimentConfig
    device_state_before: Optional[DeviceState]
    device_state_after: Optional[DeviceState]
    initial_state_hash: str
    results_hash: str


def get_hardware_manifest() -> HardwareManifest:
    devs = jax.devices()
    try:
        import psutil
        ram_gb = psutil.virtual_memory().total / 1024 ** 3
    except Exception:
        ram_gb = 0.0
    return HardwareManifest(
        platform=jax.default_backend(),
        device_kind=devs[0].device_kind if devs else "none",
        num_devices=len(devs),
        cpu_model=platform.processor() or platform.machine(),
        cpu_cores=os.cpu_count() or 0,
        ram_gb=round(ram_gb, 2),
        hostname=platform.node(),
    )


def get_software_manifest() -> SoftwareManifest:
    return SoftwareManifest(
        python_version=platform.python_version(),
        jax_version=jax.__version__,
        jaxlib_backend=jax.default_backend(),
        numpy_version=np.__version__,
        os_version=platform.platform(),
    )


def get_device_state() -> DeviceState:
    """TPU analogue of NVML polling (reference: reproducibility.py:162-224):
    memory from the device allocator; power/clock/throttle unavailable on
    this platform and reported as None."""
    dev = jax.devices()[0]
    mem_used = mem_total = None
    try:
        stats = dev.memory_stats()
        if stats:
            mem_used = stats.get("bytes_in_use", 0) / 1024 ** 2
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            mem_total = limit / 1024 ** 2 if limit else None
    except Exception:
        pass
    return DeviceState(device_kind=dev.device_kind,
                       memory_used_mb=mem_used, memory_total_mb=mem_total)


def hash_state(positions, velocities) -> str:
    """SHA-256 of the state bytes, 16 hex chars
    (reference: reproducibility.py:227-232)."""
    pos = np.asarray(positions, np.float32).tobytes()
    vel = np.asarray(velocities, np.float32).tobytes()
    return hashlib.sha256(pos + vel).hexdigest()[:16]


# Back-compat alias matching the reference name.
hash_tensor_state = hash_state


def create_manifest(config: ExperimentConfig, initial_positions,
                    initial_velocities, final_positions=None,
                    final_velocities=None,
                    device_state_before: DeviceState = None,
                    device_state_after: DeviceState = None
                    ) -> ReproducibilityManifest:
    """(reference: reproducibility.py:247-278)"""
    initial_hash = hash_state(initial_positions, initial_velocities)
    results_hash = (hash_state(final_positions, final_velocities)
                    if final_positions is not None else "N/A")
    exp_id = (f"{config.precision_mode}_{config.num_stars}_"
              f"{config.random_seed}_{datetime.now().strftime('%H%M%S')}")
    return ReproducibilityManifest(
        timestamp=datetime.now().isoformat(),
        experiment_id=exp_id,
        hardware=get_hardware_manifest(),
        software=get_software_manifest(),
        config=config,
        device_state_before=device_state_before,
        device_state_after=device_state_after,
        initial_state_hash=initial_hash,
        results_hash=results_hash,
    )


def save_manifest(manifest: ReproducibilityManifest, filepath: str):
    with open(filepath, "w") as f:
        json.dump(dataclasses.asdict(manifest), f, indent=2, default=str)


def print_manifest(m: ReproducibilityManifest):
    print("\n" + "=" * 70)
    print("  REPRODUCIBILITY MANIFEST")
    print("=" * 70)
    print(f"  Experiment: {m.experiment_id}")
    print(f"  Timestamp:  {m.timestamp}")
    print(f"  Platform:   {m.hardware.platform} "
          f"({m.hardware.device_kind} x{m.hardware.num_devices})")
    print(f"  Host:       {m.hardware.cpu_model} "
          f"({m.hardware.cpu_cores} cores, {m.hardware.ram_gb} GB)")
    print(f"  Software:   python {m.software.python_version}, "
          f"jax {m.software.jax_version}")
    print(f"  Config:     {m.config.precision_mode}, "
          f"N={m.config.num_stars}, ticks={m.config.num_ticks}, "
          f"seed={m.config.random_seed}")
    print(f"  Initial state hash: {m.initial_state_hash}")
    print(f"  Final state hash:   {m.results_hash}")
    print("=" * 70)


# --------------------------------------------------------------------------
# Multi-seed statistics
# --------------------------------------------------------------------------

@dataclasses.dataclass
class StatisticalResult:
    metric_name: str
    mean: float
    std: float
    ci_95_low: float
    ci_95_high: float
    n_samples: int
    values: List[float]


def run_with_confidence(experiment_fn: Callable[[int], float],
                        n_seeds: int = 10, base_seed: int = 42,
                        metric_name: str = "metric") -> StatisticalResult:
    """Multi-seed runner with t-distribution 95% CI
    (reference: reproducibility.py:362-398)."""
    values = []
    for i in range(n_seeds):
        seed = base_seed + i
        set_all_seeds(seed)
        values.append(float(experiment_fn(seed)))

    arr = np.asarray(values)
    mean = float(arr.mean())
    std = float(arr.std(ddof=1)) if n_seeds > 1 else 0.0
    try:
        from scipy import stats
        t_crit = float(stats.t.ppf(0.975, df=max(n_seeds - 1, 1)))
    except Exception:  # scipy-free fallback: normal approximation
        t_crit = 1.96
    margin = t_crit * std / np.sqrt(max(n_seeds, 1))
    return StatisticalResult(metric_name=metric_name, mean=mean, std=std,
                             ci_95_low=mean - margin,
                             ci_95_high=mean + margin,
                             n_samples=n_seeds, values=values)


METHODOLOGY_NOTES = """
METHODOLOGY NOTES (TPU build)

1. Determinism: XLA TPU executions of a fixed compiled program are
   bitwise deterministic for fixed inputs; the precision ladder is applied
   as explicit fake-quantization, never via autotuned kernels. The JAX PRNG
   is counter-based (threefry): identical keys give identical streams on
   every backend.

2. Telemetry: this platform does not expose NVML-style power/clock/
   throttle counters. Fields are reported as None and verdict logic that
   consumes power (hardware-leak family) runs in 'degraded' mode, using
   step-time jitter as the observable instead. Measure instrumentation
   overhead with utils.profiler.measure_instrumentation_overhead; the
   reference observed ~35% throughput loss with GPU-state logging in the
   loop (reference: reproducibility.py:464-471) — the streaming design
   here keeps overhead under a few percent because state never leaves the
   device between snapshot boundaries.

3. Cross-substrate comparison: export/compare state hashes via
   hash_state + manifests; bit-identical ICs across hosts are guaranteed
   by the counter-based PRNG rather than by seed rituals.
"""
