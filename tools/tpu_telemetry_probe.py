"""Probe every hardware-telemetry channel this TPU platform exposes.

VERDICT r2 asked whether libtpu/this platform exposes ANY usable counter
(duty cycle, HBM bandwidth, temperature, power) that could un-degrade the
NVML-shaped verdicts (reference: gpu_profiler.py:34-49). This probe
enumerates, per channel, measured-vs-unavailable, and prints the table
that docs/PERF.md and utils/profiler.py document.

Channels tried:
* PJRT device memory stats (``device.memory_stats()``) — allocator
  bytes-in-use / peak / limit;
* PJRT device attributes (coords, utilization-ish metadata);
* the ``tpu_info`` / libtpu gRPC metrics service (duty cycle, HBM usage,
  tensorcore utilization) if the package and a LOCAL libtpu runtime
  exist — on this box the chip sits behind the axon tunnel, so there is
  no local libtpu to serve metrics;
* sysfs/devfs accelerator nodes (``/dev/accel*``, ``/sys/class/accel``);
* ``jax.profiler`` trace capture (op-level timeline — always available).

Usage:  python tools/tpu_telemetry_probe.py
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def probe() -> dict:
    dev = jax.devices()[0]
    report = {"device_kind": dev.device_kind,
              "platform": jax.default_backend(), "channels": {}}
    ch = report["channels"]

    # --- PJRT memory stats -------------------------------------------------
    try:
        # allocate something real so the stats are non-trivial
        x = jnp.ones((1024, 1024), jnp.float32)
        x.block_until_ready()
        stats = dev.memory_stats() or {}
        ch["memory_stats"] = {
            "status": "MEASURED" if stats else "empty",
            "keys": sorted(stats.keys()),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
        del x
    except Exception as e:  # noqa: BLE001
        ch["memory_stats"] = {"status": f"UNAVAILABLE ({e!r})"}

    # --- PJRT device attributes -------------------------------------------
    attrs = {}
    for name in ("coords", "core_on_chip", "device_kind", "platform",
                 "slice_index", "process_index", "local_hardware_id"):
        try:
            attrs[name] = repr(getattr(dev, name))
        except Exception as e:  # noqa: BLE001
            attrs[name] = f"unavailable ({type(e).__name__})"
    ch["device_attributes"] = attrs

    # --- libtpu metrics service (tpu_info) --------------------------------
    try:
        import tpu_info  # noqa: F401

        try:
            from tpu_info import metrics as tpu_metrics

            ch["libtpu_metrics"] = {
                "status": "package present; querying",
                "detail": repr(tpu_metrics)}
        except Exception as e:  # noqa: BLE001
            ch["libtpu_metrics"] = {
                "status": f"package present, service UNAVAILABLE ({e!r})"}
    except ImportError:
        ch["libtpu_metrics"] = {
            "status": "UNAVAILABLE (tpu_info not installed; chip is "
                      "behind the axon tunnel — no local libtpu runtime "
                      "to serve duty-cycle/HBM/power metrics)"}

    # --- sysfs / devfs accelerator nodes ----------------------------------
    nodes = (glob.glob("/dev/accel*") + glob.glob("/dev/vfio/*")
             + glob.glob("/sys/class/accel/*")
             + glob.glob("/sys/devices/**/tpu*", recursive=True))
    ch["sysfs_nodes"] = {
        "status": "MEASURED" if nodes else
        "UNAVAILABLE (no local accelerator device nodes — remote chip)",
        "nodes": nodes[:10],
    }

    # --- power / temperature / clocks -------------------------------------
    # NVML-equivalents: nothing in PJRT, no local libtpu, no sysfs node.
    for name in ("power_watts", "temperature_c", "clock_mhz",
                 "duty_cycle_pct", "hbm_bandwidth_util"):
        if name not in ch:
            ch[name] = {"status": "UNAVAILABLE on this platform "
                                  "(no PJRT API; no local libtpu metrics "
                                  "service; chip behind axon tunnel)"}

    # --- jax.profiler trace capture ---------------------------------------
    try:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            y = jnp.ones((256, 256)) @ jnp.ones((256, 256))
            y.block_until_ready()
            jax.profiler.stop_trace()
            produced = list(Path(td).rglob("*"))
        ch["jax_profiler_trace"] = {
            "status": "MEASURED" if produced else "ran, no artifacts",
            "artifacts": len(produced)}
    except Exception as e:  # noqa: BLE001
        ch["jax_profiler_trace"] = {"status": f"UNAVAILABLE ({e!r})"}

    return report


def main():
    report = probe()
    print(json.dumps(report, indent=2))
    out = Path("output/tpu_telemetry_probe.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"\nwritten to {out}")


if __name__ == "__main__":
    main()
