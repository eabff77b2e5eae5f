"""Two-process ``jax.distributed`` integration worker (CPU, localhost).

Runs the pod-deployment story UN-MOCKED on one box: two OS processes, 4
virtual CPU devices each, federated into one 8-device global mesh by
``jax.distributed.initialize`` with gloo CPU collectives. Each process
executes the SAME program (multi-controller SPMD):

1. the sharded flagship history (`ring.run_with_snapshots_sharded`) —
   ring force + energy ring + gathered structure metrics, with every
   collective now crossing a REAL process boundary;
2. an int4 sharded run (global quantization-bounds ring across processes);
3. `multihost.cross_host_state_agreement` — the live replacement for the
   reference's offline JSON "substrate mirror" exchange (reference:
   ultimate_reality_engine.py:694-833): agreement on identical state AND
   detection of a deliberately perturbed process-local state.

Each process writes a JSON result; tests/test_multihost_real.py spawns
both, checks cross-process identity, and compares the drift history to a
single-process 8-device run of the same configuration.

Manual use:
    python tools/multihost_check.py --process-id 0 --port 29871 --out /tmp/p0.json &
    python tools/multihost_check.py --process-id 1 --port 29871 --out /tmp/p1.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--stars", type=int, default=200)
    ap.add_argument("--ticks", type=int, default=20)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    # Environment must be set before jax initializes a backend. REPLACE
    # the inherited XLA_FLAGS (a parent pytest sets 8 forced devices; this
    # process owns its own device count).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_process}"
        " --xla_cpu_collective_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600")

    import jax
    # The box sitecustomize pins jax_platforms="axon,cpu" at the CONFIG
    # level; env alone does not override it (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    import numpy as np

    from nbody_tpu.parallel import multihost

    active = multihost.initialize_multihost(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_collectives="gloo")
    result = {
        "process_id": args.process_id,
        "multihost_active": bool(active),
        "num_processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": len(jax.local_devices()),
    }
    if not active:
        _write(args.out, dict(result, error="distributed init inactive"))
        return 1

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nbody_tpu.config import SimConfig
    from nbody_tpu.models import galaxy
    from nbody_tpu.models.state import make_state
    from nbody_tpu.ops.precision import Quantizer
    from nbody_tpu.parallel import ring

    mesh = multihost.make_global_mesh()
    cfg = SimConfig()
    q32 = Quantizer.from_string("f32")

    # Same-seed ICs on every process (deterministic jax PRNG on the same
    # backend) — multi-controller SPMD requires identical replicated
    # inputs; np arrays fed to the jitted runner are treated as such.
    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0),
                                            num_stars=args.stars)
    pos, vel, m = (np.asarray(pos), np.asarray(vel), np.asarray(m))
    st = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(m))

    # 1) flagship sharded history: every collective (ring ppermute, psum,
    # all_gather, PE ring) crosses the REAL process boundary.
    out_state, snaps, frames = ring.run_with_snapshots_sharded(
        st, q32, cfg, mesh,
        steps_per_chunk=max(args.ticks // args.chunks, 1),
        num_chunks=args.chunks)
    total = np.asarray(snaps.total, np.float64)
    drift_pct = ((total - total[0]) / abs(total[0]) * 100.0).tolist()
    result["energy_total"] = total.tolist()
    result["drift_pct"] = drift_pct
    result["frames_shape"] = list(np.asarray(frames).shape)

    # Gather the resident padded state to replicated host arrays.
    def gather(x):
        x = jax.sharding.reshard(x, NamedSharding(mesh, P()))
        return np.asarray(x)[:args.stars]

    pos_f = gather(out_state.positions)
    vel_f = gather(out_state.velocities)
    result["final_pos_checksum"] = float(np.abs(pos_f).sum())

    # 2) int4 sharded run: the global log-grid bounds ring now spans
    # processes.
    qi4 = Quantizer.from_string("int4")
    st4 = make_state(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(m))
    out4, es4 = ring.run_steps_sharded(st4, qi4, cfg, mesh, num_steps=5,
                                       quantize_forces=True,
                                       steps_per_chunk=5)
    result["int4_total"] = np.asarray(es4.total, np.float64).tolist()
    result["int4_finite"] = bool(np.isfinite(np.asarray(es4.total)).all())

    # 3) live substrate-mirror: hash agreement across the REAL processes.
    agree = multihost.cross_host_state_agreement(pos_f, vel_f)
    result["agree"] = dict(agree)

    # ... and deliberate divergence: perturb THIS process's local view
    # only on process 1 — agreement must fail on BOTH processes (the
    # gathered digests differ everywhere).
    pos_bad = pos_f + (1e-3 if args.process_id == 1 else 0.0)
    mismatch = multihost.cross_host_state_agreement(pos_bad, vel_f)
    result["mismatch"] = dict(mismatch)

    _write(args.out, result)
    jax.distributed.shutdown()
    return 0


def _write(path, payload):
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, default=str)


if __name__ == "__main__":
    sys.exit(main())
