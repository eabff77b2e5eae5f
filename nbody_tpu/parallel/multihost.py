"""Multi-host (DCN) initialization and cross-host determinism checks.

SURVEY.md §2.5: the reference's "cross-machine" story is offline JSON
exchange (reference: ultimate_reality_engine.py:694-833); the TPU-native
equivalent is ``jax.distributed`` across hosts of a pod slice, with
per-shard state hashing compared over collectives instead of files.

Untestable on this single-host dev box — kept deliberately thin: a
documented wrapper over ``jax.distributed.initialize`` plus the two
primitives the engines need (global mesh, cross-host hash agreement).
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("nbody_tpu.multihost")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         cpu_collectives: Optional[str] = None) -> bool:
    """Initialize jax.distributed for a multi-host pod slice.

    On TPU pods, all arguments are auto-detected from the environment; on
    other setups pass them explicitly. Returns True if a multi-process
    runtime is active after the call. Safe to call on a single host
    (no-op, returns False).

    ``cpu_collectives`` selects the cross-process collective transport for
    CPU backends (pass ``"gloo"`` for multi-process CPU runs — XLA:CPU has
    no default cross-process transport, so collectives would otherwise
    fail; must be set BEFORE backend initialization). TPU slices ignore it
    (ICI/DCN routing is XLA's own). Exercised for real by
    tools/multihost_check.py + tests/test_multihost_real.py: two localhost
    processes x 4 virtual CPU devices running the sharded flagship history
    and the hash-agreement collective un-mocked.
    """
    if cpu_collectives is not None:
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception as e:  # pragma: no cover - knob absent/renamed
            logger.warning("cpu_collectives=%r not applied: %s",
                           cpu_collectives, e)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception as e:  # single-host or already initialized
        logger.info("jax.distributed not initialized (%s); single-host", e)
    n = jax.process_count()
    if n > 1:
        logger.info("multihost: %d processes, %d global devices", n,
                    jax.device_count())
    return n > 1


def make_global_mesh(axis_name: str = "shards") -> jax.sharding.Mesh:
    """1-D mesh over ALL global devices (ICI within a slice, DCN across
    hosts — XLA routes each collective over the right fabric)."""
    return jax.make_mesh((jax.device_count(),), (axis_name,))


def cross_host_state_agreement(positions, velocities) -> dict:
    """The live replacement for the reference's JSON 'substrate mirror':
    every process hashes its local view; agreement is established with a
    collective instead of a file exchange.

    Returns {"hash": ..., "all_equal": bool, "num_processes": int}.
    """
    from nbody_tpu.utils.reproducibility import hash_state

    local_hash = hash_state(positions, velocities)
    n = jax.process_count()
    if n == 1:
        return {"hash": local_hash, "all_equal": True, "num_processes": 1}

    from jax.experimental import multihost_utils

    # Gather the digest as four exact 16-bit integer limbs: a float
    # gather would silently round away low-bit differences (jax defaults
    # to f32), turning real cross-host divergence into false agreement.
    digest = int(local_hash, 16)
    limbs = jnp.asarray([(digest >> s) & 0xFFFF for s in (0, 16, 32, 48)],
                        dtype=jnp.int32)
    gathered = np.asarray(multihost_utils.process_allgather(limbs))
    all_equal = bool(np.all(gathered == gathered[0]))
    return {"hash": local_hash, "all_equal": all_equal,
            "num_processes": n}
