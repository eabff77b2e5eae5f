"""Pure-functional particle state pytrees.

The reference holds mutable tensors on a class (reference:
simulation.py:62-72); here state is an immutable pytree threaded through
jitted step functions and ``lax.scan``, which is what lets the whole run
live on-device with zero host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nbody_tpu.ops.doubledouble import DD, dd_from_f32


class ParticleState(NamedTuple):
    """f32 state for all degraded precision modes."""

    positions: jnp.ndarray    # (N, D)
    velocities: jnp.ndarray   # (N, D)
    masses: jnp.ndarray       # (N,)
    accelerations: jnp.ndarray  # (N, D)
    tick: jnp.ndarray         # scalar int32

    @property
    def num_particles(self) -> int:
        return self.positions.shape[0]

    @property
    def dim(self) -> int:
        return self.positions.shape[1]


class BaselineState(NamedTuple):
    """Double-double state for the emulated-float64 baseline.

    Positions/velocities are unevaluated f32 pairs (~48-bit mantissa);
    accelerations stay f32 (they are recomputed each step — only the
    *integrated* quantities accumulate error).
    """

    positions: DD             # DD of (N, D)
    velocities: DD            # DD of (N, D)
    masses: jnp.ndarray       # (N,)
    accelerations: jnp.ndarray  # (N, D) f32
    tick: jnp.ndarray

    @property
    def num_particles(self) -> int:
        return self.positions.hi.shape[0]

    @property
    def dim(self) -> int:
        return self.positions.hi.shape[1]

    def to_f32(self) -> ParticleState:
        return ParticleState(
            positions=self.positions.to_f32(),
            velocities=self.velocities.to_f32(),
            masses=self.masses,
            accelerations=self.accelerations,
            tick=self.tick,
        )


def make_state(positions, velocities, masses) -> ParticleState:
    positions = jnp.asarray(positions, jnp.float32)
    velocities = jnp.asarray(velocities, jnp.float32)
    masses = jnp.asarray(masses, jnp.float32)
    return ParticleState(
        positions=positions,
        velocities=velocities,
        masses=masses,
        accelerations=jnp.zeros_like(positions),
        tick=jnp.asarray(0, jnp.int32),
    )


def make_baseline_state(positions, velocities, masses) -> BaselineState:
    positions = jnp.asarray(positions, jnp.float32)
    velocities = jnp.asarray(velocities, jnp.float32)
    masses = jnp.asarray(masses, jnp.float32)
    return BaselineState(
        positions=dd_from_f32(positions),
        velocities=dd_from_f32(velocities),
        masses=masses,
        accelerations=jnp.zeros_like(positions),
        tick=jnp.asarray(0, jnp.int32),
    )
