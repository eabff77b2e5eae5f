"""Multiverse divergence: FP-nondeterminism as a physics probe.

TPU-native equivalent of the reference's MultiverseSim
(reference: reality_glitch_tests.py:148-256): three "universes" from
identical ICs —

* A: standard float32 summation order,
* B: reversed source-summation order (torch.flip analogue: the source
  axis is reversed before the reduction, changing the rounding sequence),
* C: float16 intermediates (the emulated f16 round-trip),

— stepped in lockstep while measuring pairwise state divergence, a
Lyapunov-rate fit, and zlib entropy. On TPU a fixed compiled program is
bitwise deterministic, so A-vs-B isolates pure summation-order effects
exactly (the reference's GPU runs also carried scheduling noise).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.diagnostics.glitch import measure_state_entropy
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer


def reversed_sum_accelerations(positions, masses, q: Quantizer,
                               cfg: SimConfig, quantize_forces: bool = False):
    """Force with the source-axis reduction order reversed
    (reference: reality_glitch_tests.py:163-181). Same math, different
    floating-point rounding sequence."""
    n = positions.shape[0]
    diff = positions[None, ::-1, :] - positions[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1) + cfg.softening_sq
    inv_d = jax.lax.rsqrt(d2)
    inv_d3 = inv_d * inv_d * inv_d
    factor = cfg.G * masses[None, ::-1] * inv_d3
    self_mask = (jnp.arange(n)[::-1])[None, :] == jnp.arange(n)[:, None]
    factor = jnp.where(self_mask, 0.0, factor)
    return jnp.einsum("bm,bmd->bd", factor, diff)


@dataclasses.dataclass
class MultiverseReport:
    ticks: List[int]
    divergence_reversed: List[float]   # |A - B| mean position divergence
    divergence_fp16: List[float]       # |A - C|
    lyapunov_reversed: float           # divergence growth rate (1/tick)
    lyapunov_fp16: float
    entropy_bits_a: float
    entropy_bits_b: float
    heisenberg_product: float          # Δx * Δv at the end (A vs B)


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
def _run_reversed(pos, vel, acc, m, cfg: SimConfig, num_steps: int):
    """Leapfrog scan with the reversed-sum force (module-level jit so
    repeated intervals hit the compile cache instead of retracing)."""

    def body(carry, _):
        p, v, a = carry
        v = v + a * (cfg.dt / 2)
        p = p + v * cfg.dt
        a = reversed_sum_accelerations(p, m, Quantizer(), cfg)
        v = v + a * (cfg.dt / 2)
        return (p, v, a), None

    (p, v, a), _ = jax.lax.scan(body, (pos, vel, acc), None,
                                length=num_steps)
    return p, v, a


class MultiverseSim:
    """Three universes stepped in lockstep: A (standard engine), B
    (reversed-sum force, run by _run_reversed on raw arrays), C (fp16)."""

    def __init__(self, positions, velocities, masses,
                 cfg: SimConfig = SimConfig()):
        self.cfg = cfg
        self.universe_a = DirectSimulation(positions, velocities, masses,
                                           precision=Precision.FLOAT32,
                                           cfg=cfg, force_impl="dense")
        self.universe_c = DirectSimulation(positions, velocities, masses,
                                           precision=Precision.FLOAT16,
                                           cfg=cfg, force_impl="dense")
        self._b_state = (jnp.asarray(positions, jnp.float32),
                         jnp.asarray(velocities, jnp.float32),
                         jnp.asarray(masses, jnp.float32))
        self._b_acc = reversed_sum_accelerations(
            self._b_state[0], self._b_state[2], Quantizer(), cfg)

    def _step_b(self, num_steps: int):
        pos, vel, m = self._b_state
        pos, vel, acc = _run_reversed(pos, vel, self._b_acc, m, self.cfg,
                                      num_steps)
        self._b_state = (pos, vel, m)
        self._b_acc = acc

    def step(self, num_ticks: int = 10):
        """Advance all three universes in lockstep; returns the pair of
        mean position divergences (|A-B|, |A-C|) — the incremental entry
        the live dashboard consumes."""
        self.universe_a.step(num_ticks)
        self._step_b(num_ticks)
        self.universe_c.step(num_ticks)
        pa = np.asarray(self.universe_a.positions)
        db = float(np.abs(pa - np.asarray(self._b_state[0])).mean())
        dc = float(np.abs(pa - np.asarray(self.universe_c.positions)).mean())
        return db, dc

    def run(self, num_ticks: int = 200, interval: int = 20) -> MultiverseReport:
        ticks, div_b, div_c = [], [], []
        for t in range(0, num_ticks, interval):
            db, dc = self.step(interval)
            ticks.append(t + interval)
            div_b.append(db)
            div_c.append(dc)

        def lyapunov(divs):
            d = np.asarray(divs)
            valid = d > 1e-12
            if valid.sum() < 3:
                return 0.0
            x = np.asarray(ticks, float)[valid]
            y = np.log(d[valid])
            return float(np.polyfit(x, y, 1)[0])

        ent_a = measure_state_entropy(self.universe_a.positions,
                                      self.universe_a.velocities)
        ent_b = measure_state_entropy(self._b_state[0], self._b_state[1])

        va = np.asarray(self.universe_a.velocities)
        vb = np.asarray(self._b_state[1])
        dx = float(np.abs(np.asarray(self.universe_a.positions) -
                          np.asarray(self._b_state[0])).mean())
        dv = float(np.abs(va - vb).mean())
        return MultiverseReport(
            ticks=ticks, divergence_reversed=div_b, divergence_fp16=div_c,
            lyapunov_reversed=lyapunov(div_b), lyapunov_fp16=lyapunov(div_c),
            entropy_bits_a=ent_a.bits_per_float,
            entropy_bits_b=ent_b.bits_per_float,
            heisenberg_product=dx * dv,
        )
