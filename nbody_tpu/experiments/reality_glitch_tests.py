"""Reality glitch tests: four probes for simulation artifacts.

TPU-native equivalent of the reference's library+CLI
(reference: reality_glitch_tests.py:63-1255):

1. **Subnormal singularity** — drive softening toward the denormal range
   with forced subnormal injection; census + performance-cliff timing
   (reference: :85-131). NOTE: TPUs flush subnormals to zero in hardware,
   so the performance-cliff half is expected to be null — which is itself
   a substrate fingerprint this experiment documents.
2. **Multiverse divergence** — reversed-summation and fp16 twins
   (reference: :148-256) via diagnostics.multiverse.
3. **Entropy horizon** — zlib compression ratio / bits-per-float drift
   (reference: :273-298).
4. **Spatial aliasing** — projectile faster than wall-thickness/dt clips
   through a particle wall (reference: :315-437).

Usage:
    python -m nbody_tpu.experiments.reality_glitch_tests --quick
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.diagnostics.glitch import (
    count_subnormals,
    measure_state_entropy,
)
from nbody_tpu.diagnostics.multiverse import MultiverseSim
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision
from nbody_tpu.utils.profiler import fence


# --------------------------------------------------------------------------
# 1. Subnormal singularity
# --------------------------------------------------------------------------

def subnormal_singularity_test(num_stars: int = 300, num_ticks: int = 200,
                               seed: int = 42) -> dict:
    """(reference: reality_glitch_tests.py:85-131)"""
    print("\n--- TEST 1: SUBNORMAL SINGULARITY ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           cfg=SimConfig(softening=1e-18))
    timings, census = [], []
    for chunk in range(num_ticks // 20):
        # forced subnormal injection (reference: :105-109)
        vel_inj = sim.state.velocities.at[:10].multiply(1e-40)
        sim.state = sim.state._replace(velocities=vel_inj)
        t0 = time.perf_counter()
        sim.step(20)
        fence(sim.state.positions)
        timings.append((time.perf_counter() - t0) * 1e3)
        sm = count_subnormals(sim.state.velocities)
        census.append(int(sm.subnormal_count))
        print(f"  chunk {chunk}: {timings[-1]:7.1f} ms, "
              f"subnormals={census[-1]}, zeros={int(sm.zero_count)}")
    cliff = (max(timings) / max(min(timings), 1e-9)) if timings else 1.0
    result = {
        "timings_ms": timings,
        "subnormal_counts": census,
        "performance_cliff_ratio": cliff,
        "ftz_detected": max(census) == 0,
        "verdict": ("TPU flushes subnormals to zero (FTZ substrate "
                    "fingerprint): no denormal flood, no slowdown cliff"
                    if max(census) == 0 else
                    f"denormals survive; cliff ratio {cliff:.1f}x"),
    }
    print(f"  {result['verdict']}")
    return result


# --------------------------------------------------------------------------
# 2. Multiverse divergence
# --------------------------------------------------------------------------

def multiverse_divergence_test(num_stars: int = 300, num_ticks: int = 200,
                               seed: int = 42) -> dict:
    """(reference: reality_glitch_tests.py:148-256)"""
    print("\n--- TEST 2: MULTIVERSE DIVERGENCE ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    mv = MultiverseSim(pos, vel, m)
    report = mv.run(num_ticks=num_ticks, interval=max(num_ticks // 10, 10))
    print(f"  |A-B| (reversed sum) final: {report.divergence_reversed[-1]:.3e}")
    print(f"  |A-C| (fp16)         final: {report.divergence_fp16[-1]:.3e}")
    print(f"  Lyapunov (reversed): {report.lyapunov_reversed:+.4f}/tick")
    print(f"  Lyapunov (fp16):     {report.lyapunov_fp16:+.4f}/tick")
    print(f"  Heisenberg-like dx*dv: {report.heisenberg_product:.3e}")
    return {
        "ticks": report.ticks,
        "divergence_reversed": report.divergence_reversed,
        "divergence_fp16": report.divergence_fp16,
        "lyapunov_reversed": report.lyapunov_reversed,
        "lyapunov_fp16": report.lyapunov_fp16,
        "entropy_bits_a": report.entropy_bits_a,
        "entropy_bits_b": report.entropy_bits_b,
        "heisenberg_product": report.heisenberg_product,
        "chaotic_amplification": report.lyapunov_reversed > 0,
    }


# --------------------------------------------------------------------------
# 3. Entropy horizon
# --------------------------------------------------------------------------

def entropy_horizon_test(num_stars: int = 500, num_ticks: int = 300,
                         seed: int = 42) -> dict:
    """(reference: reality_glitch_tests.py:273-298)"""
    print("\n--- TEST 3: ENTROPY HORIZON ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    sim = DirectSimulation(pos, vel, m, precision=Precision.INT4_SIM)
    rows = []
    for chunk in range(num_ticks // 50):
        sim.step(50)
        ent = measure_state_entropy(sim.positions, sim.velocities)
        rows.append({"tick": sim.tick,
                     "compression_ratio": ent.compression_ratio,
                     "bits_per_float": ent.bits_per_float})
        print(f"  tick {sim.tick:4d}: ratio={ent.compression_ratio:.3f} "
              f"bits/float={ent.bits_per_float:.2f}")
    drift = (rows[-1]["bits_per_float"] - rows[0]["bits_per_float"]
             if len(rows) >= 2 else 0.0)
    print(f"  entropy drift: {drift:+.3f} bits/float over the run")
    return {"rows": rows, "bits_per_float_drift": drift}


# --------------------------------------------------------------------------
# 4. Spatial aliasing
# --------------------------------------------------------------------------

def spatial_aliasing_test(wall_stars: int = 200, v_projectile: float = 50.0,
                          dt: float = 0.1, num_ticks: int = 60) -> dict:
    """(reference: reality_glitch_tests.py:315-437): wall at x=0 with
    thickness << v*dt; a projectile should clip straight through."""
    print("\n--- TEST 4: SPATIAL ALIASING ---")
    key = jax.random.PRNGKey(0)
    wall_y = jax.random.uniform(key, (wall_stars,)) * 20.0 - 10.0
    wall = jnp.stack([jnp.zeros(wall_stars), wall_y], axis=1)
    # offset chosen so tick samples straddle (not land on) the wall plane
    projectile = jnp.array([[-28.7, 0.0]])
    positions = jnp.concatenate([wall, projectile])
    velocities = jnp.zeros_like(positions).at[-1, 0].set(v_projectile)
    masses = jnp.ones(wall_stars + 1).at[-1].set(10.0)

    sim = DirectSimulation(positions, velocities, masses,
                           precision=Precision.FLOAT32,
                           cfg=SimConfig(dt=dt, softening=0.1))
    step_distance = v_projectile * dt
    interaction_range = 0.5
    min_dist, crossed_tick = float("inf"), None
    sampled_inside_wall = False
    for t in range(num_ticks):
        x_before = float(sim.positions[-1, 0])
        sim.step(1)
        x_after = float(sim.positions[-1, 0])
        # Did the discrete trajectory ever SAMPLE a point inside the
        # wall's interaction slab |x| < range? If not, the wall never had
        # a tick in which to act — the aliasing "tunnel".
        if abs(x_after) < interaction_range:
            sampled_inside_wall = True
        d = float(jnp.min(jnp.linalg.norm(
            sim.positions[:-1] - sim.positions[-1], axis=1)))
        min_dist = min(min_dist, d)
        if crossed_tick is None and x_before < 0.0 <= x_after:
            crossed_tick = t
            print(f"  projectile crossed the wall plane at tick {t} "
                  f"(jump {x_after - x_before:.2f} per tick)")
    clipped = (crossed_tick is not None and step_distance > 1.0
               and not sampled_inside_wall)
    print(f"  step distance {step_distance:.1f} vs interaction slab "
          f"+/-{interaction_range}; sampled inside wall: "
          f"{sampled_inside_wall}; min approach {min_dist:.2f}")
    print("  VERDICT: " + ("CLIP-THROUGH (spatial aliasing confirmed)"
                           if clipped else "no aliasing at this speed"))
    return {"step_distance": step_distance, "min_approach": min_dist,
            "crossed_tick": crossed_tick,
            "sampled_inside_wall": sampled_inside_wall,
            "clip_through": bool(clipped)}


def main(argv=None):
    p = argparse.ArgumentParser(description="Reality glitch test suite")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/reality_glitch")
    args = p.parse_args(argv)
    n = 150 if args.quick else 300
    ticks = 100 if args.quick else 200

    print("\n" + "=" * 60)
    print("REALITY GLITCH TESTS")
    print("=" * 60)
    report = {
        "subnormal_singularity": subnormal_singularity_test(n, ticks,
                                                            args.seed),
        "multiverse_divergence": multiverse_divergence_test(n, ticks,
                                                            args.seed),
        "entropy_horizon": entropy_horizon_test(n + 200, ticks + 100,
                                                args.seed),
        "spatial_aliasing": spatial_aliasing_test(),
    }
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "reality_glitch_report.json").write_text(
        json.dumps(report, indent=2, default=str))
    print(f"\nReport written to {out / 'reality_glitch_report.json'}")


if __name__ == "__main__":
    main()
