"""Extreme mode: deliberate fault injection and crash hunting.

TPU-native equivalent of the reference's crash-hunting suite
(reference: extreme_mode.py:40-796): six stress simulations that push the
float32 substrate to its edges, with a NaN/Inf/subnormal census
(reference: :81-104) and a combined crash report:

* SubnormalHell  — softening decays x0.95/tick toward 2^-149 (:111-189)
* InfinityCascade — inf injected into one star at tick 50; contagion (:196-259)
* PrecisionMassacre — f32->bf16->f16->int8 round-trip each step vs a clean
  reference twin (:266-361; the f64 leg is the dd-emulated baseline here)
* SingularityHunt — zero softening + forced coincident pairs (:368-454)
* MemoryArmageddon — allocate until OOM, record the ceiling (:461-516)
* QuantumChaos — randomly permuted summation order vs deterministic twin
  (:523-602)

Usage:
    python -m nbody_tpu.experiments.extreme_mode --quick
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.diagnostics.glitch import count_subnormals
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer, f16_roundtrip
from nbody_tpu.utils.profiler import fence


def count_extreme_values(x) -> dict:
    """NaN/Inf/subnormal census (reference: extreme_mode.py:81-104)."""
    arr = np.asarray(x)
    sub = count_subnormals(jnp.asarray(arr))
    return {
        "nan": int(np.isnan(arr).sum()),
        "inf": int(np.isinf(arr).sum()),
        "subnormal": int(sub.subnormal_count),
        "zero": int((arr == 0).sum()),  # exact zeros (NaN excluded)
        "min_nonzero": float(sub.min_nonzero)
        if np.isfinite(float(sub.min_nonzero)) else None,
    }


def subnormal_hell(num_stars: int, num_ticks: int, seed: int) -> dict:
    """(reference: extreme_mode.py:111-189)"""
    print("\n--- SUBNORMAL HELL ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    softening = 0.1
    rows = []
    for chunk in range(num_ticks // 20):
        softening *= 0.95 ** 20
        sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                               softening=max(softening, 1e-45),
                               dynamic_params=True)
        sim.step(20)
        pos, vel = sim.positions, sim.velocities
        census = count_extreme_values(vel)
        rows.append({"softening": softening, **census})
        if census["nan"] or census["inf"]:
            print(f"  BROKE at softening={softening:.2e}: {census}")
            break
    survived = not (rows and (rows[-1]["nan"] or rows[-1]["inf"]))
    print(f"  final softening {softening:.2e}, "
          f"{'survived' if survived else 'exploded'}; "
          f"subnormals seen: {max(r['subnormal'] for r in rows)}")
    return {"rows": rows, "survived": bool(survived),
            "min_softening": softening}


def infinity_cascade(num_stars: int, num_ticks: int, seed: int) -> dict:
    """(reference: extreme_mode.py:196-259)"""
    print("\n--- INFINITY CASCADE ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    sim.step(50)
    # inject inf into one star's velocity
    vel_inj = sim.state.velocities.at[0, 0].set(jnp.inf)
    sim.state = sim.state._replace(velocities=vel_inj)
    contagion = []
    for chunk in range(max((num_ticks - 50) // 10, 1)):
        sim.step(10)
        bad = int(np.isnan(np.asarray(sim.positions)).any(axis=1).sum()
                  + np.isinf(np.asarray(sim.positions)).any(axis=1).sum())
        contagion.append(bad)
        print(f"  tick {sim.tick}: {bad}/{num_stars} particles corrupted")
        if bad >= num_stars:
            break
    full_at = next((i for i, b in enumerate(contagion)
                    if b >= num_stars), None)
    return {"contagion": contagion,
            "full_corruption_chunk": full_at,
            "universal_contagion": bool(contagion and
                                        contagion[-1] >= num_stars)}


def precision_massacre(num_stars: int, num_ticks: int, seed: int) -> dict:
    """(reference: extreme_mode.py:266-361): round-trip the state through
    the whole precision ladder every step; divergence vs a clean twin."""
    print("\n--- PRECISION MASSACRE ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    clean = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)
    massacre = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32)

    @jax.jit
    def ladder(x):
        x = x.astype(jnp.bfloat16).astype(jnp.float32)
        x = f16_roundtrip(x)
        # int8-style linear grid round trip
        lo, hi = jnp.min(x), jnp.max(x)
        span = jnp.where(hi - lo < 1e-10, 1.0, hi - lo)
        x = jnp.round((x - lo) / span * 255.0) / 255.0 * span + lo
        return x

    divergence = []
    for chunk in range(num_ticks // 10):
        clean.step(10)
        massacre.step(10)
        massacre.state = massacre.state._replace(
            positions=ladder(massacre.state.positions),
            velocities=ladder(massacre.state.velocities))
        div = float(np.abs(np.asarray(massacre.positions)
                           - np.asarray(clean.positions)).mean())
        divergence.append(div)
    print(f"  final mean divergence: {divergence[-1]:.4f}")
    return {"divergence": divergence,
            "diverged": bool(divergence[-1] > 0.1)}


def singularity_hunt(num_stars: int, num_ticks: int, seed: int) -> dict:
    """(reference: extreme_mode.py:368-454): zero softening + coincident
    pairs."""
    print("\n--- SINGULARITY HUNT ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    pos = pos.at[1].set(pos[0])          # forced coincident pair
    pos = pos.at[3].set(pos[2] + 1e-7)   # near-coincident pair
    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           cfg=SimConfig(softening=0.0))
    rows = []
    for chunk in range(num_ticks // 10):
        sim.step(10)
        census = count_extreme_values(sim.positions)
        rows.append(census)
        if census["nan"] or census["inf"]:
            print(f"  SINGULARITY at tick {sim.tick}: {census}")
            break
    hit = bool(rows and (rows[-1]["nan"] or rows[-1]["inf"]))
    if not hit:
        print("  no singularity: coincident pairs produce inf force * 0 "
              "distance -> NaN expected; survived means masking saved it")
    return {"rows": rows[-3:], "singularity": hit}


def memory_armageddon(step_mb: int = 256, max_steps: int = 200) -> dict:
    """(reference: extreme_mode.py:461-516): allocate until OOM."""
    print("\n--- MEMORY ARMAGEDDON ---")
    held = []
    allocated_mb = 0
    error = None
    try:
        for _ in range(max_steps):
            n = int(step_mb * 1024 * 1024 / 4)
            held.append(jnp.ones((n,), jnp.float32) * 1.000001)
            fence(held[-1])
            allocated_mb += step_mb
    except Exception as e:  # noqa: BLE001 - OOM class varies by backend
        error = f"{type(e).__name__}"
    finally:
        held.clear()
    print(f"  OOM ceiling: ~{allocated_mb} MB ({error})")
    return {"ceiling_mb": allocated_mb, "error": error}


def quantum_chaos(num_stars: int, num_ticks: int, seed: int) -> dict:
    """(reference: extreme_mode.py:523-602): random summation-order
    permutation per step vs a deterministic twin."""
    print("\n--- QUANTUM CHAOS ---")
    pos, vel, m = create_disk_galaxy(jax.random.PRNGKey(seed), num_stars)
    ref = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           force_impl="dense")
    cfg = ref.cfg
    q = Quantizer(Precision.FLOAT32)

    @jax.jit
    def chaos_step(pos, vel, acc, m, perm):
        # permute particle order (changes reduction rounding), step, unpermute
        inv = jnp.argsort(perm)
        p, v, a = pos[perm], vel[perm], acc[perm]
        mm = m[perm]
        v = v + a * (cfg.dt / 2)
        p = p + v * cfg.dt
        a = forces.dense_accelerations(p, mm, q, cfg, quantize_forces=False)
        v = v + a * (cfg.dt / 2)
        return p[inv], v[inv], a[inv]

    cpos = jnp.asarray(pos)
    cvel = jnp.asarray(vel)
    cacc = forces.dense_accelerations(cpos, m, q, cfg, quantize_forces=False)
    key = jax.random.PRNGKey(seed + 1)
    divergence = []
    for t in range(num_ticks):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, num_stars)
        cpos, cvel, cacc = chaos_step(cpos, cvel, cacc, m, perm)
        ref.step(1)
        if (t + 1) % 20 == 0:
            div = float(np.abs(np.asarray(cpos)
                               - np.asarray(ref.positions)).mean())
            divergence.append(div)
    print(f"  divergence after {num_ticks} ticks: {divergence[-1]:.3e}")
    return {"divergence": divergence,
            "chaos_amplified": bool(divergence[-1] > 1e-4)}


def main(argv=None):
    p = argparse.ArgumentParser(description="Extreme mode fault injection")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/extreme")
    p.add_argument("--skip-oom", action="store_true",
                   help="skip the deliberate OOM probe")
    args = p.parse_args(argv)
    n = 200 if args.quick else 400
    ticks = 100 if args.quick else 300

    print("\n" + "=" * 60)
    print("EXTREME MODE: deliberate crash hunting")
    print("=" * 60)
    report = {
        "subnormal_hell": subnormal_hell(n, ticks, args.seed),
        "infinity_cascade": infinity_cascade(n, ticks + 100, args.seed),
        "precision_massacre": precision_massacre(n, ticks, args.seed),
        "singularity_hunt": singularity_hunt(n, ticks, args.seed),
        "quantum_chaos": quantum_chaos(min(n, 200), ticks, args.seed),
    }
    if not args.skip_oom:
        report["memory_armageddon"] = memory_armageddon()

    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "extreme_mode_report.json").write_text(
        json.dumps(report, indent=2, default=str))
    print(f"\nCrash report written to {out / 'extreme_mode_report.json'}")


if __name__ == "__main__":
    main()
