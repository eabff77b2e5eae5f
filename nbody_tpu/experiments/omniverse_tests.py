"""Omniverse tests: four structural probes of the simulation substrate.

TPU-native equivalent of the reference suite
(reference: omniverse_tests.py:67-1036):

1. **RecursivePhysicsMirror** — nested concentric shells, recursion depth
   pushed upward; find the depth where physics jitters, NaNs, or
   wall-time explodes (reference: :67-218).
2. **FluidDynamicsChaos** — a large particle cloud around a point mass;
   detect particle "merging" (level-of-detail cheating) and
   event-horizon deletion (reference: :240-407).
3. **NeuralHardwareBridge** — an LSTM glitch predictor trained on
   synthetic RSI sequences with planted glitch patterns; accuracy /
   precision / recall / F1 verdict (reference: :414-632). Implemented as
   a pure-JAX LSTM trained with SGD on device (the reference uses
   torch.nn.LSTM).
4. **VoxelSpaceTimeGrid** — per-voxel mini-simulations over a spatial
   grid, mapping RSI spatially; anisotropy gradient (reference: :653-819).

Usage:
    python -m nbody_tpu.experiments.omniverse_tests --quick
"""

from __future__ import annotations

import argparse
import json
import math
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision


# --------------------------------------------------------------------------
# 1. Recursive physics mirror
# --------------------------------------------------------------------------

def recursive_physics_mirror(max_depth: int = 60, seed: int = 42) -> dict:
    """(reference: omniverse_tests.py:67-218): shells at radius 10/2^k.
    Beyond f32 resolution the innermost shells collapse — find the depth."""
    print("\n--- OMNIVERSE 1: RECURSIVE PHYSICS MIRROR ---")
    results = []
    breakdown_depth = None
    for depth in range(0, max_depth, 5):
        radius = 10.0 / (2.0 ** depth)
        if radius < 1e-38:
            breakdown_depth = depth
            results.append({"depth": depth, "radius": radius,
                            "status": "UNDERFLOW"})
            print(f"  depth {depth}: radius underflows f32")
            break
        n = 64
        angles = jnp.linspace(0, 2 * math.pi, n, endpoint=False)
        pos = radius * jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)
        v_circ = math.sqrt(max(0.001 * n / max(radius, 1e-30), 0.0)) * 0.1
        vel = v_circ * jnp.stack([-jnp.sin(angles), jnp.cos(angles)], axis=1)
        cfg = SimConfig(softening=radius * 0.01 if radius > 1e-30 else 1e-30,
                        dt=min(0.01, radius * 0.01))
        t0 = time.perf_counter()
        sim = DirectSimulation(pos, vel, jnp.ones(n),
                               precision=Precision.FLOAT32, cfg=cfg,
                               force_impl="dense")
        sim.step(50)
        wall = time.perf_counter() - t0
        p = np.asarray(sim.positions)
        nan = bool(np.isnan(p).any())
        collapsed = bool(np.sqrt((p ** 2).sum(1)).max() < radius * 1e-3)
        status = "NaN" if nan else ("COLLAPSED" if collapsed else "ok")
        results.append({"depth": depth, "radius": radius, "wall_s": wall,
                        "status": status})
        print(f"  depth {depth:3d} (r={radius:.2e}): {status} "
              f"({wall:.1f}s)")
        if nan or collapsed:
            breakdown_depth = depth
            break
    return {"results": results, "breakdown_depth": breakdown_depth}


# --------------------------------------------------------------------------
# 2. Fluid dynamics chaos
# --------------------------------------------------------------------------

def fluid_dynamics_chaos(num_particles: int = 20000, num_ticks: int = 200,
                         seed: int = 42) -> dict:
    """(reference: omniverse_tests.py:240-407): cloud around a point mass;
    look for particle merging (many particles at identical positions =
    LOD cheating) and event-horizon deletion (particles vanishing into
    the singularity = non-finite or escaping to infinity)."""
    print("\n--- OMNIVERSE 2: FLUID DYNAMICS CHAOS ---")
    key = jax.random.PRNGKey(seed)
    pos = jax.random.normal(key, (num_particles, 2)) * 5.0
    # central point mass = heavy particle at origin
    pos = jnp.concatenate([jnp.zeros((1, 2)), pos])
    vel = jnp.zeros_like(pos)
    # tangential swirl
    r = jnp.linalg.norm(pos[1:], axis=1, keepdims=True) + 0.1
    tang = jnp.stack([-pos[1:, 1], pos[1:, 0]], axis=1) / r
    vel = vel.at[1:].set(tang * jnp.sqrt(0.001 * 1000.0 / r))
    m = jnp.ones(num_particles + 1).at[0].set(1000.0)

    sim = DirectSimulation(pos, vel, m, precision=Precision.FLOAT32,
                           cfg=SimConfig(softening=0.05))
    sim.step(num_ticks)
    p = np.asarray(sim.positions)

    finite = np.isfinite(p).all(axis=1)
    deleted = int((~finite).sum())
    escaped = int((np.sqrt((p[finite] ** 2).sum(1)) > 1000).sum())
    # merging: count particles sharing a rounded cell with >= 5 others
    cells = np.round(p[finite] / 0.01).astype(np.int64)
    _, counts = np.unique(cells, axis=0, return_counts=True)
    merged = int(counts[counts >= 5].sum())
    lod_cheating = merged > num_particles * 0.01
    print(f"  deleted(non-finite)={deleted}, escaped={escaped}, "
          f"merged-in-cells={merged} "
          f"({'LOD CHEATING' if lod_cheating else 'no merging'})")
    return {"deleted": deleted, "escaped": escaped, "merged": merged,
            "lod_cheating_detected": bool(lod_cheating)}


# --------------------------------------------------------------------------
# 3. Neural hardware bridge (pure-JAX LSTM glitch predictor)
# --------------------------------------------------------------------------

def _lstm_init(key, input_dim, hidden, out_dim):
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / math.sqrt(hidden)
    return {
        "Wx": jax.random.normal(k1, (input_dim, 4 * hidden)) * s,
        "Wh": jax.random.normal(k2, (hidden, 4 * hidden)) * s,
        "b": jnp.zeros((4 * hidden,)),
        "Wo": jax.random.normal(k3, (hidden, out_dim)) * s,
        "bo": jnp.zeros((out_dim,)),
    }


def _lstm_apply(params, seq):
    """seq: (T, input_dim) -> logit scalar."""
    hidden = params["Wh"].shape[0]

    def cell(carry, x):
        h, c = carry
        z = x @ params["Wx"] + h @ params["Wh"] + params["b"]
        i, f, g, o = jnp.split(z, 4)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), None

    (h, _), _ = jax.lax.scan(cell, (jnp.zeros(hidden), jnp.zeros(hidden)),
                             seq)
    return (h @ params["Wo"] + params["bo"])[0]


def neural_hardware_bridge(num_sequences: int = 400, seq_len: int = 32,
                           epochs: int = 20, seed: int = 42) -> dict:
    """(reference: omniverse_tests.py:414-632): train an LSTM to predict
    glitches from synthetic RSI sequences with planted pre-glitch
    patterns; report accuracy/precision/recall/F1."""
    print("\n--- OMNIVERSE 3: NEURAL HARDWARE BRIDGE ---")
    rng = np.random.default_rng(seed)
    X = rng.normal(85.0, 5.0, size=(num_sequences, seq_len)).astype(
        np.float32)
    y = (rng.random(num_sequences) < 0.5).astype(np.float32)
    # plant a pre-glitch pattern: decaying RSI + oscillation near the end
    for i in range(num_sequences):
        if y[i] > 0.5:
            t = np.arange(8)
            X[i, -8:] -= 3.0 * t
            X[i, -8:] += 4.0 * np.sin(t * 2.0)
    X = (X - X.mean()) / X.std()
    Xj = jnp.asarray(X)[..., None]
    yj = jnp.asarray(y)
    split = int(num_sequences * 0.8)

    params = _lstm_init(jax.random.PRNGKey(seed), 1, 16, 1)

    def loss_fn(params, xb, yb):
        logits = jax.vmap(lambda s: _lstm_apply(params, s))(xb)
        return jnp.mean(jax.nn.softplus(logits) - yb * logits)

    @jax.jit
    def train_epoch(params, lr):
        g = jax.grad(loss_fn)(params, Xj[:split], yj[:split])
        return jax.tree.map(lambda p, gg: p - lr * gg, params, g)

    for epoch in range(epochs):
        params = train_epoch(params, 0.5)

    @jax.jit
    def predict(params, xb):
        return jax.vmap(lambda s: _lstm_apply(params, s))(xb) > 0.0

    preds = np.asarray(predict(params, Xj[split:]))
    truth = np.asarray(yj[split:]) > 0.5
    tp = int((preds & truth).sum())
    fp = int((preds & ~truth).sum())
    fn = int((~preds & truth).sum())
    acc = float((preds == truth).mean())
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    learned = acc > 0.8
    print(f"  accuracy={acc:.2f} precision={prec:.2f} recall={rec:.2f} "
          f"F1={f1:.2f} ({'PATTERN LEARNED' if learned else 'no signal'})")
    return {"accuracy": acc, "precision": prec, "recall": rec, "f1": f1,
            "glitches_predictable": bool(learned)}


# --------------------------------------------------------------------------
# 4. Voxel space-time grid
# --------------------------------------------------------------------------

def voxel_spacetime_grid(grid_side: int = 4, num_ticks: int = 100,
                         seed: int = 42) -> dict:
    """(reference: omniverse_tests.py:653-819): run a mini-sim per voxel
    of a spatial grid, score each by drift, map spatial anisotropy."""
    print("\n--- OMNIVERSE 4: VOXEL SPACE-TIME GRID ---")
    drifts = np.zeros((grid_side, grid_side))
    for i in range(grid_side):
        for j in range(grid_side):
            key = jax.random.PRNGKey(seed + i * grid_side + j)
            pos, vel, m = create_disk_galaxy(key, 128)
            offset = jnp.array([(i - grid_side / 2) * 100.0,
                                (j - grid_side / 2) * 100.0])
            sim = DirectSimulation(pos + offset[None, :], vel, m,
                                   precision=Precision.FLOAT32,
                                   force_impl="dense")
            e0 = sim.get_total_energy()
            sim.step(num_ticks)
            drifts[i, j] = abs((sim.get_total_energy() - e0) / e0)
    gx, gy = np.gradient(drifts)
    anisotropy = float(np.sqrt(gx ** 2 + gy ** 2).mean())
    spatial_variation = float(drifts.std() / max(drifts.mean(), 1e-12))
    print(f"  voxel drift: mean {drifts.mean():.2e}, "
          f"spatial variation {spatial_variation:.2f}, "
          f"anisotropy gradient {anisotropy:.2e}")
    return {"drift_map": drifts.tolist(),
            "spatial_variation": spatial_variation,
            "anisotropy_gradient": anisotropy,
            "space_is_uniform": bool(spatial_variation < 1.0)}


def run_omniverse_suite(quick: bool = False, seed: int = 42) -> dict:
    """(reference: omniverse_tests.py:839-978)"""
    report = {
        "recursive_mirror": recursive_physics_mirror(
            30 if quick else 60, seed),
        "fluid_chaos": fluid_dynamics_chaos(
            5000 if quick else 20000, 100 if quick else 200, seed),
        "neural_bridge": neural_hardware_bridge(
            200 if quick else 400, epochs=10 if quick else 20, seed=seed),
        "voxel_grid": voxel_spacetime_grid(
            3 if quick else 4, 60 if quick else 100, seed),
    }
    score = sum([
        report["recursive_mirror"]["breakdown_depth"] is not None,
        report["fluid_chaos"]["lod_cheating_detected"],
        report["neural_bridge"]["glitches_predictable"],
        not report["voxel_grid"]["space_is_uniform"],
    ])
    report["suite_score"] = {
        "positive_probes": score,
        "conclusion": f"{score}/4 structural probes returned anomalies",
    }
    print(f"\nOMNIVERSE SCORE: {report['suite_score']['conclusion']}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Omniverse structural probes")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/omniverse")
    args = p.parse_args(argv)

    print("\n" + "=" * 60)
    print("OMNIVERSE TESTS")
    print("=" * 60)
    report = run_omniverse_suite(args.quick, args.seed)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    (out / "omniverse_report.json").write_text(
        json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
