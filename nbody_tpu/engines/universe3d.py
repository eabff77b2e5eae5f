"""Universe3D: 3-D cosmological engine + substrate probes (CLI).

TPU-native equivalent of the reference 3-D engine
(reference: universe_3d.py:1087-1673): the shared PM machinery in 3-D on a
32^3 grid, plus the three probes unique to the 3-D build:

* ``SubstrateInterferenceProbe`` — co-run host (prime-sieve) and device
  (matmul-loop) stress while stepping the universe and test whether
  step-time variance rises ("lag contagion",
  reference: universe_3d.py:645-789);
* ``CollisionTickAuditor`` — fire a projectile at a particle wall and
  binary-search the velocity above which it tunnels through in one tick
  (v * dt > wall thickness), the discrete-time "quantum tunneling" analogy
  (reference: universe_3d.py:792-961);
* ``IRLExperimentLogger`` — map simulation findings to proposed
  real-world experiment protocols (reference: universe_3d.py:964-1080).

Usage:
    python -m nbody_tpu.engines.universe3d --precision int4 --particles 4096
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from dataclasses import dataclass
from pathlib import Path
from typing import List

import numpy as np

from nbody_tpu.engines.cosmo import CosmologicalEngine
from nbody_tpu.utils.profiler import fence


class Universe3D(CosmologicalEngine):
    """3-D preset (reference: universe_3d.py:1087): 32^3 PM grid."""

    def __init__(self, num_particles: int = 8000,
                 box_size_mpc: float = 200.0, start_redshift: float = 50.0,
                 precision: str = "float32", dm_ratio: float = 5.0,
                 seed: int = 42, **kw):
        super().__init__(num_particles=num_particles,
                         box_size_mpc=box_size_mpc,
                         start_redshift=start_redshift, precision=precision,
                         dm_ratio=dm_ratio, seed=seed, dim=3, n_grid=32, **kw)


# --------------------------------------------------------------------------
# Probe 1: substrate interference ("lag contagion")
# --------------------------------------------------------------------------

@dataclass
class InterferenceResult:
    baseline_mean_ms: float
    baseline_std_ms: float
    stressed_mean_ms: float
    stressed_std_ms: float
    variance_ratio: float
    lag_contagion: bool


class SubstrateInterferenceProbe:
    """Step-time variance with and without host+device co-stress
    (reference: universe_3d.py:645-789). The host stress thread sieves
    primes; the device stress issues matmuls between sim steps."""

    def __init__(self, stress_seconds: float = 2.0):
        self.stress_seconds = stress_seconds
        self._stop = threading.Event()

    def _cpu_stress(self):
        n = 3
        while not self._stop.is_set():
            # trial-division primality churn (busy work; result unused)
            all(n % d for d in range(2, min(int(n ** 0.5) + 1, 5000)))
            n += 2

    def _time_steps(self, universe, num: int, device_stress: bool):
        import jax
        import jax.numpy as jnp

        if device_stress:
            x = jnp.ones((512, 512))
            mm = jax.jit(lambda a: a @ a)
        times = []
        for _ in range(num):
            t0 = time.perf_counter()
            universe.step(dz=0.05, num_steps=1)
            if device_stress:
                fence(mm(x))
            fence(universe.state.positions)
            times.append((time.perf_counter() - t0) * 1e3)
        return np.asarray(times)

    def run(self, universe, num_steps: int = 20) -> InterferenceResult:
        base = self._time_steps(universe, num_steps, device_stress=False)

        self._stop.clear()
        t = threading.Thread(target=self._cpu_stress, daemon=True)
        t.start()
        try:
            stressed = self._time_steps(universe, num_steps,
                                        device_stress=True)
        finally:
            self._stop.set()
            t.join(timeout=1.0)

        b_std = float(base.std()) + 1e-9
        s_std = float(stressed.std())
        ratio = s_std / b_std
        return InterferenceResult(
            baseline_mean_ms=float(base.mean()),
            baseline_std_ms=float(base.std()),
            stressed_mean_ms=float(stressed.mean()),
            stressed_std_ms=s_std,
            variance_ratio=ratio,
            lag_contagion=ratio > 3.0,
        )


# --------------------------------------------------------------------------
# Probe 2: collision tick auditor ("quantum tunneling")
# --------------------------------------------------------------------------

@dataclass
class CollisionAuditResult:
    clip_velocity: float          # first velocity that tunnels through
    wall_thickness: float
    dt: float
    predicted_clip_velocity: float  # wall_thickness / dt
    tunneling_confirmed: bool


class CollisionTickAuditor:
    """Binary-search the projectile velocity above which it crosses a
    particle wall in a single tick without ever overlapping it
    (reference: universe_3d.py:792-961). Pure kinematics on device."""

    def __init__(self, wall_thickness: float = 1.0, dt: float = 0.01):
        self.wall_thickness = wall_thickness
        self.dt = dt

    def _passes_through(self, velocity: float) -> bool:
        """True if a projectile starting just before the wall ends past it
        after one tick with no sample inside the wall."""
        start = -1e-3
        end = start + velocity * self.dt
        inside = (start >= 0 and start <= self.wall_thickness) or (
            end >= 0 and end <= self.wall_thickness)
        return end > self.wall_thickness and not inside

    def run(self, v_lo: float = 0.1, v_hi: float = 10000.0,
            iters: int = 40) -> CollisionAuditResult:
        lo, hi = v_lo, v_hi
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            if self._passes_through(mid):
                hi = mid
            else:
                lo = mid
        predicted = self.wall_thickness / self.dt
        return CollisionAuditResult(
            clip_velocity=hi,
            wall_thickness=self.wall_thickness,
            dt=self.dt,
            predicted_clip_velocity=predicted,
            tunneling_confirmed=abs(hi - predicted) / predicted < 0.1,
        )


# --------------------------------------------------------------------------
# Probe 3: IRL experiment logger
# --------------------------------------------------------------------------

@dataclass
class IRLExperiment:
    sim_finding: str
    irl_protocol: str
    expected_signature: str


class IRLExperimentLogger:
    """Map simulation findings to real-world experiment proposals
    (reference: universe_3d.py:964-1080)."""

    def __init__(self):
        self.experiments: List[IRLExperiment] = []

    def log_from_universe(self, universe: Universe3D,
                          interference: InterferenceResult = None,
                          collision: CollisionAuditResult = None):
        g = universe.glitch_detector.get_glitch_summary()
        if g.get("energy_jump", 0) > 0:
            self.experiments.append(IRLExperiment(
                sim_finding=f"{g['energy_jump']} energy-conservation jumps "
                            f"under {universe.precision_str}",
                irl_protocol="Ultra-long-baseline calorimetry of an "
                             "isolated system; search for discrete energy "
                             "steps correlated with environment load",
                expected_signature="Quantized energy residuals at fixed "
                                   "relative magnitude",
            ))
        if g.get("momentum_drift", 0) > 0:
            self.experiments.append(IRLExperiment(
                sim_finding=f"{g['momentum_drift']} momentum-drift events",
                irl_protocol="Torsion-balance drift monitoring in deep "
                             "vacuum over months",
                expected_signature="Secular momentum drift aligned with a "
                                   "fixed lattice direction",
            ))
        if interference and interference.lag_contagion:
            self.experiments.append(IRLExperiment(
                sim_finding=f"Lag contagion x{interference.variance_ratio:.1f} "
                            "under substrate co-stress",
                irl_protocol="Precision clock comparison near/far from "
                             "high-entropy computation clusters",
                expected_signature="Clock jitter correlated with external "
                                   "computational load",
            ))
        if collision and collision.tunneling_confirmed:
            self.experiments.append(IRLExperiment(
                sim_finding=f"Tick-tunneling above v={collision.clip_velocity:.1f} "
                            f"(= thickness/dt)",
                irl_protocol="Thin-barrier tunneling rate vs incident "
                             "velocity at extreme energies",
                expected_signature="Transmission step at velocity ~ "
                                   "(barrier width) x (Planck frequency)",
            ))
        return self.experiments

    def to_json(self):
        return [vars(e) for e in self.experiments]


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description="3D cosmological universe (TPU)")
    p.add_argument("--particles", type=int, default=8000)
    p.add_argument("--box-size", type=float, default=200.0)
    p.add_argument("--start-z", type=float, default=50.0)
    p.add_argument("--dz", type=float, default=1.0)
    p.add_argument("--precision", type=str, default="float32")
    p.add_argument("--dm-ratio", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mesh", action="store_true",
                   help="run the sharded PM pipeline over all local "
                        "devices (parallel/pm_sharded.py)")
    p.add_argument("--output", type=str, default="output/universe3d")
    p.add_argument("--probes", action="store_true",
                   help="run substrate/collision/IRL probes after evolution")
    p.add_argument("--frames", type=int, default=4,
                   help="3-D dashboard frames to render across the run")
    p.add_argument("--headless", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-headless opens the interactive rotating "
                        "viewer when a display exists")
    p.add_argument("--animate", action="store_true",
                   help="run the rotating live dashboard instead of "
                        "periodic PNG frames (gif when headless)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    mesh = None
    if args.mesh:
        from nbody_tpu.parallel import ring as _ring

        mesh = _ring.make_particle_mesh()
        print(f"sharded PM over {mesh.shape[_ring.AXIS]} device(s)")
    u = Universe3D(num_particles=args.particles, box_size_mpc=args.box_size,
                   start_redshift=args.start_z, precision=args.precision,
                   dm_ratio=args.dm_ratio, seed=args.seed, mesh=mesh)
    from nbody_tpu.engines.dashboard3d import Dashboard3D

    dash = Dashboard3D(u, args.output)

    if args.animate:
        path = dash.animate(dz=args.dz, frames=args.frames * 5,
                            headless=args.headless or None)
        if path:
            print(f"animation written to {path}")
        return

    total_steps = int((args.start_z - u.cfg.min_redshift) / args.dz) + 1
    frame_every = max(1, total_steps // max(args.frames, 1))
    t0 = time.time()
    rendered = 0
    while not u.completed:
        u.step(args.dz, num_steps=min(10, frame_every))
        if u.tick // frame_every > rendered:
            rendered += 1
            dash.render_frame()
    dash.render_frame(tag="final")
    wall = time.time() - t0
    print(f"Evolved z={args.start_z} -> {u.redshift:.2f} in {wall:.1f}s "
          f"({u.tick} steps); glitches={u.glitch_detector.get_glitch_count()}")

    report = {
        "engine": "universe3d",
        "precision": u.precision_str,
        "num_particles": u.num_particles,
        "ticks": u.tick,
        "final_redshift": u.redshift,
        "bao_scale_mpc": u.get_bao_scale(),
        "clustering": u.get_clustering(),
        "glitch_summary": u.glitch_detector.get_glitch_summary(),
        "exploit_summary": u.exploit_engine.get_exploit_summary(),
    }

    if args.probes:
        print("\nRunning substrate interference probe...")
        probe_u = Universe3D(num_particles=1000, precision=args.precision,
                             start_redshift=10.0)
        interference = SubstrateInterferenceProbe().run(probe_u, num_steps=15)
        print(f"  variance ratio: {interference.variance_ratio:.2f} "
              f"(lag contagion: {interference.lag_contagion})")

        collision = CollisionTickAuditor(wall_thickness=1.0, dt=0.01).run()
        print(f"  clip velocity: {collision.clip_velocity:.1f} "
              f"(predicted {collision.predicted_clip_velocity:.1f}, "
              f"tunneling: {collision.tunneling_confirmed})")

        irl = IRLExperimentLogger()
        irl.log_from_universe(u, interference, collision)
        report["interference"] = vars(interference)
        report["collision_audit"] = vars(collision)
        report["irl_experiments"] = irl.to_json()
        print(f"  {len(irl.experiments)} IRL experiment(s) proposed")

    (out / "universe3d_report.json").write_text(
        json.dumps(report, indent=2, default=str))
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("irl_experiments",)}, indent=2,
                     default=str))


if __name__ == "__main__":
    main()
