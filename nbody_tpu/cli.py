"""Primary CLI: the precision-ladder comparison workflow.

TPU-native equivalent of the reference entry point
(reference: main.py:23-212): build a disk galaxy, run it under several
precision modes, write the four comparison figures and the summary table.
The whole run per mode is a handful of fused device programs (chunked
``lax.scan``) with snapshots streamed to host only at interval boundaries.

Usage:
    python main.py --stars 5000 --ticks 2000 --compare float64,int4
    python main.py --quick
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np

from nbody_tpu.config import SimConfig
from nbody_tpu.diagnostics import metrics as metrics_lib
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import describe_mode, get_mode_from_string
from nbody_tpu.utils.history import MetricsHistory
from nbody_tpu.utils.viz import plot_full_comparison, print_summary
from nbody_tpu.utils.profiler import fence


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=("Lossy galaxy simulation (TPU-native): testing dark "
                     "matter as rounding errors"),
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  python main.py --stars 5000 --ticks 2000 --compare float64,int4
  python main.py --quick
  python main.py --stars 10000 --compare float64,float16,int8,int4

Precision modes:
  float64  - emulated extended precision baseline (double-double on TPU)
  float32  - TPU-native 32-bit
  bfloat16 - TPU MXU-native brain float
  float16  - half precision
  int8     - simulated 8-bit (256-level log grid)
  int4     - simulated 4-bit (16-level log grid), most extreme
""")
    p.add_argument("--stars", "-n", type=int, default=3000,
                   help="number of stars (default: 3000)")
    p.add_argument("--ticks", "-t", type=int, default=1000,
                   help="number of simulation ticks (default: 1000)")
    p.add_argument("--compare", "-c", type=str, default="float64,int4",
                   help="comma-separated precision modes (default: float64,int4)")
    p.add_argument("--output", "-o", type=str, default="output",
                   help="output directory for plots")
    p.add_argument("--quick", action="store_true",
                   help="quick test mode (500 stars, 500 ticks)")
    p.add_argument("--no-show", action="store_true",
                   help="don't display plots (always true: headless Agg backend)")
    p.add_argument("--dt", type=float, default=0.01, help="time step")
    p.add_argument("--G", type=float, default=0.001,
                   help="gravitational constant")
    p.add_argument("--seed", type=int, default=42, help="PRNG seed for ICs")
    p.add_argument("--snapshot-interval", type=int, default=100,
                   help="ticks between on-device metric snapshots")
    p.add_argument("--force-impl", type=str, default="auto",
                   choices=["auto", "dense", "tiled", "pallas"],
                   help="force kernel implementation")
    p.add_argument("--mesh", type=int, nargs="?", const=0, default=None,
                   metavar="N",
                   help=("run sharded over an N-device mesh (bare --mesh "
                         "= all local devices): particles ring-sharded, "
                         "forces via the half-ring Newton's-third-law "
                         "schedule, energies psum'd under the mesh"))
    p.add_argument("--schedule", type=str, default="sym",
                   choices=["sym", "rows"],
                   help="ring force schedule for --mesh runs")
    p.add_argument("--bounds-every", type=int, default=1, metavar="K",
                   help="int-sim modes: recompute the global log-grid "
                        "bounds every K steps instead of every force "
                        "evaluation (K=1 = exact reference semantics; "
                        "K>1 trades a documented bin-edge lag for "
                        "throughput, see docs/PERF.md)")
    p.add_argument("--ticks-per-dispatch", type=int, default=None,
                   metavar="T",
                   help="mesh runs: cap the ticks folded into each "
                        "device dispatch (identical physics; needed on "
                        "hosts whose TPU tunnel kills dispatches past a "
                        "wall-clock watchdog — e.g. ~20 f32 ticks at "
                        "N=1M on this box, see docs/PERF.md)")
    return p


def run_compare(args) -> dict:
    if args.quick:
        args.stars = 500
        args.ticks = 500
        print("Quick mode: 500 stars, 500 ticks")

    print(f"\nBackend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s): {jax.devices()[0].device_kind})")

    mode_strings = [s.strip() for s in args.compare.split(",")]
    try:
        modes = [get_mode_from_string(s, strict=True) for s in mode_strings]
    except ValueError as e:
        raise SystemExit(f"error: {e}")
    print("\nPrecision modes to compare:")
    for mode in modes:
        print(f"  - {mode.value}: {describe_mode(mode)}")

    print(f"\nCreating galaxy with {args.stars} stars...")
    key = jax.random.PRNGKey(args.seed)
    positions, velocities, masses = create_disk_galaxy(
        key, num_stars=args.stars, galaxy_radius=10.0, G=args.G)
    print(f"  Position range: [{float(positions.min()):.2f}, "
          f"{float(positions.max()):.2f}]")
    print(f"  Velocity range: [{float(velocities.min()):.2f}, "
          f"{float(velocities.max()):.2f}]")

    cfg = SimConfig(G=args.G, dt=args.dt)
    histories, final_positions = {}, {}

    mesh = None
    schedule = getattr(args, "schedule", "sym")
    if getattr(args, "mesh", None) is not None:
        from nbody_tpu.parallel import ring
        n_dev = args.mesh if args.mesh > 0 else None
        mesh = ring.make_particle_mesh(n_dev)
        print(f"\nMesh: {mesh.shape[ring.AXIS]} device(s), "
              f"schedule={schedule} (particle-ring sharding)")
    elif getattr(args, "ticks_per_dispatch", None) is not None:
        # silently dropping a typed flag would leave the user exposed to
        # the very watchdog they tried to dodge
        raise SystemExit("--ticks-per-dispatch requires --mesh (it bounds "
                         "the sharded runners' dispatches; single-device "
                         "runs are chunked via the snapshot interval)")

    for mode in modes:
        print(f"\n{'=' * 50}\nRunning simulation: {mode.value}\n{'=' * 50}")
        sim = DirectSimulation(positions, velocities, masses, precision=mode,
                               cfg=cfg, force_impl=args.force_impl,
                               mesh=mesh, schedule=schedule,
                               bounds_every=getattr(args, "bounds_every", 1),
                               ticks_per_dispatch=getattr(
                                   args, "ticks_per_dispatch", None))
        snap0 = metrics_lib.snapshot(sim.positions, sim.velocities,
                                     sim.masses, sim.state.tick, cfg)
        t0 = time.time()
        snaps, frames = sim.run_with_history(
            args.ticks, snapshot_interval=args.snapshot_interval)
        fence(snaps)
        wall = time.time() - t0
        h = MetricsHistory.from_snapshots(snaps, initial=snap0)
        histories[mode.value] = h
        final_positions[mode.value] = np.asarray(sim.positions)
        pairs_per_sec = args.stars ** 2 * args.ticks / max(wall, 1e-9)
        print(f"  {args.ticks} ticks in {wall:.2f}s "
              f"({args.ticks / max(wall, 1e-9):.1f} ticks/s, "
              f"{pairs_per_sec:.2e} pairwise interactions/s)")
        for tick, e in zip(h.ticks[::2], h.total_energy[::2]):
            print(f"  Tick {tick}: Energy={e:.4f}")

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    print(f"\n{'=' * 50}\nGenerating comparison plots...\n{'=' * 50}")
    plot_full_comparison(final_positions, histories, save_dir=str(out_dir))
    print_summary(histories)
    print(f"\nPlots saved to: {out_dir.absolute()}")
    print("\nLook for these effects:")
    print("  1. Rotation curve: flatter in quantized mode = 'dark matter'")
    print("  2. Energy: increasing in quantized mode = rounding injecting energy")
    print("  3. Radius: smaller in quantized mode = stars staying more bound")
    return histories


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run_compare(args)


if __name__ == "__main__":
    main()
