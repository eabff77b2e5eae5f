"""Realtime precision-compare viewer: clean vs broken, live.

TPU-native equivalent of the reference's live comparison visualizer
(reference: realtime_visual.py:37-387): a clean (float32) and a broken
(16-level log-quantized) galaxy stepped in lockstep, rendered as a
dashboard of both galaxies + divergence map + energy drift + the
"GHOST FORCE" meter (broken minus clean drift; "DARK MATTER!" label above
5%) + live rotation curves. The reference subclasses the engine to
override its force method (realtime_visual.py:86-109); here the broken
universe is just a ``Quantizer(CUSTOM, 16)`` configuration.

Headless mode writes PNG frames; interactive mode uses FuncAnimation.

Usage:
    python -m nbody_tpu.realtime.visual --stars 2000 --frames 6
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import numpy as np

from nbody_tpu.diagnostics.metrics import rotation_curve
from nbody_tpu.models.direct import DirectSimulation
from nbody_tpu.models.galaxy import create_disk_galaxy
from nbody_tpu.ops.precision import Precision, Quantizer

GHOST_FORCE_DM_THRESHOLD = 5.0  # percent (reference: realtime_visual.py:240)


class PrecisionCompareViewer:
    def __init__(self, num_stars: int = 2000, seed: int = 42,
                 steps_per_frame: int = 5,
                 out_dir: str = "output/realtime_visual",
                 mode: str = "compare"):
        """mode: 'compare' runs both universes; 'clean'/'broken' run and
        render only that universe (reference: realtime_visual.py:362-383)."""
        key = jax.random.PRNGKey(seed)
        pos, vel, m = create_disk_galaxy(key, num_stars)
        self.mode = mode
        self.clean = None
        self.broken = None
        if mode in ("compare", "clean"):
            self.clean = DirectSimulation(pos, vel, m,
                                          precision=Precision.FLOAT32)
            self.e0_clean = self.clean.get_total_energy()
        if mode in ("compare", "broken"):
            self.broken = DirectSimulation(
                pos, vel, m,
                precision=Quantizer(Precision.CUSTOM, custom_levels=16),
                quantize_forces=False)
            self.e0_broken = self.broken.get_total_energy()
        self.steps_per_frame = steps_per_frame
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.history = {"ticks": [], "drift_clean": [], "drift_broken": [],
                        "ghost": []}
        self.frame_idx = 0

    @property
    def tick(self) -> int:
        sim = self.clean or self.broken
        return sim.tick

    def step(self):
        drift_c = drift_b = 0.0
        if self.clean is not None:
            self.clean.step(self.steps_per_frame)
            drift_c = ((self.clean.get_total_energy() - self.e0_clean)
                       / abs(self.e0_clean) * 100)
        if self.broken is not None:
            self.broken.step(self.steps_per_frame)
            drift_b = ((self.broken.get_total_energy() - self.e0_broken)
                       / abs(self.e0_broken) * 100)
        self.history["ticks"].append(self.tick)
        self.history["drift_clean"].append(drift_c)
        self.history["drift_broken"].append(drift_b)
        self.history["ghost"].append(drift_b - drift_c
                                     if self.mode == "compare" else 0.0)

    def _render_single(self):
        """Single-universe frame for --mode clean/broken."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        sim = self.clean if self.mode == "clean" else self.broken
        drift_key = ("drift_clean" if self.mode == "clean"
                     else "drift_broken")
        p = np.asarray(sim.positions)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 6),
                                       facecolor="#0b0b16")
        ax1.scatter(p[:, 0], p[:, 1], s=0.8, c="white", alpha=0.6)
        ax1.set_facecolor("black")
        ax1.set_xlim(-20, 20)
        ax1.set_ylim(-20, 20)
        ax1.set_title(f"{self.mode.upper()} universe, tick {self.tick}",
                      color="white")
        ax1.tick_params(colors="white")
        ax2.plot(self.history["ticks"], self.history[drift_key],
                 color="#2ecc71" if self.mode == "clean" else "#e74c3c")
        ax2.set_title("Energy drift %", color="white")
        ax2.set_facecolor("#101020")
        ax2.tick_params(colors="white")
        fig.tight_layout()
        path = self.out_dir / f"{self.mode}_{self.frame_idx:04d}.png"
        fig.savefig(path, dpi=100, facecolor="#0b0b16")
        plt.close(fig)
        self.frame_idx += 1
        return path

    def render_frame(self):
        if self.mode != "compare":
            return self._render_single()
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pc = np.asarray(self.clean.positions)
        pb = np.asarray(self.broken.positions)
        ghost = self.history["ghost"][-1] if self.history["ghost"] else 0.0

        fig = plt.figure(figsize=(16, 9), facecolor="#0b0b16")
        gs = fig.add_gridspec(2, 3)

        for idx, (p, title) in enumerate(
                [(pc, "CLEAN (float32)"), (pb, "BROKEN (16-level log)")]):
            ax = fig.add_subplot(gs[0, idx])
            ax.scatter(p[:, 0], p[:, 1], s=0.8, c="white", alpha=0.6)
            ax.set_facecolor("black")
            ax.set_xlim(-20, 20)
            ax.set_ylim(-20, 20)
            ax.set_title(title, color="white")
            ax.tick_params(colors="white")

        ax = fig.add_subplot(gs[0, 2])
        div = np.linalg.norm(pc - pb, axis=1)
        sc = ax.scatter(pc[:, 0], pc[:, 1], s=1.2, c=div, cmap="inferno",
                        vmin=0, vmax=max(float(div.max()), 1e-6))
        ax.set_facecolor("black")
        ax.set_xlim(-20, 20)
        ax.set_ylim(-20, 20)
        ax.set_title("DIVERGENCE MAP", color="white")
        ax.tick_params(colors="white")
        fig.colorbar(sc, ax=ax)

        ax = fig.add_subplot(gs[1, 0])
        ax.plot(self.history["ticks"], self.history["drift_clean"],
                color="#2ecc71", label="clean")
        ax.plot(self.history["ticks"], self.history["drift_broken"],
                color="#e74c3c", label="broken")
        ax.set_title("Energy drift %", color="white")
        ax.set_facecolor("#101020")
        ax.tick_params(colors="white")
        ax.legend()

        ax = fig.add_subplot(gs[1, 1])
        color = "#e74c3c" if ghost > GHOST_FORCE_DM_THRESHOLD else "#f39c12"
        ax.bar(["GHOST FORCE"], [ghost], color=color)
        label = ("DARK MATTER!" if ghost > GHOST_FORCE_DM_THRESHOLD
                 else f"{ghost:+.2f}%")
        ax.set_title(f"Ghost force meter: {label}", color="white")
        ax.set_facecolor("#101020")
        ax.tick_params(colors="white")

        ax = fig.add_subplot(gs[1, 2])
        for sim, color, label in ((self.clean, "#2ecc71", "clean"),
                                  (self.broken, "#e74c3c", "broken")):
            c = rotation_curve(sim.positions, sim.velocities, num_bins=14)
            r = np.asarray(c.radii)
            v = np.asarray(c.velocities, float)
            valid = ~np.isnan(v)
            ax.plot(r[valid], v[valid], "o-", ms=3, color=color,
                    label=label)
        ax.set_title("Live rotation curves", color="white")
        ax.set_facecolor("#101020")
        ax.tick_params(colors="white")
        ax.legend()

        fig.suptitle(f"tick {self.clean.tick}", color="white")
        fig.tight_layout()
        path = self.out_dir / f"compare_{self.frame_idx:04d}.png"
        fig.savefig(path, dpi=100, facecolor="#0b0b16")
        plt.close(fig)
        self.frame_idx += 1
        return path


    def animate(self, frames: int = 20, save_path=None, headless=None):
        """Live compare dashboard (reference FuncAnimation:
        realtime_visual.py:142-174): clean/broken galaxies + drift + ghost
        meter + rotation curves, stepping both universes per frame."""
        from nbody_tpu.utils.anim import LiveAnimation

        def make_figure():
            import matplotlib.pyplot as plt

            fig = plt.figure(figsize=(16, 9), facecolor="#0b0b16")
            gs = fig.add_gridspec(2, 3)
            axes = {
                "clean": fig.add_subplot(gs[0, 0]),
                "broken": fig.add_subplot(gs[0, 1]),
                "div": fig.add_subplot(gs[0, 2]),
                "drift": fig.add_subplot(gs[1, 0]),
                "ghost": fig.add_subplot(gs[1, 1]),
                "curves": fig.add_subplot(gs[1, 2]),
            }
            return fig, axes

        def update(frame, axes):
            self.step()
            pc = np.asarray(self.clean.positions)
            pb = np.asarray(self.broken.positions)
            for key, p, title in (("clean", pc, "CLEAN (float32)"),
                                  ("broken", pb, "BROKEN (16-level log)")):
                ax = axes[key]
                ax.clear()
                ax.scatter(p[:, 0], p[:, 1], s=0.8, c="white", alpha=0.6)
                ax.set_facecolor("black")
                ax.set_xlim(-20, 20)
                ax.set_ylim(-20, 20)
                ax.set_title(title, color="white")
                ax.tick_params(colors="white")

            ax = axes["div"]
            ax.clear()
            div = np.linalg.norm(pc - pb, axis=1)
            ax.scatter(pc[:, 0], pc[:, 1], s=1.2, c=div, cmap="inferno",
                       vmin=0, vmax=max(float(div.max()), 1e-6))
            ax.set_facecolor("black")
            ax.set_xlim(-20, 20)
            ax.set_ylim(-20, 20)
            ax.set_title("DIVERGENCE MAP", color="white")
            ax.tick_params(colors="white")

            ax = axes["drift"]
            ax.clear()
            ax.plot(self.history["ticks"], self.history["drift_clean"],
                    color="#2ecc71", label="clean")
            ax.plot(self.history["ticks"], self.history["drift_broken"],
                    color="#e74c3c", label="broken")
            ax.set_title("Energy drift %", color="white")
            ax.set_facecolor("#101020")
            ax.tick_params(colors="white")
            ax.legend()

            ax = axes["ghost"]
            ax.clear()
            ghost = self.history["ghost"][-1]
            color = ("#e74c3c" if ghost > GHOST_FORCE_DM_THRESHOLD
                     else "#f39c12")
            ax.bar(["GHOST FORCE"], [ghost], color=color)
            label = ("DARK MATTER!" if ghost > GHOST_FORCE_DM_THRESHOLD
                     else f"{ghost:+.2f}%")
            ax.set_title(f"Ghost force meter: {label}", color="white")
            ax.set_facecolor("#101020")
            ax.tick_params(colors="white")

            ax = axes["curves"]
            ax.clear()
            for sim, color, label in ((self.clean, "#2ecc71", "clean"),
                                      (self.broken, "#e74c3c", "broken")):
                c = rotation_curve(sim.positions, sim.velocities,
                                   num_bins=14)
                r = np.asarray(c.radii)
                v = np.asarray(c.velocities, float)
                valid = ~np.isnan(v)
                ax.plot(r[valid], v[valid], "o-", ms=3, color=color,
                        label=label)
            ax.set_title("Live rotation curves", color="white")
            ax.set_facecolor("#101020")
            ax.tick_params(colors="white")
            ax.legend()
            return []

        anim = LiveAnimation(make_figure, update, frames=frames,
                             interval_ms=100)
        return anim.run(save_path=save_path
                        or self.out_dir / "compare.gif",
                        headless=headless)


def main(argv=None):
    p = argparse.ArgumentParser(description="Realtime precision viewer")
    p.add_argument("--stars", type=int, default=2000)
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--ticks-per-frame", type=int, default=50)
    p.add_argument("--mode", choices=["compare", "clean", "broken"],
                   default="compare")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", type=str, default="output/realtime_visual")
    p.add_argument("--animate", action="store_true",
                   help="live FuncAnimation (gif when headless) instead "
                        "of per-frame PNGs; compare mode only")
    args = p.parse_args(argv)

    viewer = PrecisionCompareViewer(args.stars, args.seed,
                                    steps_per_frame=args.ticks_per_frame,
                                    out_dir=args.output, mode=args.mode)
    if args.animate and args.mode == "compare":
        path = viewer.animate(frames=args.frames)
        if path:
            print(f"animation written to {path}")
        (Path(args.output) / "ghost_history.json").write_text(
            json.dumps(viewer.history, indent=2))
        return
    t0 = time.time()
    for f in range(args.frames):
        viewer.step()
        path = viewer.render_frame()
        g = viewer.history["ghost"][-1]
        print(f"  frame {f}: tick {viewer.tick}, ghost force "
              f"{g:+.2f}% -> {path}")
    print(f"\n{args.frames} frames in {time.time() - t0:.1f}s; final ghost "
          f"force {viewer.history['ghost'][-1]:+.2f}%")
    (Path(args.output) / "ghost_history.json").write_text(
        json.dumps(viewer.history, indent=2))


if __name__ == "__main__":
    main()
