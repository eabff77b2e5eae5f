"""Live-dashboard layer: headless FuncAnimation renders for every
reference dashboard (reference: universe_2d.py:1296-1562,
universe_3d.py:1358-1540, reality_glitch_tests.py:444-1218,
realtime_reality_engine.py:521-759, realtime_visual.py:142-174)."""

import os

import pytest

from nbody_tpu.utils import anim


def test_has_display_false_headless(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    monkeypatch.setenv("MPLBACKEND", "Agg")
    assert anim.has_display() is False


def test_pick_writer_falls_back_to_gif(tmp_path):
    writer, path = anim.pick_writer(tmp_path / "x.mp4")
    # this box has no ffmpeg -> pillow/gif; with ffmpeg mp4 is kept
    assert writer in ("pillow", "ffmpeg")
    if writer == "pillow":
        assert path.suffix == ".gif"


def test_live_animation_saves_gif(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames_seen = []

    def make_figure():
        fig, ax = plt.subplots(figsize=(2, 2))
        return fig, ax

    def update(frame, ax):
        frames_seen.append(frame)
        ax.clear()
        ax.plot([0, frame + 1])
        return []

    la = anim.LiveAnimation(make_figure, update, frames=3, interval_ms=50)
    path = la.run(save_path=tmp_path / "mini.gif", headless=True)
    assert path is not None and path.exists() and path.stat().st_size > 0
    assert len(frames_seen) >= 3


def test_glitch_dashboard_headless(tmp_path):
    from nbody_tpu.experiments.reality_glitch_tests import run_dashboard

    v = run_dashboard(num_stars=48, frames=2, ticks_per_frame=1,
                      save_path=tmp_path / "glitch.gif", headless=True)
    assert os.path.exists(v["animation"])
    assert v["frames"] >= 2
    assert "anomalies" in v


def test_universe2d_animate_headless(tmp_path):
    from nbody_tpu.engines.universe2d import (Universe2D,
                                              Universe2DDashboard)

    u = Universe2D(num_particles=64, start_redshift=10.0,
                   precision="float32")
    dash = Universe2DDashboard(u, out_dir=str(tmp_path))
    path = dash.animate(dz=1.0, steps_per_frame=1, frames=2, headless=True)
    assert path is not None and path.exists()
    assert u.tick >= 2  # engine really advanced inside the animation


def test_universe3d_animate_headless(tmp_path):
    from nbody_tpu.engines.dashboard3d import Dashboard3D
    from nbody_tpu.engines.universe3d import Universe3D

    u = Universe3D(num_particles=64, start_redshift=10.0,
                   precision="float32")
    dash = Dashboard3D(u, out_dir=str(tmp_path))
    azim0 = dash.azim
    path = dash.animate(dz=1.0, steps_per_frame=1, frames=2, headless=True)
    assert path is not None and path.exists()
    assert dash.azim != azim0  # the camera actually rotated


def test_precision_viewer_animate_headless(tmp_path):
    from nbody_tpu.realtime.visual import PrecisionCompareViewer

    viewer = PrecisionCompareViewer(num_stars=48, steps_per_frame=1,
                                    out_dir=str(tmp_path))
    path = viewer.animate(frames=2, save_path=tmp_path / "cmp.gif",
                          headless=True)
    assert path is not None and path.exists()
    assert len(viewer.history["ghost"]) >= 2


@pytest.mark.slow
def test_realtime_engine_animate_headless(tmp_path):
    from nbody_tpu.realtime.engine import run_realtime_engine

    report = run_realtime_engine(num_particles=64, precision="float32",
                                 seconds=1.0, out_dir=str(tmp_path),
                                 animate=True)
    assert (tmp_path / "realtime.gif").exists()
    assert report["final_tick"] > 0
