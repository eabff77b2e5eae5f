"""Mesh-shape breadth for the driver dry run: the full seven-surface
multi-chip path must compile + execute on meshes other than the default
8 — an odd non-power-of-two (6, exercises unaligned shard padding in
every surface) and a larger-than-8 (16, exercises the ring schedule past
one half-ring wrap). Each runs in a fresh subprocess because the XLA
host-device count is fixed at process start (the in-process suite is
pinned to 8 by conftest)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n_devices", [6, 16])
def test_dryrun_multichip_mesh_shapes(n_devices):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    out = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n_devices})"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"dryrun_multichip OK on {n_devices} devices" in out.stdout, (
        out.stdout[-2000:], out.stderr[-1000:])
