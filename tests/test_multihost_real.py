"""REAL two-process ``jax.distributed`` integration test (CPU, localhost).

Round-3 verdict: the DCN path had only ever run under monkeypatched
simulation (test_multihost.py). This spawns TWO actual OS processes with
4 virtual CPU devices each, federates them into one 8-device global mesh
over a localhost coordinator + gloo collectives, and runs the sharded
flagship history and the cross-host hash agreement UN-MOCKED (see
tools/multihost_check.py for the worker program). The single-process
8-device run of the identical configuration is the oracle.

Replaces (live) the reference's offline JSON state exchange
(reference: ultimate_reality_engine.py:694-833).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_check.py")

STARS, TICKS, CHUNKS = 200, 20, 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(tmp, port):
    """One attempt: spawn both workers on `port`, wait, return
    (procs, outs, logs)."""
    env = dict(os.environ, PYTHONPATH=REPO)
    # The workers own their device topology (they REPLACE XLA_FLAGS); the
    # parent's 8-device flags and any TPU platform pin must not leak in a
    # way the worker can't override — it sets everything pre-import.
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"p{pid}_{port}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--process-id", str(pid),
             "--port", str(port), "--out", str(out),
             "--stars", str(STARS), "--ticks", str(TICKS),
             "--chunks", str(CHUNKS)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process jax.distributed run timed out")
        logs.append(stdout.decode(errors="replace"))
    return procs, outs, logs


@pytest.fixture(scope="module")
def two_process_results(tmp_path_factory):
    """Run the two workers once; both module tests read the results.

    _free_port() probes then CLOSES the socket, so another process can
    grab the port before the coordinator binds it (TOCTOU). A bind
    failure is detectable from the worker log — retry on a fresh port
    instead of flaking the whole module."""
    tmp = tmp_path_factory.mktemp("mh")
    for attempt in range(3):
        procs, outs, logs = _spawn_workers(tmp, _free_port())
        bind_race = any(
            p.returncode != 0 and any(
                marker in log.lower()
                for marker in ("address already in use", "failed to bind",
                               "address in use"))
            for p, log in zip(procs, logs))
        if bind_race and attempt < 2:
            continue
        break
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} rc={p.returncode}\n--- log tail ---\n"
            + logs[pid][-3000:])
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_two_process_topology(two_process_results):
    for r in two_process_results:
        assert r["multihost_active"] is True
        assert r["num_processes"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4


def test_two_process_history_is_identical_across_processes(
        two_process_results):
    """Multi-controller SPMD: both processes must compute the SAME
    replicated history (gloo collectives are deterministic)."""
    r0, r1 = two_process_results
    assert r0["energy_total"] == r1["energy_total"]
    assert r0["final_pos_checksum"] == r1["final_pos_checksum"]
    assert r0["int4_total"] == r1["int4_total"]
    assert r0["int4_finite"] and r1["int4_finite"]
    assert r0["frames_shape"] == [CHUNKS, STARS, 2]


def test_two_process_matches_single_process_mesh(two_process_results):
    """The 8-device global mesh split across two REAL processes must
    reproduce the single-process 8-device history of the same run (same
    shard layout; only the transport differs)."""
    from nbody_tpu.config import SimConfig
    from nbody_tpu.models import galaxy
    from nbody_tpu.models.state import make_state
    from nbody_tpu.ops.precision import Quantizer
    from nbody_tpu.parallel import ring

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(0),
                                            num_stars=STARS)
    st = make_state(pos, vel, m)
    mesh = ring.make_particle_mesh(8)
    _, snaps, _ = ring.run_with_snapshots_sharded(
        st, Quantizer.from_string("f32"), SimConfig(), mesh,
        steps_per_chunk=TICKS // CHUNKS, num_chunks=CHUNKS)
    want = np.asarray(snaps.total, np.float64)
    got = np.asarray(two_process_results[0]["energy_total"], np.float64)
    # Same shard layout and math; cross-process reductions may associate
    # differently than in-process ones -> rounding-level tolerance only.
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_two_process_hash_agreement_and_mismatch(two_process_results):
    """The live substrate mirror: agreement on identical state; a
    perturbation local to process 1 must be detected by BOTH."""
    r0, r1 = two_process_results
    assert r0["agree"]["all_equal"] is True
    assert r1["agree"]["all_equal"] is True
    assert r0["agree"]["hash"] == r1["agree"]["hash"]
    assert r0["agree"]["num_processes"] == 2
    assert r0["mismatch"]["all_equal"] is False
    assert r1["mismatch"]["all_equal"] is False
    # the perturbed process's own digest changed; the clean one's did not
    assert r0["mismatch"]["hash"] == r0["agree"]["hash"]
    assert r1["mismatch"]["hash"] != r1["agree"]["hash"]
