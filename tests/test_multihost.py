"""Multi-host helpers exercised on a single host (8-device CPU mesh).

Real DCN needs a pod; here the single-process paths run for real and the
multi-process agreement logic is exercised by simulating the gathered
digests of other hosts (agreement + deliberate mismatch).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.parallel import multihost


def _state(seed=0, n=64):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, (n, 2)), jax.random.normal(k2, (n, 2)))


def test_initialize_multihost_single_host_is_noop():
    assert multihost.initialize_multihost() is False


def test_make_global_mesh_spans_all_devices():
    mesh = multihost.make_global_mesh()
    assert mesh.shape["shards"] == len(jax.devices()) == 8


def test_agreement_single_process():
    pos, vel = _state()
    out = multihost.cross_host_state_agreement(pos, vel)
    assert out["num_processes"] == 1
    assert out["all_equal"] is True
    assert len(out["hash"]) == 16
    # identical state -> identical hash; perturbed state -> different
    again = multihost.cross_host_state_agreement(pos, vel)
    assert again["hash"] == out["hash"]
    perturbed = multihost.cross_host_state_agreement(pos + 1e-6, vel)
    assert perturbed["hash"] != out["hash"]


def _fake_two_hosts(monkeypatch, other_digest_offset: int):
    """Pretend a second process exists whose gathered digest differs by
    the given offset (0 = agreement)."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    from jax.experimental import multihost_utils

    def fake_allgather(x):
        local = np.asarray(x)
        other = local + other_digest_offset
        return np.stack([local, other])

    monkeypatch.setattr(multihost_utils, "process_allgather",
                        fake_allgather)


def test_agreement_multi_process_equal(monkeypatch):
    _fake_two_hosts(monkeypatch, other_digest_offset=0)
    pos, vel = _state()
    out = multihost.cross_host_state_agreement(pos, vel)
    assert out["num_processes"] == 2
    assert out["all_equal"] is True


def test_agreement_multi_process_mismatch_detected(monkeypatch):
    _fake_two_hosts(monkeypatch, other_digest_offset=1)
    pos, vel = _state()
    out = multihost.cross_host_state_agreement(pos, vel)
    assert out["num_processes"] == 2
    assert out["all_equal"] is False
