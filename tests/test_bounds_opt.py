"""Int-sim grid-bounds optimizations: the O(N) exact pruned max pass and
the speculate-and-verify cached-bounds scan.

The reference recomputes the tensor-global log-grid bounds from a full
O(N^2) max before every force evaluation (quantization.py:112-121 via
simulation.py:94). These tests pin the two replacements:

* ``max_pairwise_dist_sq_pruned`` must be BITWISE the same value as the
  full pass on every geometry (it is exact, not approximate — candidate
  pruning by the diameter endpoint-radius bound, with a guarded full
  fallback for degenerate geometries).
* ``run_steps(bounds_mode='cached')`` must track the exact path within
  the documented headroom envelope and never clip (grid hi >= observed
  max at every step).
* ``pallas_accelerations_sym(emit_max=True)`` must return the same
  forces as the plain call plus the same max as the dedicated pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models import galaxy
from nbody_tpu.ops import forces
from nbody_tpu.ops.precision import Precision, Quantizer

CFG = SimConfig()


def _geometries():
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 8)
    disk, _, _ = galaxy.create_disk_galaxy(ks[0], num_stars=512)
    gauss3 = jax.random.normal(ks[1], (512, 3)) * 5.0
    # Near-spherical shell: every point is at ~r_max, the endpoint-radius
    # bound admits everyone -> the full-pass fallback cond must fire.
    raw = jax.random.normal(ks[2], (512, 2))
    shell = raw / jnp.linalg.norm(raw, axis=1, keepdims=True) * 10.0
    coincident = jnp.zeros((512, 2)) + jax.random.normal(ks[3], (512, 2)) * 1e-6
    clusters = jnp.concatenate([
        jax.random.normal(ks[4], (256, 2)) + jnp.asarray([100.0, 0.0]),
        jax.random.normal(ks[5], (256, 2)) - jnp.asarray([100.0, 0.0]),
    ])
    outlier = jnp.concatenate([jax.random.normal(ks[6], (511, 3)),
                               jnp.asarray([[500.0, -300.0, 200.0]])])
    return {"disk": disk, "gauss3d": gauss3, "shell": shell,
            "coincident": coincident, "clusters": clusters,
            "outlier3d": outlier}


@pytest.mark.parametrize("name", list(_geometries().keys()))
def test_pruned_max_bitwise_equals_full_pass(name):
    pos = _geometries()[name]
    full = forces.max_pairwise_dist_sq(pos, CFG)
    pruned = forces.max_pairwise_dist_sq_pruned(pos, CFG,
                                                max_candidates=64)
    assert float(full) == float(pruned), (name, float(full), float(pruned))


def test_pruned_max_small_n_dense_path():
    pos, _, _ = galaxy.create_disk_galaxy(jax.random.PRNGKey(1),
                                          num_stars=48)
    full = forces.max_pairwise_dist_sq(pos, CFG)
    pruned = forces.max_pairwise_dist_sq_pruned(pos, CFG,
                                                max_candidates=1024)
    assert float(full) == float(pruned)


def test_pruned_max_fallback_fires_on_shell():
    """The shell geometry must actually take the full-fallback branch
    (admitted > max_candidates) — otherwise the test above is not
    exercising the cond at all."""
    pos = _geometries()["shell"]
    c = jnp.mean(pos, axis=0)
    r = jnp.linalg.norm(pos - c, axis=1)
    r_max = jnp.max(r)
    dirs = forces._diameter_directions(2)
    proj = pos @ dirs.T
    d_lb = jnp.max(jnp.max(proj, axis=0) - jnp.min(proj, axis=0))
    thresh = (d_lb - r_max) * (1.0 - 1e-5) - 1e-6 * r_max
    admitted = int(jnp.sum(r >= thresh))
    assert admitted > 64  # the parametrized test used max_candidates=64


def test_emit_max_matches_separate_pass():
    """Fused in-kernel max (interpret mode): same forces as the plain sym
    call, same max as the dedicated pass."""
    from nbody_tpu.ops.pallas_nbody import (pallas_accelerations_sym,
                                            pallas_max_dist_sq)
    from nbody_tpu.ops.precision import dist_sq_log_bounds

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(2),
                                            num_stars=300)
    q = Quantizer(Precision.INT4_SIM)
    max_d2 = pallas_max_dist_sq(pos, CFG)
    log_lo, log_hi = dist_sq_log_bounds(q, max_d2, CFG.softening_sq)

    plain = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     log_lo=log_lo, log_hi=log_hi)
    fused, fused_max = pallas_accelerations_sym(
        pos, m, q, CFG, block=128, log_lo=log_lo, log_hi=log_hi,
        emit_max=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fused))
    assert float(fused_max) == float(max_d2)


def test_emit_max_requires_int_and_bounds():
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(3),
                                            num_stars=128)
    with pytest.raises(ValueError, match="int-sim"):
        pallas_accelerations_sym(pos, m, Quantizer(Precision.FLOAT32),
                                 CFG, emit_max=True)
    with pytest.raises(ValueError, match="log_lo/log_hi"):
        pallas_accelerations_sym(pos, m, Quantizer(Precision.INT4_SIM),
                                 CFG, emit_max=True)


def test_cached_bounds_tracks_exact():
    """bounds_mode='cached' vs the exact per-step path over a horizon:
    positions stay inside the short-horizon chaos envelope (the grid-hi
    staleness perturbation is bounded by the headroom, far below the int4
    bin width at this scale)."""
    from nbody_tpu.models.direct import run_steps
    from nbody_tpu.models.state import make_state

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(4),
                                            num_stars=192)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.INT4_SIM)

    exact = run_steps(st, q, CFG, "pallas", True, 10)
    cached = run_steps(st, q, CFG, "pallas", True, 10,
                       bounds_mode="cached")
    np.testing.assert_allclose(np.asarray(cached.positions),
                               np.asarray(exact.positions),
                               rtol=5e-3, atol=5e-3)


def test_cached_bounds_guards():
    from nbody_tpu.models.direct import run_steps
    from nbody_tpu.models.state import make_state

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(5),
                                            num_stars=64)
    st = make_state(pos, vel, m)
    with pytest.raises(ValueError, match="int-sim"):
        run_steps(st, Quantizer(Precision.FLOAT32), CFG, "pallas", False,
                  2, bounds_mode="cached")
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_steps(st, Quantizer(Precision.INT4_SIM), CFG, "pallas", True,
                  2, bounds_mode="cached", bounds_every=4)
    with pytest.raises(ValueError, match="cached"):
        run_steps(st, Quantizer(Precision.INT4_SIM), CFG, "dense", True,
                  2, bounds_mode="cached")


def test_cached_bounds_snapshots_path():
    """run_with_snapshots honors bounds_mode='cached' (same carry plumbing
    as run_steps)."""
    from nbody_tpu.models.direct import run_with_snapshots
    from nbody_tpu.models.state import make_state

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(6),
                                            num_stars=192)
    st = make_state(pos, vel, m)
    q = Quantizer(Precision.INT4_SIM)
    _, snaps, frames = run_with_snapshots(st, q, CFG, "pallas", True,
                                          steps_per_chunk=3, num_chunks=2,
                                          bounds_mode="cached")
    assert frames.shape[0] == 2
    assert np.isfinite(np.asarray(frames)).all()
