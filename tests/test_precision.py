"""Unit tests for the precision ladder (nbody_tpu.ops.precision).

Validates the quantizer semantics against the reference contract
(reference: quantization.py): safety floor, log-grid level count,
monotonicity, float-cast round trips, alias parsing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops import precision as P


def test_mode_aliases():
    assert P.get_mode_from_string("bf16") == P.Precision.BFLOAT16
    assert P.get_mode_from_string("fp16") == P.Precision.FLOAT16
    assert P.get_mode_from_string("int4") == P.Precision.INT4_SIM
    assert P.get_mode_from_string("int8_sim") == P.Precision.INT8_SIM
    assert P.get_mode_from_string("float64") == P.Precision.FLOAT64
    assert P.get_mode_from_string("unknown-mode") == P.Precision.FLOAT64


def test_quantizer_levels():
    assert P.Quantizer(P.Precision.INT8_SIM).levels == 256
    assert P.Quantizer(P.Precision.INT4_SIM).levels == 16
    assert P.Quantizer(P.Precision.CUSTOM, custom_levels=7).levels == 7
    assert not P.Quantizer(P.Precision.FLOAT32).is_int
    assert P.Quantizer(P.Precision.INT4_SIM).is_int


def test_quantizer_is_static_jit_arg():
    @jax.jit
    def f(x, q):
        return P.quantize_distance_squared(x, q)

    # hashable static arg -> separate traces per mode
    import functools

    g = jax.jit(functools.partial(P.quantize_distance_squared),
                static_argnums=(1,))
    x = jnp.linspace(0.02, 10.0, 64)
    y4 = g(x, P.Quantizer(P.Precision.INT4_SIM))
    y8 = g(x, P.Quantizer(P.Precision.INT8_SIM))
    assert len(np.unique(np.asarray(y4))) <= 16
    assert len(np.unique(np.asarray(y8))) <= 256


def test_float_cast_roundtrip():
    x = jnp.linspace(0.02, 10.0, 1000)
    q_bf = P.Quantizer(P.Precision.BFLOAT16)
    y = P.quantize_distance_squared(x, q_bf)
    assert y.dtype == jnp.float32
    # bf16 has ~3 decimal digits
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-2)
    # must actually lose precision vs f32
    assert not np.allclose(np.asarray(y), np.asarray(x), rtol=1e-6)

    q_f16 = P.Quantizer(P.Precision.FLOAT16)
    y16 = P.quantize_distance_squared(x, q_f16)
    np.testing.assert_allclose(np.asarray(y16), np.asarray(x), rtol=1e-3)


def test_noop_modes_pass_through():
    x = jnp.linspace(0.005, 10.0, 100)
    for mode in (P.Precision.FLOAT64, P.Precision.FLOAT32):
        y = P.quantize_distance_squared(x, P.Quantizer(mode))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_grid_quantize_safe_floor():
    """Quantization must never produce values below the safety floor
    (reference: quantization.py:104-127)."""
    x = jnp.array([1e-6, 0.005, 0.02, 1.0, 100.0])
    y = P.grid_quantize_safe(x, levels=16, min_val=0.01)
    assert float(jnp.min(y)) >= 0.01 - 1e-9


def test_grid_quantize_safe_level_count():
    x = jnp.exp(jax.random.uniform(jax.random.PRNGKey(0), (10000,),
                                   minval=-4.0, maxval=4.0))
    y = P.grid_quantize_safe(x, levels=16, min_val=0.01)
    assert len(np.unique(np.asarray(y))) <= 16
    y256 = P.grid_quantize_safe(x, levels=256, min_val=0.01)
    assert 16 < len(np.unique(np.asarray(y256))) <= 256


def test_grid_quantize_safe_monotone():
    """Log-grid rounding preserves ordering (monotone non-decreasing)."""
    x = jnp.sort(jnp.exp(jax.random.uniform(jax.random.PRNGKey(1), (1000,),
                                            minval=-4.0, maxval=4.0)))
    y = np.asarray(P.grid_quantize_safe(x, levels=16, min_val=0.01))
    assert np.all(np.diff(y) >= -1e-7)


def test_grid_quantize_safe_endpoints_preserved():
    """Global min (after clamp) and max are fixed points of the grid."""
    x = jnp.array([0.01, 0.1, 1.0, 10.0, 250.0])
    y = np.asarray(P.grid_quantize_safe(x, levels=16, min_val=0.01))
    np.testing.assert_allclose(y[0], 0.01, rtol=1e-5)
    np.testing.assert_allclose(y[-1], 250.0, rtol=1e-5)


def test_grid_quantize_safe_degenerate_range():
    x = jnp.full((32,), 5.0)
    y = P.grid_quantize_safe(x, levels=16, min_val=0.01)
    np.testing.assert_allclose(np.asarray(y), 5.0, rtol=1e-6)


def test_grid_quantize_safe_precomputed_bounds_match_global():
    """Tiled execution with precomputed log bounds must equal the
    tensor-global computation (the thing that makes the Pallas kernel
    semantics-preserving)."""
    x = jnp.exp(jax.random.uniform(jax.random.PRNGKey(2), (4096,),
                                   minval=-4.0, maxval=5.0))
    x = jnp.maximum(x, 0.01)
    ref = P.grid_quantize_safe(x, levels=16, min_val=0.01)
    log_x = jnp.log(jnp.maximum(x, 0.01))
    lo, hi = jnp.min(log_x), jnp.max(log_x)
    tiles = [P.grid_quantize_safe(t, levels=16, min_val=0.01,
                                  log_lo=lo, log_hi=hi)
             for t in jnp.split(x, 8)]
    np.testing.assert_allclose(np.asarray(jnp.concatenate(tiles)),
                               np.asarray(ref), rtol=1e-6)


def test_grid_quantize_linear():
    x = jnp.linspace(-5.0, 5.0, 1000)
    y = P.grid_quantize(x, levels=16)
    u = np.unique(np.asarray(y))
    assert len(u) <= 16
    np.testing.assert_allclose(u[0], -5.0, rtol=1e-6)
    np.testing.assert_allclose(u[-1], 5.0, rtol=1e-6)


def test_quantize_force_int_modes_only():
    f = jax.random.normal(jax.random.PRNGKey(3), (128, 2))
    out = P.quantize_force(f, P.Quantizer(P.Precision.FLOAT32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(f))
    out4 = P.quantize_force(f, P.Quantizer(P.Precision.INT4_SIM))
    assert len(np.unique(np.asarray(out4))) <= 16


def test_dist_sq_log_bounds_analytic_min():
    q = P.Quantizer(P.Precision.INT4_SIM)
    lo, hi = P.dist_sq_log_bounds(q, jnp.asarray(400.0), softening_sq=0.01)
    np.testing.assert_allclose(float(lo), np.log(0.01), rtol=1e-4)
    np.testing.assert_allclose(float(hi), np.log(400.0), rtol=1e-4)


def test_f16_roundtrip_emulation_matches_cast():
    """Bit-trick f16 emulation must match astype(f16).astype(f32) across
    normals, subnormals, overflow, and specials."""
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.uniform(-1e4, 1e4, 2000),
        rng.uniform(-1.0, 1.0, 2000),
        rng.uniform(-1e-5, 1e-5, 2000),        # subnormal territory
        rng.uniform(-1e-8, 1e-8, 1000),
        np.array([0.0, -0.0, 65504.0, 65505.0, 65519.0, 65519.9,
                  65520.0, 1e5, -1e5,
                  2.0 ** -14, 2.0 ** -14 * 0.999, 2.0 ** -24, np.inf,
                  -np.inf]),
    ]).astype(np.float32)
    want = vals.astype(np.float16).astype(np.float32)
    got = np.asarray(P.f16_roundtrip(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, want)


def test_bf16_roundtrip_matches_astype():
    """Bit-exact equivalence with the native cast (on CPU, where XLA's
    excess-precision elision does not kick in); the emulation exists
    because on TPU the native round-trip CAN be elided, which the
    on-chip parity gate caught as a cross-path physics difference."""
    from nbody_tpu.ops.precision import bf16_roundtrip

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.standard_normal(4096).astype(np.float32) * 10 ** rng.integers(
            -30, 30, 4096).astype(np.float32),
        np.array([0.0, -0.0, 1e-40, -1e-40, 3.4e38, -3.4e38,
                  np.inf, -np.inf], np.float32),
    ])
    got = np.asarray(bf16_roundtrip(jnp.asarray(vals)))
    want = vals.astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(got, want)
    # NaN passthrough
    assert np.isnan(np.asarray(bf16_roundtrip(jnp.float32(np.nan))))
