"""Unit tests for double-double arithmetic (nbody_tpu.ops.doubledouble)."""

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops import doubledouble as dd


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-9)
    s = dd.dd_add_f32(dd.dd_from_f32(a), b)
    # hi + lo recovers the f64 sum far beyond f32 precision
    assert abs((float(s.hi) + float(s.lo)) - (1.0 + 1e-9)) < 1e-15


def test_dd_sum_beats_naive():
    """Compensated sum of many small terms must be ~f64-accurate where the
    naive f32 sum visibly drifts."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0.0, 1.0, size=200_000).astype(np.float32)
    exact = np.sum(x.astype(np.float64))
    naive = float(jnp.sum(jnp.asarray(x)))
    comp = dd.dd_sum(jnp.asarray(x))
    comp_val = float(comp.hi) + float(comp.lo)
    assert abs(comp_val - exact) < abs(naive - exact) / 10 + 1e-6
    assert abs(comp_val - exact) / abs(exact) < 1e-7


def test_dd_mul_accuracy():
    a = dd.dd_from_f32(jnp.float32(np.pi))
    b = dd.dd_from_f32(jnp.float32(np.e))
    p = dd.dd_mul(a, b)
    got = float(p.hi) + float(p.lo)
    want = float(np.float32(np.pi)) * float(np.float32(np.e))
    assert abs(got - want) < 1e-13


def test_dd_integration_drift():
    """Integrating x += v*dt 10_000 times with dt tiny: dd keeps ~f64
    accuracy, f32 loses it."""
    dt = np.float32(1e-4)
    v = np.float32(1.0)
    n = 10_000

    def body(carry, _):
        x_dd, x_f32 = carry
        x_dd = dd.dd_add_f32(x_dd, v * dt)
        x_f32 = x_f32 + v * dt
        return (x_dd, x_f32), None

    (x_dd, x_f32), _ = jax.lax.scan(
        body, (dd.dd_from_f32(jnp.float32(0.0)), jnp.float32(0.0)),
        None, length=n)
    exact = float(v) * float(dt) * n
    dd_val = float(x_dd.hi) + float(x_dd.lo)
    assert abs(dd_val - exact) < 1e-9
    assert abs(float(x_f32) - exact) > 1e-6  # f32 visibly drifts


def test_dd_dot():
    rng = np.random.default_rng(1)
    a = rng.normal(size=4096).astype(np.float32)
    b = rng.normal(size=4096).astype(np.float32)
    exact = np.dot(a.astype(np.float64), b.astype(np.float64))
    s = dd.dd_dot_f32(jnp.asarray(a), jnp.asarray(b))
    got = float(s.hi) + float(s.lo)
    assert abs(got - exact) / (abs(exact) + 1e-9) < 1e-6


def test_dd_sum_axis():
    x = jnp.arange(24, dtype=jnp.float32).reshape(4, 6)
    s = dd.dd_sum(x, axis=1)
    np.testing.assert_allclose(np.asarray(s.hi + s.lo),
                               np.asarray(jnp.sum(x, axis=1)), rtol=1e-7)
    s0 = dd.dd_sum(x, axis=0)
    assert s0.hi.shape == (6,)
