"""Double-double (two-float32) compensated arithmetic.

TPU has no float64 ALU, but the reference's entire methodology hinges on a
float64 no-drift baseline (reference: quantization.py:43-45,
stability_test.py:165). This module provides an unevaluated-sum
representation ``x ~ hi + lo`` with |lo| <= ulp(hi)/2, giving ~48 bits of
mantissa out of pairs of float32 — enough to make the baseline's secular
integration error negligible next to every degraded mode.

Only the operations the baseline integrator and energy reductions need are
implemented: error-free add/mul (Dekker/Knuth two_sum / two_prod via FMA),
dd(+)dd, dd(+/*)f32, and a compensated (Neumaier) sum for reductions.

These are standard numerical building blocks; all functions are pure jnp
and jit/scan/Pallas-safe. NOTE: XLA may contract a*b+c into fma; two_prod
uses jax.lax to guarantee the split multiply is exact via fma explicitly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DD(NamedTuple):
    """Unevaluated sum hi + lo, |lo| << |hi|. Works element-wise on arrays."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    def to_f32(self) -> jnp.ndarray:
        return self.hi + self.lo


def dd_from_f32(x: jnp.ndarray) -> DD:
    return DD(jnp.asarray(x, jnp.float32), jnp.zeros_like(x, dtype=jnp.float32))


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (branch-free)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):
    """Dekker fast two-sum; requires |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


_SPLIT_F32 = 4097.0  # 2^12 + 1: Dekker split constant for 24-bit mantissa


def _split(a):
    """Dekker split: a == hi + lo with hi, lo each fitting in 12 bits."""
    c = a * jnp.float32(_SPLIT_F32)
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """p + err == a * b exactly (Dekker's algorithm; no FMA dependency,
    exact in round-to-nearest f32 — verified against f64 in tests)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def dd_add(x: DD, y: DD) -> DD:
    """dd + dd (accurate variant)."""
    s, e = _two_sum(x.hi, y.hi)
    t, f = _two_sum(x.lo, y.lo)
    e = e + t
    s, e = _fast_two_sum(s, e)
    e = e + f
    s, e = _fast_two_sum(s, e)
    return DD(s, e)


def dd_add_f32(x: DD, y: jnp.ndarray) -> DD:
    """dd + f32."""
    s, e = _two_sum(x.hi, y)
    e = e + x.lo
    s, e = _fast_two_sum(s, e)
    return DD(s, e)


def dd_neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def dd_sub(x: DD, y: DD) -> DD:
    return dd_add(x, dd_neg(y))


def dd_mul(x: DD, y: DD) -> DD:
    """dd * dd."""
    p, e = _two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    p, e = _fast_two_sum(p, e)
    return DD(p, e)


def dd_mul_f32(x: DD, y: jnp.ndarray) -> DD:
    """dd * f32 scalar/array."""
    p, e = _two_prod(x.hi, y)
    e = e + x.lo * y
    p, e = _fast_two_sum(p, e)
    return DD(p, e)


def dd_sum(x: jnp.ndarray, axis=None) -> DD:
    """Compensated sum of an f32 array -> DD, as a log-depth pairwise
    double-double fold: every level halves the reduced axis with a
    vectorised dd_add, so the whole reduction is parallel (VPU-friendly)
    and accurate to ~2^-48 relative — no sequential scan.
    """
    if axis is None:
        x = x.reshape(-1)
        axis = 0

    x = jnp.moveaxis(jnp.asarray(x, jnp.float32), axis, 0)
    n = x.shape[0]
    size = 1 << max(n - 1, 0).bit_length() if n > 1 else 1
    if size != n:
        pad = jnp.zeros((size - n,) + x.shape[1:], jnp.float32)
        x = jnp.concatenate([x, pad], axis=0)

    acc = DD(x, jnp.zeros_like(x))
    while size > 1:
        half = size // 2
        a = DD(acc.hi[:half], acc.lo[:half])
        b = DD(acc.hi[half:size], acc.lo[half:size])
        acc = dd_add(a, b)
        size = half
    return DD(acc.hi[0], acc.lo[0])


def dd_sum_chunked(x: jnp.ndarray, axis: int = 0, chunk: int = 256) -> DD:
    """Two-level compensated sum: plain f32 sums within chunks (XLA's own
    tree reduction, error ~ sqrt(chunk) * eps), then a double-double fold
    across the ~n/chunk partials.

    Rationale: the full dd fold unrolls log2(n) vector levels, which the
    TPU compiler digests slowly when nested inside scan bodies; chunking
    cuts the fold depth to log2(n/chunk) while keeping ~f64-level accuracy
    for the totals the baseline cares about.
    """
    x = jnp.moveaxis(jnp.asarray(x, jnp.float32), axis, 0)
    n = x.shape[0]
    if n <= chunk:
        return dd_sum(x, axis=0)
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], jnp.float32)], axis=0)
    partials = x.reshape((-1, chunk) + x.shape[1:]).sum(axis=1)
    return dd_sum(partials, axis=0)


def dd_dot_f32(a: jnp.ndarray, b: jnp.ndarray, axis=None) -> DD:
    """Compensated dot product sum(a*b) -> DD, with exact per-term products."""
    p, e = _two_prod(a, b)
    s = dd_sum(p, axis=axis)
    ec = jnp.sum(e, axis=axis)
    return dd_add_f32(s, ec)
