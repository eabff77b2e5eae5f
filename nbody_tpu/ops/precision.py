"""Precision ladder: fake-quantization ops that make physics "lossy".

TPU-native re-design of the reference precision core
(reference: quantization.py:10-189). Differences from the reference, by
design rather than accident:

* The quantizer is **data, not control flow**: a frozen, hashable
  ``Quantizer`` dataclass that is passed as a *static* argument to jitted
  step functions, so each precision mode compiles to its own fused XLA
  program (no Python branching inside the hot loop).
* ``float64`` on TPU is emulated (TPU has no f64 ALU). The baseline engine
  uses double-double state + compensated accumulation (see
  ``nbody_tpu.ops.doubledouble``); in this module FLOAT64 simply means
  "no degradation applied".
* The int-sim grid quantizer needs the *global* log-min/log-max of its
  input (reference: quantization.py:110-121 computes them per call). For
  the tiled Pallas kernel that global reduction cannot live inside one
  tile, so every quantize function here accepts optional precomputed
  bounds; the kernel wrapper computes them in a cheap first pass.

All functions are pure ``jnp`` and safe to call inside Pallas kernels.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp


class Precision(enum.Enum):
    """Available precision degradation modes (reference: quantization.py:10-18)."""

    FLOAT64 = "float64"     # emulated extended-precision baseline on TPU
    FLOAT32 = "float32"     # plain f32 (the TPU native compute dtype)
    BFLOAT16 = "bfloat16"   # TPU-native AI dtype: f32 range, 7-bit mantissa
    FLOAT16 = "float16"
    INT8_SIM = "int8_sim"   # simulated 8-bit: 256-level log grid
    INT4_SIM = "int4_sim"   # simulated 4-bit: 16-level log grid
    CUSTOM = "custom"       # user-chosen level count


_INT_MODES = (Precision.INT8_SIM, Precision.INT4_SIM, Precision.CUSTOM)

_ALIASES = {
    "float64": Precision.FLOAT64,
    "f64": Precision.FLOAT64,
    "fp64": Precision.FLOAT64,
    "float32": Precision.FLOAT32,
    "f32": Precision.FLOAT32,
    "fp32": Precision.FLOAT32,
    "bfloat16": Precision.BFLOAT16,
    "bf16": Precision.BFLOAT16,
    "float16": Precision.FLOAT16,
    "fp16": Precision.FLOAT16,
    "f16": Precision.FLOAT16,
    "half": Precision.FLOAT16,
    "int8": Precision.INT8_SIM,
    "int8_sim": Precision.INT8_SIM,
    "int4": Precision.INT4_SIM,
    "int4_sim": Precision.INT4_SIM,
    "custom": Precision.CUSTOM,
}

_DESCRIPTIONS = {
    Precision.FLOAT64: "emulated 64-bit baseline (double-double on TPU)",
    Precision.FLOAT32: "32-bit float (TPU native)",
    Precision.BFLOAT16: "bfloat16 (TPU MXU native, 7-bit mantissa)",
    Precision.FLOAT16: "16-bit float (half precision)",
    Precision.INT8_SIM: "simulated 8-bit (256-level log grid)",
    Precision.INT4_SIM: "simulated 4-bit (16-level log grid)",
    Precision.CUSTOM: "custom quantization level count",
}


def get_mode_from_string(mode_str: str, strict: bool = False) -> Precision:
    """String -> Precision, accepting the reference's aliases
    (reference: quantization.py:160-175). Unknown strings fall back to
    FLOAT64 (reference behavior); strict=True raises instead, for CLI
    surfaces where a typo silently running the slow emulated baseline
    would be misleading."""
    key = mode_str.strip().lower()
    if strict and key not in _ALIASES:
        raise ValueError(
            f"unknown precision mode {mode_str!r}; valid: "
            f"{sorted(set(_ALIASES))}")
    return _ALIASES.get(key, Precision.FLOAT64)


def describe_mode(mode: Precision) -> str:
    """Human-readable mode description (reference: quantization.py:178-189)."""
    return _DESCRIPTIONS.get(mode, "unknown mode")


@dataclasses.dataclass(frozen=True)
class Quantizer:
    """Static description of a precision mode.

    Frozen + hashable, so it can be a ``static_argnums`` argument: jitting a
    step function against two different Quantizers produces two separately
    compiled, fully fused programs.
    """

    mode: Precision = Precision.FLOAT32
    custom_levels: int = 64
    min_dist_sq: float = 0.01  # safety floor (reference: quantization.py:25)

    @classmethod
    def from_string(cls, mode_str: str, custom_levels: int = 64) -> "Quantizer":
        return cls(mode=get_mode_from_string(mode_str), custom_levels=custom_levels)

    @property
    def levels(self) -> int:
        if self.mode == Precision.INT8_SIM:
            return 256
        if self.mode == Precision.INT4_SIM:
            return 16
        if self.mode == Precision.CUSTOM:
            return self.custom_levels or 64
        return 0

    @property
    def is_int(self) -> bool:
        return self.mode in _INT_MODES

    @property
    def is_float_cast(self) -> bool:
        return self.mode in (Precision.BFLOAT16, Precision.FLOAT16)

    @property
    def is_noop(self) -> bool:
        """True when dist^2 passes through numerically unchanged in f32."""
        return self.mode in (Precision.FLOAT64, Precision.FLOAT32)

    def describe(self) -> str:
        return describe_mode(self.mode)


# --------------------------------------------------------------------------
# Float16 round-trip emulation
# --------------------------------------------------------------------------

def f16_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> f16 -> f32 value emulation via integer bit tricks.

    The TPU Mosaic compiler cannot lower an in-kernel f32<->f16 pack
    (tpu.pack_subelements), so the FLOAT16 precision mode emulates the
    IEEE round-trip numerically: round-to-nearest-even of the mantissa to
    10 bits (carry into the exponent handled by integer addition),
    overflow above 65504 -> +/-inf, and |x| below the smallest normal
    (2^-14) snapped onto the f16 subnormal grid (multiples of 2^-24).
    Used for ALL execution paths (dense/tiled/Pallas) so every
    implementation quantizes bit-identically; equivalence with
    ``astype(f16).astype(f32)`` is unit-tested.
    """
    x = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = xi & jnp.uint32(0x80000000)
    mag = xi & jnp.uint32(0x7FFFFFFF)
    absx = jax.lax.bitcast_convert_type(mag, jnp.float32)

    # Normal range: RNE on the low 13 mantissa bits.
    bias = ((mag >> 13) & jnp.uint32(1)) + jnp.uint32(0x0FFF)
    rounded = (mag + bias) & jnp.uint32(0xFFFFE000)
    rounded_abs = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    normal = jax.lax.bitcast_convert_type(rounded | sign, jnp.float32)

    # Subnormal range: snap onto multiples of 2^-24 (RNE via rint).
    sub_step = jnp.float32(2.0 ** -24)
    subnormal = jnp.round(x / sub_step) * sub_step

    inf = jax.lax.bitcast_convert_type(sign | jnp.uint32(0x7F800000),
                                       jnp.float32)

    out = jnp.where(absx < jnp.float32(2.0 ** -14), subnormal, normal)
    # Overflow follows the ROUNDED magnitude (IEEE RNE: values below
    # 65520 round down to 65504; only >= 65520 round past f16 max).
    out = jnp.where(rounded_abs > jnp.float32(65504.0), inf, out)
    return jnp.where(jnp.isnan(x), x, out)


def bf16_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> bf16 -> f32 value emulation via integer RNE rounding.

    A native ``astype(bfloat16).astype(float32)`` round-trip can be
    ELIDED by XLA under ``--xla_allow_excess_precision`` (set by this
    box's TPU terminal), and the elision is not applied uniformly: the
    on-chip parity gate (tools/tpu_parity.py) caught the dense jnp path
    keeping f32 precision while the Mosaic kernel genuinely rounded —
    the bfloat16 precision mode silently meant different physics on
    different paths. The integer emulation (round-to-nearest-even of the
    low 16 mantissa bits; bf16 shares f32's exponent so there is no
    overflow/subnormal boundary to special-case beyond NaN) cannot be
    elided and is bit-identical across dense/tiled/Pallas.
    """
    x = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bias = ((xi >> 16) & jnp.uint32(1)) + jnp.uint32(0x7FFF)
    rounded = (xi + bias) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    # NaN mantissas could carry into the exponent (-> inf); pass through.
    return jnp.where(jnp.isnan(x), x, out)


# --------------------------------------------------------------------------
# Grid quantizers
# --------------------------------------------------------------------------

def grid_quantize(x: jnp.ndarray, levels: int,
                  lo=None, hi=None) -> jnp.ndarray:
    """Linear min/max grid rounding (reference: quantization.py:74-88).

    Degenerate ranges pass through untouched. ``lo``/``hi`` override the
    tensor-global bounds (needed when the op runs on a tile of a larger
    logical tensor).
    """
    lo = jnp.min(x) if lo is None else lo
    hi = jnp.max(x) if hi is None else hi
    span = hi - lo
    safe_span = jnp.where(span < 1e-10, 1.0, span)
    normalized = (x - lo) / safe_span * (levels - 1)
    snapped = jnp.round(normalized) / (levels - 1) * safe_span + lo
    return jnp.where(span < 1e-10, x, snapped)


def grid_quantize_safe(x: jnp.ndarray, levels: int, min_val: float = 0.01,
                       log_lo=None, log_hi=None) -> jnp.ndarray:
    """Log-space grid quantization above a safety floor
    (reference: quantization.py:91-127) — THE "broken math" primitive.

    Clamps to ``min_val`` first so quantization can never produce a
    dangerously small distance (infinite-slingshot protection), then rounds
    ``log(x)`` onto a ``levels``-point uniform grid between the global
    log-min and log-max, and exponentiates back.
    """
    x_safe = jnp.maximum(x, min_val)
    log_x = jnp.log(x_safe)
    log_lo = jnp.min(log_x) if log_lo is None else log_lo
    log_hi = jnp.max(log_x) if log_hi is None else log_hi
    span = log_hi - log_lo
    safe_span = jnp.where(span < 1e-10, 1.0, span)
    normalized = (log_x - log_lo) / safe_span * (levels - 1)
    log_snapped = jnp.round(normalized) / (levels - 1) * safe_span + log_lo
    out = jnp.exp(log_snapped)
    out = jnp.where(span < 1e-10, x_safe, out)
    return jnp.maximum(out, min_val)


# --------------------------------------------------------------------------
# The two public degradation hooks
# --------------------------------------------------------------------------

def quantize_distance_squared(dist_sq: jnp.ndarray, q: Quantizer,
                              log_lo=None, log_hi=None) -> jnp.ndarray:
    """Degrade pairwise distance^2 per the precision mode
    (reference: quantization.py:21-71).

    float64/float32 -> unchanged f32 (f64 baseline handled by the
    double-double engine); bf16/f16 -> round-trip cast; int modes ->
    log-grid quantization with the safety floor. ``log_lo``/``log_hi`` are
    the optional precomputed global log bounds for tiled execution.
    """
    if q.mode == Precision.BFLOAT16:
        return bf16_roundtrip(dist_sq)
    if q.mode == Precision.FLOAT16:
        return f16_roundtrip(dist_sq)
    if q.is_int:
        return grid_quantize_safe(dist_sq, q.levels, q.min_dist_sq,
                                  log_lo=log_lo, log_hi=log_hi)
    return dist_sq


def quantize_force(force: jnp.ndarray, q: Quantizer,
                   lo=None, hi=None) -> jnp.ndarray:
    """Degrade force/acceleration vectors (reference: quantization.py:130-157).

    Int modes use the *linear* grid here (matching the reference, which
    deliberately uses the unsafe variant on forces).
    """
    if q.mode == Precision.BFLOAT16:
        return bf16_roundtrip(force)
    if q.mode == Precision.FLOAT16:
        return f16_roundtrip(force)
    if q.is_int:
        return grid_quantize(force, q.levels, lo=lo, hi=hi)
    return force


def dist_sq_log_bounds(q: Quantizer, max_dist_sq, softening_sq: float) -> tuple:
    """Global log bounds for the dist^2 quantizer in the direct engine.

    The (i, i) diagonal entries of the softened dist^2 matrix equal
    softening^2, which lower-bounds every off-diagonal entry, so the raw
    global minimum is *analytically* softening^2 and after the safety clamp
    it is max(softening^2, min_dist_sq) — no O(N^2) min pass needed. Only
    the global *max* requires a reduction over all pairs (reference
    semantics: quantization.py:112-113 computes both from the full (N, N)
    tensor; here the min is exact by construction).
    """
    # jnp.maximum so a traced (dynamic-sweep) softening also works
    lo = jnp.maximum(jnp.asarray(softening_sq, jnp.float32),
                     jnp.float32(q.min_dist_sq))
    log_lo = jnp.log(lo)
    log_hi = jnp.log(jnp.maximum(max_dist_sq, lo))
    return log_lo, log_hi
