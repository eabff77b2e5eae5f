"""Native host-side monitor kernels (C extension with Python fallback).

``byte_entropy`` and ``float_census`` are the hot per-tick host probes of
the realtime/glitch layers (see fastent.c for why they are native). The
extension is compiled on first import with the system compiler and cached
next to the source; if anything fails, pure-numpy fallbacks keep every
feature working.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

import numpy as np

logger = logging.getLogger("nbody_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(
    _HERE, f"_fastent{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")

_impl = None


def _build_extension() -> bool:
    """Compile fastent.c into this directory (one .so, no setup.py run)."""
    src = os.path.join(_HERE, "fastent.c")
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CC", "gcc"), "-O3", "-shared", "-fPIC",
        f"-I{include}", src, "-o", _SO_PATH, "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.info("fastent build failed (%s); using numpy fallback", e)
        return False


def _load():
    global _impl
    if _impl is not None:
        return _impl
    if not os.path.exists(_SO_PATH):
        if not _build_extension():
            _impl = False
            return _impl
    try:
        sys.path.insert(0, _HERE)
        import _fastent  # noqa: PLC0415

        _impl = _fastent
    except Exception:  # pragma: no cover
        _impl = False
    finally:
        sys.path.remove(_HERE)
    return _impl


HAS_NATIVE = bool(_load())


def byte_entropy(buf: bytes) -> tuple[float, int]:
    """Shannon entropy in bits/byte + distinct byte count."""
    impl = _load()
    if impl:
        return impl.byte_entropy(buf)
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0
    counts = np.bincount(arr, minlength=256)
    q = counts[counts > 0] / arr.size
    return float(-(q * np.log2(q)).sum()), int((counts > 0).sum())


def float_census(buf: bytes) -> tuple[int, int, int, int, float]:
    """(nan, inf, subnormal, zero, min_nonzero_abs) of a float32 buffer."""
    impl = _load()
    if impl:
        return impl.float_census(buf)
    arr = np.frombuffer(buf, dtype=np.float32)
    bits = arr.view(np.uint32)
    mag = bits & np.uint32(0x7FFFFFFF)
    expo = mag >> 23
    nan = int(((expo == 255) & (mag != 0x7F800000)).sum())
    inf = int((mag == 0x7F800000).sum())
    sub = int(((expo == 0) & (mag != 0)).sum())
    zero = int((mag == 0).sum())
    finite_nonzero = (expo != 255) & (mag != 0)
    min_nonzero = (float(np.abs(arr[finite_nonzero]).min())
                   if finite_nonzero.any() else 0.0)
    return nan, inf, sub, zero, min_nonzero
