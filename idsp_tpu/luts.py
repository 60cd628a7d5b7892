"""Build-time lookup tables, regenerated in Python.

The reference generates these in `build.rs` (reference build.rs:8-119) at
compile time; here they are computed once at import with float64 host math
and cached as numpy arrays (wrapped to jnp device constants by the
kernels that gather from them).

* cossin midpoint LUT: 128 entries, packed u32 = cos-excess u16 | sin u16
  (build.rs:8-41).
* atan2 reciprocal seed LUT: 16 (base u32, slope i32) pairs
  (build.rs:43-67).
* CORDIC atan/atanh tables and gains (build.rs:69-119).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

COSSIN_DEPTH = 7
ATAN2_DIVI_DEPTH = 4
CORDIC_DEPTH = 30


def _round(x: float) -> int:
    """Rust f64::round: half away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


@lru_cache(maxsize=None)
def cossin_table() -> np.ndarray:
    """128-entry packed cos/sin midpoint LUT (build.rs:8-41).

    Entries sample (i + 0.5)/2^DEPTH of the first octant [0, pi/4).
    cos gets one extra bit of accuracy via the excess-(2^16) encoding
    (0.5 < cos <= 1 on the octant): stored value is
    round((cos*2 - 1)*65535 - 1); sin is round(sin*65535).
    """
    amplitude = float(np.iinfo(np.uint16).max)  # 65535
    n = 1 << COSSIN_DEPTH
    out = np.empty(n, dtype=np.uint32)
    for i in range(n):
        z = math.pi / 4.0 * ((i + 0.5) / n)
        c = _round((math.cos(z) * 2.0 - 1.0) * amplitude - 1.0)
        s = _round(math.sin(z) * amplitude)
        out[i] = np.uint32(c) + (np.uint32(s) << np.uint32(16))
    return out


@lru_cache(maxsize=None)
def atan2_divi_table() -> tuple[np.ndarray, np.ndarray]:
    """16-entry reciprocal seed (base, slope) LUT for the atan2 divider
    (build.rs:43-67). base = round(2^31/x0) as u32, slope = the first
    difference of the reciprocal scaled to Q31, as i32."""
    q31 = float(1 << 31)
    n = 1 << ATAN2_DIVI_DEPTH
    base = np.empty(n, dtype=np.uint32)
    slope = np.empty(n, dtype=np.int32)
    for i in range(n):
        x0 = 1.0 + i / n
        x1 = 1.0 + (i + 1) / n
        base[i] = np.uint32(_round(q31 / x0))
        slope[i] = np.int32(_round((1.0 / x1 - 1.0 / x0) * q31))
    return base, slope


@lru_cache(maxsize=None)
def cordic_circular_table() -> np.ndarray:
    """30-entry atan(2^-i)/pi in Q31 (build.rs:76-90)."""
    q31 = float(1 << 31)
    vals = [
        _round(math.atan(0.5 ** i) / math.pi * q31) for i in range(CORDIC_DEPTH)
    ]
    # `as i64 as i32` wrap in the generator (atan(1)/pi*2^31 = 2^29, fits)
    return np.array(vals, dtype=np.int64).astype(np.int32)


@lru_cache(maxsize=None)
def cordic_circular_gain() -> float:
    """prod sqrt(1 + 4^-i) over the iteration schedule (build.rs:77-82)."""
    f = 1.0
    for i in range(CORDIC_DEPTH):
        f *= math.sqrt(1.0 + 0.25 ** i)
    return f


@lru_cache(maxsize=None)
def cordic_hyperbolic_table() -> np.ndarray:
    """30-entry atanh(2^-(i+1)) in Q31 (build.rs:111-118)."""
    q31 = float(1 << 31)
    vals = [
        _round(math.atanh(0.5 ** (i + 1)) * q31) for i in range(CORDIC_DEPTH)
    ]
    return np.array(vals, dtype=np.int64).astype(np.int32)


@lru_cache(maxsize=None)
def cordic_hyperbolic_gain() -> float:
    """Hyperbolic-mode gain with the k -> 3k+1 repeat schedule
    (build.rs:92-110)."""
    f = 1.0
    k = 4
    for i in range(1, CORDIC_DEPTH):
        r = 1
        if i == k:
            k = 3 * i + 1
            r = 2
        for _ in range(r):
            f *= math.sqrt(1.0 - 0.25 ** i)
    return f
