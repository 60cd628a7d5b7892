"""ctypes loader for the native C golden model (native/golden.c).

An independent scalar implementation of the fixed-point kernels used to
cross-validate the JAX/Pallas implementations bit-for-bit — the
cross-implementation equivalence pattern of the reference test suite
(SURVEY.md §4.4), without depending on the Rust toolchain.

Builds on first use with cc into ``native/libgolden.so``.
"""

from __future__ import annotations

import ctypes
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def _lib() -> ctypes.CDLL:
    from ._native import load_native

    lib = load_native(
        "golden.c", "libgolden.so",
        ("-O2", "-fwrapv", "-shared", "-fPIC"), ("-lm",),
    )
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.golden_cossin.argtypes = [i32p, i32p, i32p, ctypes.c_int64]
    lib.golden_atan2.argtypes = [i32p, i32p, i32p, ctypes.c_int64]
    lib.golden_biquad_df1_q.argtypes = [
        i32p, ctypes.c_int, i32p, i32p, i32p, ctypes.c_int64,
    ]
    lib.golden_biquad_df1_wide.argtypes = [
        i32p, ctypes.c_int, i32p, i64p, i32p, i32p, ctypes.c_int64,
    ]
    lib.golden_biquad_df1_dither.argtypes = [
        i32p, ctypes.c_int, i32p, u32p, i32p, i32p, ctypes.c_int64,
    ]
    lib.golden_q_mul.argtypes = [i32p, i32p, ctypes.c_int, i32p, ctypes.c_int64]
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.golden_biquad_df1_clamp.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p, ctypes.c_int64,
    ]
    lib.golden_biquad_df1_q16.argtypes = [
        i16p, ctypes.c_int, i16p, i16p, i16p, ctypes.c_int64,
    ]
    lib.golden_biquad_df1_q64.argtypes = [
        i64p, ctypes.c_int, i64p, i64p, i64p, ctypes.c_int64,
    ]
    lib.golden_pll.argtypes = [i32p, i32p, i64p, i32p, i32p, ctypes.c_int64]
    lib.golden_normal_q.argtypes = [
        i32p, i32p, ctypes.c_int, i32p, i32p, i32p, ctypes.c_int64,
    ]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.golden_rpll.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, i32p, u8p,
        i32p, i32p, ctypes.c_int64,
    ]
    return lib


def _as_i32(x):
    return np.ascontiguousarray(x, dtype=np.int32)


def _ptr(a, typ=ctypes.c_int32):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def cossin(phase):
    phase = _as_i32(phase)
    c = np.empty_like(phase)
    s = np.empty_like(phase)
    _lib().golden_cossin(_ptr(phase), _ptr(c), _ptr(s), phase.size)
    return c, s


def atan2(y, x):
    y = _as_i32(y)
    x = _as_i32(x)
    out = np.empty_like(y)
    _lib().golden_atan2(_ptr(y), _ptr(x), _ptr(out), y.size)
    return out


def biquad_df1_q(ba, f, state, x):
    """state: int32[4] = [x1, x2, y1, y2], mutated in place."""
    ba = _as_i32(ba)
    state = _as_i32(state)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_q(_ptr(ba), f, _ptr(state), _ptr(x), _ptr(y), x.size)
    return state, y


def biquad_df1_wide(ba, f, x_state, y_state, x):
    ba = _as_i32(ba)
    xs = _as_i32(x_state)
    ys = np.ascontiguousarray(y_state, dtype=np.int64)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_wide(
        _ptr(ba), f, _ptr(xs), _ptr(ys, ctypes.c_int64), _ptr(x), _ptr(y), x.size
    )
    return xs, ys, y


def biquad_df1_dither(ba, f, state, e, x):
    ba = _as_i32(ba)
    state = _as_i32(state)
    e_arr = np.ascontiguousarray([e], dtype=np.uint32)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_dither(
        _ptr(ba), f, _ptr(state), _ptr(e_arr, ctypes.c_uint32), _ptr(x),
        _ptr(y), x.size,
    )
    return state, np.uint32(e_arr[0]), y


def q_mul(a, b, f):
    a = _as_i32(a)
    b = _as_i32(np.broadcast_to(b, a.shape))
    out = np.empty_like(a)
    _lib().golden_q_mul(_ptr(a), _ptr(b), f, _ptr(out), a.size)
    return out


def biquad_df1_clamp(ba, f, u, lo, hi, state, x):
    """Clamped DF1 (biquad.rs:394-404); state int32[4] mutated in place."""
    ba = _as_i32(ba)
    state = _as_i32(state)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_clamp(
        _ptr(ba), f, int(u), int(lo), int(hi), _ptr(state), _ptr(x),
        _ptr(y), x.size,
    )
    return state, y


def biquad_df1_q16(ba, f, state, x):
    """Q16<13>-class DF1: i16 storage, i32 accumulator."""
    ba = np.ascontiguousarray(ba, dtype=np.int16)
    state = np.ascontiguousarray(state, dtype=np.int16)
    x = np.ascontiguousarray(x, dtype=np.int16)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_q16(
        _ptr(ba, ctypes.c_int16), f, _ptr(state, ctypes.c_int16),
        _ptr(x, ctypes.c_int16), _ptr(y, ctypes.c_int16), x.size,
    )
    return state, y


def biquad_df1_q64(ba, f, state, x):
    """Q64<61>-class DF1: i64 storage, i128 accumulator."""
    ba = np.ascontiguousarray(ba, dtype=np.int64)
    state = np.ascontiguousarray(state, dtype=np.int64)
    x = np.ascontiguousarray(x, dtype=np.int64)
    y = np.empty_like(x)
    _lib().golden_biquad_df1_q64(
        _ptr(ba, ctypes.c_int64), f, _ptr(state, ctypes.c_int64),
        _ptr(x, ctypes.c_int64), _ptr(y, ctypes.c_int64), x.size,
    )
    return state, y


def normal_q(b, p, f, state, x):
    """Normal-form (Rader-Gold) SOS; state int32[4] = [x1, x2, y0, y1],
    mutated in place."""
    b = _as_i32(b)
    p = _as_i32(p)
    state = _as_i32(state)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_normal_q(
        _ptr(b), _ptr(p), int(f), _ptr(state), _ptr(x), _ptr(y), x.size
    )
    return state, y


def rpll(dt2, sf, sp, state, x, valid):
    """RPLL masked-timestamp loop; state int32[4] = [x_prev, ff, f, y]
    (ff/f as u32 bit patterns), mutated in place.  Returns
    (state, phase, frequency)."""
    state = _as_i32(state)
    x = _as_i32(x)
    valid = np.ascontiguousarray(valid, dtype=np.uint8)
    phase = np.empty_like(x)
    freq = np.empty_like(x)
    _lib().golden_rpll(
        int(dt2), int(sf), int(sp), _ptr(state), _ptr(x),
        _ptr(valid, ctypes.c_uint8), _ptr(phase), _ptr(freq), x.size,
    )
    return state, phase, freq


def pll(ba, st32, st64, x):
    """PLL update chain (pll.rs:90-107).

    st32: int32[5] = [clamp_x0, clamp_state, z0, y0, y]; st64: int64[2]
    = [f0, f]. Both mutated in place.
    """
    ba = _as_i32(ba)
    st32 = _as_i32(st32)
    st64 = np.ascontiguousarray(st64, dtype=np.int64)
    x = _as_i32(x)
    y = np.empty_like(x)
    _lib().golden_pll(
        _ptr(ba), _ptr(st32), _ptr(st64, ctypes.c_int64), _ptr(x), _ptr(y),
        x.size,
    )
    return st32, st64, y
