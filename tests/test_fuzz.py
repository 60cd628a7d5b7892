"""Property-based full-range fuzzing of the fixed-point kernels against
the native C golden model — the hypothesis analog of the reference's
quickcheck properties (cic.rs:210-301, cordic.rs:247-277)."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from idsp_tpu import fxp, golden
from idsp_tpu.filters import biquad

_i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


def _i32_arrays(n=64):
    return st.lists(_i32, min_size=1, max_size=n).map(
        lambda v: np.asarray(v, np.int64).astype(np.int32)
    )


@settings(max_examples=30, deadline=None)
@given(a=_i32_arrays(), b=_i32, f=st.integers(min_value=0, max_value=31))
def test_q_mul_matches_golden(a, b, f):
    b_arr = np.full_like(a, np.int64(b).astype(np.int32))
    got = np.asarray(fxp.q_mul(jnp.asarray(a), jnp.asarray(b_arr), f))
    want = golden.q_mul(a, b_arr, f)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    a=_i32,
    b=_i32.filter(lambda v: v != 0),
    f=st.integers(min_value=0, max_value=15),
)
def test_q_div_truncates_like_c(a, b, f):
    """q_div == C's truncating (a << f) / b on the widened type."""
    got = int(fxp.q_div(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
                        f))
    num = a << f  # exact in Python ints
    q = abs(num) // abs(b)
    if (num < 0) != (b < 0):
        q = -q
    want = int(np.int64(q).astype(np.int32))  # down-cast wraps
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    ba=st.lists(_i32, min_size=5, max_size=5),
    f=st.integers(min_value=1, max_value=31),
    xs=_i32_arrays(128),
    st0=st.lists(_i32, min_size=4, max_size=4),
)
def test_df1_q_matches_golden(ba, f, xs, st0):
    ba = np.asarray(ba, np.int64).astype(np.int32)
    st_arr = np.asarray(st0, np.int64).astype(np.int32)
    st_j = biquad.Df1State(
        x=jnp.asarray(st_arr[:2]), y=jnp.asarray(st_arr[2:])
    )
    _, yj = biquad.df1_process_q(jnp.asarray(ba), f, st_j, jnp.asarray(xs))
    _, yg = golden.biquad_df1_q(ba, f, st_arr.copy(), xs)
    np.testing.assert_array_equal(np.asarray(yj), yg)


@settings(max_examples=25, deadline=None)
@given(phases=_i32_arrays(256))
def test_cossin_matches_golden(phases):
    from idsp_tpu.ops import trig

    cj, sj = trig.cossin(jnp.asarray(phases))
    cg, sg = golden.cossin(phases)
    np.testing.assert_array_equal(np.asarray(cj), cg)
    np.testing.assert_array_equal(np.asarray(sj), sg)


@settings(max_examples=25, deadline=None)
@given(y=_i32_arrays(256), seed=st.integers(0, 2**31 - 1))
def test_atan2_matches_golden(y, seed):
    from idsp_tpu.ops import trig

    rng = np.random.default_rng(seed)
    x = rng.integers(-(2**31), 2**31, size=y.shape, dtype=np.int64).astype(
        np.int32
    )
    rj = trig.atan2(jnp.asarray(y), jnp.asarray(x))
    rg = golden.atan2(y, x)
    np.testing.assert_array_equal(np.asarray(rj), rg)


@settings(max_examples=15, deadline=None)
@given(
    xs=_i32_arrays(128),
    seed=st.integers(0, 2**31 - 1),
)
def test_pll_matches_golden(xs, seed):
    from idsp_tpu.filters import pll

    rng = np.random.default_rng(seed)
    bw = float(rng.uniform(1e-4, 5e-2))
    pba = pll.coefficients_from_bandwidth(bw, 4.0)
    st0 = pll.init(())
    _, yj = pll.block(jnp.asarray(pba), st0, jnp.asarray(xs))
    _, _, yg = golden.pll(pba, np.zeros(5, np.int32), np.zeros(2, np.int64),
                          xs)
    np.testing.assert_array_equal(np.asarray(yj), yg)


@given(
    st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=32),
    st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=32),
    st.sampled_from([0, 1, 13, 29, 61, 63, 64, 80, 127, -3]),
)
@settings(max_examples=60, deadline=None)
def test_q_mul_i64_matches_bigint(a, b, f):
    # int64 q_mul uses the limb-emulated 128-bit product; Python's
    # arbitrary-precision ints are the oracle (>> floors == arithmetic
    # shift; low 64 bits reinterpreted signed).
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    av = jnp.asarray(np.array(a, dtype=np.int64))
    bv = jnp.asarray(np.array(b, dtype=np.int64))
    have = np.asarray(fxp.q_mul(av, bv, f, dtype=jnp.int64))
    for i in range(n):
        p = a[i] * b[i]
        sh = (p >> f) if f >= 0 else (p << -f)
        want = ((sh & ((1 << 64) - 1)) ^ (1 << 63)) - (1 << 63)
        assert int(have[i]) == want, (a[i], b[i], f, int(have[i]), want)


def test_widen_dtype_int64_documented_rejection():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fxp.widen_dtype(jnp.int64)
    with _pytest.raises(NotImplementedError):
        fxp.q_div(
            jnp.asarray([1], jnp.int64), jnp.asarray([2], jnp.int64), 3,
            dtype=jnp.int64,
        )
    # f_rhs <= 0 stays in the base width and works.
    out = fxp.q_div(
        jnp.asarray([-7 << 10], jnp.int64), jnp.asarray([3], jnp.int64),
        0, dtype=jnp.int64,
    )
    assert int(out[0]) == -((7 << 10) // 3) - (1 if (7 << 10) % 3 else 0) + 1


def test_mul_wide_i64_accumulate_quantize():
    # The accumulate-then-quantize MAC pattern must work for int64:
    # mul_wide returns an I128 whose `+` is the carry-propagating limb
    # add (a bare tuple would silently concatenate).
    a = jnp.asarray([0x7FFF_FFFF_FFFF_0001, -3], jnp.int64)
    b = jnp.asarray([0x6EDC_BA98_7654_3210, 5], jnp.int64)
    acc = fxp.mul_wide(a, b, dtype=jnp.int64) + fxp.mul_wide(
        b, a, dtype=jnp.int64
    )
    got = np.asarray(fxp.quantize(acc, 61, dtype=jnp.int64))
    for i in range(2):
        p = 2 * int(a[i]) * int(b[i])
        want = ((p >> 61) & ((1 << 64) - 1) ^ (1 << 63)) - (1 << 63)
        assert int(got[i]) == want
    # sum() over a list starts at 0 — the I128 __radd__ absorbs it
    acc2 = sum(
        [fxp.mul_wide(a, b, dtype=jnp.int64)] * 3
    )
    got2 = np.asarray(fxp.quantize(acc2, 61, dtype=jnp.int64))
    for i in range(2):
        p = 3 * int(a[i]) * int(b[i])
        want = ((p >> 61) & ((1 << 64) - 1) ^ (1 << 63)) - (1 << 63)
        assert int(got2[i]) == want


def test_i128_pytree_and_subtraction():
    # I128 crosses jit boundaries (registered pytree) and supports the
    # subtracting MAC pattern (complex.mul_q's `ar - ai`).
    import jax as _jax

    a = jnp.asarray([0x7FFF_FFFF_FFFF_0001, -3], jnp.int64)
    b = jnp.asarray([0x6EDC_BA98_7654_3210, 5], jnp.int64)
    acc = _jax.jit(lambda a, b: fxp.mul_wide(a, b, dtype=jnp.int64))(a, b)
    assert isinstance(acc, fxp.I128)
    d = fxp.mul_wide(a, b, dtype=jnp.int64) - fxp.mul_wide(
        b, b, dtype=jnp.int64
    )
    got = np.asarray(fxp.quantize(d, 61, dtype=jnp.int64))
    for i in range(2):
        p = int(a[i]) * int(b[i]) - int(b[i]) * int(b[i])
        want = ((p >> 61) & ((1 << 64) - 1) ^ (1 << 63)) - (1 << 63)
        assert int(got[i]) == want
    # int64 complex late-quantize multiply end to end
    from idsp_tpu.ops import complex as cplx

    re, im = cplx.mul_q(
        jnp.asarray([1 << 40], jnp.int64),
        jnp.asarray([-(1 << 39)], jnp.int64),
        jnp.asarray([1 << 20], jnp.int64),
        jnp.asarray([1 << 19], jnp.int64),
        61, dtype=jnp.int64,
    )
    pr = (1 << 60) + (1 << 58)
    pi = (1 << 59) - (1 << 59)
    assert int(re[0]) == (pr >> 61) and int(im[0]) == (pi >> 61)
