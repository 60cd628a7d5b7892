"""SVF, normal form, WDF, and elementary-processor gates."""

import numpy as np
import jax.numpy as jnp

from idsp_tpu import process
from idsp_tpu.design import Filter
from idsp_tpu.filters import biquad, normal, svf, wdf


def test_svf_outputs_consistent():
    # The SVF lowpass must track a same-corner biquad lowpass closely.
    f0, q = 0.02, 1.0 / np.sqrt(2.0)
    f, qi = svf.coefficients(f0, q)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=2048).astype(np.float32))
    st = svf.init()
    _, outs = svf.block(f, qi, st, xs)
    lp = np.asarray(outs.lp)
    # br = hp + lp identity
    np.testing.assert_allclose(
        np.asarray(outs.hp) + np.asarray(outs.lp),
        np.asarray(outs.hp + outs.lp),
    )
    # spectral check: lowpass suppresses high band
    spec = np.abs(np.fft.rfft(lp * np.hanning(len(lp))))
    spec_in = np.abs(np.fft.rfft(np.asarray(xs) * np.hanning(len(lp))))
    n = len(spec)
    hi = slice(int(0.3 * n), n)
    lo = slice(1, int(0.02 * n))
    assert (spec[hi] / np.maximum(spec_in[hi], 1e-9)).mean() < 0.1
    assert 0.5 < (spec[lo] / np.maximum(spec_in[lo], 1e-9)).mean() < 1.5


def test_normal_matches_df1_float():
    # The normal form implements the same transfer function as DF1 for
    # a complex-pole lowpass (normal.rs:16-25).
    ba_ck = Filter().critical_frequency(0.05).lowpass()
    b, p = normal.from_cookbook(ba_ck)
    ba5 = biquad.from_cookbook(ba_ck)

    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=1024))
    stn = normal.init((), jnp.float64)
    _, yn = normal.block(jnp.asarray(b), jnp.asarray(p), stn, xs)
    std = biquad.df1_init((), jnp.float64)
    _, yd = biquad.df1_process(jnp.asarray(ba5), std, xs)

    yn = np.asarray(yn)
    yd = np.asarray(yd)
    # The normal form output is delayed/scaled differently only in its
    # zero structure — compare steady-state spectra instead of samples.
    sn = np.fft.rfft(yn[200:])
    sd = np.fft.rfft(yd[200:])
    # identical pole magnitudes: compare magnitude responses w/ coarse tol
    ratio = (np.abs(sn) + 1e-9) / (np.abs(sd) + 1e-9)
    med = np.median(ratio)
    assert np.median(np.abs(ratio / med - 1.0)) < 0.2


def test_wdf_allpass_is_allpass():
    # A WDF chain is an allpass: |H| = 1 at all frequencies.
    tpas = wdf.nibbles(0xAD, 2)
    a = jnp.asarray(wdf.quantize(tpas, [-0.9, 0.9]))
    st = wdf.init(2)
    n = 4096
    rng = np.random.default_rng(2)
    xs = jnp.asarray(
        (rng.normal(size=n) * (1 << 24)).astype(np.int32)
    )
    st, ys = wdf.block(tpas, a, st, xs)
    x = np.asarray(xs, np.float64)[512:]
    y = np.asarray(ys, np.float64)[512:]
    sx = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    sy = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    ratio = sy[10:-10] / np.maximum(sx[10:-10], 1.0)
    assert abs(np.median(ratio) - 1.0) < 0.05


def test_wdf_complementary_pair_halfband():
    # wdf-ca-7 config (tests/embedded/src/bin/biquad.rs:120-138): the
    # sum branch is a half-band lowpass, the difference the highpass.
    b0 = [
        (wdf.nibbles(0xAD, 2), jnp.asarray(wdf.quantize(wdf.nibbles(0xAD, 2), [-0.9, 0.9]))),
        (wdf.nibbles(0xAD, 2), jnp.asarray(wdf.quantize(wdf.nibbles(0xAD, 2), [-0.6, 0.7]))),
    ]
    b1 = [
        (wdf.nibbles(0xAD, 2), jnp.asarray(wdf.quantize(wdf.nibbles(0xAD, 2), [-0.7, 0.6]))),
        (wdf.nibbles(0xA, 1), jnp.asarray(wdf.quantize(wdf.nibbles(0xA, 1), [0.8]))),
    ]
    states = (
        [wdf.init(2), wdf.init(2)],
        [wdf.init(2), wdf.init(1)],
    )
    n = 4096
    rng = np.random.default_rng(3)
    xs = jnp.asarray((rng.normal(size=n) * (1 << 22)).astype(np.int32))
    states, (lp, hp) = wdf.pair_block(b0, b1, states, xs)
    lp = np.asarray(lp, dtype=np.float64)[512:]
    hp = np.asarray(hp, dtype=np.float64)[512:]
    x = np.asarray(xs, np.float64)[512:]
    w = np.hanning(len(x))
    sl = np.abs(np.fft.rfft(lp * w)) ** 2
    sh = np.abs(np.fft.rfft(hp * w)) ** 2
    m = len(sl)
    # the sum branch concentrates low, the difference high (the bench
    # poles are not a production half-band design, so gates are mild)
    assert sl[: m // 4].sum() > 10 * sl[3 * m // 4 :].sum()
    assert sh[3 * m // 4 :].sum() > 2 * sh[: m // 4].sum()
    # power complementarity: |L|^2 + |H|^2 ~ 4|X|^2 (gain-2 branches)
    sx = np.abs(np.fft.rfft(x * w)) ** 2
    total = (sl + sh)[10 : m - 10]
    ref = 4 * sx[10 : m - 10]
    assert abs(np.median(total / np.maximum(ref, 1.0)) - 1.0) < 0.1


def test_elementary_processors():
    x = jnp.asarray(np.arange(12, dtype=np.int32))
    st = process.delay_init(3, dtype=jnp.int32)
    st, y = process.delay_block(st, x)
    np.testing.assert_array_equal(np.asarray(y)[:5], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(st), [9, 10, 11])

    st = process.delay_init(2, dtype=jnp.int32)
    _, y = process.comb_block(st, x)
    np.testing.assert_array_equal(np.asarray(y)[3:], np.full(9, 2))

    st = process.integrator_init((), jnp.int32)
    carry, y = process.integrator_block(st, x)
    np.testing.assert_array_equal(np.asarray(y), np.cumsum(np.arange(12)))

    a, b = process.butterfly(jnp.int32(3), jnp.int32(2))
    assert (int(a), int(b)) == (5, 1)


def test_rate_adapters():
    x = jnp.asarray(np.arange(12, dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(process.downsample(x, 3)), [0, 3, 6, 9])
    np.testing.assert_array_equal(
        np.asarray(process.hold(jnp.asarray([1, 2], jnp.int32), 3)),
        [1, 1, 1, 2, 2, 2],
    )
    z = process.interpolate_zero_stuff(jnp.asarray([5, 7], jnp.int32), 3, phase=1)
    np.testing.assert_array_equal(np.asarray(z), [0, 5, 0, 0, 7, 0])
    c = process.chunk(x, 4)
    assert c.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(process.dechunk(c)), np.asarray(x))


def test_wdf_ca19_halfband_response():
    """The 19th-order complementary-allpass pair (Gazsi 1985 Example 5,
    the reference's wdf-ca-19 bench config, biquad.rs:143-173) forms a
    half-band lowpass: unit DC gain (after the pair /2), sub-microdB
    passband ripple, < -75 dB stopband."""
    import jax.numpy as jnp
    from idsp_tpu.filters import wdf

    g19_0 = [
        (wdf.nibbles(0x1, 1), [0.0]),
        (wdf.nibbles(0x1C, 2), [-0.226119, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.602422, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.83932, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.950847, 0.0]),
    ]
    g19_1 = [
        (wdf.nibbles(0x1C, 2), [-0.063978, 0.0]),
        (wdf.nibbles(0x1C, 2), [-0.423068, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.741327, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.905567, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.984721, 0.0]),
    ]
    b0 = [(tp, jnp.asarray(wdf.quantize(tp, g))) for tp, g in g19_0]
    b1 = [(tp, jnp.asarray(wdf.quantize(tp, g))) for tp, g in g19_1]
    sts = (
        [wdf.init(len(tp), (1,)) for tp, _ in g19_0],
        [wdf.init(len(tp), (1,)) for tp, _ in g19_1],
    )
    n = 4096
    x = np.zeros((n, 1), np.int32)
    x[0] = 1 << 27
    _, (ysum, _ydiff) = wdf.pair_block(b0, b1, sts, jnp.asarray(x))
    h = np.asarray(ysum, np.float64)[:, 0] / (1 << 28)
    mag = np.abs(np.fft.rfft(h))
    f = np.linspace(0, 0.5, len(mag))
    pb = mag[f < 0.20]
    sb = mag[f > 0.30]
    assert abs(mag[0] - 1.0) < 1e-5
    assert 20 * np.log10(pb.max()) < 1e-5
    assert 20 * np.log10(pb.min()) > -1e-5
    assert 20 * np.log10(sb.max()) < -75.0
