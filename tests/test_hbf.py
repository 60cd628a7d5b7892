"""Half-band filter gates: impulse response, spectral quality, streaming.

Mirrors reference hbf.rs tests: the unit decimator case (hbf.rs:547-561),
response-length exactness (hbf.rs:576-609), and the 140 dB passband/
stopband spectral gates (hbf.rs:597-634).  Adds block-streaming
equivalence (tail carry) which the reference gets from its ring buffers.
"""

import numpy as np
import jax.numpy as jnp

from idsp_tpu.filters import hbf


def test_unit_hbf_dec():
    # hbf.rs:547-556: M=1 taps [0.5], ones input -> [1.5, 2, 2, 2]
    st = hbf.hbf_dec_init(1)
    _, y = hbf.hbf_dec_block(np.array([0.5], np.float32), st, jnp.ones(8, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), [1.5, 2.0, 2.0, 2.0])


def test_dec_response_length():
    # hbf.rs:576-595: feed noise then zeros; the response dies exactly
    # after hbf_dec_response_length(depth) outputs.
    depth = 4
    r = 1 << depth
    n_out = 100
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n_out * r, dtype=np.float32))
    states = hbf.hbf_dec_cascade_init(depth)
    states, y = hbf.hbf_dec_cascade(states, x)
    zeros = jnp.zeros(1 << 10, jnp.float32)
    states, y2 = hbf.hbf_dec_cascade(states, zeros)
    y2 = np.asarray(y2)
    n = hbf.hbf_dec_response_length(depth)
    assert y2[n - 1] != 0.0
    assert y2[n] == 0.0


def test_int_impulse_and_spectrum():
    # hbf.rs:597-634: interpolator impulse response length and the
    # 140 dB cascade's spectral gates (< 1e-6 dB ripple, < -141.5 dB).
    depth = 4
    r = hbf.hbf_int_response_length(depth)
    n_in = (r >> depth) + 1
    x = np.zeros(n_in, np.float32)
    x[0] = 1.0
    states = hbf.hbf_int_cascade_init(depth)
    _, y = hbf.hbf_int_cascade(states, jnp.asarray(x))
    y = np.asarray(y)
    assert y[r] != 0.0
    assert np.all(y[r + 1 :] == 0.0)

    yk = y.astype(np.float64) / (1 << depth)
    yk = np.concatenate([yk, np.zeros((5 << 10) - len(yk))])
    p = 10.0 * np.log10(np.abs(np.fft.fft(yk)) ** 2 + 1e-300)
    f = len(p) / (1 << depth)
    p_pass = np.abs(p[: int(np.floor(f * hbf.HBF_PASSBAND))]).max()
    assert p_pass < 1e-6, p_pass
    p_stop = p[int(np.ceil(f * (1 - hbf.HBF_PASSBAND))) : len(p) // 2].max()
    assert p_stop < -141.5, p_stop


def test_taps_98_spectrum():
    # hbf.rs:247-256: > 98 dB stopband, < 0.001 dB ripple.
    depth = 4
    r = hbf.hbf_int_response_length(depth, taps=hbf.HBF_TAPS_98)
    n_in = (r >> depth) + 1
    x = np.zeros(n_in, np.float32)
    x[0] = 1.0
    states = hbf.hbf_int_cascade_init(depth, taps=hbf.HBF_TAPS_98)
    _, y = hbf.hbf_int_cascade(states, jnp.asarray(x), taps=hbf.HBF_TAPS_98)
    y = np.asarray(y).astype(np.float64) / (1 << depth)
    y = np.concatenate([y, np.zeros((5 << 10) - len(y))])
    p = 10.0 * np.log10(np.abs(np.fft.fft(y)) ** 2 + 1e-300)
    f = len(p) / (1 << depth)
    assert np.abs(p[: int(np.floor(f * hbf.HBF_PASSBAND))]).max() < 1e-3
    assert p[int(np.ceil(f * (1 - hbf.HBF_PASSBAND))) : len(p) // 2].max() < -98.0


def test_streaming_equals_one_shot():
    # Tail carry: many small blocks == one big block, bit-exact.
    rng = np.random.default_rng(1)
    x = rng.normal(size=1024).astype(np.float32)
    depth = 3

    st = hbf.hbf_dec_cascade_init(depth)
    _, y_big = hbf.hbf_dec_cascade(st, jnp.asarray(x))

    st = hbf.hbf_dec_cascade_init(depth)
    outs = []
    for i in range(0, 1024, 128):
        st, y = hbf.hbf_dec_cascade(st, jnp.asarray(x[i : i + 128]))
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    np.testing.assert_array_equal(np.asarray(y_big), y_stream)

    sti = hbf.hbf_int_cascade_init(depth)
    _, yi_big = hbf.hbf_int_cascade(sti, jnp.asarray(x))
    sti = hbf.hbf_int_cascade_init(depth)
    outs = []
    for i in range(0, 1024, 128):
        sti, y = hbf.hbf_int_cascade(sti, jnp.asarray(x[i : i + 128]))
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.asarray(yi_big), np.concatenate(outs))


def test_channels_batch():
    # Leading channel axes broadcast through all block functions.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 5, 256)).astype(np.float32))
    st = hbf.hbf_dec_cascade_init(2, shape=(3, 5))
    _, y = hbf.hbf_dec_cascade(st, x)
    assert y.shape == (3, 5, 64)
    # channel independence: channel 0 processed alone gives same bits
    st0 = hbf.hbf_dec_cascade_init(2)
    _, y0 = hbf.hbf_dec_cascade(st0, x[0, 0])
    np.testing.assert_array_equal(np.asarray(y[0, 0]), np.asarray(y0))


def test_fir_types():
    # The four linear-phase FIR types produce the expected symmetry of
    # their full impulse responses.
    taps = np.array([0.25, 0.5], np.float32)
    n = 16
    x = np.zeros(n, np.float32)
    x[0] = 1.0

    for odd, sym in [(True, True), (False, True), (True, False), (False, False)]:
        st = hbf.fir_init(2, odd)
        _, y = hbf.fir_block(taps, st, jnp.asarray(x), odd=odd, sym=sym)
        y = np.asarray(y)
        ln = hbf.fir_len(2, odd)
        h = y[: ln + 1]
        if sym:
            np.testing.assert_allclose(h, h[::-1], atol=1e-7)
        else:
            np.testing.assert_allclose(h, -h[::-1], atol=1e-7)


def test_hbf_time_major_matches_time_last():
    # axis=0 (time-major, transpose-free) == axis=-1 transposed, for the
    # dec and int cascades, across a block boundary (carried tails).
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    c, t, depth = 4, 256, 3
    x = rng.normal(size=(c, t)).astype(np.float32)

    st_l = hbf.hbf_dec_cascade_init(depth, (c,))
    st_t = hbf.hbf_dec_cascade_init(depth, (c,), axis=0)
    xa, xb = jnp.asarray(x[:, : t // 2]), jnp.asarray(x[:, t // 2:])
    st_l, ya = hbf.hbf_dec_cascade(st_l, xa)
    st_l, yb = hbf.hbf_dec_cascade(st_l, xb)
    st_t, za = hbf.hbf_dec_cascade(st_t, xa.T, axis=0)
    st_t, zb = hbf.hbf_dec_cascade(st_t, xb.T, axis=0)
    np.testing.assert_allclose(np.asarray(za).T, np.asarray(ya), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zb).T, np.asarray(yb), rtol=1e-6)

    st_l = hbf.hbf_int_cascade_init(depth, (c,))
    st_t = hbf.hbf_int_cascade_init(depth, (c,), axis=0)
    st_l, ya = hbf.hbf_int_cascade(st_l, xa)
    st_t, za = hbf.hbf_int_cascade(st_t, xa.T, axis=0)
    st_l, yb = hbf.hbf_int_cascade(st_l, xb)
    st_t, zb = hbf.hbf_int_cascade(st_t, xb.T, axis=0)
    np.testing.assert_allclose(np.asarray(za).T, np.asarray(ya), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(zb).T, np.asarray(yb), rtol=1e-6)
