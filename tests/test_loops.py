"""CIC, Lowpass, Lockin, PLL, RPLL gates.

Mirrors the reference's property tests (cic.rs:210-387), PLL
convergence harness (pll.rs:117-149), and RPLL noisy-timestamp harness
(rpll.rs:105-289) with its per-scenario error-limit tables.
"""

import numpy as np
import jax
import jax.numpy as jnp

from idsp_tpu.filters import cic, lockin, lowpass, pll, rpll
from idsp_tpu.ops import accu


# --- CIC --------------------------------------------------------------------


def test_cic_block_matches_step_decimate():
    n_ord, m, rate = 3, 1, 4
    r = rate + 1
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=60, dtype=np.int64).astype(np.int32)
    )
    st_b = cic.init(n_ord, m)
    st_b, y_blk = cic.decimate_block(st_b, xs, rate)

    st_s = cic.init(n_ord, m)
    idx = jnp.int32(0)
    outs = []
    for i in range(60):
        st_s, idx, (emit, y) = cic.decimate_step(st_s, xs[i], idx, rate)
        if bool(emit):
            outs.append(int(y))
    np.testing.assert_array_equal(np.asarray(y_blk), np.array(outs, np.int32))
    np.testing.assert_array_equal(np.asarray(st_b.integrators), np.asarray(st_s.integrators))
    np.testing.assert_array_equal(np.asarray(st_b.combs), np.asarray(st_s.combs))


def test_cic_block_matches_step_interpolate():
    n_ord, m, rate = 2, 1, 3
    r = rate + 1
    rng = np.random.default_rng(1)
    xs_slow = jnp.asarray(
        rng.integers(-(2**10), 2**10, size=12, dtype=np.int64).astype(np.int32)
    )
    st_b = cic.init(n_ord, m)
    st_b, y_blk = cic.interpolate_block(st_b, xs_slow, rate)

    st_s = cic.init(n_ord, m)
    idx = jnp.int32(0)
    outs = []
    k = 0
    for i in range(12 * r):
        if i % r == 0:
            xv = (xs_slow[k], jnp.asarray(True))
            k += 1
        else:
            xv = (jnp.int32(0), jnp.asarray(False))
        st_s, idx, y = cic.interpolate_step(st_s, xv, idx, rate)
        outs.append(int(y))
    np.testing.assert_array_equal(np.asarray(y_blk), np.array(outs, np.int32))


def test_cic_interpolate_gain_and_settle():
    # Constant input settles to x * gain (cic.rs gain/settle properties).
    n_ord, m, rate = 3, 1, 7
    g = cic.gain(rate, n_ord, m)
    x = 123
    st = cic.init(n_ord, m)
    xs = jnp.full(64, x, jnp.int32)
    st, y = cic.interpolate_block(st, xs, rate)
    assert int(np.asarray(y)[-1]) == x * g
    # settle_interpolate gives the settled state immediately
    st2 = cic.settle_interpolate(rate, n_ord, m, jnp.int32(x))
    _, y2 = cic.interpolate_block(st2, jnp.full(4, x, jnp.int32), rate)
    np.testing.assert_array_equal(np.asarray(y2), np.full(4 * (rate + 1), x * g))


def test_cic_decimate_gain():
    n_ord, m, rate = 3, 1, 15
    g = cic.gain(rate, n_ord, m)
    assert cic.gain_log2(rate, n_ord, m) >= np.log2(g)
    x = 77
    st = cic.init(n_ord, m)
    xs = jnp.full(32 * (rate + 1), x, jnp.int32)
    st, y = cic.decimate_block(st, xs, rate)
    assert int(np.asarray(y)[-1]) == x * g


def test_cic_monotone_step_response():
    # Step input -> monotone non-decreasing output (cic.rs step property)
    n_ord, m, rate = 3, 1, 4
    st = cic.init(n_ord, m)
    xs = jnp.concatenate([jnp.zeros(20, jnp.int32), jnp.full(80, 50, jnp.int32)])
    _, y = cic.decimate_block(st, xs, rate)
    y = np.asarray(y).astype(np.int64)
    assert (np.diff(y) >= 0).all()


# --- Lowpass ----------------------------------------------------------------


def test_lowpass1_dc_and_settle():
    k = jnp.asarray(lowpass.gains1(0.01))
    st = lowpass.init(1)
    xs = jnp.full(4096, 100000, jnp.int32)
    st, y = lowpass.block(k, st, xs)
    assert abs(int(np.asarray(y)[-1]) - 100000) <= 1


def test_lowpass2_dc_and_no_overshoot_much():
    k = jnp.asarray(lowpass.gains2(0.01))
    st = lowpass.init(2)
    xs = jnp.full(8192, 1 << 20, jnp.int32)
    st, y = lowpass.block(k, st, xs)
    y = np.asarray(y).astype(np.int64)
    # DC gain 1 within the truncation floor (reference promises unity DC
    # gain; the floor-truncated feedback leaves a small static offset).
    assert abs(int(y[-1]) - (1 << 20)) <= (1 << 20) * 1e-4
    # Butterworth step overshoot is < 5%
    assert y.max() < (1 << 20) * 1.05


def test_lowpass_channels():
    k = jnp.asarray(lowpass.gains1(0.02))
    st = lowpass.init(1, (4,))
    xs = jnp.broadcast_to(
        jnp.asarray([1000, -1000, 1 << 20, 0], jnp.int32), (512, 4)
    )
    st, y = lowpass.block(k, st, xs)
    got = np.asarray(y)[-1]
    np.testing.assert_allclose(got, [1000, -1000, 1 << 20, 0], atol=1)


# --- Lockin -----------------------------------------------------------------


def test_lockin_recovers_iq():
    # Coherent tone at the LO frequency: I/Q outputs settle to the tone
    # amplitude/phase (ddc_lockin-style check on the integer path).
    n = 1 << 12
    step_phase = np.int32(0x0200_0000)
    phases = np.asarray(accu.ramp(jnp.int32(0), step_phase, n))
    amp = 1 << 24
    phi = 0.3
    sig = np.round(
        amp * np.cos(phases.astype(np.float64) * (np.pi / 2**31) + phi)
    ).astype(np.int32)

    k = jnp.asarray(lowpass.gains1(0.001))
    states = lockin.lockin_init_lowpass(1)
    states, (yi, yq) = lockin.lockin_lowpass_block(
        k, states, jnp.asarray(sig), jnp.asarray(phases)
    )
    ii = float(np.asarray(yi)[-1])
    qq = float(np.asarray(yq)[-1])
    mag = np.hypot(ii, qq) / amp
    ang = np.arctan2(qq, ii)
    # The Q32<32> DDS LO has amplitude 1/2 and mixing averages another
    # 1/2: |IQ| = A/4; demodulated angle is -phi (conjugate mix).
    assert abs(mag - 0.25) < 0.02
    err = (ang + phi + np.pi) % (2 * np.pi) - np.pi
    assert abs(err) < 0.05


# --- PLL --------------------------------------------------------------------


def test_pll_converges():
    # pll.rs:117-132: bw=5e-2, step 0x71f63049, 512 samples.
    ba = jnp.asarray(pll.coefficients_from_bandwidth(5e-2, 4.0))
    n = 1 << 9
    xs = accu.ramp(jnp.int32(0), jnp.int32(0x71F63049), n)
    st = pll.init()
    st_out, ys = pll.block(ba, st, xs)
    xs_np = np.asarray(xs).astype(np.int64)
    ys_np = np.asarray(ys).astype(np.int64)

    # re-run checking the invariants over the tail
    st = pll.init()
    freqs = []
    for i in range(n):
        st, y = pll.step(ba, st, xs[i])
        freqs.append(int(pll.frequency(st)))
    step_i = 0x71F63049 - (1 << 32)  # as i32
    for i in range(n // 2 + 1, n):
        fsum = np.int32(np.int64(step_i) + np.int64(freqs[i]))
        xysum = np.int32(xs_np[i] + ys_np[i])
        assert abs(int(fsum)) <= 1, i
        assert abs(int(xysum)) <= 4, i


def test_pll_bank_vectorizes():
    # A bank of PLLs with different input frequencies, one shared config.
    ba = jnp.asarray(pll.coefficients_from_bandwidth(2e-2, 4.0))
    steps = np.array([0x0100_0000, 0x0200_0000, -0x0300_0000], np.int32)
    n = 2048
    xs = jnp.stack([accu.ramp(jnp.int32(0), s, n) for s in jnp.asarray(steps)], axis=-1)
    st = pll.init((3,))
    st, ys = pll.block(ba, st, xs)
    f = np.asarray(pll.frequency(st)).astype(np.int64)
    np.testing.assert_allclose(-f, steps.astype(np.int64), atol=4)


# --- RPLL -------------------------------------------------------------------


def _rpll_harness(cfg, period, first, noise, n, seed=42):
    """Pre-generate the timestamp stream (host side), then run the RPLL
    scan (rpll.rs:105-173)."""
    rng = np.random.default_rng(seed)
    t = 0
    nxt = first
    nxt_noisy = first
    xs = np.zeros(n, np.int32)
    valids = np.zeros(n, bool)
    y_ref = np.zeros(n, np.float64)
    dt2 = cfg.dt2
    for i in range(n):
        if (np.int32(t - nxt_noisy)) >= 0:
            nxt = np.int32(nxt + period)
            xs[i] = nxt_noisy
            valids[i] = True
            p_noise = rng.integers(-noise, noise + 1) if noise else 0
            nxt_noisy = np.int32(nxt + p_noise)
        y_ref[i] = (
            np.int64(np.int32(t - nxt)) * (1 << 32) / period
        )
        t = np.int32(t + (1 << dt2))
    return xs, valids, y_ref


def _rpll_measure(cfg, period, first, noise, limits, n=1 << 14, seed=42):
    t_settle = (1 << (cfg.shift_frequency - cfg.dt2 + 4)) + (
        1 << (cfg.shift_phase - cfg.dt2 + 4)
    )
    xs, valids, y_ref = _rpll_harness(cfg, period, first, noise, t_settle + n, seed)
    st = rpll.init()
    st, (ys, fs) = rpll.block(
        cfg, st, jnp.asarray(xs), jnp.asarray(valids)
    )
    ys = np.asarray(ys).astype(np.int64)[t_settle:]
    fs = np.asarray(fs).astype(np.int64)[t_settle:]
    y_ref = y_ref[t_settle:]

    y_err = (ys - y_ref) / 2.0**32
    y_err -= np.round(y_err)  # modulo the turn
    p_ref = 1 << (32 + cfg.dt2)
    f_err = (
        (fs.astype(np.uint64) & 0xFFFFFFFF).astype(np.float64) * period - p_ref
    ) / 2.0 ** (32 + cfg.dt2)

    fm, fsd = f_err.mean(), f_err.std() / np.sqrt(len(f_err))
    ym, ysd = y_err.mean(), y_err.std() / np.sqrt(len(y_err))
    m = [fm, fsd, ym, ysd]
    for val, lim in zip(m, limits):
        assert abs(val) <= abs(lim), (m, limits)


def test_rpll_default_scenario():
    # rpll.rs:208-213: dt2=8, shifts 9/8, period 333, noise 0.
    cfg = rpll.RpllConfig(dt2=8, shift_frequency=9, shift_phase=8)
    _rpll_measure(cfg, 333, 111, 0, [1e-11, 4e-8, 2e-8, 2e-8])


def test_rpll_noisy_scenario():
    # rpll.rs:215-223: noise 10, shifts 23/22.  The reference limits are
    # tuned to its exact StdRng noise realization; with a different RNG
    # the noise-driven means shift, so allow 10x headroom on those.
    cfg = rpll.RpllConfig(dt2=8, shift_frequency=23, shift_phase=22)
    _rpll_measure(cfg, 333, 111, 10, [3e-8, 3e-5, 5e-3, 2e-3], n=1 << 16)


def test_rpll_wide_fast_scenario():
    # rpll.rs:251-262: period 990, noise 5, shifts 10/9.
    cfg = rpll.RpllConfig(dt2=8, shift_frequency=10, shift_phase=9)
    _rpll_measure(cfg, 990, 351, 5, [2e-5, 3e-1, 2e-4, 2e-1], n=1 << 16)


def test_rpll_narrow_slow_scenario():
    # rpll.rs:238-249: period 1818181, noise 1000, shifts 23/22.
    cfg = rpll.RpllConfig(dt2=8, shift_frequency=23, shift_phase=22)
    _rpll_measure(cfg, 1818181, 35281, 1000, [2e-4, 6e-3, 2e-3, 2e-3], n=1 << 16)


def test_rpll_wide_slow_scenario():
    # rpll.rs:264-275: period 1818181, noise 1000, shifts 21/20.
    cfg = rpll.RpllConfig(dt2=8, shift_frequency=21, shift_phase=20)
    _rpll_measure(cfg, 1818181, 35281, 1000, [2e-3, 6e-2, 2e-3, 2e-2], n=1 << 16)


def test_rpll_batch_fast_narrow_scenario():
    # rpll.rs:277-289: dt2 11, period 2431, noise 100, shifts 23/23.
    cfg = rpll.RpllConfig(dt2=11, shift_frequency=23, shift_phase=23)
    _rpll_measure(cfg, 2431, 35281, 100, [1e-7, 2e-4, 6e-3, 6e-3], n=1 << 16)


def test_cic_modular_recomposition_decimator():
    """The monolithic CIC decimator equals the composition of
    Integrator x N -> Downsample -> Comb x N built from the process.py
    primitives, bit for bit — the reference's modular equivalence proof
    (cic.rs:305-387)."""
    import numpy as np
    import jax.numpy as jnp
    from idsp_tpu import process
    from idsp_tpu.filters import cic

    rng = np.random.default_rng(42)
    n, m, rate = 3, 2, 15
    r = rate + 1
    c, t = 4, r * 32
    x1 = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=(c, t), dtype=np.int64).astype(
            np.int32
        )
    )
    x2 = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=(c, t), dtype=np.int64).astype(
            np.int32
        )
    )

    # monolithic, two chained blocks
    st = cic.init(n, m, (c,))
    st, y1 = cic.decimate_block(st, x1, rate)
    st, y2 = cic.decimate_block(st, x2, rate)

    # modular: integrators -> downsample -> combs (delay m)
    int_states = [process.integrator_init((c,)) for _ in range(n)]
    comb_states = [
        process.delay_init(m, (c,), jnp.int32) for _ in range(n)
    ]
    outs = []
    for x in (x1, x2):
        cur = x
        for i in range(n):
            int_states[i], cur = process.integrator_block(int_states[i], cur)
        cur = process.downsample(cur, r, 0)
        for i in range(n):
            comb_states[i], cur = process.comb_block(comb_states[i], cur)
        outs.append(cur)

    np.testing.assert_array_equal(np.asarray(y1), np.asarray(outs[0]))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(outs[1]))


def test_cic_modular_recomposition_interpolator():
    """Comb x N -> Hold -> Integrator x N == monolithic interpolator
    (cic.rs:309-387)."""
    import numpy as np
    import jax.numpy as jnp
    from idsp_tpu import process
    from idsp_tpu.filters import cic

    rng = np.random.default_rng(43)
    n, m, rate = 3, 1, 7
    r = rate + 1
    c, t = 4, 64
    x1 = jnp.asarray(
        rng.integers(-(2**10), 2**10, size=(c, t), dtype=np.int64).astype(
            np.int32
        )
    )
    x2 = jnp.asarray(
        rng.integers(-(2**10), 2**10, size=(c, t), dtype=np.int64).astype(
            np.int32
        )
    )

    st = cic.init(n, m, (c,))
    st, y1 = cic.interpolate_block(st, x1, rate)
    st, y2 = cic.interpolate_block(st, x2, rate)

    comb_states = [
        process.delay_init(m, (c,), jnp.int32) for _ in range(n)
    ]
    int_states = [process.integrator_init((c,)) for _ in range(n)]
    outs = []
    for x in (x1, x2):
        cur = x
        for i in range(n):
            comb_states[i], cur = process.comb_block(comb_states[i], cur)
        cur = process.hold(cur, r)
        for i in range(n):
            int_states[i], cur = process.integrator_block(int_states[i], cur)
        outs.append(cur)

    np.testing.assert_array_equal(np.asarray(y1), np.asarray(outs[0]))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(outs[1]))


def test_cic_time_major_axis_bitexact():
    # axis=0 (time-major) == channel-last path transposed, bit-for-bit,
    # for both directions and multi-block streaming (M=2 delay carry).
    rng = np.random.default_rng(40)
    c, t, n, m, rate = 5, 64, 3, 2, 3
    st_a = cic.init(n, m, (c,), jnp.int32)
    st_b = cic.init(n, m, (c,), jnp.int32)
    for _ in range(3):
        x = jnp.asarray(
            rng.integers(-(2**16), 2**16, size=(c, t), dtype=np.int64).astype(
                np.int32
            )
        )
        st_a, ya = cic.decimate_block(st_a, x, rate)
        st_b, yb = cic.decimate_block(st_b, x.T, rate, axis=0)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb).T)
        for la, lb in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    st_a = cic.init(n, m, (c,), jnp.int32)
    st_b = cic.init(n, m, (c,), jnp.int32)
    for _ in range(3):
        x = jnp.asarray(
            rng.integers(-(2**10), 2**10, size=(c, t), dtype=np.int64).astype(
                np.int32
            )
        )
        st_a, ya = cic.interpolate_block(st_a, x, rate)
        st_b, yb = cic.interpolate_block(st_b, x.T, rate, axis=0)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb).T)
        for la, lb in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
