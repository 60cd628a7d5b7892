"""SNR/SFDR acceptance gates for the coarse/fine fast LO path.

The fast LO (ops/fastlo.py) is gated by the reference's DDS spectral
acceptance suite (src/cossin.rs:199-247) instead of bit-exactness, per
the repo's documented fast-path convention: SFDR > 118 dB, SNR >
106 dB, spur < -120.4 dBc — the same thresholds the exact `cossin`
path must meet — plus the stronger requirement that the fast mix be
*closer to the ideal f64 mix* than the exact LUT path is.
"""

import numpy as np
import jax.numpy as jnp

from idsp_tpu import cossin, fxp, testing
from idsp_tpu.ops import fastlo


def _ramp_lo_ideal(phase0: int, step: int, t: int):
    n = np.arange(1, t + 1, dtype=np.int64)
    ph = np.int32((np.int64(phase0) + np.int64(step) * n) & 0xFFFFFFFF)
    ang = ph.astype(np.float64) * (np.pi / 2**31)
    return np.cos(ang), np.sin(ang)


def test_fastlo_matches_ideal_ramp():
    # Factored f32 LO vs the ideal f64 ramp: error is pure f32 rounding
    # (~1e-7), 40x below the exact LUT path's 4e-6 RMS bound.
    t, k = 1 << 14, 128
    phase0 = jnp.asarray([12345], jnp.int32)
    steps = jnp.asarray([0x2468ACE1], jnp.int32)
    lo_re, lo_im = fastlo.fastlo_iq(phase0, steps, t, k,
                                    trig_dtype=jnp.float64)
    want_c, want_s = _ramp_lo_ideal(12345, 0x2468ACE1, t)
    err_c = np.asarray(lo_re[:, 0], np.float64) - want_c
    err_s = np.asarray(lo_im[:, 0], np.float64) - want_s
    assert np.sqrt((err_c**2).mean()) < 3e-7
    assert np.sqrt((err_s**2).mean()) < 3e-7
    assert np.abs(err_c).max() < 1.5e-6
    assert np.abs(err_s).max() < 1.5e-6


def _fast_dds_complex(k_tone: int, n_log2: int = 16, *, k: int = 128,
                      trig_dtype=jnp.float64):
    n = 1 << n_log2
    step = np.int32(k_tone << (32 - n_log2))
    lo_re, lo_im = fastlo.fastlo_iq(
        jnp.asarray([-int(step)], jnp.int32),  # phase0 = -step => n=1 at 0
        jnp.asarray([step], jnp.int32), n, k, trig_dtype=trig_dtype,
    )
    return (np.asarray(lo_re[:, 0], np.float64)
            + 1j * np.asarray(lo_im[:, 0], np.float64))


def test_fastlo_dds_metrics_real():
    # The reference real-DDS gates (cossin.rs:232-248) applied to the
    # fast LO; passes with >20 dB margin (noise floor is f32 rounding).
    k_tone = 7
    x = _fast_dds_complex(k_tone).real
    m = testing.dds_metrics(x, k_tone, 16)
    assert m.sfdr_db > 118.0, m
    assert m.snr_db > 106.0, m
    assert m.thdn_db > 105.9, m
    assert m.thd_db > 123.0, m


def test_fastlo_spur_floor_complex():
    # Strongest complex-spectrum spur below the exact path's -120.4 dBc
    # deterministic interpolation spur (cossin.rs:199-230).
    k_tone = 7
    z = _fast_dds_complex(k_tone)
    power = testing.complex_fft_power(z)
    carrier = power[k_tone]
    mask = np.ones(power.shape[0], dtype=bool)
    mask[k_tone] = False
    strongest = float(np.max(np.where(mask, power, -np.inf)))
    assert testing.db(strongest / carrier) < -120.4


def test_fastlo_f32_tables_pass_gates():
    # The cheap float32 trig table variant still clears the gates.
    k_tone = 7
    z = _fast_dds_complex(k_tone, trig_dtype=jnp.float32)
    power = testing.complex_fft_power(z)
    carrier = power[k_tone]
    mask = np.ones(power.shape[0], dtype=bool)
    mask[k_tone] = False
    strongest = float(np.max(np.where(mask, power, -np.inf)))
    assert testing.db(strongest / carrier) < -120.4
    m = testing.dds_metrics(z.real, k_tone, 16)
    assert m.sfdr_db > 118.0, m
    assert m.snr_db > 106.0, m


def test_fastlo_mix_closer_to_ideal_than_exact():
    # The headline-chain substitution gate: fast miq must be at least
    # as close to the ideal f64 conjugate mix as the exact LUT path.
    t, k, c = 1 << 13, 128, 4
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
        .astype(np.int32)
    )
    phase0 = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(c,), dtype=np.int64)
        .astype(np.int32)
    )
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64)
        .astype(np.int32)
    )

    miq_fast = np.asarray(fastlo.fastlo_mix(x, phase0, steps, k),
                          np.float64)

    idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
        jnp.int32
    )
    phases = phase0[None, :] + steps[None, :] * idx[:, None]
    lo_re, lo_im = cossin(phases)
    xi = x[:, None]
    miq_exact = np.concatenate(
        [
            np.asarray(fxp.q_apply(lo_re, xi, 32), np.float64),
            np.asarray(fxp.q_apply(-lo_im, xi, 32), np.float64),
        ],
        axis=1,
    )

    xf = np.asarray(x, np.float64)
    ideal = np.empty_like(miq_fast)
    for ci in range(c):
        wc, ws = _ramp_lo_ideal(int(phase0[ci]), int(steps[ci]), t)
        amp = fastlo.AMPLITUDE
        ideal[:, ci] = wc * xf * amp
        ideal[:, c + ci] = -ws * xf * amp

    rms_fast = np.sqrt(((miq_fast - ideal) ** 2).mean())
    rms_exact = np.sqrt(((miq_exact - ideal) ** 2).mean())
    assert rms_fast < rms_exact, (rms_fast, rms_exact)
    # Absolute floor: fast-path mix error is ~LSB-scale rounding, far
    # below the exact path's ~4e-6 * 2^26 ~ 270-LSB LUT deviation.
    assert rms_fast < 32.0, rms_fast


def test_fastlo_mix_shapes_and_dtype():
    t, k, c = 512, 64, 3
    x = jnp.ones((t,), jnp.int32)
    phase0 = jnp.zeros((c,), jnp.int32)
    steps = jnp.full((c,), 1 << 20, jnp.int32)
    miq = fastlo.fastlo_mix(x, phase0, steps, k)
    assert miq.shape == (t, 2 * c)
    assert miq.dtype == jnp.int32
