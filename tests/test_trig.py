"""cossin/atan2 accuracy and exactness gates.

Mirrors the reference test strategy: exhaustive/grid numerical error
with hard thresholds (src/cossin.rs:130-196, src/atan2.rs:116-185) and
spectral DDS acceptance (src/cossin.rs:198-248).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from idsp_tpu import cossin, atan2, testing
from idsp_tpu.ops import accu

AMPLITUDE = float(1 << 31) - 0.85 * float(1 << 15)


def test_cossin_error_max_rms_all_phase():
    # 2^20-phase sweep in the reference (cossin.rs:143-196); same grid.
    depth = 20
    phase = (np.arange(1 << depth, dtype=np.int64) << (32 - depth)).astype(np.int32)
    c, s = cossin(phase)
    have_c = np.asarray(c, dtype=np.float64) / AMPLITUDE
    have_s = np.asarray(s, dtype=np.float64) / AMPLITUDE

    radian = 2.0 * np.pi * phase.astype(np.float64) / float(1 << 32)
    want_c = np.cos(radian)
    want_s = np.sin(radian)

    err_c = have_c - want_c
    err_s = have_s - want_s

    # DC offset gates — raw (unnormalized) sums over the whole sweep, as
    # in the reference (cossin.rs:182-189): the LUT is DC-balanced by
    # construction so these cancel to ~1e-10 despite 2^20 terms.
    assert abs(have_c.sum()) < 4e-10
    assert abs(have_s.sum()) < 3e-8
    assert abs(err_c.sum()) < 4e-10
    assert abs(err_s.sum()) < 4e-10
    assert np.sqrt((err_c**2).mean()) < 4e-6
    assert np.sqrt((err_s**2).mean()) < 4e-6
    assert np.abs(err_c).max() < 1e-5
    assert np.abs(err_s).max() < 1e-5


def _dds_complex(k: int, n_log2: int = 16):
    n = 1 << n_log2
    step = np.int32(k << (32 - n_log2))
    phase = accu.ramp(jnp.int32(0), step, n)
    c, s = cossin(phase)
    return (
        np.asarray(c, dtype=np.float64) / AMPLITUDE
        + 1j * np.asarray(s, dtype=np.float64) / AMPLITUDE
    )


def test_cossin_dds_spur_prediction_complex():
    # First interpolation spur pair at (M±1)k, M=8*2^7, at -120.4 dBc
    # (cossin.rs:198-230).
    k = 7
    n = 1 << 16
    z = _dds_complex(k)
    power = testing.complex_fft_power(z)
    carrier = power[k]
    m = 8 * (1 << 7)
    lo = n - ((m - 1) * k) % n
    hi = ((m + 1) * k) % n
    lo_db = testing.db(power[lo] / carrier)
    hi_db = testing.db(power[hi] / carrier)
    assert abs(lo_db + 120.4) < 1.5, lo_db
    assert abs(hi_db + 120.4) < 1.5, hi_db
    mask = np.ones(n, dtype=bool)
    mask[k] = False
    strongest = int(np.argmax(np.where(mask, power, -np.inf)))
    assert strongest in (lo, hi)


def test_cossin_dds_metrics_real():
    # Real-DDS SFDR/SNR/THD gates (cossin.rs:232-248).
    k = 7
    n = 1 << 16
    x = _dds_complex(k).real
    m = testing.dds_metrics(x, k, 16)
    mm = 8 * (1 << 7)
    spur_bins = {
        min(b % n, n - b % n) for b in (n - ((mm - 1) * k) % n, ((mm + 1) * k) % n)
    }
    assert m.strongest_spur_bin in spur_bins
    assert m.sfdr_db > 118.0, m
    assert m.snr_db > 106.0, m
    assert m.thdn_db > 105.9, m
    assert m.thd_db > 123.0, m


def test_atan2_absolute_error():
    # 323^2 grid incl. extremes (atan2.rs:116-153).
    n = 321
    scale = float(1 << 31)
    vals = [int(scale * (-1.0 + 2.0 * i / n)) for i in range(n)]
    assert -(1 << 31) in vals
    vals.append((1 << 31) - 1)
    vals.append(0)
    v = np.array(vals, dtype=np.int32)
    y = np.repeat(v, len(v))
    x = np.tile(v, len(v))
    have = np.asarray(atan2(y, x), dtype=np.float64) * (np.pi / scale)
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    err = np.abs(have - want)
    assert err.max() < 2.3e-6
    assert np.sqrt((err**2).sum()) / len(v) < 1.3e-6

    # Relative error near axes < 1e-15 for large errors (atan2.rs:139-152)
    def angle_to_axis(a):
        a = np.mod(a, np.pi / 2)
        return np.minimum(np.pi / 2 - a, a)

    big = err > 3e-5
    if big.any():
        rel = (err[big] / angle_to_axis(want[big])).max()
        assert rel < 1e-15


def test_atan2_small_equal_inputs():
    v = np.arange(1, 1024, dtype=np.int32)
    scale = np.pi / float(1 << 31)
    have = np.asarray(atan2(v, v), dtype=np.float64) * scale
    assert np.abs(have - np.pi / 4).max() < 2.3e-6


def test_atan2_small_vectors_near_origin():
    xs, ys = [], []
    for x in range(1, 512):
        for y in range(0, x + 1):
            xs.append(x)
            ys.append(y)
    x = np.array(xs, dtype=np.int32)
    y = np.array(ys, dtype=np.int32)
    scale = np.pi / float(1 << 31)
    have = np.asarray(atan2(y, x), dtype=np.float64) * scale
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.abs(have - want).max() < 2.3e-6


def test_atan2_zero_axis_is_exact():
    # atan2.rs:179-185
    imax = (1 << 31) - 1
    assert int(atan2(np.int32(0), np.int32(1))) == 0
    assert int(atan2(np.int32(0), np.int32(imax))) == 0
    assert int(atan2(np.int32(1), np.int32(0))) == 0x3FFF_FFFF
    assert int(atan2(np.int32(imax), np.int32(0))) == 0x3FFF_FFFF


@pytest.mark.parametrize("shape", [(), (3,), (2, 5)])
def test_shapes_preserved(shape):
    phase = np.zeros(shape, dtype=np.int32)
    c, s = cossin(phase)
    assert c.shape == shape and s.shape == shape
    r = atan2(np.ones(shape, dtype=np.int32), np.ones(shape, dtype=np.int32))
    assert r.shape == shape


def test_cossin_lookup_strategies_bit_identical():
    # All four LUT access strategies must agree bit-for-bit (trig.py:
    # gather / select / tree / dot).  Random phases plus the octant
    # seams where the fold/unfold logic switches.
    rng = np.random.default_rng(7)
    seams = np.arange(8, dtype=np.int64) * (1 << 29)
    phase = np.concatenate(
        [
            rng.integers(-(2**31), 2**31, size=(1 << 16,), dtype=np.int64),
            seams - 1, seams, seams + 1,
        ]
    ).astype(np.int32)
    ref_c, ref_s = cossin(phase, lookup="gather")
    for lk in ("select", "tree", "dot"):
        c, s = cossin(phase, lookup=lk)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(ref_c),
                                      err_msg=lk)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s),
                                      err_msg=lk)


def test_atan2_lookup_strategies_bit_identical():
    # The reciprocal-LUT division has gather and select strategies
    # (trig.py:_divi); they must agree bit-for-bit including the axes
    # and the x == 0 guard.
    rng = np.random.default_rng(8)
    y = np.concatenate(
        [rng.integers(-(2**31), 2**31, size=(1 << 16,), dtype=np.int64),
         [0, 1, -1, 2**31 - 1, -(2**31)]]
    ).astype(np.int32)
    x = np.concatenate(
        [rng.integers(-(2**31), 2**31, size=(1 << 16,), dtype=np.int64),
         [1, 0, 0, -(2**31), 2**31 - 1]]
    ).astype(np.int32)
    ref = atan2(y, x, lookup="gather")
    sel = atan2(y, x, lookup="select")
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(ref))
