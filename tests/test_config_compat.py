"""Config plane + compat surface tests."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from idsp_tpu import compat
from idsp_tpu.design import Filter, Units
from idsp_tpu.design.config import (
    BaConfig,
    BiquadConfig,
    FilterConfig,
    GainsConfig,
    PidConfig,
)
from idsp_tpu.design.errors import DesignError
from idsp_tpu.filters import biquad


def test_compat_cossin_atan2_roundtrip():
    p = np.linspace(-2**31, 2**31 - 1, 1001).astype(np.int64).astype(np.int32)
    xy = compat.cossin(p)
    assert xy.shape == (1001, 2)
    back = compat.atan2(xy)
    # atan2(cossin(p)) ~= p within the documented error bounds
    err = np.abs(np.asarray(back).astype(np.int64) - p.astype(np.int64))
    err = np.minimum(err, 2**32 - err)
    # combined DDS amplitude error (~9e-6) + atan2 error (~2.3e-6 rad)
    assert err.max() * np.pi / 2**31 < 2e-5


def test_compat_sos_matches_golden():
    # Same filter as the Q30 doctest but via the (N,6) sos surface at
    # the py.rs default Q29.
    ba = Filter().critical_frequency(0.1).gain_linear(2.0).lowpass()
    rows = np.concatenate([ba[0], ba[1]])[None, :]
    x = np.array([1000, -2000, 3000, 4000, -500, 250], np.int32)
    y = compat.sos(rows, x)
    # reference: stage-major DF1 Q32<29> — equals our df1_process_q
    ba_q = biquad.quantize_ba(biquad.from_cookbook(ba), 29)
    st = biquad.df1_init((), jnp.int32)
    _, want = biquad.df1_process_q(jnp.asarray(ba_q), 29, st, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(want))


def test_compat_sos_clamp_wide_identity():
    rows = np.array([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, -2.0**31, 2.0**31 - 1]])
    x = np.array([5, -6, 7], np.int32)
    y = compat.sos_clamp_wide(rows, x)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_biquad_config_tags():
    # config.rs:169-175 tag round trip
    c = BiquadConfig.from_tag("Filter")
    assert c.tag == "Filter"
    with pytest.raises(DesignError):
        BiquadConfig.from_tag("Unknown")


def test_biquad_config_filter_build():
    cfg = BiquadConfig(
        "Filter",
        FilterConfig(typ="lowpass", frequency=0.1, gain_db=6.0),
    )
    out = cfg.build(Units())
    # forward DC gain ~ 2 (6 dB)
    fg = biquad.forward_gain(out.ba)
    dc = fg / (1 - out.ba[3] - out.ba[4])
    assert abs(dc - 10 ** (6.0 / 20.0)) < 1e-6


def test_biquad_config_pid_and_units():
    cfg = BiquadConfig(
        "Pid",
        PidConfig(
            order="I",
            gain=GainsConfig(i=1e-3, p=1.0),
            limit=GainsConfig.splat(math.inf),
            setpoint=0.5,
        ),
    )
    out = cfg.build(Units(t=1.0, x=2.0, y=4.0))
    assert np.isfinite(out.ba).all()
    # setpoint maps to junction offset via forward gain
    fg = float(out.ba[0] + out.ba[1] + out.ba[2])
    assert abs(out.u - (-0.5 / 2.0) * fg) < 1e-9


def test_biquad_config_quantized_and_dict_roundtrip():
    cfg = BiquadConfig(
        "Filter", FilterConfig(typ="notch", frequency=0.2, min=-1e4, max=1e4)
    )
    d = cfg.to_dict()
    cfg2 = BiquadConfig.from_dict(d)
    out = cfg2.build(Units(), f=29)
    assert out.ba.dtype == np.int32
    assert out.min == -10000 and out.max == 10000

    bad = BiquadConfig("Ba", BaConfig(min=1.0, max=-1.0))
    with pytest.raises(DesignError):
        bad.build(Units())


def test_compat_sos_multichannel_matches_single():
    # a (t, c) bank gives each channel the same bits as 1-D processing
    ba = Filter().critical_frequency(0.08).lowpass()
    rows = np.concatenate([ba[0], ba[1]])[None, :]
    rng = np.random.default_rng(11)
    x2 = rng.integers(-(2**24), 2**24, size=(200, 4), dtype=np.int64).astype(
        np.int32
    )
    y2 = np.asarray(compat.sos(rows, x2))
    for ch in range(4):
        y1 = np.asarray(compat.sos(rows, x2[:, ch]))
        np.testing.assert_array_equal(y2[:, ch], y1)
