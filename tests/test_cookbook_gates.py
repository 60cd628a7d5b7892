"""Cookbook filter transfer-function gates.

Port of the reference's check_transfer tests (coefficients.rs:668-846):
each filter type's response at listed frequencies, both in float and
after Q32<30> quantize-and-back.
"""

import numpy as np

from idsp_tpu.design import Filter, freqz
from idsp_tpu.filters import biquad
from idsp_tpu.fxp import to_float


def _gain_db(ba, f):
    h = freqz(ba[0], ba[1], f)
    return 10.0 * np.log10(np.abs(h) ** 2)


def _check_transfer(ba, fg):
    for f, kind, *args in fg:
        g = _gain_db(ba, f)
        if kind == "db":
            want, tol = args
            assert abs(g - want) <= tol, (f, g, want)
        else:
            (limit,) = args
            assert g <= limit, (f, g, limit)

    # Quantize to Q32<30> and back (biquad.rs From<[[f64;3];2]>), then
    # re-check with the quantized coefficients.
    ba5 = biquad.from_cookbook(np.asarray(ba))
    ba_q = biquad.quantize_ba(ba5, 30)
    baf = np.asarray(to_float(ba_q, 30))
    ba_i = [
        [baf[0], baf[1], baf[2]],
        [1.0, -baf[3], -baf[4]],
    ]
    for f, kind, *args in fg:
        g = _gain_db(ba_i, f)
        if kind == "db":
            want, tol = args
            assert abs(g - want) <= tol, ("quantized", f, g, want)
        else:
            (limit,) = args
            assert g <= limit, ("quantized", f, g, limit)


def test_lowpass_gates():
    ba = Filter().critical_frequency(0.01).gain_db(20.0).lowpass()
    _check_transfer(
        ba,
        [(1e-3, "db", 20.0, 0.01), (0.01, "db", 17.0, 0.02), (0.4, "below", -40.0)],
    )


def test_highpass_gates():
    ba = Filter().critical_frequency(0.1).gain_db(-2.0).highpass()
    _check_transfer(
        ba,
        [(1e-3, "below", -40.0), (0.1, "db", -5.0, 0.02), (0.4, "db", -2.0, 0.01)],
    )


def test_bandpass_gates():
    ba = Filter().critical_frequency(0.02).bandwidth(2.0).gain_db(3.0).bandpass()
    _check_transfer(
        ba,
        [
            (1e-4, "below", -35.0),
            (0.01, "db", 0.0, 0.02),
            (0.02, "db", 3.0, 0.01),
            (0.04, "db", 0.0, 0.04),
            (0.4, "below", -25.0),
        ],
    )


def test_allpass_gates():
    ba = Filter().critical_frequency(0.02).gain_db(-10.0).allpass()
    _check_transfer(
        ba,
        [(f, "db", -10.0, 0.01) for f in (1e-4, 0.01, 0.02, 0.04, 0.4)],
    )


def test_notch_gates():
    ba = Filter().critical_frequency(0.02).bandwidth(2.0).notch()
    _check_transfer(
        ba,
        [
            (1e-4, "db", 0.0, 0.01),
            (0.01, "db", -3.0, 0.02),
            (0.02, "below", -140.0),
            (0.04, "db", -3.0, 0.02),
            (0.4, "db", 0.0, 0.01),
        ],
    )


def test_peaking_gates():
    ba = (
        Filter()
        .critical_frequency(0.02)
        .bandwidth(2.0)
        .gain_db(-10.0)
        .shelf_db(20.0)
        .peaking()
    )
    _check_transfer(
        ba,
        [
            (1e-4, "db", -10.0, 0.01),
            (0.01, "db", 0.0, 0.04),
            (0.02, "db", 10.0, 0.01),
            (0.04, "db", 0.0, 0.04),
            (0.4, "db", -10.0, 0.05),
        ],
    )


def test_highshelf_gates():
    ba = (
        Filter()
        .critical_frequency(0.02)
        .gain_db(-10.0)
        .shelf_db(-20.0)
        .highshelf()
    )
    _check_transfer(
        ba,
        [
            (1e-6, "db", -10.0, 0.01),
            (1e-4, "db", -10.0, 0.01),
            (0.02, "db", -20.0, 0.01),
            (0.4, "db", -30.0, 0.01),
        ],
    )


def test_lowshelf_gates():
    ba = (
        Filter()
        .critical_frequency(0.02)
        .gain_db(-10.0)
        .shelf_db(-20.0)
        .lowshelf()
    )
    _check_transfer(
        ba,
        [
            (1e-6, "db", -30.0, 0.01),
            (1e-4, "db", -30.0, 0.01),
            (0.02, "db", -20.0, 0.01),
            (0.4, "db", -10.0, 0.01),
        ],
    )


def test_iho_gates():
    ba = (
        Filter()
        .critical_frequency(0.01)
        .gain_db(-20.0)
        .shelf_db(10.0)
        .q(10.0)
        .iho()
    )
    _check_transfer(
        ba,
        [
            (1e-5, "db", 40.0, 0.01),
            (0.01, "below", -40.0),
            (4.99e-1, "db", -10.0, 0.01),
        ],
    )
