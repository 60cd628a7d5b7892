"""Swept-sine harmonic (Hammerstein) response extraction workflow."""

import numpy as np

from idsp_tpu.ops import sweptsine


def _measure(system):
    sw = sweptsine.Sweep.fit(0.4, 1000.0, 4.0)
    n = int(sw.delay(1000.0)) + 1
    re, _ = sweptsine.accu_osc(sw, n)
    x = np.asarray(re, np.float64) / 2**31
    y = system(x)
    nfft = 1 << int(np.ceil(np.log2(n + 4096)))
    ypad = np.concatenate([y, np.zeros(nfft - n)])
    return sweptsine.harmonic_impulse_responses(sw, ypad, n, 3, 64)


def test_harmonic_extraction_separates_orders():
    # Mildly nonlinear memoryless system: harmonics 2 and 3 show up in
    # their own windows, well separated from the linear response.
    h = _measure(lambda x: x + 0.05 * x**2 - 0.02 * x**3)
    peak1 = np.abs(h[0]).max()
    i1 = int(np.argmax(np.abs(h[0])))
    assert 0.3 < peak1 < 1.5
    assert abs(i1 - 64) <= 3
    e1 = (h[0] ** 2).sum()
    e2 = (h[1] ** 2).sum()
    e3 = (h[2] ** 2).sum()
    assert e2 > 1e-4 * e1
    assert e3 > 1e-5 * e1


def test_linear_system_has_no_harmonic_energy():
    h = _measure(lambda x: 0.5 * x)
    assert (h[1] ** 2).sum() < 1e-4 * (h[0] ** 2).sum()
    assert (h[2] ** 2).sum() < 1e-4 * (h[0] ** 2).sum()
