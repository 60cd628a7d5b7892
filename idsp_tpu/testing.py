"""Spectral quality metrics and tolerance helpers for acceptance tests.

Equivalent of reference src/testing.rs (DdsMetrics, isclose/allclose,
real_fft_power) on jnp.fft.  These are first-class: the reference gates
its DDS and filter quality on SFDR/SNR/THD numbers computed exactly this
way (src/cossin.rs:232-248, src/hbf.rs:597-634).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def max_error(a, b, rtol, atol):
    """rtol * max(|a|, |b|) + atol (testing.rs:20-22)."""
    return rtol * np.maximum(np.abs(a), np.abs(b)) + atol


def isclose(a, b, rtol, atol):
    return np.abs(a - b) <= max_error(a, b, rtol, atol)


def allclose(a, b, rtol, atol):
    return bool(np.all(isclose(np.asarray(a), np.asarray(b), rtol, atol)))


def complex_allclose(a, b, rtol, atol):
    a = np.asarray(a)
    b = np.asarray(b)
    return allclose(a.real, b.real, rtol, atol) and allclose(
        a.imag, b.imag, rtol, atol
    )


def db(ratio):
    """Power ratio to dB (testing.rs:69-71)."""
    return 10.0 * np.log10(ratio)


def real_fft_power(x):
    """One-sided power spectrum of a real sequence (testing.rs:74-80):
    bins 0..=n/2 of |FFT|^2 (no window, no scaling)."""
    x = jnp.asarray(x, dtype=jnp.float64)
    spec = jnp.fft.fft(x)
    n = x.shape[-1]
    return np.asarray(jnp.abs(spec[..., : n // 2 + 1]) ** 2)


def complex_fft_power(z):
    """|FFT|^2 of a complex sequence (cossin.rs:106-114)."""
    spec = jnp.fft.fft(jnp.asarray(z, dtype=jnp.complex128))
    return np.asarray(jnp.abs(spec) ** 2)


def _alias_real_bin(bin_: int, n: int) -> int:
    bin_ = bin_ % n
    return min(bin_, n - bin_)


@dataclass(frozen=True)
class DdsMetrics:
    """Coherent single-tone metrics in dBc (testing.rs:52-66)."""

    carrier_bin: int
    strongest_spur_bin: int
    sfdr_db: float
    snr_db: float
    thd_db: float
    thdn_db: float


def dds_metrics(x, carrier_bin: int, harmonics: int) -> DdsMetrics:
    """SFDR/SNR/THD/THD+N of a coherent real tone (testing.rs:91-131).

    Harmonic bins are h*carrier_bin folded into the one-sided spectrum;
    everything else (except DC aside: bin 0 is counted as noise like the
    reference) contributes to noise.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[-1]
    power = real_fft_power(x)
    carrier = power[carrier_bin]

    harmonic_bins = {
        b
        for b in (_alias_real_bin(h * carrier_bin, n) for h in range(2, harmonics + 1))
        if b not in (0, carrier_bin)
    }

    mask = np.ones_like(power, dtype=bool)
    mask[carrier_bin] = False
    spur_power = np.where(mask, power, -np.inf)
    strongest_spur_bin = int(np.argmax(spur_power))
    strongest_spur = power[strongest_spur_bin]

    thdn = float(power[mask].sum())
    hsel = np.zeros_like(mask)
    for b in harmonic_bins:
        hsel[b] = True
    thd = float(power[hsel & mask].sum())
    noise = float(power[mask & ~hsel].sum())

    return DdsMetrics(
        carrier_bin=carrier_bin,
        strongest_spur_bin=strongest_spur_bin,
        sfdr_db=float(db(carrier / strongest_spur)),
        snr_db=float(db(carrier / noise)),
        thd_db=float(db(carrier / thd)),
        thdn_db=float(db(carrier / thdn)),
    )
