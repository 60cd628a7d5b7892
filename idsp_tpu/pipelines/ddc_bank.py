"""Wideband multi-channel DDC bank with per-channel PLL carrier tracking.

BASELINE config #5: a wideband input stream feeds C digital
downconverters (C = 1024 in the headline config), each with its own NCO
frequency, a shared-coefficient I/Q lowpass, decimation, and a
per-channel PLL tracking the residual carrier phase.

TPU structure:
* NCO phases are closed-form wrapping ramps (no scan) -> `cossin` DDS,
  (t, c) vectorized.
* The mix is the fixed-point late-quantize complex multiply.
* The I/Q lowpass is the integer `Lowpass<2>` with channels on lanes
  (one shared gain config — the `Lanes` pattern).
* Decimation is a strided slice (phase-aligned blocks).
* The PLL bank scans time once for all channels (7 words/channel).

Sharding: channels are embarrassingly parallel — shard (t, c) arrays on
the c axis (`parallel.channel_sharding`); time-block sharding composes
via the carried state like any stage in `parallel.stream`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..filters import lowpass, pll
from ..ops import accu
from ..ops.trig import atan2, cossin
from .. import fxp


class DdcBankState(NamedTuple):
    nco_phase: jax.Array  # (c,) i32
    lp_i: lowpass.LowpassState  # (c, N) i64
    lp_q: lowpass.LowpassState
    pll: pll.PllState  # per-channel


def init(n_channels: int, lp_order: int = 2) -> DdcBankState:
    return DdcBankState(
        nco_phase=jnp.zeros((n_channels,), jnp.int32),
        lp_i=lowpass.init(lp_order, (n_channels,)),
        lp_q=lowpass.init(lp_order, (n_channels,)),
        pll=pll.init((n_channels,)),
    )


class DdcBankBiquadState(NamedTuple):
    """Variant state with a Q32 biquad (Pallas bank kernel) as the
    channel filter instead of the integer Lowpass."""

    nco_phase: jax.Array
    bq: object  # biquad.Df1State over (2c,) I|Q lanes
    pll: object


def init_biquad(n_channels: int) -> DdcBankBiquadState:
    from ..filters import biquad as bq

    return DdcBankBiquadState(
        nco_phase=jnp.zeros((n_channels,), jnp.int32),
        bq=bq.df1_init((2 * n_channels,), jnp.int32),
        pll=pll.init((n_channels,)),
    )


@partial(
    jax.jit,
    static_argnames=("decimate", "f", "ba_q", "pll_ba", "lo_mode",
                     "time_chunk", "unroll", "interpret"),
)
def ddc_bank_block_biquad(
    state: DdcBankBiquadState,
    x,
    nco_steps,
    ba_q,
    pll_ba,
    *,
    decimate: int = 16,
    f: int = 29,
    lo_mode: str = "exact",
    time_chunk: int = 128,
    unroll: int = 4,
    interpret: bool = False,
):
    """DDC bank with the Pallas Q32 biquad as the channel filter.

    Same structure as `ddc_bank_block` but the I/Q lowpass is the
    `df1_bank_q` Pallas kernel (see benches/RESULTS.md for the
    canonical rate; c must be a multiple of 64 so the stacked I|Q bank
    is a multiple of 128 — except lo_mode="one_kernel", whose PLL
    state tiles need c itself to be a multiple of 128).  ``ba_q`` and ``pll_ba``
    are STATIC tuples of ints (the kernels bake coefficients as
    constants; use `df1_bank_q_coef` for runtime retune).

    ``lo_mode="fast"`` mixes with the coarse/fine factored LO
    (ops/fastlo.py) instead of the exact LUT `cossin` — the documented
    SNR-gated fast path (mix LSB-rounding noise ~-130 dBc, far below
    the PLL tracking floor); "exact" is bit-exact with the reference
    semantics.
    """
    t = x.shape[0]
    c = state.nco_phase.shape[0]
    assert t % decimate == 0

    # Split composition: XLA mix (the cossin select chain fuses into
    # the concat output) -> Pallas DF1 bank.  Measured FASTER on a real
    # v5e than the fused NCO+mix+biquad kernel (`ddc_mix_df1_bank`):
    # Mosaic's in-kernel select chain costs ~1.7x XLA's even with the
    # sub-chunked mix (scripts/tpu_fused_sub_probe.py vs
    # tpu_split_probe.py: 2.6 ms vs 3.2 ms for the mix+DF1 front end).
    if lo_mode == "one_kernel":
        # the ENTIRE per-channel stack (fast-LO mix + DF1 + decimate +
        # atan2 + PLL) in one kernel — bit-identical to the
        # "fast_fused" + atan2 + pll composition
        from ..filters.ddc_pallas import fastlo_ddc_bank_block

        bq_state, pll_state, _ph, yiq_d = fastlo_ddc_bank_block(
            ba_q, pll_ba, state.bq, state.pll, state.nco_phase,
            nco_steps, x, f, d=decimate, time_chunk=time_chunk,
            unroll=unroll, interpret=interpret,
        )
        yi_d = yiq_d[:, :c]
        yq_d = yiq_d[:, c:]
        new_state = DdcBankBiquadState(
            nco_phase=accu.advance(state.nco_phase, nco_steps, t),
            bq=bq_state,
            pll=pll_state,
        )
        return new_state, (yi_d, yq_d, pll.frequency(pll_state))
    if lo_mode == "fast_fused":
        # the whole front end (fast-LO mix + DF1 + decimate) in ONE
        # kernel — the full-rate mixed stream never touches HBM
        from ..filters.ddc_pallas import fastlo_df1_dec_bank

        bq_state, _ph, yiq_d = fastlo_df1_dec_bank(
            ba_q, state.bq, state.nco_phase, nco_steps, x, f,
            d=decimate, interpret=interpret,
        )
    else:
        from ..filters.biquad_pallas import df1_bank_q_dec

        if lo_mode == "fast":
            from ..ops.fastlo import fastlo_mix

            # largest pow2 fine-table len dividing t
            k = math.gcd(t, 128)
            miq = fastlo_mix(x, state.nco_phase, nco_steps, k)
        else:
            phases = accu.ramp_t(state.nco_phase, nco_steps, t)
            lo_re, lo_im = cossin(phases)
            xi = x[:, None]
            mi = fxp.q_apply(lo_re, xi, 32)
            mq = fxp.q_apply(-lo_im, xi, 32)
            miq = jnp.concatenate([mi, mq], axis=1)
        # keep-1-in-d decimation in the kernel epilogue: cuts the
        # kernel's output HBM traffic by d and replaces the separate
        # reshape+slice pass (a bare `yiq[::d]` would lower to a
        # while-loop gather on TPU anyway — profiled at ~11 ms/block
        # at (65536, 2048)).
        bq_state, yiq_d = df1_bank_q_dec(
            ba_q, state.bq, miq, f, d=decimate, interpret=interpret
        )
    yi_d = yiq_d[:, :c]
    yq_d = yiq_d[:, c:]

    ph = atan2(yq_d, yi_d)
    if (
        c % 128 == 0
        and ph.shape[0] % 8 == 0
        and jax.default_backend() in ("tpu", "axon")
    ):
        from ..filters.pll_pallas import pll_bank

        pll_state, _ = pll_bank(pll_ba, state.pll, ph)
    else:
        pll_state, _ = pll.block(
            jnp.asarray(np.asarray(pll_ba, np.int64).astype(np.int32)),
            state.pll, ph,
        )

    new_state = DdcBankBiquadState(
        nco_phase=accu.advance(state.nco_phase, nco_steps, t),
        bq=bq_state,
        pll=pll_state,
    )
    return new_state, (yi_d, yq_d, pll.frequency(pll_state))


@partial(
    jax.jit,
    static_argnames=("decimate", "lp_gains", "pll_ba", "lo_mode",
                     "time_chunk", "unroll",
                     "interpret"),
)
def ddc_bank_block(
    state: DdcBankState,
    x,
    nco_steps,
    lp_gains,
    pll_ba,
    *,
    decimate: int = 16,
    lo_mode: str = "exact",
    time_chunk: int = 128,
    unroll: int = 4,
    interpret: bool = False,
):
    """Process one block. x: (t,) i32 wideband samples; t must be a
    multiple of `decimate`.

    ``lp_gains`` and ``pll_ba`` are STATIC tuples of ints (they feed
    Pallas kernels as baked constants on TPU).  ``lo_mode="fast"``
    mixes with the SNR-gated coarse/fine LO (ops/fastlo.py).

    Returns (state, (i, q, phase, frequency)) at the decimated rate,
    each (t/decimate, c).
    """
    lp_gains = np.asarray(lp_gains, np.int64).astype(np.int32)
    pll_arr = jnp.asarray(np.asarray(pll_ba, np.int64).astype(np.int32))
    t = x.shape[0]
    c = state.nco_phase.shape[0]
    assert t % decimate == 0

    if lo_mode == "one_kernel":
        # the ENTIRE per-channel stack (fast-LO mix + Lowpass2 +
        # decimate + atan2 + PLL) in one kernel per block
        from ..filters.ddc_pallas import fastlo_ddc_bank_block_lp

        lp_iq = lowpass.LowpassState(
            p=jnp.concatenate([state.lp_i.p, state.lp_q.p], axis=0)
        )
        n_lp = state.lp_i.p.shape[-1]
        lp_iq, pll_state, _ph, yiq_d, y_pll = fastlo_ddc_bank_block_lp(
            tuple(int(v) for v in lp_gains), pll_ba, lp_iq, state.pll,
            state.nco_phase, nco_steps, x, n=n_lp, d=decimate,
            time_chunk=time_chunk, unroll=unroll, interpret=interpret,
        )
        yi_d, yq_d = yiq_d[:, :c], yiq_d[:, c:]
        new_state = DdcBankState(
            nco_phase=accu.advance(state.nco_phase, nco_steps, t),
            lp_i=lowpass.LowpassState(p=lp_iq.p[:c]),
            lp_q=lowpass.LowpassState(p=lp_iq.p[c:]),
            pll=pll_state,
        )
        return new_state, (yi_d, yq_d, y_pll, pll.frequency(pll_state))

    if lo_mode == "fast":
        from ..ops.fastlo import fastlo_mix

        k = math.gcd(t, 128)  # largest pow2 fine-table len dividing t
        miq = fastlo_mix(x, state.nco_phase, nco_steps, k)
        mix_i, mix_q = miq[:, :c], miq[:, c:]
    else:
        # per-channel NCO (t, c), continuing from the carried phase
        phases = accu.ramp_t(state.nco_phase, nco_steps, t)
        lo_re, lo_im = cossin(phases)
        # conjugate mix: x * exp(-j phi) with Q32<32> LO
        xi = x[:, None]
        mix_i = fxp.q_apply(lo_re, xi, 32)
        mix_q = fxp.q_apply(-lo_im, xi, 32)

    use_kernels = c % 128 == 0 and jax.default_backend() in ("tpu", "axon")
    if use_kernels:
        # kernel path: one fused I|Q lowpass bank on 2c lanes with the
        # keep-1-in-d decimation in the kernel epilogue (output HBM
        # traffic / d; the separate reshape+slice pass disappears)
        from ..filters.lowpass_pallas import lowpass_bank

        lp_iq = lowpass.LowpassState(
            p=jnp.concatenate([state.lp_i.p, state.lp_q.p], axis=0)
        )
        lp_iq, yiq_d = lowpass_bank(
            lp_gains, lp_iq, jnp.concatenate([mix_i, mix_q], axis=1),
            dec=decimate,
        )
        lp_i = lowpass.LowpassState(p=lp_iq.p[:c])
        lp_q = lowpass.LowpassState(p=lp_iq.p[c:])
        yi_d, yq_d = yiq_d[:, :c], yiq_d[:, c:]
    else:
        lp_i, yi = lowpass.block(jnp.asarray(lp_gains), state.lp_i, mix_i)
        lp_q, yq = lowpass.block(jnp.asarray(lp_gains), state.lp_q, mix_q)
        # decimate (t, c) -> (t/d, c); reshape + unit slice, NOT a
        # stride-d slice (which lowers to a while-loop gather on TPU)
        yi_d = yi.reshape(t // decimate, decimate, c)[:, 0, :]
        yq_d = yq.reshape(t // decimate, decimate, c)[:, 0, :]

    # per-channel PLL on the residual carrier phase
    ph = atan2(yq_d, yi_d)
    if use_kernels and ph.shape[0] % 8 == 0:
        from ..filters.pll_pallas import pll_bank

        pll_state, y_pll = pll_bank(pll_ba, state.pll, ph)
    else:
        pll_state, y_pll = pll.block(pll_arr, state.pll, ph)

    new_state = DdcBankState(
        nco_phase=accu.advance(state.nco_phase, nco_steps, t),
        lp_i=lp_i,
        lp_q=lp_q,
        pll=pll_state,
    )
    return new_state, (yi_d, yq_d, y_pll, pll.frequency(pll_state))


def make_tone_bank(steps, n, amplitude=1 << 27, offsets=None):
    """Fixture: a sum of per-channel carriers with small frequency
    offsets (what each channel's PLL should acquire)."""
    steps = np.asarray(steps, np.int64)
    if offsets is None:
        offsets = np.zeros_like(steps)
    phases = accu.ramp(
        jnp.zeros(len(steps), jnp.int32),
        jnp.asarray((steps + offsets).astype(np.int32)),
        n,
    )  # (c, t)
    re, _ = cossin(phases)
    tones = (re.astype(jnp.int64) * amplitude) >> 31
    return jnp.sum(tones, axis=0).astype(jnp.int32)
