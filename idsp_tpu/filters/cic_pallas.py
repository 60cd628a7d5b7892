"""Pallas bank kernels for the CIC integrator cascade (cic.rs:13-200).

The XLA block path (filters/cic.py) runs the N integrator stages as N
chained `jnp.cumsum` passes — each a full-rate HBM round trip.  Here
the whole integrator cascade is ONE sequential bank kernel (the
`_seq_bank_kernel` family): N wrapping i32 adds per sample, channels
vectorized on lanes, with the keep-1-in-R decimation in the kernel
epilogue so only slow-rate rows leave VMEM.  The comb chain runs at the
slow rate (1/R of the data) and stays in XLA where it is cheap.

Bit-exactness: pure wrapping integer arithmetic — outputs and carried
state are bit-identical to `cic.decimate_block` / `cic.interpolate_block`
(axis=0), which are themselves equivalence-tested against the
per-sample reference mirror (the cic.rs:305-387 pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .biquad_pallas import _bank_call, _seq_bank_kernel, as_vma
from .cic import CicState, _comb_chain


def _integ_body(n: int):
    """carry = (int_1 .. int_N) rows; chained wrapping adds."""

    def body(carry, x, extras):
        del extras
        outs = []
        cur = x
        for i in range(n):
            cur = carry[i] + cur
            outs.append(cur)
        return tuple(outs), cur

    return body


def _pack_integ(integrators, cs):
    # (c, N) -> (N, cs, 128)
    n = integrators.shape[-1]
    return jnp.moveaxis(integrators, -1, 0).reshape(n, cs, 128)


def _unpack_integ(st_out, c):
    # (N, cs, 128) -> (c, N)
    n = st_out.shape[0]
    return jnp.moveaxis(st_out.reshape(n, c), 0, -1)


@functools.partial(
    jax.jit,
    static_argnames=("rate", "n", "time_chunk", "unroll", "interpret",
                     "vma"),
)
def _cic_dec_impl(state, x, rate, n, *, time_chunk, unroll, interpret,
                  vma=None):
    r = rate + 1
    t, c = x.shape
    cs = c // 128
    st_in = _pack_integ(state.integrators, cs)
    sampled, st_out = _bank_call(
        _seq_bank_kernel(_integ_body(n), unroll=unroll, dec=r),
        st_in, x.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret, vma=vma,
    )
    sampled = sampled.reshape(t // r, c)
    new_combs, y = _comb_chain(state.combs, sampled, axis=0)
    return (
        CicState(
            combs=new_combs,
            integrators=_unpack_integ(st_out, c),
            zoh=y[-1],
        ),
        y,
    )


def cic_dec_bank(state: CicState, x, rate: int, *, time_chunk: int = 512,
                 unroll: int = 4, interpret: bool = False, vma=None):
    """Decimate a time-major (t, c) i32 block by R = rate+1.

    Drop-in kernel replacement for `cic.decimate_block(state, x, rate,
    axis=0)` with channel-shaped state (`cic.init(n, m, (c,))`),
    c % 128 == 0.  Returns (new_state, y) with y (t // R, c),
    bit-identical to the XLA path.
    """
    r = rate + 1
    t, c = x.shape
    assert c % 128 == 0, "channel count must be a multiple of 128"
    assert t % r == 0, "block length must be a multiple of rate+1"
    n = int(state.integrators.shape[-1])
    assert n > 0, "kernel path needs at least one integrator stage"
    return _cic_dec_impl(state, x, rate, n, time_chunk=time_chunk,
                         unroll=unroll, interpret=interpret,
                         vma=as_vma(vma))


@functools.partial(
    jax.jit,
    static_argnames=("rate", "n", "time_chunk", "unroll", "interpret",
                     "vma"),
)
def _cic_int_impl(state, x, rate, n, *, time_chunk, unroll, interpret,
                  vma=None):
    r = rate + 1
    t, c = x.shape
    cs = c // 128
    new_combs, cmb = _comb_chain(state.combs, x, axis=0)
    zoh = jnp.repeat(cmb, r, axis=0)
    st_in = _pack_integ(state.integrators, cs)
    y, st_out = _bank_call(
        _seq_bank_kernel(_integ_body(n), unroll=unroll),
        st_in, zoh.reshape(t * r, cs, 128),
        time_chunk=time_chunk, interpret=interpret, vma=vma,
    )
    return (
        CicState(
            combs=new_combs,
            integrators=_unpack_integ(st_out, c),
            zoh=cmb[-1],
        ),
        y.reshape(t * r, c),
    )


def cic_int_bank(state: CicState, x, rate: int, *, time_chunk: int = 512,
                 unroll: int = 4, interpret: bool = False, vma=None):
    """Interpolate a time-major (t, c) i32 block by R = rate+1.

    Drop-in kernel replacement for `cic.interpolate_block(state, x,
    rate, axis=0)`: combs + ZOH at the slow rate in XLA, the N-stage
    integrator cascade (the full-rate hot path) as one kernel.
    Returns (new_state, y) with y (t * R, c), bit-identical.
    """
    t, c = x.shape
    assert c % 128 == 0, "channel count must be a multiple of 128"
    n = int(state.integrators.shape[-1])
    assert n > 0, "kernel path needs at least one integrator stage"
    return _cic_int_impl(state, x, rate, n, time_chunk=time_chunk,
                         unroll=unroll, interpret=interpret,
                         vma=as_vma(vma))
