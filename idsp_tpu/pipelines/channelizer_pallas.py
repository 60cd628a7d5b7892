"""One-kernel polyphase channelizer: FIR + cast + DFT matmul fused.

TPU-native analog of reference examples/polyphase_channelizer.rs scaled
to large M: the XLA planes path (`channelizer.channelize_planes`) runs
concat -> 8-tap shifted-slice FIR -> concat -> cast -> (n, 2m)x(2m, 2m)
matmul as separate HBM round trips, and the round-5 stage breakdown
(scripts/tpu_chan_breakdown.py) showed every stage dispatch-floor bound
at n<=4096 and HBM-traffic bound above.  This kernel reads each input
plane once, runs the polyphase FIR into VMEM, casts, and feeds the MXU
directly — the full-rate FIR accumulator never touches HBM:

    HBM bytes/sample: read 8 (z planes) + write 8 (y planes) = 16
    MXU FLOPs/sample: 8m  (four (bn, m) x (m, m) real dots per block)

The polyphase FIR history rides a VMEM scratch across the sequential
grid (the carried-tail choreography of hbf_pallas/_run_fused_cascade),
so state-in/state-out are one (taps-1, m) block each.

Semantics match `channelizer.channelize_planes(..., dft="matmul")`
exactly up to f32 contraction order: the kernel sums two K=m dots where
the XLA path runs one K=2m dot, and the in-kernel FIR FMA contraction
differs across graphs (CLAUDE.md round-3 lessons), so parity is
tolerance + bin-power gated (tests/test_channelizer.py), never
bit-equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..filters.biquad_pallas import as_vma
from .channelizer import PlanesState, _dft_matrix, prototype


def _pick_block_frames(n: int, cap: int, requested: int) -> int:
    """Largest multiple-of-8 divisor of n that is <= min(cap, requested)."""
    best = 0
    for bn in range(8, min(cap, requested, n) + 1, 8):
        if n % bn == 0:
            best = bn
    if best == 0:
        raise ValueError(
            f"no multiple-of-8 block size divides n={n} under cap={cap}"
        )
    return best


def channelize_fused(state: PlanesState, zr, zi, proto=None, *, m: int,
                     taps: int = 8, twiddle_dtype=jnp.bfloat16,
                     block_frames: int = 256, interpret: bool = False,
                     vma=None):
    """Fused planes-layout analysis bank (one Pallas kernel).

    Args:
      state: `channelizer.PlanesState` with hist planes (taps-1, m).
      zr, zi: (n, m) f32 I/Q planes, m % 128 == 0, n a multiple of 8.
      twiddle_dtype: DFT matmul operand precision (both the FIR output
        and the DFT matrix are cast to it; f32 and bf16 run at the same
        measured MXU rate on v5e — ROOFLINE.md peaks — but f32 doubles
        the resident twiddle VMEM, shrinking the frame block).
      block_frames: requested frames per grid step (auto-clamped by the
        VMEM model and to a divisor of n).

    Returns (new_state, yr, yi), planes shaped like the inputs.
    """
    if proto is None:
        proto = prototype(m, taps)
    coeff_key = tuple(float(v) for v in np.asarray(proto, np.float32))
    n, mm = zr.shape
    assert mm == m and zi.shape == (n, m)
    new_hr, new_hi, yr, yi = _channelize_fused_impl(
        coeff_key, state.hist_r, state.hist_i, zr, zi,
        m=m, taps=taps, twiddle_dtype=jnp.dtype(twiddle_dtype),
        block_frames=block_frames, interpret=interpret, vma=as_vma(vma),
    )
    return PlanesState(hist_r=new_hr, hist_i=new_hi), yr, yi


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("m", "taps", "twiddle_dtype", "block_frames",
                     "interpret", "vma"),
)
def _channelize_fused_impl(coeff_key, hist_r, hist_i, zr, zi, *, m, taps,
                           twiddle_dtype, block_frames, interpret, vma=None):
    assert taps >= 2
    h = taps - 1
    n = zr.shape[0]
    assert m % 128 == 0, "channel count must be a multiple of 128"
    assert hist_r.shape == (h, m)
    tw = twiddle_dtype
    tw_bytes = jnp.dtype(tw).itemsize

    coeff = jnp.asarray(
        np.asarray(coeff_key, np.float32).reshape(taps, m))
    w = _dft_matrix(m)
    wr = jnp.asarray(np.real(w).astype(np.float32)).astype(tw)
    wi = jnp.asarray(np.imag(w).astype(np.float32)).astype(tw)

    # VMEM model: double-buffered walked blocks (z in, y out: 4 planes
    # x 2 buffers x 4 B) + ext scratch (2 planes x 4 B) + the resident
    # twiddles, under a ~12 MB budget.
    per_row = (4 * 2 * 4 + 2 * 4) * m
    budget = 12 * 2**20 - 2 * m * m * tw_bytes
    cap = max(8, budget // per_row)
    bn = _pick_block_frames(n, cap, block_frames)
    grid = (n // bn,)

    def kernel(hr_in, hi_in, zr_ref, zi_ref, wr_ref, wi_ref, co_ref,
               yr_ref, yi_ref, hr_out, hi_out,
               halo_r, halo_i, ext_r, ext_i):
        i = pl.program_id(0)
        nblk = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            halo_r[...] = hr_in[...]
            halo_i[...] = hi_in[...]

        zr_v = zr_ref[...]
        zi_v = zi_ref[...]
        ext_r[0:h] = halo_r[...]
        ext_i[0:h] = halo_i[...]
        ext_r[h:h + bn] = zr_v
        ext_i[h:h + bn] = zi_v
        halo_r[...] = zr_v[bn - h:]
        halo_i[...] = zi_v[bn - h:]

        # y[t] = sum_tap coeff[tap] * frame[t - tap] (tap 0 newest) —
        # identical tap order to channelize_planes.
        acc_r = acc_i = None
        for tap in range(taps):
            cv = co_ref[tap:tap + 1]
            tr = ext_r[h - tap:h - tap + bn] * cv
            ti = ext_i[h - tap:h - tap + bn] * cv
            acc_r = tr if acc_r is None else acc_r + tr
            acc_i = ti if acc_i is None else acc_i + ti

        ar = acc_r.astype(tw)
        ai = acc_i.astype(tw)
        wr_v = wr_ref[...]
        wi_v = wi_ref[...]
        # y = (ar + j ai) @ (wr + j wi): four (bn, m) x (m, m) MXU dots
        yr_ref[...] = (
            jnp.dot(ar, wr_v, preferred_element_type=jnp.float32)
            - jnp.dot(ai, wi_v, preferred_element_type=jnp.float32)
        )
        yi_ref[...] = (
            jnp.dot(ar, wi_v, preferred_element_type=jnp.float32)
            + jnp.dot(ai, wr_v, preferred_element_type=jnp.float32)
        )

        @pl.when(i == nblk - 1)
        def _():
            hr_out[...] = halo_r[...]
            hi_out[...] = halo_i[...]

    def fixed(rows, cols):
        return pl.BlockSpec(
            (rows, cols), lambda i: (i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    walk = pl.BlockSpec(
        (bn, m), lambda i: (i, i * 0), memory_space=pltpu.VMEM
    )

    yr, yi, new_hr, new_hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(h, m), fixed(h, m), walk, walk,
                  fixed(m, m), fixed(m, m), fixed(taps, m)],
        out_specs=[walk, walk, fixed(h, m), fixed(h, m)],
        out_shape=(
            jax.ShapeDtypeStruct((n, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((h, m), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((h, m), jnp.float32, vma=vma),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, m), jnp.float32),
            pltpu.VMEM((h, m), jnp.float32),
            pltpu.VMEM((bn + h, m), jnp.float32),
            pltpu.VMEM((bn + h, m), jnp.float32),
        ],
        interpret=interpret,
    )(hist_r, hist_i, zr, zi, wr, wi, coeff)
    # out_shape order: (yr, yi, hr, hi) matches out_specs order
    return new_hr, new_hi, yr, yi
