"""One-kernel fixed-point FM discriminator receiver bank.

The composed `pipelines.fm_disc.fm_receiver` (reference
examples/fm_disc.rs:26-48, BASELINE config #1) runs the discriminator
(conjugate product + atan2 + carrier subtract) as an XLA elementwise
pass and the Q32<30> deemphasis biquad as a Pallas bank — paying an
HBM round trip for the full-rate `dphi` plane in between.  This kernel
fuses the entire receiver: per block it reads only the (t, c) IQ
planes and writes only the (t, c) output; the discriminator runs
vectorized in sub-chunks (the atan2 select/limb chain holds many live
u32 intermediates — a whole-chunk pass spills scoped VMEM, the same
lesson as the cossin mix, CLAUDE.md) into a VMEM scratch that the
sequential DF1 loop consumes.

Bit-identical to `fm_receiver` (and so to the scan): the conjugate
product is the same late-quantize ``Complex<Q32<32>> * Complex<i32>``
(negate-then-widen, >> 32 == emulated-i64 high word), the angle is the
kernel-traceable `ddc_pallas.atan2_i32` (bit-equal to `ops.trig.atan2`),
and the biquad is the same `_mac5_q` limb MAC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biquad import Df1State
from .biquad_pallas import (
    _add_i64,
    _mac5_q,
    _mul_i32_i32_to_i64,
    _pick_time_chunk,
    _shr_i64_to_i32,
    _sub_i64,
)
from .ddc_pallas import atan2_f32_word, atan2_i32


def _disc_rows(a_re, a_im, b_re, b_im, carrier: int):
    """Discriminator on a row group: z = a * conj(b), dphi = arg(z) - c.

    Matches `cplx.mul_q(a_re, a_im, b_re, -b_im, 32)` exactly: the
    conjugate negation wraps in i32 BEFORE widening (fm_disc.py:68),
    and ``>> 32`` of the i64 accumulator is its high word.
    """
    nim = jnp.int32(0) - b_im  # wrapping conj negate (pre-widen)
    ar = _mul_i32_i32_to_i64(a_re, b_re)
    ai = _mul_i32_i32_to_i64(a_im, nim)
    z_re = _sub_i64(ar, ai)[0]
    br = _mul_i32_i32_to_i64(a_re, nim)
    bi = _mul_i32_i32_to_i64(a_im, b_re)
    z_im = _add_i64(br, bi)[0]
    return atan2_i32(z_im, z_re) - jnp.int32(carrier)


def _disc_rows_fast(a_re, a_im, b_re, b_im, carrier: int):
    """f32 discriminator (the ``angle="fast"`` path): the conjugate
    product and the angle run in f32 — ~30 lane-ops/sample instead of
    the ~700 emulated-limb ops of the bit-exact path.

    Error vs the exact discriminator: f32 product rounding (2^-24
    relative on each term) + 3.4e-7 rad polynomial — worst case a few
    hundred LSB of the i32 phase word, far inside the reference FM
    example's acceptance gates (corr > 0.999, rms < 5e-4,
    fm_disc.rs:151-157).  The deemphasis biquad downstream stays
    bit-exact integer.
    """
    f32 = jnp.float32
    ar = a_re.astype(f32)
    ai = a_im.astype(f32)
    br = b_re.astype(f32)
    bi = b_im.astype(f32)
    z_re = ar * br + ai * bi
    z_im = ai * br - ar * bi
    return atan2_f32_word(z_im, z_re) - jnp.int32(carrier)


def fm_effective_time_chunk(c: int, t: int, requested: int, *,
                            unroll: int = 4, trig_sub: int = 8) -> int:
    """The post-VMEM-clamp time chunk `fm_disc_bank` will actually run
    with — the single source of truth for the kernel's VMEM budget
    (probes print this instead of re-deriving the formula; ADVICE r3:
    a silently clamped request can alias sweep configs)."""
    vmem_cap = max(8, (10 * 2**20) // (24 * c))
    return _pick_time_chunk(t, vmem_cap, unroll, 1, requested,
                            max(trig_sub, 1))


def fm_disc_bank(ba, state, re, im, carrier: int, f: int = 30, *,
                 time_chunk: int = 1024, unroll: int = 4,
                 trig_sub: int = 8, angle: str = "exact",
                 interpret: bool = False):
    """The whole FM receiver in ONE kernel over a channel bank.

    Note (honest median-of-differences re-measurement, round 4 —
    benches/RESULTS.md): the composed XLA path (`fm_disc.fm_receiver`)
    is ~8x FASTER on a single chip (~7.1 GS/s vs ~0.9 for this kernel
    at c=512), and ``angle="fast"`` (f32 conjugate product +
    `atan2_f32_word`, ~30 lane-ops/sample vs ~736 for the limb
    `atan2_i32`, SNR-gated, passes the reference FM gates) does NOT
    close the gap (~0.8 GS/s) — the bottleneck is not the angle: at
    c=512 the deemphasis DF1 runs on cs=4 half-vreg rows and the
    discriminator prologue is sub-chunked 8 rows at a time, so the
    kernel is latency/overhead-bound regardless of the angle's op
    count.  Earlier claims that the fast-angle variant beats the
    composed path came from min-selected iteration differences
    (retracted — see profiling.measure_rate and ROADMAP round 4).
    This kernel remains the memory-optimal form for streaming
    deployments where the full-rate dphi plane must not touch HBM;
    for single-chip throughput use the composed path.
    ``time_chunk`` REQUESTS 1024; `_pick_time_chunk` VMEM-clamps (at
    c=512 the effective chunk is 512).

    Args:
      ba: (5,) i32 Q32<f> deemphasis coefficients (static).
      state: `pipelines.fm_disc.FmDiscState` with (c,) fields,
        c % 128 == 0 (prev IQ sample + validity + Df1State).
      re, im: (t, c) i32 IQ planes, time-major.
      carrier: static i32 carrier frequency word.
      trig_sub: rows per discriminator sub-pass (VMEM-spill control).

    Returns (state, y) bit-identical to `fm_disc.fm_receiver`.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    st_in = jnp.stack(
        [
            state.prev_re,
            state.prev_im,
            state.prev_valid.astype(jnp.int32),
            state.deemph.x[..., 0],
            state.deemph.x[..., 1],
            state.deemph.y[..., 0],
            state.deemph.y[..., 1],
        ],
        axis=0,
    )
    st_out, ys = _fm_disc_bank_impl(
        ba_static, int(carrier), f, st_in, re, im,
        time_chunk=time_chunk, unroll=unroll, trig_sub=trig_sub,
        angle=angle, interpret=interpret,
    )
    from ..pipelines.fm_disc import FmDiscState

    new_state = FmDiscState(
        prev_re=st_out[0],
        prev_im=st_out[1],
        prev_valid=st_out[2] != 0,
        deemph=Df1State(
            x=jnp.stack([st_out[3], st_out[4]], axis=-1),
            y=jnp.stack([st_out[5], st_out[6]], axis=-1),
        ),
    )
    return new_state, ys


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "carrier", "f", "time_chunk", "unroll",
                     "trig_sub", "angle", "interpret"),
)
def _fm_disc_bank_impl(ba_static, carrier, f, st_in, re, im, *,
                       time_chunk, unroll, trig_sub, angle="exact",
                       interpret):
    if angle not in ("exact", "fast"):
        # never silently demote the documented bit-exact path
        raise ValueError(
            f"angle must be 'exact' or 'fast', got {angle!r}"
        )
    disc = _disc_rows if angle == "exact" else _disc_rows_fast
    t, c = re.shape
    assert c % 128 == 0
    cs = c // 128
    # in (2cs) + out (cs) double-buffered + dphi scratch (cs) + trig
    # temporaries: budget like the fused cascades (single source of
    # truth shared with the probes — `fm_effective_time_chunk`)
    time_chunk = fm_effective_time_chunk(
        c, t, time_chunk, unroll=unroll, trig_sub=trig_sub
    )
    tc = time_chunk
    grid = (t // tc,)

    def kernel(st_in_ref, x_ref, y_ref, out_state_ref, state_ref,
               dphi_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]

        st = state_ref[...]
        prev_re = st[0]
        prev_im = st[1]
        prev_valid = st[2]
        xr = x_ref[:, :cs]
        xi = x_ref[:, cs:]

        # --- discriminator prologue, sub-chunked (spill control) ---
        for s0 in range(0, tc, trig_sub):
            a_re = xr[s0:s0 + trig_sub]
            a_im = xi[s0:s0 + trig_sub]
            if s0 == 0:
                b_re = jnp.concatenate(
                    [prev_re[None], xr[: trig_sub - 1]], axis=0
                )
                b_im = jnp.concatenate(
                    [prev_im[None], xi[: trig_sub - 1]], axis=0
                )
            else:
                b_re = xr[s0 - 1:s0 + trig_sub - 1]
                b_im = xi[s0 - 1:s0 + trig_sub - 1]
            dphi = disc(a_re, a_im, b_re, b_im, carrier)
            if s0 == 0:
                # row 0's "previous sample" comes from the carry; mask
                # it out until the stream's first sample has passed
                # (fm_disc.py:70-73)
                dphi = jnp.concatenate(
                    [
                        jnp.where(
                            prev_valid != 0, dphi[0], jnp.int32(0)
                        )[None],
                        dphi[1:],
                    ],
                    axis=0,
                )
            dphi_ref[s0:s0 + trig_sub] = dphi

        # --- sequential deemphasis DF1 over the dphi scratch ---
        def step(j, packed):
            carry = tuple(packed[rr] for rr in range(4))
            for u in range(unroll):
                i = j * unroll + u
                x1, x2, y1, y2 = carry
                acc = _mac5_q(ba_static, dphi_ref[i], x1, x2, y1, y2)
                y0 = _shr_i64_to_i32(acc[0], acc[1], f)
                carry = (dphi_ref[i], x1, y0, y1)
                y_ref[i] = y0
            return jnp.stack(carry)

        dst = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, st[3:7]
        )

        ones = jnp.ones_like(prev_valid)
        state_ref[...] = jnp.concatenate(
            [xr[tc - 1][None], xi[tc - 1][None], ones[None], dst], axis=0
        )

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = state_ref[...]

    def fixed(rr, ncs):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    def walk(rr, ncs):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    xs3 = jnp.concatenate(
        [re.reshape(t, cs, 128), im.reshape(t, cs, 128)], axis=1
    )
    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(7, cs), walk(tc, 2 * cs)],
        out_specs=[walk(tc, cs), fixed(7, cs)],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs, 128), jnp.int32),
            jax.ShapeDtypeStruct((7, cs, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((7, cs, 128), jnp.int32),
            pltpu.VMEM((tc, cs, 128), jnp.int32),
        ],
        interpret=interpret,
    )(st_in.reshape(7, cs, 128), xs3)
    return st_out.reshape(7, c), ys.reshape(t, c)
