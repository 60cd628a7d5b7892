"""Fused DDC-chain Pallas kernels: NCO mix + IIR bank + HBF cascade.

The headline chain (bench.py / examples analog: fm_disc.rs:126-140 runs
the whole per-sample stack fused) previously materialized the mixed
I/Q stream ``miq`` (t, 2c) in HBM between the XLA mix pass and the
Pallas biquad bank — 2x128 MB of pure HBM traffic per 32 K block at
c=512.  The kernels here fold chain stages into one another:

* `ddc_mix_df1_bank` — exact-LO mix (the full `cossin` select chain
  traced in-kernel) + DF1 bank, bit-identical to the split pipeline.
* the fused-cascade family (one composer, `_run_fused_cascade`): a
  sequential IIR bank whose loop parity-splits its output rows into
  VMEM scratch, followed by up to N vectorized half-band FIR stages,
  emitting at 1/2**N rate — the whole filter chain in ONE kernel.
  Instantiations: `df1_hbf1_bank`, `df1_hbf12_bank`,
  `df1_hbf_cascade_bank` (plain DF1), `df1_clamp_hbf_cascade_bank`
  (anti-windup DF1, biquad.rs:399-404), and `fastlo_ddc_cascade_bank`
  (coarse/fine factored LO mixed in the kernel prologue — the entire
  headline chain in one kernel invocation, see ops/fastlo.py for the
  SNR gate).

Bit-exactness: integer IIR state and outputs are bit-identical to the
unfused composition (same limb-emulated i64 MACs, same truncations);
the f32 FIR outputs may differ by ~1 ULP of FMA contraction (measured
bit-exact on v5e); the fast-LO mix is SNR-gated, not bit-exact
(tests/test_fastlo.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import trig
from ..ops import fastlo as _fastlo
from .biquad import Df1State
from .biquad_pallas import (
    _mac5_q, _mul_i32_i32_to_i64, _shr_i64_to_i32, as_vma,
)


def ddc_mix_df1_bank(ba, state: Df1State, phase0, steps, x, f: int = 29, *,
                     time_chunk: int = 512, mix_sub: int = 16,
                     lookup: str = "select", interpret: bool = False,
                     out_dtype=jnp.int32):
    """Fused per-channel NCO mix + Q32 DF1 biquad bank.

    Args:
      ba: (5,) Q<f> coefficients (static, baked).
      state: Df1State over 2c I|Q lanes (x/y (2c, 2) i32), c % 128 == 0.
      phase0: (c,) i32 carried NCO phase (phase BEFORE the first sample;
        sample i mixes with ``cossin(phase0 + steps*(i+1))`` — matching
        the closed-form ramp convention in bench.py / pipelines).
      steps: (c,) i32 per-channel NCO frequency words.
      x: (t,) i32 wideband input.

    Returns (new_state, new_phase0, yiq) with yiq (t, 2c) i32 —
    bit-identical to mixing in XLA then running `df1_bank_q`.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _ddc_mix_df1_bank_impl(
        ba_static, state, phase0, steps, x, f,
        time_chunk=time_chunk, mix_sub=mix_sub, lookup=lookup,
        interpret=interpret, out_dtype=jnp.dtype(out_dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "time_chunk", "mix_sub",
                     "lookup", "interpret", "out_dtype"),
)
def _ddc_mix_df1_bank_impl(ba_static, state, phase0, steps, x, f, *,
                           time_chunk, mix_sub, lookup, interpret,
                           out_dtype=jnp.int32):
    t = x.shape[0]
    c = phase0.shape[0]
    assert c % 128 == 0
    cs = c // 128
    cs2 = 2 * cs

    # VMEM budget: x-in (tc,1,128) + y-out (tc,2cs,128) double-buffered
    # + miq scratch (tc,2cs,128) + the select-chain temporaries.  The
    # mix runs in mix_sub-row sub-chunks precisely so those temporaries
    # (~84 B per sample-channel of scoped VMEM when the whole chunk is
    # mixed at once — 22 MB at tc=512, c=512!) stay bounded by the
    # sub-chunk, not the chunk.
    vmem_cap = max(8, (10 * 2**20) // (24 * c))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8, "cannot find a VMEM-fitting time chunk"
    grid = (t // time_chunk,)
    tc = time_chunk
    unroll = 2
    sub = max(8, min(mix_sub, tc))
    while tc % sub:
        sub //= 2

    def kernel(pp_ref, st_in_ref, x_ref, y_ref, out_state_ref, state_ref,
               miq_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]

        # --- vectorized NCO + mix -> VMEM scratch, in sub-chunks of
        # `sub` rows: each sub-chunk is an independent full-width
        # elementwise pass (latency of the 128-way select chain hides
        # across rows) while Mosaic's temporaries stay ~84 B * sub * c
        # instead of ~84 B * tc * c (which spills past scoped VMEM).
        for s in range(tc // sub):
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, cs, 128), 0)
                + tq * jnp.int32(tc)
                + jnp.int32(s * sub + 1)
            )
            phase = pp_ref[0][None] + pp_ref[1][None] * idx  # wrapping i32
            cos, sin = trig.cossin(phase, lookup=lookup)
            xb = jnp.broadcast_to(
                x_ref[s * sub:(s + 1) * sub], (sub, cs, 128)
            )
            mi = _mul_i32_i32_to_i64(cos, xb)[0]  # (cos*x) >> 32, exact
            mq = _mul_i32_i32_to_i64(-sin, xb)[0]
            miq_ref[s * sub:(s + 1) * sub] = jnp.concatenate(
                [mi, mq], axis=1
            )

        # --- sequential DF1 over the chunk (state in scratch) ---
        def step(j, packed):
            # unpack once per unroll group (see _seq_bank_kernel)
            carry = tuple(packed[r] for r in range(4))
            for u in range(unroll):
                i = j * unroll + u
                x0 = miq_ref[i]
                x1, x2, y1, y2 = carry
                acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
                y0 = _shr_i64_to_i32(acc[0], acc[1], f)
                carry = (x0, x1, y0, y1)
                y_ref[i] = y0.astype(out_dtype)
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st

    pp = jnp.stack([phase0, steps], axis=0).reshape(2, cs, 128)
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs2, 128)
    xb = jnp.broadcast_to(x[:, None, None], (t, 1, 128))

    def fixed(r, ncs):
        return pl.BlockSpec(
            (r, ncs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(2, cs),
            fixed(4, cs2),
            pl.BlockSpec(
                (tc, 1, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tc, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(4, cs2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs2, 128), out_dtype),
            jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, cs2, 128), jnp.int32),
            pltpu.VMEM((tc, cs2, 128), jnp.int32),
        ],
        interpret=interpret,
    )(pp, st_in, xb)

    st_out = st_out.reshape(4, 2 * c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    new_phase0 = phase0 + steps * jnp.int32(t)
    return new_state, new_phase0, ys.reshape(t, 2 * c)


# --- fused IIR + N-stage HBF decimation cascade (kernel composer) ------------
#
# The DDC chain's HBF cost is dominated by data movement, not FIR math:
# the stride-2 even/odd de-interleave of the full-rate (t, 2c) stream is
# a cross-sublane shuffle, and the full-rate block makes an extra HBM
# round trip between the biquad kernel and each decimator.  Fusing the
# cascade into the IIR kernel makes BOTH free: the sequential IIR loop
# writes even/odd output rows to separate VMEM scratch directly (parity
# is static under even unroll), each half-band FIR then runs vectorized
# over contiguous rows, and the kernel output bandwidth shrinks by
# 2**depth.  Mirrors the reference's fused per-sample stack
# (examples/fm_disc.rs:126-140) and the hbf.rs:156-192 decimator.
#
# `_run_fused_cascade` is the single composer owning the BlockSpec /
# scratch / parity plumbing; variants differ only in the IIR `body`
# (plain DF1 or anti-windup clamp DF1) and the optional in-kernel mix
# prologue (the coarse/fine fast LO).


def hbf1_tail_init(c2: int, m: int = 5):
    """Zero tail for a fused cascade stage: (2m-1) odd-sample FIR rows +
    (m-1) even-sample delay rows, packed (3m-2, c2) f32 — the
    Pallas-kernel packing of `hbf.hbf_dec_init(m, axis=0)`."""
    return jnp.zeros((3 * m - 2, c2), jnp.float32)


def _default_taps(taps, depth):
    if taps is None:
        from .hbf import HBF_TAPS

        depth = 3 if depth is None else depth
        taps = tuple(HBF_TAPS[2 - d] for d in range(depth))
    return taps


def _taps_static(taps):
    import numpy as _np

    return tuple(tuple(float(v) for v in _np.asarray(tv)) for tv in taps)


def _ba_static(ba):
    import numpy as _np

    return tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])


def _iir_df1_body(ba_static, f):
    """Plain Q32 DF1: the 5-MAC limb-emulated recurrence
    (biquad.rs:366-383)."""

    def body(carry, x0):
        x1, x2, y1, y2 = carry
        acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        return (x0, x1, y0, y1), y0

    return body


def _iir_df1_clamp_body(ba_static, f, u, lo, hi):
    """Anti-windup DF1: summing-junction offset + output clamp BEFORE
    feedback — the clamped y0 is what enters the y-state
    (biquad.rs:394-404)."""

    def body(carry, x0):
        x1, x2, y1, y2 = carry
        acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        y0 = jnp.clip(y0 + jnp.int32(u), jnp.int32(lo), jnp.int32(hi))
        return (x0, x1, y0, y1), y0

    return body


# --- kernel-traceable atan2 (no 64-bit ints, no gathers) ----------------------
#
# `ops.trig.atan2` uses u64 arithmetic and `lax.clz`, which Mosaic
# cannot lower; this is the same algorithm (src/atan2.rs:12-82) built
# from the kernels' 16-bit-limb machinery: select-tree clz, 16-way
# compare/select reciprocal LUT, limb-emulated Q31 multiplies.  Pure
# jnp — bit-identical to `trig.atan2` both inside kernels and in plain
# XLA (tests/test_biquad_pallas.py gates the full i32 semantics).

_ATAN2_I32_MIN = -2147483648
_ATAN2_I32_MAX = 2147483647


def _mul_q31_limb(a, x):
    """u32 Q31 multiply without rounding bias: (a*x) >> 31 on the
    emulated u64 product (src/atan2.rs:6-9)."""
    from .biquad_pallas import _mul_u32_u32_to_u64

    hi, lo = _mul_u32_u32_to_u64(a, x)
    return (lo >> 31) | (hi << 1)


def _clz32_u32(v):
    """Count leading zeros of u32 (v != 0) via a 5-step select tree."""
    n = jnp.zeros_like(v)
    for bits, mask in ((16, 0xFFFF0000), (8, 0xFF000000),
                      (4, 0xF0000000), (2, 0xC0000000), (1, 0x80000000)):
        z = (v & jnp.uint32(mask)) == 0
        v = jnp.where(z, v << bits, v)
        n = n + jnp.where(z, jnp.uint32(bits), jnp.uint32(0))
    return n


def _divi_kernel(y, x):
    """y/x in Q31 for 0 <= y <= x (src/atan2.rs:12-29): normalize,
    16-entry reciprocal LUT seed (compare/select), one Newton step."""
    from .. import luts
    from .biquad_pallas import _mul_i32_i32_to_i64, _shr_i64_to_i32

    base_t, slope_t = luts.atan2_divi_table()
    frac_bits = 31 - luts.ATAN2_DIVI_DEPTH  # 27

    x_safe = jnp.where(x == 0, jnp.uint32(1), x)
    shift = _clz32_u32(x_safe)
    y = y << shift
    xn = x_safe << shift

    rem = xn & jnp.uint32((1 << frac_bits) - 1)
    idx = (xn << 1) >> (1 + frac_bits)
    base = jnp.zeros_like(idx)
    slope = jnp.zeros_like(idx.astype(jnp.int32))
    for j in range(base_t.shape[0]):
        m = idx == j
        base = jnp.where(m, jnp.uint32(int(base_t[j])), base)
        slope = jnp.where(m, jnp.int32(int(slope_t[j])), slope)
    # (slope * rem) >> 27: rem < 2^27 fits i32, slope i32
    sh, sl = _mul_i32_i32_to_i64(slope, rem.astype(jnp.int32))
    step = _shr_i64_to_i32(sh, sl, frac_bits).astype(jnp.uint32)
    r0 = base + step  # wrapping u32
    r = _mul_q31_limb(
        y, _mul_q31_limb(r0, jnp.uint32(0) - _mul_q31_limb(xn, r0))
    )
    return jnp.where(x == 0, jnp.uint32(0), r)


def _atani_kernel(x):
    """11th-order odd minimax atan on the first octant, Q-format Horner
    (src/atan2.rs:32-48); x u32 Q31 in [0, 1]."""
    from ..ops.trig import _ATANI
    from .biquad_pallas import (
        _mul_i32_i32_to_i64, _mul_u32_i32_to_i64, _mul_u32_u32_to_u64,
    )

    x2hi, _ = _mul_u32_u32_to_u64(x, x)
    x2 = x2hi.astype(jnp.int32)  # (x*x) >> 32, < 2^30
    r = jnp.zeros_like(x2)
    for i in range(_ATANI.shape[0] - 1, -1, -1):
        rhi, _ = _mul_i32_i32_to_i64(r, x2)  # (r*x2) >> 32 == hi word
        r = rhi + jnp.int32(int(_ATANI[i]))  # wrapping add
    fhi, flo = _mul_u32_i32_to_i64(x, r)  # (r*x) exact 64-bit
    return (flo >> 28) | (_as_u32_pl(fhi) << 4)  # low 32 of >> 28


def _as_u32_pl(v):
    return v.astype(jnp.uint32)


def atan2_i32(y, x):
    """Full-circle fixed-point atan2 (src/atan2.rs:66-82), kernel-
    traceable; bit-identical to `ops.trig.atan2`."""
    imin = jnp.int32(_ATAN2_I32_MIN)
    imax = jnp.int32(_ATAN2_I32_MAX)
    k = jnp.zeros(jnp.broadcast_shapes(y.shape, x.shape), dtype=jnp.uint32)
    y = jnp.broadcast_to(y, k.shape)
    x = jnp.broadcast_to(x, k.shape)

    neg_y = y < 0
    y = jnp.where(neg_y, jnp.where(y == imin, imax, -y), y)
    k = jnp.where(neg_y, k ^ jnp.uint32(0xFFFFFFFF), k)

    neg_x = x < 0
    x = jnp.where(neg_x, jnp.where(x == imin, imax, -x), x)
    k = jnp.where(neg_x, k ^ jnp.uint32(0x7FFFFFFF), k)

    swap = y > x
    y, x = jnp.where(swap, x, y), jnp.where(swap, y, x)
    k = jnp.where(swap, k ^ jnp.uint32(0x3FFFFFFF), k)

    r = _atani_kernel(
        _divi_kernel(y.astype(jnp.uint32), x.astype(jnp.uint32))
    )
    return (r ^ k).astype(jnp.int32)


# deg-13 odd minimax-style fit of atan on [0, 1] (Chebyshev-node LSQ;
# max error 2.7e-7 rad exact, 3.4e-7 rad in f32 Horner — 7x inside the
# reference's own atan2 bound of 2.3e-6 rad, src/atan2.rs:150-152).
_ATAN_F32_COEFFS = (
    0.9999966346012426, -0.33318302540856615, 0.19813210086072103,
    -0.13247509251117956, 0.0798109508479018, -0.03372571225910291,
    0.006842548554979471,
)


def atan2_f32_word(y, x):
    """Full-circle atan2 of f32 inputs, returned as the i32 phase word
    (i32::MIN = -pi), kernel-traceable.

    The FAST angle path (SNR-gated, like ops/fastlo.py): ~20 f32
    lane-ops + one divide per element, vs the ~700 emulated-limb i32
    ops of the bit-exact `atan2_i32`.  Max error vs the ideal angle is
    3.4e-7 rad (poly) + input rounding; worst case ~240 LSB of the i32
    word — use where the documented reference error bounds (not bit
    equality) are the acceptance gate.

    Domain caveats (fine for the FM conjugate-product call site, which
    feeds O(2^54)-magnitude products): the 1e-38 divide guard makes
    inputs with max(|x|, |y|) below ~1e-38 return 0 rad regardless of
    quadrant, and -0.0 is treated as +0.0 (atan2(-0.0, x<0) -> +pi).
    Callers with tiny-magnitude or signed-zero inputs need the exact
    `atan2_i32`/`ops.trig.atan2` instead.
    """
    f32 = jnp.float32
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    q = num / jnp.maximum(den, f32(1e-38))
    q2 = q * q
    p = f32(_ATAN_F32_COEFFS[-1])
    for cc in _ATAN_F32_COEFFS[-2::-1]:
        p = p * q2 + f32(cc)
    t = p * q
    t = jnp.where(ay > ax, f32(np.pi / 2) - t, t)
    t = jnp.where(x < 0, f32(np.pi) - t, t)
    t = jnp.where(y < 0, -t, t)
    w = t * f32(2147483648.0 / np.pi)
    # round-half-away (astype truncates toward zero), saturating at +pi
    w = w + jnp.where(w >= 0, f32(0.5), f32(-0.5))
    w = jnp.minimum(w, f32(2147483520.0))  # largest f32 below 2^31
    return w.astype(jnp.int32)


def _x_rows_from_lanes(xl, tc: int):
    """(1, tc//128, 128) row-major packed x block -> (tc, 128) with
    every lane of row i holding x[i], via per-group 128x128 broadcast +
    transpose.

    Streams the scalar input at 4 B/sample instead of the 512 B/sample
    a (t, 1, 128) lane-replicated operand costs (x_layout="lanes")."""
    x2 = xl[...].reshape(tc // 128, 128)
    groups = []
    for g in range(tc // 128):
        m = jnp.broadcast_to(x2[g][None, :], (128, 128))
        groups.append(m.T)
    return groups[0] if len(groups) == 1 else jnp.concatenate(groups, axis=0)


def _fastlo_x_operand(xh, t: int, tc: int, x_layout: str):
    """(operand, BlockSpec) for the pre-scaled scalar input stream —
    lane-packed (4 B/sample) or lane-replicated (512 B/sample)."""
    if x_layout == "lanes":
        assert tc % 128 == 0 and t % tc == 0
        # Grid axis leads; the block covers the WHOLE trailing two dims
        # so Mosaic's (8, 128)-divisibility rule is satisfied for any
        # tc (block dims equal to the array dims are always legal).
        return xh.reshape(t // tc, tc // 128, 128), pl.BlockSpec(
            (1, tc // 128, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )
    return (
        jnp.broadcast_to(xh[:, None, None], (t, 1, 128)),
        pl.BlockSpec(
            (tc, 1, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
    )


def _fastlo_mix_chunk(caf_ref, saf_ref, cbf_ref, sbf_ref, xw_ref, tc: int,
                      cs: int, x_layout: str):
    """In-kernel fast-LO conjugate mix for one chunk: one complex
    multiply per sample against the per-chunk coarse row; returns the
    (tc, 2cs, 128) i32 I|Q block."""
    ca, sa = caf_ref[0], saf_ref[0]  # (cs, 128)
    cb, sb = cbf_ref[...], sbf_ref[...]  # (tc, cs, 128)
    lo_re = ca[None] * cb - sa[None] * sb
    lo_im = sa[None] * cb + ca[None] * sb
    if x_layout == "lanes":
        xt = _x_rows_from_lanes(xw_ref, tc)  # (tc, 128)
        xb = jnp.broadcast_to(xt[:, None, :], (tc, cs, 128))
    else:
        xb = jnp.broadcast_to(xw_ref[...], (tc, cs, 128))
    mi = _fastlo.round_half_away(lo_re * xb).astype(jnp.int32)
    mq = _fastlo.round_half_away(-(lo_im * xb)).astype(jnp.int32)
    return jnp.concatenate([mi, mq], axis=1)


def _fir_even(odd_s, even_s, ln, nn, taps):
    """Vectorized half-band FIR over a chunk: symmetric odd-sample taps
    (small-to-large, same op order as hbf.symmetric_fir) + even-sample
    center-tap bypass."""
    acc = None
    for i in range(len(taps)):
        a = odd_s[i:i + nn]
        b = odd_s[ln - i:ln - i + nn]
        term = (b + a) * jnp.float32(taps[i])
        acc = term if acc is None else acc + term
    return acc + even_s[0:nn]


def _run_fused_cascade(body, taps_static, state, tails, xs, *,
                       time_chunk, unroll, interpret, fastlo_in=None,
                       x_layout="replicate", vma=None):
    """Composer: sequential IIR bank + fused half-band cascade.

    Args:
      body: ``(carry4, x0_i32) -> (carry4, y0_i32)`` per-sample IIR.
      taps_static: tuple of per-stage one-sided tap tuples, highest
        rate first.
      state: Df1State over c2 lanes.
      tails: tuple of per-stage (3*m_d - 2, c2) f32 carried tails.
      xs: (t, c2) i32 input rows, or None when ``fastlo_in`` supplies
        the mix.
      fastlo_in: optional (x, phase0, steps, trig_dtype): the kernel
        computes the conjugate mix in its prologue from coarse/fine
        factored LO tables (ops/fastlo.py) — I lanes [0, c), Q lanes
        [c, 2c).  Requires c2 == 2 * len(phase0).

    Returns (new_state, tails_out, y) with y (t // 2**depth, c2) f32.
    """
    depth = len(taps_static)
    r = 1 << depth
    if fastlo_in is not None:
        x, phase0, steps, trig_dtype = fastlo_in
        t = x.shape[0]
        c = phase0.shape[0]
        c2 = 2 * c
        assert c % 128 == 0
    else:
        t, c2 = xs.shape
        assert c2 % 128 == 0
    assert t % r == 0 and unroll % 2 == 0
    cs2 = c2 // 128
    ms = [len(tv) for tv in taps_static]
    lns = [2 * m - 1 for m in ms]
    mes = [m - 1 for m in ms]
    nts = [ln + me for ln, me in zip(lns, mes)]
    assert len(tails) == depth

    # VMEM model: ~18 B per sample-channel for the parity/tail scratch
    # family; the fastlo variant adds the (tc, cs2) i32 mix scratch,
    # the (tc, cs) fine tables and the f32 mix temporaries (~16 B more).
    per_elem = 34 if fastlo_in is not None else 18
    vmem_cap = max(8, (10 * 2**20) // (per_elem * c2))
    from .biquad_pallas import _pick_time_chunk

    lanes_mult = (
        128 if (fastlo_in is not None and x_layout == "lanes") else 1
    )
    time_chunk = _pick_time_chunk(
        t, vmem_cap, unroll, r, time_chunk, lanes_mult
    )
    tc = time_chunk
    ns = [tc >> (d + 1) for d in range(depth)]  # stage output rows
    grid = (t // tc,)

    n_mix = 5 if fastlo_in is not None else 1

    def kernel(*refs):
        st_in_ref = refs[0]
        tin_refs = refs[1:1 + depth]
        mix_refs = refs[1 + depth:1 + depth + n_mix]
        y_ref = refs[1 + depth + n_mix]
        out_state_ref = refs[2 + depth + n_mix]
        tout_refs = refs[3 + depth + n_mix:3 + 2 * depth + n_mix]
        scr = refs[3 + 2 * depth + n_mix:]
        state_ref = scr[0]
        t_refs = scr[1:1 + depth]
        oe_refs = scr[1 + depth:1 + 3 * depth]  # odd0, even0, odd1, ...
        src_ref = scr[1 + 3 * depth] if fastlo_in is not None else mix_refs[0]

        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]
            for tr, tin in zip(t_refs, tin_refs):
                tr[...] = tin[...]

        if fastlo_in is not None:
            src_ref[...] = _fastlo_mix_chunk(
                *mix_refs, tc, cs2 // 2, x_layout
            )

        for d in range(depth):
            oe_refs[2 * d][0:lns[d]] = t_refs[d][0:lns[d]]
            oe_refs[2 * d + 1][0:mes[d]] = t_refs[d][lns[d]:nts[d]]

        def step(j, packed):
            carry = tuple(packed[rr] for rr in range(4))
            for u in range(unroll):
                carry, y0 = body(carry, src_ref[j * unroll + u])
                k = j * (unroll // 2) + u // 2
                # even unroll => sample parity is static per slot
                if u % 2 == 0:
                    oe_refs[1][mes[0] + k] = y0.astype(jnp.float32)
                else:
                    oe_refs[0][lns[0] + k] = y0.astype(jnp.float32)
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        for d in range(depth):
            yv = _fir_even(oe_refs[2 * d], oe_refs[2 * d + 1], lns[d],
                           ns[d], taps_static[d])
            if d + 1 < depth:
                # parity split rows into the next stage (reshape +
                # unit slice; stride-2 row slices are gathers Mosaic
                # rejects)
                yp = yv.reshape(ns[d + 1], 2, cs2, 128)
                oe_refs[2 * d + 3][mes[d + 1]:mes[d + 1] + ns[d + 1]] = (
                    yp[:, 0]
                )
                oe_refs[2 * d + 2][lns[d + 1]:lns[d + 1] + ns[d + 1]] = (
                    yp[:, 1]
                )
            else:
                y_ref[...] = yv
            t_refs[d][0:lns[d]] = oe_refs[2 * d][ns[d]:ns[d] + lns[d]]
            t_refs[d][lns[d]:nts[d]] = (
                oe_refs[2 * d + 1][ns[d]:ns[d] + mes[d]]
            )

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st
            for tr, tout in zip(t_refs, tout_refs):
                tout[...] = tr[...]

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs2, 128)

    def fixed(rr, ncs=cs2):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    if fastlo_in is not None:
        cs = cs2 // 2
        ca, sa, cb, sb = _fastlo.fastlo_tables(
            phase0, steps, t, tc, trig_dtype=trig_dtype
        )
        xh = x.astype(jnp.float32) * jnp.float32(_fastlo.AMPLITUDE)
        xw, x_spec = _fastlo_x_operand(xh, t, tc, x_layout)
        mix_in = [
            ca.reshape(t // tc, cs, 128), sa.reshape(t // tc, cs, 128),
            cb.reshape(tc, cs, 128), sb.reshape(tc, cs, 128), xw,
        ]
        mix_specs = [
            pl.BlockSpec((1, cs, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            fixed(tc, cs), fixed(tc, cs),
            x_spec,
        ]
        mix_scratch = [pltpu.VMEM((tc, cs2, 128), jnp.int32)]
    else:
        mix_in = [xs.reshape(t, cs2, 128)]
        mix_specs = [pl.BlockSpec(
            (tc, cs2, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )]
        mix_scratch = []

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(4)] + [fixed(nt) for nt in nts] + mix_specs,
        out_specs=(
            [pl.BlockSpec(
                (ns[-1], cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )]
            + [fixed(4)] + [fixed(nt) for nt in nts]
        ),
        out_shape=(
            # vma: under shard_map every output varies over the sharded
            # channel axis; declaring it here (halo_rdma.py pattern)
            # keeps the replication checker usable in compiled mode.
            [jax.ShapeDtypeStruct((t // r, cs2, 128), jnp.float32,
                                  vma=vma)]
            + [jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32, vma=vma)]
            + [jax.ShapeDtypeStruct((nt, cs2, 128), jnp.float32,
                                    vma=vma)
               for nt in nts]
        ),
        scratch_shapes=(
            [pltpu.VMEM((4, cs2, 128), jnp.int32)]
            + [pltpu.VMEM((nt, cs2, 128), jnp.float32) for nt in nts]
            + sum(
                (
                    [pltpu.VMEM((ns[d] + lns[d], cs2, 128), jnp.float32),
                     pltpu.VMEM((ns[d] + mes[d], cs2, 128), jnp.float32)]
                    for d in range(depth)
                ),
                [],
            )
            + mix_scratch
        ),
        interpret=interpret,
    )(st_in, *[tl.reshape(nt, cs2, 128) for tl, nt in zip(tails, nts)],
      *mix_in)

    y = outs[0]
    st_out = outs[1].reshape(4, c2)
    t_outs = tuple(o.reshape(nt, c2) for o, nt in zip(outs[2:], nts))
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, t_outs, y.reshape(t // r, c2)


# --- public instantiations ----------------------------------------------------


def df1_hbf1_bank(ba, state: Df1State, tail, xs, f: int = 29, *,
                  taps=None, time_chunk: int = 512, unroll: int = 2,
                  interpret: bool = False):
    """Fused Q32 DF1 biquad bank + half-band decimate-by-2 (stage 1).

    Depth-1 instantiation of the fused cascade.  ``tail`` is a single
    (3m-2, c2) f32 carried tail (`hbf1_tail_init`); default taps are
    `hbf.HBF_TAPS[2]` (the 5-tap stage leading the decimate-by-8
    cascade).  Returns (new_state, new_tail, y2) with y2 (t/2, c2) f32
    — equal to ``df1_bank_q(out_dtype=f32)`` + one
    ``hbf.hbf_dec_block(axis=0)`` within the documented <= 2 ULP FMA
    bound (integer state and tails bit-exact).
    """
    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS[2]
    state, tails, y2 = _df1_hbf_cascade_impl(
        _ba_static(ba), _taps_static((taps,)), state, (tail,), xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )
    return state, tails[0], y2


def df1_hbf12_bank(ba, state: Df1State, tail1, tail2, xs, f: int = 29, *,
                   taps1=None, taps2=None, time_chunk: int = 512,
                   unroll: int = 4, interpret: bool = False):
    """Fused Q32 DF1 biquad bank + half-band decimate-by-4 (stages 1+2).

    Depth-2 instantiation of the fused cascade; quarter-rate output.
    Default taps `HBF_TAPS[2]` / `HBF_TAPS[1]` — the first two stages
    of the decimate-by-8 cascade.  Returns (state, tail1, tail2, y4).
    """
    if taps1 is None or taps2 is None:
        from .hbf import HBF_TAPS

        taps1 = HBF_TAPS[2] if taps1 is None else taps1
        taps2 = HBF_TAPS[1] if taps2 is None else taps2
    state, tails, y4 = _df1_hbf_cascade_impl(
        _ba_static(ba), _taps_static((taps1, taps2)), state,
        (tail1, tail2), xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )
    return state, tails[0], tails[1], y4


def df1_hbf_cascade_bank(ba, state: Df1State, tails, xs, f: int = 29, *,
                         taps=None, depth: int = None,
                         time_chunk: int = 128, unroll: int = 4,
                         interpret: bool = False, vma=None):
    """Fused Q32 DF1 biquad bank + 2**depth half-band decimation, all
    inside ONE Pallas kernel: the sequential biquad loop parity-splits
    its output rows, then each cascade stage runs vectorized over the
    chunk with its own parity split feeding the next.  The kernel
    emits at 1/2**depth rate — with the XLA mix in front, the whole
    headline DDC chain is a single kernel invocation.

    Args:
      tails: tuple of per-stage (3*m_d-2, c2) f32 tails
        (`hbf1_tail_init(c2, m_d)` each).
      taps: tuple of per-stage one-sided tap vectors, highest rate
        first (default the leading `depth` stages of the reference
        decimate-by-8 cascade: `HBF_TAPS[2], HBF_TAPS[1], HBF_TAPS[0]`).
      xs: (t, c2) i32, t % 2**depth == 0.

    Returns (state, tails, y) with y (t / 2**depth, c2) f32; integer
    state and stage-1 tails bit-exact vs the unfused composition, FIR
    outputs within the FMA bound (measured bit-exact on v5e).
    """
    taps = _default_taps(taps, depth)
    return _df1_hbf_cascade_impl(
        _ba_static(ba), _taps_static(taps), state, tuple(tails), xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
        vma=as_vma(vma),
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "taps_static", "f", "time_chunk",
                     "unroll", "interpret", "vma"),
)
def _df1_hbf_cascade_impl(ba_static, taps_static, state, tails, xs, f, *,
                          time_chunk, unroll, interpret, vma=None):
    return _run_fused_cascade(
        _iir_df1_body(ba_static, f), taps_static, state, tails, xs,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
        vma=vma,
    )


def df1_clamp_hbf_cascade_bank(ba, state: Df1State, tails, xs, f: int = 29,
                               *, u: int = 0, lo: int, hi: int, taps=None,
                               depth: int = None, time_chunk: int = 128,
                               unroll: int = 4, interpret: bool = False):
    """Fused anti-windup (clamp) DF1 bank + half-band cascade.

    The clamp variant is the production configuration in the reference
    (offset + output clamp applied BEFORE feedback,
    biquad.rs:399-404); this kernel lets the clamped flagship chain run
    fully fused instead of falling back to the split composition.
    Bit-exact (integer path) vs ``df1_clamp_bank_q`` + the XLA HBF
    stages, within the FMA bound on the f32 FIR outputs.
    """
    taps = _default_taps(taps, depth)
    return _df1_clamp_hbf_cascade_impl(
        _ba_static(ba), _taps_static(taps), state, tuple(tails), xs, f,
        int(u), int(lo), int(hi),
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "taps_static", "f", "u", "lo", "hi",
                     "time_chunk", "unroll", "interpret"),
)
def _df1_clamp_hbf_cascade_impl(ba_static, taps_static, state, tails, xs,
                                f, u, lo, hi, *, time_chunk, unroll,
                                interpret):
    return _run_fused_cascade(
        _iir_df1_clamp_body(ba_static, f, u, lo, hi), taps_static, state,
        tails, xs,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


def fastlo_df1_dec_bank(ba, state: Df1State, phase0, steps, x,
                        f: int = 29, *, d: int = 16, clamp=None,
                        time_chunk: int = 128, unroll: int = 4,
                        trig_dtype=jnp.float32, out_dtype=jnp.int32,
                        x_layout: str = "replicate",
                        interpret: bool = False):
    """DDC-bank front end in ONE kernel: in-kernel fast-LO conjugate
    mix + DF1 biquad bank + keep-1-in-d decimation epilogue.

    The kernel reads only the real wideband stream x (t,) and the tiny
    coarse/fine LO factor tables, and writes t/d output rows — the
    full-rate mixed stream never touches HBM (pipelines/ddc_bank.py's
    biquad variant previously paid a (t, 2c) i32 write+read between
    the XLA mix and the kernel).  The biquad recurrence runs at full
    rate with exact integer state; the mix is the documented SNR-gated
    fast path (ops/fastlo.py).

    Returns (new_state, new_phase0, y) with y (t // d, 2c).
    """
    taps_clamp = None if clamp is None else tuple(int(v) for v in clamp)
    new_state, y = _fastlo_df1_dec_impl(
        _ba_static(ba), state, phase0, steps, x, f, int(d), taps_clamp,
        time_chunk=time_chunk, unroll=unroll,
        trig_dtype=jnp.dtype(trig_dtype), out_dtype=jnp.dtype(out_dtype),
        x_layout=x_layout, interpret=interpret,
    )
    new_phase0 = phase0 + steps * jnp.int32(x.shape[0])
    return new_state, new_phase0, y


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "d", "clamp_static", "time_chunk",
                     "unroll", "trig_dtype", "out_dtype", "x_layout",
                     "interpret"),
)
def _fastlo_df1_dec_impl(ba_static, state, phase0, steps, x, f, d,
                         clamp_static, *, time_chunk, unroll, trig_dtype,
                         out_dtype, x_layout, interpret):
    t = x.shape[0]
    c = phase0.shape[0]
    c2 = 2 * c
    assert c % 128 == 0 and t % d == 0 and unroll % 2 == 0
    cs = c // 128
    cs2 = 2 * cs

    body = (
        _iir_df1_body(ba_static, f)
        if clamp_static is None
        else _iir_df1_clamp_body(ba_static, f, *clamp_static)
    )

    # mix scratch + full-rate y scratch + fine tables + f32 temporaries
    vmem_cap = max(8, (10 * 2**20) // (38 * c2))
    from .biquad_pallas import _pick_time_chunk

    time_chunk = _pick_time_chunk(
        t, vmem_cap, unroll, d, time_chunk,
        128 if x_layout == "lanes" else 1,
    )
    tc = time_chunk
    grid = (t // tc,)

    def kernel(st_in_ref, caf_ref, saf_ref, cbf_ref, sbf_ref, xw_ref,
               y_ref, out_state_ref, state_ref, miq_ref, yfull_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]

        miq_ref[...] = _fastlo_mix_chunk(
            caf_ref, saf_ref, cbf_ref, sbf_ref, xw_ref, tc, cs, x_layout
        )

        def step(j, packed):
            carry = tuple(packed[rr] for rr in range(4))
            for u in range(unroll):
                i = j * unroll + u
                carry, y0 = body(carry, miq_ref[i])
                yfull_ref[i] = y0.astype(out_dtype)
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        y_ref[...] = yfull_ref[...].reshape(tc // d, d, cs2, 128)[:, 0]

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs2, 128)
    ca, sa, cb, sb = _fastlo.fastlo_tables(
        phase0, steps, t, tc, trig_dtype=trig_dtype
    )
    xh = x.astype(jnp.float32) * jnp.float32(_fastlo.AMPLITUDE)
    xw, x_spec = _fastlo_x_operand(xh, t, tc, x_layout)

    def fixed(rr, ncs=cs2):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    def walk(rr, ncs):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(4),
            walk(1, cs), walk(1, cs),
            fixed(tc, cs), fixed(tc, cs),
            x_spec,
        ],
        out_specs=[walk(tc // d, cs2), fixed(4)],
        out_shape=[
            jax.ShapeDtypeStruct((t // d, cs2, 128), out_dtype),
            jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, cs2, 128), jnp.int32),
            pltpu.VMEM((tc, cs2, 128), jnp.int32),
            pltpu.VMEM((tc, cs2, 128), out_dtype),
        ],
        interpret=interpret,
    )(st_in, ca.reshape(t // tc, cs, 128), sa.reshape(t // tc, cs, 128),
      cb.reshape(tc, cs, 128), sb.reshape(tc, cs, 128), xw)

    st_out = st_out.reshape(4, c2)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t // d, c2)


def fastlo_ddc_bank_block(ba, pll_ba, state: Df1State, pll_state, phase0,
                          steps, x, f: int = 29, *, d: int = 16,
                          time_chunk: int = 128, unroll: int = 4,
                          pll_unroll: int = 2, trig_dtype=jnp.float32,
                          x_layout: str = "replicate",
                          interpret: bool = False):
    """The ENTIRE BASELINE #5 per-channel stack in ONE kernel: fast-LO
    conjugate mix + DF1 biquad bank + keep-1-in-d decimation + fixed-
    point atan2 + type-2 PLL carrier tracking.

    Extends `fastlo_df1_dec_bank` with the decimated-rate back end:
    `atan2_i32` (bit-identical to ops.trig.atan2, limb-emulated) runs
    vectorized on the kept rows and the 9-word PLL recurrence
    (pll_pallas._pll_body, bit-identical to pll.block) scans them —
    per block the kernel reads x (t,) + tiny LO tables and writes only
    the (t/d, 2c) decimated IQ plus the carried states.

    Args:
      pll_ba: (3,) static ints [b0, b1, a1] Q32<32> lead-lag.
      pll_state: `pll.PllState` over (c,) channels.

    Returns (df1_state, pll_state, new_phase0, yiq_d).
    """
    import numpy as _np

    pll_static = tuple(
        int(v) for v in _np.asarray(pll_ba).reshape(-1)[:3]
    )
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0],
         state.y[..., 1]],
        axis=0,
    )
    st_out, pst_out, y, _ypll = _fastlo_ddc_bank_impl(
        ("df1", _ba_static(ba), int(f)), pll_static, st_in,
        _pack_pll_state(pll_state), phase0, steps, x, d=int(d),
        time_chunk=time_chunk, unroll=unroll, pll_unroll=pll_unroll,
        trig_dtype=jnp.dtype(trig_dtype), x_layout=x_layout,
        interpret=interpret,
    )
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    new_phase0 = phase0 + steps * jnp.int32(x.shape[0])
    return new_state, _unpack_pll_state(pst_out), new_phase0, y


def fastlo_ddc_bank_block_lp(lp_gains, pll_ba, lp_state, pll_state,
                             phase0, steps, x, *, n: int = 2, d: int = 16,
                             time_chunk: int = 128, unroll: int = 4,
                             pll_unroll: int = 2, trig_dtype=jnp.float32,
                             x_layout: str = "replicate",
                             interpret: bool = False):
    """The Lowpass<N>-flavored one-kernel DDC bank (the BASELINE #5
    headline configuration): fast-LO mix + integer Lowpass2 I/Q bank +
    keep-1-in-d decimation + atan2 + PLL, one kernel per block.

    Args:
      lp_gains: (N,) static ints (`lowpass.gains1/gains2`).
      lp_state: `lowpass.LowpassState` with p (2c, N) i64 — the I|Q
        concat bank (the pipeline's `Lanes` layout).

    Returns (lp_state, pll_state, new_phase0, yiq_d).
    """
    import numpy as _np

    from .biquad_pallas import _split_i64_planes, _join_i64_planes
    from .lowpass import LowpassState

    k_static = tuple(int(v) for v in _np.asarray(lp_gains).reshape(-1))
    assert len(k_static) == n and n in (1, 2)
    pll_static = tuple(
        int(v) for v in _np.asarray(pll_ba).reshape(-1)[:3]
    )
    planes = []
    for i in range(n):
        hi, lo = _split_i64_planes(lp_state.p[..., i])
        planes += [hi, lo]
    st_in = jnp.stack(planes, axis=0)
    st_out, pst_out, y, ypll = _fastlo_ddc_bank_impl(
        ("lp", k_static, n), pll_static, st_in,
        _pack_pll_state(pll_state), phase0, steps, x, d=int(d),
        time_chunk=time_chunk, unroll=unroll, pll_unroll=pll_unroll,
        trig_dtype=jnp.dtype(trig_dtype), x_layout=x_layout,
        interpret=interpret,
    )
    p = jnp.stack(
        [_join_i64_planes(st_out[2 * i], st_out[2 * i + 1])
         for i in range(n)],
        axis=-1,
    )
    new_phase0 = phase0 + steps * jnp.int32(x.shape[0])
    return (LowpassState(p=p), _unpack_pll_state(pst_out), new_phase0, y,
            ypll)


def _pack_pll_state(pll_state):
    from .biquad_pallas import _split_i64_planes

    f0hi, f0lo = _split_i64_planes(pll_state.f0)
    fhi, flo = _split_i64_planes(pll_state.f)
    return jnp.stack(
        [
            pll_state.clamp.x0,
            pll_state.clamp.clamp.astype(jnp.int32),
            pll_state.z0,
            pll_state.y0,
            f0hi, f0lo, fhi, flo,
            pll_state.y,
        ],
        axis=0,
    )


def _unpack_pll_state(pst_out):
    from ..ops.unwrap import ClampWrapState
    from .biquad_pallas import _join_i64_planes
    from .pll import PllState

    return PllState(
        clamp=ClampWrapState(
            x0=pst_out[0], clamp=pst_out[1].astype(jnp.int8)
        ),
        z0=pst_out[2],
        y0=pst_out[3],
        f0=_join_i64_planes(pst_out[4], pst_out[5]),
        f=_join_i64_planes(pst_out[6], pst_out[7]),
        y=pst_out[8],
    )


@functools.partial(
    jax.jit,
    static_argnames=("filt", "pll_static", "d", "time_chunk",
                     "unroll", "pll_unroll", "trig_dtype", "x_layout",
                     "interpret"),
)
def _fastlo_ddc_bank_impl(filt, pll_static, st_in, pst_in, phase0,
                          steps, x, d, *, time_chunk, unroll,
                          pll_unroll, trig_dtype, x_layout, interpret):
    """filt: static spec — ("df1", ba5, f) or ("lp", k_tuple, n)."""
    from .pll_pallas import _pll_body
    from .biquad_pallas import _pick_time_chunk

    t = x.shape[0]
    c = phase0.shape[0]
    c2 = 2 * c
    assert c % 128 == 0 and t % d == 0 and unroll % 2 == 0
    cs = c // 128
    cs2 = 2 * cs

    if filt[0] == "df1":
        body = _iir_df1_body(filt[1], filt[2])
        n_rows = 4
    else:
        from .lowpass_pallas import _lp_body

        k_static, lp_n = filt[1], filt[2]
        n_rows = 2 * lp_n

        def body(carry, x0):
            return _lp_body(k_static, lp_n, carry, x0)

    vmem_cap = max(8, (10 * 2**20) // (42 * c2))
    time_chunk = _pick_time_chunk(
        t, vmem_cap, unroll, max(d, d * pll_unroll), time_chunk,
        128 if x_layout == "lanes" else 1,
    )
    tc = time_chunk
    nd = tc // d  # decimated rows per chunk
    assert nd % pll_unroll == 0
    grid = (t // tc,)

    def kernel(st_in_ref, pst_in_ref, caf_ref, saf_ref, cbf_ref, sbf_ref,
               xw_ref, y_ref, ypll_ref, out_state_ref, out_pst_ref,
               state_ref, pst_ref, miq_ref, yfull_ref, ph_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]
            pst_ref[...] = pst_in_ref[...]

        miq_ref[...] = _fastlo_mix_chunk(
            caf_ref, saf_ref, cbf_ref, sbf_ref, xw_ref, tc, cs, x_layout
        )

        def step(j, packed):
            carry = tuple(packed[rr] for rr in range(n_rows))
            for u in range(unroll):
                i = j * unroll + u
                carry, y0 = body(carry, miq_ref[i])
                yfull_ref[i] = y0
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        ydec = yfull_ref[...].reshape(tc // d, d, cs2, 128)[:, 0]
        y_ref[...] = ydec

        # decimated-rate back end: atan2 vectorized, PLL sequential
        ph_ref[...] = atan2_i32(ydec[:, cs:], ydec[:, :cs])

        def pstep(j, packed):
            carry = tuple(packed[rr] for rr in range(9))
            for u in range(pll_unroll):
                i = j * pll_unroll + u
                carry, yv = _pll_body(pll_static, carry, ph_ref[i])
                ypll_ref[i] = yv
            return jnp.stack(carry)

        pst = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nd // pll_unroll), pstep, pst_ref[...]
        )
        pst_ref[...] = pst

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = state_ref[...]
            out_pst_ref[...] = pst

    st_in = st_in.reshape(n_rows, cs2, 128)
    pst_in = pst_in.reshape(9, cs, 128)

    ca, sa, cb, sb = _fastlo.fastlo_tables(
        phase0, steps, t, tc, trig_dtype=trig_dtype
    )
    xh = x.astype(jnp.float32) * jnp.float32(_fastlo.AMPLITUDE)
    xw, x_spec = _fastlo_x_operand(xh, t, tc, x_layout)

    def fixed(rr, ncs=cs2):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    def walk(rr, ncs):
        return pl.BlockSpec(
            (rr, ncs, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    ys, ypll, st_out, pst_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(n_rows), fixed(9, cs),
            walk(1, cs), walk(1, cs),
            fixed(tc, cs), fixed(tc, cs),
            x_spec,
        ],
        out_specs=[walk(tc // d, cs2), walk(tc // d, cs),
                   fixed(n_rows), fixed(9, cs)],
        out_shape=[
            jax.ShapeDtypeStruct((t // d, cs2, 128), jnp.int32),
            jax.ShapeDtypeStruct((t // d, cs, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_rows, cs2, 128), jnp.int32),
            jax.ShapeDtypeStruct((9, cs, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, cs2, 128), jnp.int32),
            pltpu.VMEM((9, cs, 128), jnp.int32),
            pltpu.VMEM((tc, cs2, 128), jnp.int32),
            pltpu.VMEM((tc, cs2, 128), jnp.int32),
            pltpu.VMEM((nd, cs, 128), jnp.int32),
        ],
        interpret=interpret,
    )(st_in, pst_in, ca.reshape(t // tc, cs, 128),
      sa.reshape(t // tc, cs, 128), cb.reshape(tc, cs, 128),
      sb.reshape(tc, cs, 128), xw)

    return (st_out.reshape(n_rows, c2), pst_out.reshape(9, c),
            ys.reshape(t // d, c2), ypll.reshape(t // d, c))


def fastlo_ddc_cascade_bank(ba, state: Df1State, tails, phase0, steps, x,
                            f: int = 29, *, clamp=None, taps=None,
                            depth: int = None, time_chunk: int = 128,
                            unroll: int = 4, trig_dtype=jnp.float32,
                            x_layout: str = "replicate",
                            interpret: bool = False):
    """The ENTIRE headline DDC chain in one kernel: in-kernel fast-LO
    conjugate mix (coarse/fine factored tables, ops/fastlo.py) + DF1
    biquad bank + half-band decimation cascade.

    The mixed full-rate stream never touches HBM: the kernel reads only
    the real input x (t,), the tiny factor tables, and emits at
    1/2**depth rate.  The mix is the documented SNR-gated fast path
    (tests/test_fastlo.py); the IIR and FIR stages are the same
    bit-exact machinery as `df1_hbf_cascade_bank`.

    Args:
      phase0: (c,) i32 NCO phase before the first sample.
      steps: (c,) i32 per-channel frequency words.
      x: (t,) i32 wideband input; lanes are I|Q concat (c2 = 2c).
      clamp: optional (u, lo, hi) anti-windup parameters.

    Returns (new_state, tails, new_phase0, y) with y (t/2**depth, 2c).
    """
    taps = _default_taps(taps, depth)
    clamp_static = None if clamp is None else tuple(int(v) for v in clamp)
    new_state, t_outs, y = _fastlo_ddc_cascade_impl(
        _ba_static(ba), _taps_static(taps), state, tuple(tails),
        phase0, steps, x, f, clamp_static,
        time_chunk=time_chunk, unroll=unroll,
        trig_dtype=jnp.dtype(trig_dtype), x_layout=x_layout,
        interpret=interpret,
    )
    new_phase0 = phase0 + steps * jnp.int32(x.shape[0])
    return new_state, t_outs, new_phase0, y


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "taps_static", "f", "clamp_static",
                     "time_chunk", "unroll", "trig_dtype", "x_layout",
                     "interpret"),
)
def _fastlo_ddc_cascade_impl(ba_static, taps_static, state, tails, phase0,
                             steps, x, f, clamp_static, *, time_chunk,
                             unroll, trig_dtype, x_layout, interpret):
    body = (
        _iir_df1_body(ba_static, f)
        if clamp_static is None
        else _iir_df1_clamp_body(ba_static, f, *clamp_static)
    )
    return _run_fused_cascade(
        body, taps_static, state, tails, None,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
        fastlo_in=(x, phase0, steps, trig_dtype), x_layout=x_layout,
    )


# --- one-kernel float DDC / lock-in bank (BASELINE #2 example) ----------------


def ddc_lockin_bank(ba, state: Df1State, x, lo_freqs, n0=0, *,
                    time_chunk: int = 256, x_layout: str = "replicate",
                    trig_dtype=jnp.float32, interpret: bool = False):
    """The ddc_lockin example (examples/ddc_lockin.rs:27-42) as ONE
    kernel over a channel bank: float quadrature mix + shared-config
    DF1 lowpass on the I/Q lanes.

    The full-rate LO never touches HBM: like the integer fast LO, the
    per-channel phase ramp factors as coarse-per-chunk x fine-in-chunk
    (angle addition) — exp(-j w (k*tc + b)) = exp(-j w k tc) *
    exp(-j w b) — so the kernel reads only the scalar input stream and
    tiny factor tables, and mixes with one f32 complex multiply per
    sample.  Tables are built in f64 (mod tau) so the phase error stays
    at f32 rounding regardless of block index; `n0` (the absolute index
    of the block's first sample) carries LO phase across blocks.

    The sequential DF1 matches the per-sample reference semantics
    (unlike the reassociating `df1_block_float`); the LO differs from
    the composed XLA path only by f32 product rounding (~1e-7),
    tolerance-gated like every float kernel.

    Args:
      ba: (5,) f32 coefficients (static floats).
      state: Df1State f32 over 2c lanes (I|Q concat), c % 128 == 0.
      x: (t,) f32 real input (shared wideband stream).
      lo_freqs: (c,) relative LO frequencies.
      n0: absolute sample index of x[0] (phase continuity).

    Returns (state, yiq) with yiq (t, 2c) f32 — I lanes then Q lanes.
    """
    import numpy as _np

    ba_static = tuple(float(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _ddc_lockin_bank_impl(
        ba_static, state, x, jnp.asarray(lo_freqs, jnp.float64),
        jnp.asarray(n0, jnp.float64),
        time_chunk=time_chunk, x_layout=x_layout,
        trig_dtype=jnp.dtype(trig_dtype), interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "time_chunk", "x_layout", "trig_dtype",
                     "interpret"),
)
def _ddc_lockin_bank_impl(ba_static, state, x, w, n0, *, time_chunk,
                          x_layout, trig_dtype, interpret):
    from .biquad_pallas import _pick_time_chunk

    t = x.shape[0]
    c = w.shape[0]
    c2 = 2 * c
    assert c % 128 == 0
    cs = c // 128
    cs2 = 2 * cs

    vmem_cap = max(8, (10 * 2**20) // (20 * c2))
    time_chunk = _pick_time_chunk(
        t, vmem_cap, 1, 1, time_chunk,
        128 if x_layout == "lanes" else 1,
    )
    tc = time_chunk
    grid = (t // tc,)

    # Factor-table phases in f64 mod tau (error independent of n0/t);
    # the trig itself defaults to f32 — f64 trig is EMULATED on TPU
    # (CLAUDE.md round-3 lesson; same default as ops/fastlo.py).  A
    # f32-reduced phase costs ~1e-7 rad, far under the example gates.
    tau = 2.0 * jnp.pi
    wt = w * tau
    ka = n0 + jnp.arange(t // tc, dtype=jnp.float64) * tc
    pa = ((ka[:, None] * wt[None, :]) % tau).astype(trig_dtype)
    pb = (
        (jnp.arange(tc, dtype=jnp.float64)[:, None] * wt[None, :]) % tau
    ).astype(trig_dtype)
    ca = jnp.cos(pa).astype(jnp.float32).reshape(t // tc, cs, 128)
    sa = jnp.sin(pa).astype(jnp.float32).reshape(t // tc, cs, 128)
    cb = jnp.cos(pb).astype(jnp.float32).reshape(tc, cs, 128)
    sb = jnp.sin(pb).astype(jnp.float32).reshape(tc, cs, 128)

    xw, x_spec = _fastlo_x_operand(x.astype(jnp.float32), t, tc, x_layout)

    def kernel(st_in_ref, ca_ref, sa_ref, cb_ref, sb_ref, xw_ref,
               y_ref, out_state_ref, state_ref, miq_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]

        # quadrature mix: lo = exp(-j(A+b)); iq = [x*lo_re, -x*lo_im]
        cav, sav = ca_ref[0], sa_ref[0]
        cbv, sbv = cb_ref[...], sb_ref[...]
        lo_re = cav[None] * cbv - sav[None] * sbv
        lo_im = sav[None] * cbv + cav[None] * sbv
        if x_layout == "lanes":
            xt = _x_rows_from_lanes(xw_ref, tc)
            xb = jnp.broadcast_to(xt[:, None, :], (tc, cs, 128))
        else:
            xb = jnp.broadcast_to(xw_ref[...], (tc, cs, 128))
        miq_ref[...] = jnp.concatenate(
            [xb * lo_re, -(xb * lo_im)], axis=1
        )

        # sequential f32 DF1 over the I|Q lanes (unroll=1: FMA
        # contraction stability, like df1_bank_f32)
        def step(j, packed):
            b0, b1, b2, a1, a2 = (jnp.float32(v) for v in ba_static)
            x1, x2, y1, y2 = (packed[r] for r in range(4))
            x0 = miq_ref[j]
            y0 = b0 * x0 + b1 * x1 + b2 * x2 + a1 * y1 + a2 * y2
            y_ref[j] = y0
            return jnp.stack((x0, x1, y0, y1))

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc), step, state_ref[...]
        )
        state_ref[...] = st

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st

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

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0],
         state.y[..., 1]],
        axis=0,
    ).astype(jnp.float32).reshape(4, cs2, 128)

    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(4, cs2),
            walk(1, cs), walk(1, cs),
            fixed(tc, cs), fixed(tc, cs),
            x_spec,
        ],
        out_specs=[walk(tc, cs2), fixed(4, cs2)],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs2, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, cs2, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, cs2, 128), jnp.float32),
            pltpu.VMEM((tc, cs2, 128), jnp.float32),
        ],
        interpret=interpret,
    )(st_in, ca, sa, cb, sb, xw)

    st_out = st_out.reshape(4, c2)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c2)
