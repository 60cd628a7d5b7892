"""Fused NCO-mix + DF1-biquad Pallas kernel for the DDC chain front end.

The headline chain (bench.py / examples analog: fm_disc.rs:126-140 runs
the whole per-sample stack fused) previously materialized the mixed
I/Q stream ``miq`` (t, 2c) in HBM between the XLA mix pass and the
Pallas biquad bank — 2x128 MB of pure HBM traffic per 32 K block at
c=512.  This kernel computes the mix *inside* the biquad kernel:

* per time chunk, the NCO phase block is a closed-form ramp
  ``phase0 + step * (i+1)`` built from an in-kernel iota (no scan);
* `ops.trig.cossin` (octant fold + 128-entry select-chain LUT +
  interpolation — pure elementwise jnp) traces directly into the
  kernel, vectorized over the whole (tc, c) block at full VPU width;
* the conjugate mix ``(cos*x)>>32, (-sin*x)>>32`` uses the exact
  limb-emulated i64 product high word (== `fxp.q_apply(.., 32)`);
* the mixed block lands in VMEM scratch and the sequential DF1 loop
  consumes it without ever touching HBM.

Bit-identical to the unfused ``cossin -> q_apply -> df1_bank_q``
pipeline (same select-chain LUT, same truncations) — gated by
tests/test_biquad_pallas.py and scripts/tpu_validate_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import trig
from .biquad import Df1State
from .biquad_pallas import _mac5_q, _mul_i32_i32_to_i64, _shr_i64_to_i32


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


# --- fused DF1 + first HBF decimation stage ---------------------------------
#
# The DDC chain's HBF cost is dominated by data movement, not FIR math:
# the stride-2 even/odd de-interleave of the full-rate (t, 2c) stream is
# a cross-sublane shuffle, and the full-rate block makes one extra HBM
# round trip between the biquad kernel and the first decimator.  Fusing
# stage 1 into the biquad kernel makes BOTH free: the sequential DF1
# loop writes even/odd output rows to separate VMEM scratch buffers
# directly (parity is static under unroll=2), and the half-band FIR
# then runs vectorized over contiguous rows.  Kernel output bandwidth
# halves (t/2 rows).  Mirrors the reference's fused per-sample stack
# (examples/fm_disc.rs:126-140) and the hbf.rs:156-192 decimator.


def hbf1_tail_init(c2: int, m: int = 5):
    """Zero tail for the fused stage-1 decimator: (2m-1) odd-sample FIR
    rows + (m-1) even-sample delay rows, packed (3m-2, c2) f32 —
    the Pallas-kernel packing of `hbf.hbf_dec_init(m, axis=0)`."""
    return jnp.zeros((3 * m - 2, c2), jnp.float32)


def df1_hbf1_bank(ba, state: Df1State, tail, xs, f: int = 29, *,
                  taps=None, time_chunk: int = 512, unroll: int = 2,
                  interpret: bool = False):
    """Fused Q32 DF1 biquad bank + half-band decimate-by-2 (stage 1).

    Args:
      ba: (5,) Q<f> coefficients (static, baked).
      state: Df1State over c2 lanes (c2 % 128 == 0).
      tail: (3m-2, c2) f32 carried decimator tail (`hbf1_tail_init`);
        rows [0, 2m-1) = odd-sample FIR tail, rows [2m-1, 3m-2) =
        even-sample delay tail.
      xs: (t, c2) i32 input block, t even.
      taps: one-sided half-band taps (default `hbf.HBF_TAPS[2]`, the
        5-tap stage that leads the decimate-by-8 cascade).

    Returns (new_state, new_tail, y2) with y2 (t/2, c2) f32 — equal to
    ``df1_bank_q(out_dtype=f32)`` followed by
    ``hbf.hbf_dec_block(taps, ..., axis=0)``.  The integer DF1 state
    and the carried tails are bit-exact (exact copies); the f32 FIR
    output may differ from the XLA composition by ~1 ULP (mul+add
    contracts to FMA differently across the two graphs) — a documented
    float fast path, gated to <= 2 ULP by tests and
    scripts/tpu_validate_kernels.py.
    """
    import numpy as _np

    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS[2]
    taps_static = tuple(float(v) for v in _np.asarray(taps))
    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    assert unroll % 2 == 0, "unroll must be even (even/odd parity)"
    return _df1_hbf1_bank_impl(
        ba_static, taps_static, state, tail, xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "taps_static", "f", "time_chunk",
                     "unroll", "interpret"),
)
def _df1_hbf1_bank_impl(ba_static, taps_static, state, tail, xs, f, *,
                        time_chunk, unroll, interpret):
    t, c2 = xs.shape
    assert c2 % 128 == 0 and t % 2 == 0
    cs2 = c2 // 128
    m = len(taps_static)
    ln = 2 * m - 1  # odd-tail rows
    me = m - 1  # even-tail rows
    nt = ln + me

    # VMEM: x-in (tc, cs2, 128) i32 + y2-out (tc/2, ...) f32, both
    # double-buffered, + odd/even f32 work scratch (~tc rows) ->
    # ~18 B per sample-channel.
    vmem_cap = max(8, (10 * 2**20) // (18 * c2))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8, "cannot find a VMEM-fitting time chunk"
    tc = time_chunk
    n = tc // 2  # decimated rows per chunk
    grid = (t // tc,)

    def kernel(st_in_ref, tail_in_ref, x_ref, y2_ref, out_state_ref,
               out_tail_ref, state_ref, tail_ref, odd_ref, even_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]
            tail_ref[...] = tail_in_ref[...]

        odd_ref[0:ln] = tail_ref[0:ln]
        even_ref[0:me] = tail_ref[ln:nt]

        def step(j, packed):
            # even unroll => sample parity is static per unrolled slot
            carry = tuple(packed[r] for r in range(4))
            for u in range(unroll):
                x0 = x_ref[j * unroll + u]
                x1, x2, y1, y2 = carry
                acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
                y0 = _shr_i64_to_i32(acc[0], acc[1], f)
                carry = (x0, x1, y0, y1)
                k = j * (unroll // 2) + u // 2  # decimated row index
                if u % 2 == 0:
                    even_ref[me + k] = y0.astype(jnp.float32)
                else:
                    odd_ref[ln + k] = y0.astype(jnp.float32)
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        # vectorized half-band FIR over the chunk, same op order as
        # hbf.symmetric_fir (small-to-large taps) + even bypass
        acc = None
        for i in range(m):
            a = odd_ref[i:i + n]
            b = odd_ref[ln - i:ln - i + n]
            term = (b + a) * jnp.float32(taps_static[i])
            acc = term if acc is None else acc + term
        y2_ref[...] = acc + even_ref[0:n]

        tail_ref[0:ln] = odd_ref[n:n + ln]
        tail_ref[ln:nt] = even_ref[n:n + me]

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st
            out_tail_ref[...] = tail_ref[...]

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs2, 128)
    tail_in = tail.reshape(nt, cs2, 128)

    def fixed(r, dt):
        del dt
        return pl.BlockSpec(
            (r, cs2, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    y2, st_out, tail_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(4, jnp.int32),
            fixed(nt, jnp.float32),
            pl.BlockSpec(
                (tc, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (n, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(4, jnp.int32),
            fixed(nt, jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t // 2, cs2, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt, cs2, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, cs2, 128), jnp.int32),
            pltpu.VMEM((nt, cs2, 128), jnp.float32),
            pltpu.VMEM((n + ln, cs2, 128), jnp.float32),
            pltpu.VMEM((n + me, cs2, 128), jnp.float32),
        ],
        interpret=interpret,
    )(st_in, tail_in, xs.reshape(t, cs2, 128))

    st_out = st_out.reshape(4, c2)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, tail_out.reshape(nt, c2), y2.reshape(t // 2, c2)


# --- fused DF1 + two HBF decimation stages -----------------------------------


def df1_hbf12_bank(ba, state: Df1State, tail1, tail2, xs, f: int = 29, *,
                   taps1=None, taps2=None, time_chunk: int = 512,
                   unroll: int = 4, interpret: bool = False):
    """Fused Q32 DF1 biquad bank + half-band decimate-by-4 (stages 1+2).

    Extends `df1_hbf1_bank`: after the vectorized stage-1 FIR, the
    chunk's half-rate rows are parity-split into stage-2 odd/even
    scratch (whole-row copies — row strides move vregs, unlike the
    lane/sublane shuffles a (t, c) stride-2 slice costs) and stage 2
    runs vectorized too.  The kernel emits at QUARTER rate.

    Args:
      tail1: (3*m1-2, c2) f32 stage-1 tail (`hbf1_tail_init(c2, m1)`).
      tail2: (3*m2-2, c2) f32 stage-2 tail (`hbf1_tail_init(c2, m2)`).
      taps1/taps2: one-sided half-band taps (default `HBF_TAPS[2]` /
        `HBF_TAPS[1]` — the first two stages of the decimate-by-8
        cascade).
      xs: (t, c2) i32, t % 4 == 0.

    Returns (state, tail1, tail2, y4) with y4 (t/4, c2) f32 — equal to
    `df1_bank_q(out f32)` + two `hbf_dec_block(axis=0)` stages, with
    the same FMA-bound float gate as `df1_hbf1_bank` (integer state
    and tails exact).
    """
    import numpy as _np

    if taps1 is None or taps2 is None:
        from .hbf import HBF_TAPS

        taps1 = HBF_TAPS[2] if taps1 is None else taps1
        taps2 = HBF_TAPS[1] if taps2 is None else taps2
    t1 = tuple(float(v) for v in _np.asarray(taps1))
    t2 = tuple(float(v) for v in _np.asarray(taps2))
    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    assert unroll % 2 == 0
    return _df1_hbf12_bank_impl(
        ba_static, t1, t2, state, tail1, tail2, xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "t1", "t2", "f", "time_chunk", "unroll",
                     "interpret"),
)
def _df1_hbf12_bank_impl(ba_static, t1, t2, state, tail1, tail2, xs, f, *,
                         time_chunk, unroll, interpret):
    t, c2 = xs.shape
    assert c2 % 128 == 0 and t % 4 == 0
    cs2 = c2 // 128
    m1, m2 = len(t1), len(t2)
    ln1, me1 = 2 * m1 - 1, m1 - 1
    ln2, me2 = 2 * m2 - 1, m2 - 1
    nt1, nt2 = ln1 + me1, ln2 + me2

    vmem_cap = max(8, (10 * 2**20) // (18 * c2))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8, "cannot find a VMEM-fitting time chunk"
    tc = time_chunk
    n = tc // 2
    n2 = tc // 4
    grid = (t // tc,)

    def fir_even(odd_s, even_s, ln, nn, taps):
        acc = None
        for i in range(len(taps)):
            a = odd_s[i:i + nn]
            b = odd_s[ln - i:ln - i + nn]
            term = (b + a) * jnp.float32(taps[i])
            acc = term if acc is None else acc + term
        return acc + even_s[0:nn]

    def kernel(st_in_ref, t1_in_ref, t2_in_ref, x_ref, y4_ref,
               out_state_ref, out_t1_ref, out_t2_ref, state_ref,
               t1_ref, t2_ref, odd1_ref, even1_ref, odd2_ref, even2_ref):
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]
            t1_ref[...] = t1_in_ref[...]
            t2_ref[...] = t2_in_ref[...]

        odd1_ref[0:ln1] = t1_ref[0:ln1]
        even1_ref[0:me1] = t1_ref[ln1:nt1]
        odd2_ref[0:ln2] = t2_ref[0:ln2]
        even2_ref[0:me2] = t2_ref[ln2:nt2]

        def step(j, packed):
            carry = tuple(packed[r] for r in range(4))
            for u in range(unroll):
                x0 = x_ref[j * unroll + u]
                x1, x2, y1, y2 = carry
                acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
                y0 = _shr_i64_to_i32(acc[0], acc[1], f)
                carry = (x0, x1, y0, y1)
                k = j * (unroll // 2) + u // 2
                if u % 2 == 0:
                    even1_ref[me1 + k] = y0.astype(jnp.float32)
                else:
                    odd1_ref[ln1 + k] = y0.astype(jnp.float32)
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        # stage 1, vectorized over the chunk
        y2v = fir_even(odd1_ref, even1_ref, ln1, n, t1)
        # parity-split rows into the stage-2 streams: reshape + unit
        # slice (a stride-2 row slice lowers to a gather Mosaic
        # rejects; the reshaped form is plain row addressing)
        y2p = y2v.reshape(n2, 2, cs2, 128)
        even2_ref[me2:me2 + n2] = y2p[:, 0]
        odd2_ref[ln2:ln2 + n2] = y2p[:, 1]
        # stage 2
        y4_ref[...] = fir_even(odd2_ref, even2_ref, ln2, n2, t2)

        t1_ref[0:ln1] = odd1_ref[n:n + ln1]
        t1_ref[ln1:nt1] = even1_ref[n:n + me1]
        t2_ref[0:ln2] = odd2_ref[n2:n2 + ln2]
        t2_ref[ln2:nt2] = even2_ref[n2:n2 + me2]

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st
            out_t1_ref[...] = t1_ref[...]
            out_t2_ref[...] = t2_ref[...]

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs2, 128)

    def fixed(r):
        return pl.BlockSpec(
            (r, cs2, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    y4, st_out, t1_out, t2_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            fixed(4), fixed(nt1), fixed(nt2),
            pl.BlockSpec(
                (tc, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (n2, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(4), fixed(nt1), fixed(nt2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t // 4, cs2, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt1, cs2, 128), jnp.float32),
            jax.ShapeDtypeStruct((nt2, cs2, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, cs2, 128), jnp.int32),
            pltpu.VMEM((nt1, cs2, 128), jnp.float32),
            pltpu.VMEM((nt2, cs2, 128), jnp.float32),
            pltpu.VMEM((n + ln1, cs2, 128), jnp.float32),
            pltpu.VMEM((n + me1, cs2, 128), jnp.float32),
            pltpu.VMEM((n2 + ln2, cs2, 128), jnp.float32),
            pltpu.VMEM((n2 + me2, cs2, 128), jnp.float32),
        ],
        interpret=interpret,
    )(st_in, tail1.reshape(nt1, cs2, 128), tail2.reshape(nt2, cs2, 128),
      xs.reshape(t, cs2, 128))

    new_state = Df1State(
        x=jnp.stack(
            [st_out.reshape(4, c2)[0], st_out.reshape(4, c2)[1]], axis=-1
        ),
        y=jnp.stack(
            [st_out.reshape(4, c2)[2], st_out.reshape(4, c2)[3]], axis=-1
        ),
    )
    return (new_state, t1_out.reshape(nt1, c2), t2_out.reshape(nt2, c2),
            y4.reshape(t // 4, c2))


# --- fused DF1 + N-stage HBF decimation cascade ------------------------------


def df1_hbf_cascade_bank(ba, state: Df1State, tails, xs, f: int = 29, *,
                         taps=None, depth: int = None,
                         time_chunk: int = 128, unroll: int = 4,
                         interpret: bool = False):
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
    import numpy as _np

    if taps is None:
        from .hbf import HBF_TAPS

        depth = 3 if depth is None else depth
        taps = tuple(HBF_TAPS[2 - d] for d in range(depth))
    depth = len(taps)
    taps_static = tuple(
        tuple(float(v) for v in _np.asarray(tv)) for tv in taps
    )
    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    assert unroll % 2 == 0
    assert len(tails) == depth
    return _df1_hbf_cascade_impl(
        ba_static, taps_static, state, tuple(tails), xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "taps_static", "f", "time_chunk",
                     "unroll", "interpret"),
)
def _df1_hbf_cascade_impl(ba_static, taps_static, state, tails, xs, f, *,
                          time_chunk, unroll, interpret):
    t, c2 = xs.shape
    depth = len(taps_static)
    r = 1 << depth
    assert c2 % 128 == 0 and t % r == 0
    cs2 = c2 // 128
    ms = [len(tv) for tv in taps_static]
    lns = [2 * m - 1 for m in ms]
    mes = [m - 1 for m in ms]
    nts = [ln + me for ln, me in zip(lns, mes)]

    vmem_cap = max(8, (10 * 2**20) // (18 * c2))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk or time_chunk % r:
        time_chunk //= 2
    assert time_chunk >= r and time_chunk >= 8
    tc = time_chunk
    ns = [tc >> (d + 1) for d in range(depth)]  # stage output rows
    grid = (t // tc,)

    def fir_even(odd_s, even_s, ln, nn, taps):
        acc = None
        for i in range(len(taps)):
            a = odd_s[i:i + nn]
            b = odd_s[ln - i:ln - i + nn]
            term = (b + a) * jnp.float32(taps[i])
            acc = term if acc is None else acc + term
        return acc + even_s[0:nn]

    def kernel(*refs):
        (st_in_ref, *tin_refs) = refs[:1 + depth]
        x_ref = refs[1 + depth]
        y_ref = refs[2 + depth]
        out_state_ref = refs[3 + depth]
        tout_refs = refs[4 + depth:4 + 2 * depth]
        state_ref = refs[4 + 2 * depth]
        t_refs = refs[5 + 2 * depth:5 + 3 * depth]
        oe_refs = refs[5 + 3 * depth:]  # odd0, even0, odd1, even1, ...

        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]
            for tr, tin in zip(t_refs, tin_refs):
                tr[...] = tin[...]

        for d in range(depth):
            oe_refs[2 * d][0:lns[d]] = t_refs[d][0:lns[d]]
            oe_refs[2 * d + 1][0:mes[d]] = t_refs[d][lns[d]:nts[d]]

        def step(j, packed):
            carry = tuple(packed[rr] for rr in range(4))
            for u in range(unroll):
                x0 = x_ref[j * unroll + u]
                x1, x2, y1, y2 = carry
                acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
                y0 = _shr_i64_to_i32(acc[0], acc[1], f)
                carry = (x0, x1, y0, y1)
                k = j * (unroll // 2) + u // 2
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
            yv = fir_even(oe_refs[2 * d], oe_refs[2 * d + 1], lns[d],
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

    def fixed(rr):
        return pl.BlockSpec(
            (rr, cs2, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [fixed(4)] + [fixed(nt) for nt in nts]
            + [pl.BlockSpec(
                (tc, cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )]
        ),
        out_specs=(
            [pl.BlockSpec(
                (ns[-1], cs2, 128), lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            )]
            + [fixed(4)] + [fixed(nt) for nt in nts]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((t // r, cs2, 128), jnp.float32)]
            + [jax.ShapeDtypeStruct((4, cs2, 128), jnp.int32)]
            + [jax.ShapeDtypeStruct((nt, cs2, 128), jnp.float32)
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
        ),
        interpret=interpret,
    )(st_in, *[tl.reshape(nt, cs2, 128) for tl, nt in zip(tails, nts)],
      xs.reshape(t, cs2, 128))

    y = outs[0]
    st_out = outs[1].reshape(4, c2)
    t_outs = [o.reshape(nt, c2) for o, nt in zip(outs[2:], nts)]
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, tuple(t_outs), y.reshape(t // r, c2)
