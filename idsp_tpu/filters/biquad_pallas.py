"""Pallas TPU kernel for the fixed-point DF1 biquad channel bank.

The XLA `lax.scan` path pays per-step loop overhead that dwarfs the
~10 integer ops of a biquad step; this kernel runs the whole time loop
*inside* one Pallas program with the (4, C) filter state resident in
VMEM/vector registers, channels on the lanes.

Bit-exactness: the reference semantics need an exact
(i32 x i32 -> i64) multiply-accumulate and a truncating ``>> F``
(biquad.rs:366-383 with `Q<i32,i64,F>`).  Mosaic has no 64-bit
integers, so the accumulator is emulated as a (hi: i32, lo: u32) pair
built from 16-bit limb products — exact, and equivalence-tested
bit-for-bit against `biquad.df1_process_q`.

Layout: x (T, C) i32 time-major, C a multiple of 128 (lane width); the
grid walks time chunks sequentially (TPU grid order) with the state in
scratch across iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biquad import Df1State


def _mul_i32_i32_to_i64(a, x):
    """Exact 64-bit product of i32 scalars/vectors as (hi i32, lo u32).

    16-bit limb decomposition: a = ah*2^16 + al, x = xh*2^16 + xl with
    ah, xh sign-carrying high halves and al, xl unsigned low halves.
    """
    ah = a >> 16
    al = (a & 0xFFFF).astype(jnp.uint32)
    xh = x >> 16
    xl = (x & 0xFFFF).astype(jnp.uint32)

    ll = al * xl  # < 2^32, exact in u32
    lh = al.astype(jnp.int32) * xh  # |.| < 2^31, exact in i32
    hl = ah * xl.astype(jnp.int32)
    hh = ah * xh  # |.| < 2^30

    # acc = hh<<32 + (lh + hl)<<16 + ll, assembled with explicit carries
    hi = hh
    lo = ll
    for m in (lh, hl):
        add_lo = (m.astype(jnp.uint32) << 16)
        new_lo = lo + add_lo
        carry = (new_lo < lo).astype(jnp.int32)
        hi = hi + (m >> 16) + carry
        lo = new_lo
    return hi, lo


def _add_i64(a, b):
    """(hi, lo) + (hi, lo) with carry."""
    ahi, alo = a
    bhi, blo = b
    lo = alo + blo
    carry = (lo < alo).astype(jnp.int32)
    return ahi + bhi + carry, lo


def _shr_i64_to_i32(hi, lo, f: int):
    """Low 32 bits of the arithmetic ``(hi:lo) >> f`` for 0 < f < 32."""
    return (hi << (32 - f)) | (lo >> f).astype(jnp.int32)


def _df1_q_kernel(
    st_in_ref, x_ref, y_ref, out_state_ref, state_ref, *, ba: tuple, f: int
):
    """One time-chunk: sequential fori over rows, channels on lanes.

    Coefficients are trace-time constants (static `ba` tuple): an SMEM
    coefficient input triggered Mosaic lowering failures under a grid,
    and baked constants fold into the MACs anyway.  Retunes recompile
    (cheap, cached); the scan path handles dynamic coefficients.
    """
    tq = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(tq == 0)
    def _():
        state_ref[...] = st_in_ref[...]

    # Channels are laid out 2D as (c // 128 sublanes, 128 lanes): a
    # (1, c) row would occupy one sublane of each vreg (1/8 VPU
    # utilization); (cs, 128) rows pack vregs fully.
    b0 = jnp.int32(ba[0])
    b1 = jnp.int32(ba[1])
    b2 = jnp.int32(ba[2])
    a1 = jnp.int32(ba[3])
    a2 = jnp.int32(ba[4])

    tc = x_ref.shape[0]

    # The carry is ONE packed (4, C) array [x1; x2; y1; y2]: Mosaic
    # miscompiles tuple-of-vector fori carries under a grid (observed
    # "failed to legalize func.return (i64)" on v5e), a single array
    # carry lowers fine.
    def body(i, carry):
        x1 = carry[0]
        x2 = carry[1]
        y1 = carry[2]
        y2 = carry[3]
        x0 = x_ref[i]
        acc = _mul_i32_i32_to_i64(jnp.full_like(x0, b0), x0)
        acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(x0, b1), x1))
        acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(x0, b2), x2))
        acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(x0, a1), y1))
        acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(x0, a2), y2))
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        y_ref[i, :] = y0
        return jnp.stack([x0, x1, y0, y1])

    # int32 loop bounds: under jax_enable_x64 the default i64 induction
    # variable does not lower through Mosaic.
    st = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(tc), body, state_ref[...]
    )
    state_ref[...] = st

    @pl.when(tq == n_t - 1)
    def _():
        out_state_ref[...] = st


def _df1_f32_kernel(
    st_in_ref, x_ref, y_ref, out_state_ref, state_ref, *, ba: tuple
):
    """Float DF1 bank: same structure as the integer kernel, plain FMAs."""
    tq = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(tq == 0)
    def _():
        state_ref[...] = st_in_ref[...]

    b0 = jnp.float32(ba[0])
    b1 = jnp.float32(ba[1])
    b2 = jnp.float32(ba[2])
    a1 = jnp.float32(ba[3])
    a2 = jnp.float32(ba[4])
    tc = x_ref.shape[0]

    def body(i, carry):
        x1 = carry[0]
        x2 = carry[1]
        y1 = carry[2]
        y2 = carry[3]
        x0 = x_ref[i]
        y0 = b0 * x0 + b1 * x1 + b2 * x2 + a1 * y1 + a2 * y2
        y_ref[i] = y0
        return jnp.stack([x0, x1, y0, y1])

    st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(tc), body, state_ref[...])
    state_ref[...] = st

    @pl.when(tq == n_t - 1)
    def _():
        out_state_ref[...] = st


def df1_bank_f32(ba, state: Df1State, xs, *, time_chunk: int = 256,
                 interpret: bool = False):
    """Float DF1 biquad bank, Pallas fast path (sequential semantics —
    matches `df1_process` scanned exactly, unlike the reassociating
    `df1_block_float`)."""
    import numpy as _np

    ba_static = tuple(float(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_f32_impl(
        ba_static, state, xs, time_chunk=time_chunk, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("ba_static", "time_chunk", "interpret")
)
def _df1_bank_f32_impl(ba_static, state: Df1State, xs, *, time_chunk,
                       interpret):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    vmem_cap = max(8, (12 * 2**20) // (16 * c))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128).astype(jnp.float32)
    xs3 = xs.reshape(t, cs, 128)

    grid = (t // time_chunk,)
    kernel = functools.partial(_df1_f32_kernel, ba=ba_static)
    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs, 128), jnp.float32),
            jax.ShapeDtypeStruct((4, cs, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, cs, 128), jnp.float32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(st_in, xs3)

    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


def _sos_q_kernel(
    st_in_ref, x_ref, y_ref, out_state_ref, state_ref, *, ba: tuple, f: int,
    n_stages: int
):
    """Stage-major SOS cascade, whole cascade per time step in-kernel.

    State rows: stage n occupies rows [4n, 4n+4) as [x1; x2; y1; y2].
    Same Mosaic workarounds as `_df1_q_kernel` (packed single-array
    carry, static coefficients, i32 loop bounds).
    """
    tq = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(tq == 0)
    def _():
        state_ref[...] = st_in_ref[...]

    tc = x_ref.shape[0]

    def body(i, carry):
        cur = x_ref[i]
        rows = []
        for n in range(n_stages):
            b0, b1, b2, a1, a2 = (jnp.int32(v) for v in ba[5 * n : 5 * n + 5])
            x1 = carry[4 * n + 0]
            x2 = carry[4 * n + 1]
            y1 = carry[4 * n + 2]
            y2 = carry[4 * n + 3]
            acc = _mul_i32_i32_to_i64(jnp.full_like(cur, b0), cur)
            acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(cur, b1), x1))
            acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(cur, b2), x2))
            acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(cur, a1), y1))
            acc = _add_i64(acc, _mul_i32_i32_to_i64(jnp.full_like(cur, a2), y2))
            y0 = _shr_i64_to_i32(acc[0], acc[1], f)
            rows.extend([cur, x1, y0, y1])
            cur = y0
        y_ref[i] = cur
        return jnp.stack(rows)

    st = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(tc), body, state_ref[...]
    )
    state_ref[...] = st

    @pl.when(tq == n_t - 1)
    def _():
        out_state_ref[...] = st


def sos_bank_q(ba_stages, states, xs, f: int = 29, *, time_chunk: int = 256,
               interpret: bool = False):
    """N-stage fixed-point SOS cascade over a channel bank (one Pallas
    pass; the whole cascade advances per time step in VMEM).

    Args:
      ba_stages: (N, 5) i32 coefficients (static).
      states: list/tuple of N Df1State, each (c, 2).
      xs: (t, c) i32.

    Returns (new_states, ys) bit-identical to chaining `df1_process_q`
    stage-major (the reference `sos` path, py.rs:51-74).
    """
    import numpy as _np

    ba_arr = _np.asarray(ba_stages).reshape(-1, 5)
    n_stages = ba_arr.shape[0]
    ba_static = tuple(int(v) for v in ba_arr.reshape(-1))
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    st_in = jnp.concatenate(
        [
            jnp.stack(
                [s.x[..., 0], s.x[..., 1], s.y[..., 0], s.y[..., 1]], axis=0
            )
            for s in states
        ],
        axis=0,
    ).reshape(4 * n_stages, cs, 128)

    ys, st_out = _sos_bank_q_impl(
        ba_static, st_in, xs.reshape(t, cs, 128), f,
        n_stages=n_stages, time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(4 * n_stages, c)
    new_states = [
        Df1State(
            x=jnp.stack([st_out[4 * n], st_out[4 * n + 1]], axis=-1),
            y=jnp.stack([st_out[4 * n + 2], st_out[4 * n + 3]], axis=-1),
        )
        for n in range(n_stages)
    ]
    return new_states, ys.reshape(t, c)


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "n_stages", "time_chunk", "interpret"),
)
def _sos_bank_q_impl(ba_static, st_in, xs3, f, *, n_stages, time_chunk,
                     interpret):
    t, cs, _ = xs3.shape
    c = cs * 128
    vmem_cap = max(8, (12 * 2**20) // (16 * c))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8

    rows = 4 * n_stages
    grid = (t // time_chunk,)
    kernel = functools.partial(
        _sos_q_kernel, ba=ba_static, f=f, n_stages=n_stages
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rows, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, cs, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, cs, 128), jnp.int32)],
        interpret=interpret,
    )(st_in, xs3)


def df1_bank_q(ba, state: Df1State, xs, f: int = 29, *, time_chunk: int = 256,
               interpret: bool = False):
    """Fixed-point DF1 biquad over a channel bank, Pallas fast path.

    Args:
      ba: (5,) i32 Q<f> coefficients (shared across channels); traced
        as compile-time constants.
      state: Df1State with x/y of shape (c, 2), c % 128 == 0.
      xs: (t, c) i32, t % time_chunk == 0.
      f: fractional bits.
      time_chunk: VMEM time-block size; keep time_chunk * c * 4 bytes
        around <= 2 MB (in + out blocks are double-buffered in ~16 MB
        of VMEM; (2048, 1024) i32 blocks fail to fit).

    Returns: (state, ys) bit-identical to `df1_process_q` scanned.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_q_impl(
        ba_static, state, xs, f, time_chunk=time_chunk, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("ba_static", "f", "time_chunk", "interpret")
)
def _df1_bank_q_impl(ba_static, state: Df1State, xs, f: int, *,
                     time_chunk: int, interpret: bool):
    t, c = xs.shape
    assert c % 128 == 0, "channel count must be a multiple of 128"
    cs = c // 128
    # Auto-clamp the time chunk to the VMEM budget: the in and out
    # blocks are double-buffered (4 * tc * c * 4 bytes must stay well
    # under the ~16 MB scoped VMEM limit).
    vmem_cap = max(8, (12 * 2**20) // (16 * c))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8, "cannot find a VMEM-fitting time chunk"
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)
    xs3 = xs.reshape(t, cs, 128)

    grid = (t // time_chunk,)
    kernel = functools.partial(_df1_q_kernel, ba=ba_static, f=f)
    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (time_chunk, cs, 128),
                lambda i: (i, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs, 128), jnp.int32),
            jax.ShapeDtypeStruct((4, cs, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((4, cs, 128), jnp.int32)],
        input_output_aliases={1: 0},  # donate xs -> ys (same shape)
        interpret=interpret,
    )(st_in, xs3)

    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)
