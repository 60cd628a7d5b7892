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


def as_vma(vma):
    """Normalize a varying-manual-axes argument to frozenset | None.

    Rejects a bare string: frozenset("dp") would silently become the
    per-character axis set {'d', 'p'} and fail far from the call site.
    """
    if vma is None:
        return None
    if isinstance(vma, str):
        raise TypeError(
            f"vma must be an iterable of axis NAMES, got the string"
            f" {vma!r} (pass e.g. {{'{vma}'}})"
        )
    return frozenset(vma)


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


def _sub_i64(a, b):
    """(hi, lo) - (hi, lo): two's-complement negate-and-add."""
    bhi, blo = b
    nlo = jnp.uint32(0) - blo  # wrapping
    nhi = ~bhi + (blo == 0).astype(jnp.int32)
    return _add_i64(a, (nhi, nlo))


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
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128).astype(jnp.float32)

    def body(carry, x0, _extras):
        # jnp constants must be created INSIDE the kernel trace (a
        # closure-captured traced array is rejected by pallas_call)
        b0, b1, b2, a1, a2 = (jnp.float32(v) for v in ba_static)
        x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
        y0 = b0 * x0 + b1 * x1 + b2 * x2 + a1 * y1 + a2 * y2
        return (x0, x1, y0, y1), y0

    # unroll=1: float MACs contract to FMAs differently across unrolled
    # instances (1-ULP drift), breaking the documented bit-match with
    # the scan.  Integer kernels (exact arithmetic) use the default 2.
    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=1), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


def sos_bank_q(ba_stages, states, xs, f: int = 29, *, time_chunk: int = 256,
               unroll: int = 2, interpret: bool = False):
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
    ba_static = tuple(int(v) for v in ba_arr.reshape(-1))
    return _sos_bank_q_impl(
        ba_static, tuple(states), xs, f,
        time_chunk=time_chunk, unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "time_chunk", "unroll", "interpret"),
)
def _sos_bank_q_impl(ba_static, states, xs, f, *, time_chunk, unroll,
                     interpret):
    # Everything incl. the state pack/unpack lives INSIDE one jit: each
    # stray host-side jnp op outside it costs a full ~5 ms dispatch
    # round trip on the axon tunnel (measured: the same kernel ran
    # 36 ms/call with outside packing, 3.4 ms inside one jit).
    n_stages = len(ba_static) // 5
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

    def body(carry, x0, _extras):
        cur = x0
        rows_out = []
        for n in range(n_stages):
            ba_n = ba_static[5 * n: 5 * n + 5]
            x1 = carry[4 * n + 0]
            x2 = carry[4 * n + 1]
            y1 = carry[4 * n + 2]
            y2 = carry[4 * n + 3]
            acc = _mac5_q(ba_n, cur, x1, x2, y1, y2)
            y0 = _shr_i64_to_i32(acc[0], acc[1], f)
            rows_out.extend([cur, x1, y0, y1])
            cur = y0
        return tuple(rows_out), cur

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll), st_in,
        xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
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


def df1_bank_q(ba, state: Df1State, xs, f: int = 29, *, time_chunk: int = 256,
               unroll: int = 2, interpret: bool = False, out_dtype=None):
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
      out_dtype: optional output dtype; f32 casts in the kernel
        epilogue (free — saves a separate XLA cast pass when the next
        stage is a float FIR).  State update stays exact i32.

    Returns: (state, ys) bit-identical to `df1_process_q` scanned.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_q_impl(
        ba_static, state, xs, f, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
        out_dtype=None if out_dtype is None else jnp.dtype(out_dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "time_chunk", "unroll",
                     "interpret", "out_dtype"),
)
def _df1_bank_q_impl(ba_static, state: Df1State, xs, f: int, *,
                     time_chunk: int, unroll: int = 2, interpret: bool = False,
                     out_dtype=None):
    t, c = xs.shape
    assert c % 128 == 0, "channel count must be a multiple of 128"
    cs = c // 128
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)

    def body(carry, x0, _extras):
        x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
        acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        y = y0 if out_dtype is None else y0.astype(out_dtype)
        return (x0, x1, y0, y1), y

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll), st_in,
        xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret, out_dtype=out_dtype,
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


def df1_bank_q_dec(ba, state: Df1State, xs, f: int = 29, *, d: int = 16,
                   time_chunk: int = 256, interpret: bool = False,
                   out_dtype=None):
    """DF1 bank with keep-1-in-``d`` decimation in the kernel epilogue.

    The DDC-bank channel filter (pipelines/ddc_bank.py) decimates the
    biquad output by 16; keeping only every d-th row in the kernel
    epilogue cuts the output HBM traffic by d and replaces the separate
    reshape+slice pass (see `_seq_bank_kernel`'s ``dec``).
    Bit-identical to ``df1_bank_q(...)[1][::d]``; the carried state is
    the full-rate state, exact.

    Returns (state, ys) with ys (t // d, c).
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_q_dec_impl(
        ba_static, state, xs, f, int(d), time_chunk=time_chunk,
        interpret=interpret,
        out_dtype=None if out_dtype is None else jnp.dtype(out_dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "d", "time_chunk", "interpret",
                     "out_dtype"),
)
def _df1_bank_q_dec_impl(ba_static, state: Df1State, xs, f: int, d: int, *,
                         time_chunk: int, interpret: bool = False,
                         out_dtype=None):
    t, c = xs.shape
    assert c % 128 == 0 and t % d == 0
    cs = c // 128
    ot = jnp.int32 if out_dtype is None else out_dtype
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)

    def body(carry, x0, _extras):
        x1, x2, y1, y2 = carry
        acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        return (x0, x1, y0, y1), y0.astype(ot)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=4, dec=d), st_in,
        xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret, out_dtype=ot,
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t // d, c)


# --- shared plumbing for the bank-kernel family ------------------------------
#
# Every bank kernel below has the same shape: a (rows, cs, 128) packed
# state held in VMEM scratch across sequential grid steps, a (t, cs, 128)
# input walked in time chunks, the same-shape output, and the final state
# written on the last grid step.  `_bank_call` owns the BlockSpec / VMEM
# budget boilerplate; kernels only provide the per-chunk body.


def _pick_time_chunk(t: int, cap: int, unroll: int, dec: int,
                     requested: int, extra_multiple: int = 1) -> int:
    """Largest time chunk <= min(requested, cap) that divides ``t`` and
    is a multiple of ``unroll``, ``dec`` and ``extra_multiple`` (e.g.
    128 for the lanes x-layout).

    Non-power-of-two decimation factors (e.g. dec=12) have no
    power-of-two chunk multiple, so a halving clamp cannot find one —
    enumerate multiples of lcm instead.  Raises when even the minimum
    feasible chunk exceeds the VMEM cap (silently over-allocating would
    surface as an opaque Mosaic scoped-VMEM compile failure).
    """
    import math

    base = math.lcm(max(unroll, 1), max(dec, 1), max(extra_multiple, 1))
    if base > cap:
        raise ValueError(
            f"minimum feasible time chunk {base} (lcm of unroll={unroll},"
            f" dec={dec}, layout multiple={extra_multiple}) exceeds the"
            f" VMEM-derived cap {cap}; reduce the channel count per"
            " kernel, the decimation factor, or the unroll"
        )
    limit = min(t, cap, max(requested, base))
    best = 0
    k = base
    while k <= limit:
        if t % k == 0:
            best = k
        k += base
    assert best > 0, (
        f"no time chunk <= {limit} divides t={t} and is a multiple of "
        f"unroll={unroll}, dec={dec}, layout multiple={extra_multiple}"
    )
    return best


def _bank_call(kernel, st_in, xs3, *, time_chunk, interpret, extra_in=(),
               out_dtype=None, donate=True, vma=None):
    """Run a sequential time-loop bank kernel.

    Kernel signature: ``(extra_refs..., st_in_ref, x_ref, y_ref,
    out_state_ref, state_scratch_ref)``.

    Args:
      st_in: (rows, cs, 128) packed initial state.
      xs3: (t, cs, 128) input, t divisible into VMEM-sized chunks.
      extra_in: additional (r_i, cs, 128) VMEM-resident inputs (e.g.
        runtime coefficient planes) placed before the state input.
    Returns (ys (t, cs, 128), st_out (rows, cs, 128)).
    """
    t, cs, _ = xs3.shape
    c = cs * 128
    rows = st_in.shape[0]
    out_dtype = out_dtype or xs3.dtype
    # The sequential kernel's fori bound is tc // unroll: a chunk that
    # is not a multiple of unroll would silently leave trailing output
    # rows uninitialized (garbage via the donated input alias) and
    # corrupt the carried state — keep divisibility while clamping.
    unroll = getattr(kernel, "_unroll", 1)
    dec = getattr(kernel, "_dec", 1)
    vmem_cap = max(8, (12 * 2**20) // (16 * c))
    time_chunk = _pick_time_chunk(t, vmem_cap, unroll, dec, time_chunk)
    grid = (t // time_chunk,)

    def fixed(r):
        # Index maps derive the 0s from the i32 program index: bare
        # Python 0 constants trace as i64 under x64 and fail Mosaic
        # legalization.
        return pl.BlockSpec(
            (r, cs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    walk = pl.BlockSpec(
        (time_chunk, cs, 128), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    walk_out = (
        walk
        if dec == 1
        else pl.BlockSpec(
            (time_chunk // dec, cs, 128), lambda i: (i, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )
    )
    n_extra = len(extra_in)
    aliases = {}
    if donate and xs3.dtype == out_dtype and dec == 1:
        aliases = {n_extra + 1: 0}
    scratch = [pltpu.VMEM((rows, cs, 128), st_in.dtype)]
    if dec > 1:
        # full-rate chunk output lands here; the kernel epilogue copies
        # the kept rows (reshape + unit slice) into the walked output
        scratch.append(pltpu.VMEM((time_chunk, cs, 128), out_dtype))
    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(e.shape[0]) for e in extra_in] + [fixed(rows), walk],
        out_specs=[walk_out, fixed(rows)],
        out_shape=[
            # vma: declared (halo_rdma.py pattern) so compiled shard_map
            # callers can keep the replication checker enabled.
            jax.ShapeDtypeStruct((t // dec, cs, 128), out_dtype, vma=vma),
            jax.ShapeDtypeStruct((rows, cs, 128), st_in.dtype, vma=vma),
        ],
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*extra_in, st_in, xs3)
    return ys, st_out


def _seq_bank_kernel(body, unroll: int = 2, prep=None, dec: int = 1):
    """Wrap a per-chunk ``body(carry, x_row, extra_rows) -> (carry, y)``
    into the standard sequential bank kernel (state in scratch across
    grid steps, packed single-array fori carry, i32 fori bounds).

    ``dec``: keep-1-in-dec output decimation in the kernel epilogue.
    The sequential loop writes full-rate rows to a VMEM scratch and the
    chunk epilogue copies the kept rows (``ys[::dec]``) to the walked
    output via reshape + unit slice — one vectorized pass, no unroll
    constraint (emitting only at static unrolled slots would force
    unroll == dec, whose 16-deep unrolled limb bodies explode XLA
    compile time).  The carried state stays the exact full-rate
    recurrence.

    ``body`` receives the carry as a TUPLE of (cs, 128) rows and must
    return a tuple of rows — the packed array exists only at the fori
    boundary (tuple fori carries miscompile under a grid; see
    CLAUDE.md).  Restacking the carry array every sample dominates the
    sequential loop cost: unpacking once per unroll group and stacking
    once on exit measured ~2.9x on a 1024-lane DF1 bank unroll sweep
    (scripts/tpu_unroll_exp.py; canonical-config rates live in
    benches/RESULTS.md).  ``unroll`` additionally interleaves
    independent work of adjacent steps.  Time chunks are always a
    multiple of ``unroll`` (and of ``dec``), but NOT necessarily a
    power of two — `_pick_time_chunk` enumerates lcm multiples.
    """

    def kernel(*refs):
        if dec > 1:
            (*extra_refs, st_in_ref, x_ref, y_ref, out_state_ref,
             state_ref, yfull_ref) = refs
        else:
            (*extra_refs, st_in_ref, x_ref, y_ref, out_state_ref,
             state_ref) = refs
            yfull_ref = y_ref
        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            state_ref[...] = st_in_ref[...]

        extras = tuple(r[...] for r in extra_refs)
        if prep is not None:
            # once-per-chunk transform of the extras (e.g. coefficient
            # limb pre-split) — Mosaic does not hoist loop-invariant
            # work out of the fori body, so it must happen here
            extras = prep(extras)
        tc = x_ref.shape[0]
        rows = st_in_ref.shape[0]

        def step(j, packed):
            carry = tuple(packed[r] for r in range(rows))
            for u in range(unroll):
                i = j * unroll + u
                carry, y = body(carry, x_ref[i], extras)
                yfull_ref[i] = y
            return jnp.stack(carry)

        st = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(tc // unroll), step, state_ref[...]
        )
        state_ref[...] = st

        if dec > 1:
            cs = x_ref.shape[1]
            y_ref[...] = yfull_ref[...].reshape(
                tc // dec, dec, cs, 128
            )[:, 0]

        @pl.when(tq == n_t - 1)
        def _():
            out_state_ref[...] = st

    assert dec >= 1
    kernel._unroll = unroll  # read by _bank_call's time-chunk clamp
    kernel._dec = dec  # shrinks _bank_call's output walk + adds scratch
    return kernel


# --- emulated-i64 helpers beyond the MAC -------------------------------------


def _as_u32(x):
    """Bit-pattern i32 -> u32 (XLA same-width int convert wraps mod 2^32)."""
    return x.astype(jnp.uint32)


def _as_i32(x):
    return x.astype(jnp.int32)


def _mul_u32_i32_to_i64(u, a):
    """Exact 64-bit product of u32 ``u`` and i32 ``a`` as (hi i32, lo u32).

    Mirrors `_mul_i32_i32_to_i64` with an unsigned first operand — used
    for the reference's split-word wide-state multiplies
    (biquad.rs:464-467, pll.rs:99-102: ``(y_lo as u32 as i64 * a) >> 32``).
    """
    uh = (u >> 16).astype(jnp.int32)  # < 2^16, logical shift on u32
    ul = u & 0xFFFF
    ah = a >> 16  # sign-carrying
    al = (a & 0xFFFF).astype(jnp.uint32)

    ll = ul * al  # u32 exact
    lh = ul.astype(jnp.int32) * ah  # |.| < 2^31, exact i32
    hl = uh.astype(jnp.uint32) * al  # < 2^32, exact u32
    hh = uh * ah  # |.| < 2^31

    hi = hh
    lo = ll
    # signed mid-limb
    new_lo = lo + (lh.astype(jnp.uint32) << 16)
    hi = hi + (lh >> 16) + (new_lo < lo).astype(jnp.int32)
    lo = new_lo
    # unsigned mid-limb
    new_lo = lo + (hl << 16)
    hi = hi + (hl >> 16).astype(jnp.int32) + (new_lo < lo).astype(jnp.int32)
    lo = new_lo
    return hi, lo


def _shl_i64(acc, s: int):
    """(hi, lo) << s for static 0 <= s < 32."""
    hi, lo = acc
    if s == 0:
        return hi, lo
    return (hi << s) | (lo >> (32 - s)).astype(jnp.int32), lo << s


def _sext32(v):
    """Sign-extend an i32 into an emulated (hi, lo) i64 pair."""
    return v >> 31, _as_u32(v)


def _mul_presplit_i32(ah, al, x):
    """`_mul_i32_i32_to_i64` with the first operand already limb-split
    (ah: i32 sign-carrying high half, al: u32 low half) — used when the
    coefficient split is hoisted out of the sequential loop."""
    xh = x >> 16
    xl = (x & 0xFFFF).astype(jnp.uint32)

    ll = al * xl
    lh = al.astype(jnp.int32) * xh
    hl = ah * xl.astype(jnp.int32)
    hh = ah * xh

    hi = hh
    lo = ll
    for m in (lh, hl):
        new_lo = lo + (m.astype(jnp.uint32) << 16)
        hi = hi + (m >> 16) + (new_lo < lo).astype(jnp.int32)
        lo = new_lo
    return hi, lo


def _split_coef(p):
    """Limb-split a coefficient plane for `_mul_presplit_i32`."""
    return p >> 16, (p & 0xFFFF).astype(jnp.uint32)


def _mac5_presplit(ba_split, x0, x1, x2, y1, y2):
    """`_mac5_q` with pre-split coefficient planes
    (tuple of 5 (ah, al) pairs)."""
    acc = _mul_presplit_i32(*ba_split[0], x0)
    for (ah, al), v in zip(ba_split[1:], (x1, x2, y1, y2)):
        acc = _add_i64(acc, _mul_presplit_i32(ah, al, v))
    return acc


def _mul_u32_presplit(u, ah, al):
    """`_mul_u32_i32_to_i64` with the signed operand pre-split
    (ah: i32 sign-carrying high, al: u32 low)."""
    uh = (u >> 16).astype(jnp.int32)
    ul = u & 0xFFFF

    ll = ul * al
    lh = ul.astype(jnp.int32) * ah
    hl = uh.astype(jnp.uint32) * al
    hh = uh * ah

    hi = hh
    lo = ll
    new_lo = lo + (lh.astype(jnp.uint32) << 16)
    hi = hi + (lh >> 16) + (new_lo < lo).astype(jnp.int32)
    lo = new_lo
    new_lo = lo + (hl << 16)
    hi = hi + (hl >> 16).astype(jnp.int32) + (new_lo < lo).astype(jnp.int32)
    lo = new_lo
    return hi, lo


def _mul_coef_i32(v, x):
    """coef * i32 value; ``v`` is a scalar, a plane, or a pre-split
    (ah, al) pair (the once-per-chunk hoisted form)."""
    if isinstance(v, tuple):
        return _mul_presplit_i32(v[0], v[1], x)
    return _mul_i32_i32_to_i64(
        jnp.broadcast_to(jnp.asarray(v, jnp.int32), x.shape), x
    )


def _mul_u32_coef(u, v):
    """u32 value * coef; same coef forms as `_mul_coef_i32`."""
    if isinstance(v, tuple):
        return _mul_u32_presplit(u, v[0], v[1])
    return _mul_u32_i32_to_i64(
        u, jnp.broadcast_to(jnp.asarray(v, jnp.int32), u.shape)
    )


def _mac5_q(ba, x0, x1, x2, y1, y2):
    """acc = b0*x0 + b1*x1 + b2*x2 + a1*y1 + a2*y2 as an emulated i64.

    ``ba`` entries may be scalars (static coefficients), (cs, 128)
    planes, or pre-split (ah, al) pairs (see `_split_coef`)."""
    acc = _mul_coef_i32(ba[0], x0)
    for v, z in zip(ba[1:], (x1, x2, y1, y2)):
        acc = _add_i64(acc, _mul_coef_i32(v, z))
    return acc


# --- clamped DF1 bank --------------------------------------------------------


def df1_clamp_bank_q(ba, state: Df1State, xs, f: int = 29, *,
                     u: int = 0, lo: int, hi: int,
                     time_chunk: int = 256, interpret: bool = False):
    """Fixed-point DF1 with summing-junction offset + output clamp
    (anti-windup, biquad.rs:394-404) over a channel bank.

    Bit-identical to scanning ``clamp_step(df1_step_q(...))``.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_clamp_bank_q_impl(
        ba_static, state, xs, f, int(u), int(lo), int(hi),
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "u", "lo", "hi", "time_chunk",
                     "interpret"),
)
def _df1_clamp_bank_q_impl(ba_static, state: Df1State, xs, f, u, lo, hi, *,
                           time_chunk, interpret):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128

    def body(carry, x0, _extras):
        x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
        acc = _mac5_q(ba_static, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        y0 = jnp.clip(y0 + jnp.int32(u), jnp.int32(lo), jnp.int32(hi))
        return (x0, x1, y0, y1), y0

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)
    ys, st_out = _bank_call(
        _seq_bank_kernel(body), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


# --- wide (i64 feedback state) DF1 bank --------------------------------------


def _split_i64_planes(y):
    """(...,) i64 -> (hi i32, lo i32-bitcast) planes."""
    hi = (y >> 32).astype(jnp.int32)
    lo = (y & 0xFFFFFFFF).astype(jnp.uint32).astype(jnp.int32)
    return hi, lo


def _join_i64_planes(hi, lo):
    return (hi.astype(jnp.int64) << 32) | lo.astype(jnp.uint32).astype(
        jnp.int64
    )


def _wide_body(ba, f, clamp, carry, x0):
    """One DF1-wide step (biquad.rs:456-480) on packed carry rows
    [x1, x2, y0hi, y0lo, y1hi, y1lo]."""
    x1, x2 = carry[0], carry[1]
    y0hi, y0lo = carry[2], _as_u32(carry[3])
    y1hi, y1lo = carry[4], _as_u32(carry[5])

    b0, b1, b2, a1, a2 = ba

    acc = _mul_coef_i32(b0, x0)
    acc = _add_i64(acc, _mul_coef_i32(b1, x1))
    acc = _add_i64(acc, _mul_coef_i32(b2, x2))
    # split-word a*y: ((y_lo as u64 * a) >> 32) + y_hi * a — the >>32 of
    # the u32*i32 product is exactly its high word, which fits in i32.
    s0, _ = _mul_u32_coef(y0lo, a1)
    acc = _add_i64(acc, _sext32(s0))
    acc = _add_i64(acc, _mul_coef_i32(a1, y0hi))
    s1, _ = _mul_u32_coef(y1lo, a2)
    acc = _add_i64(acc, _sext32(s1))
    acc = _add_i64(acc, _mul_coef_i32(a2, y1hi))
    acc = _shl_i64(acc, 32 - f)
    y0 = acc[0]
    new_y0hi, new_y0lo = acc[0], acc[1]
    if clamp is not None:
        u, lo, hi = (jnp.int32(v) for v in clamp)
        y0 = jnp.clip(y0 + u, lo, hi)
        new_y0hi = y0  # clamped output replaces the high word
    return (
        (x0, x1, new_y0hi, _as_i32(new_y0lo), y0hi, _as_i32(y0lo)),
        y0,
    )


def df1_wide_bank(ba, state, xs, f: int = 29, *, clamp=None,
                  time_chunk: int = 256, interpret: bool = False):
    """Wide-state (i64 feedback) DF1 bank, Pallas fast path
    (biquad.rs:456-472; clamp variant :474-480).

    Args:
      state: Df1WideState (x (c,2) i32, y (c,2) i64).
      clamp: optional static (u, lo, hi) ints for the clamped variant.

    Bit-identical to scanning `df1_wide_step` / `df1_wide_clamp_step`.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    clamp_static = None if clamp is None else tuple(int(v) for v in clamp)
    return _df1_wide_bank_impl(
        ba_static, state, xs, f, clamp_static,
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "clamp", "time_chunk", "interpret"),
)
def _df1_wide_bank_impl(ba_static, state, xs, f, clamp, *, time_chunk,
                        interpret):
    from .biquad import Df1WideState

    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    y0hi, y0lo = _split_i64_planes(state.y[..., 0])
    y1hi, y1lo = _split_i64_planes(state.y[..., 1])
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], y0hi, y0lo, y1hi, y1lo], axis=0
    ).reshape(6, cs, 128)

    def body(carry, x0, _extras):
        return _wide_body(ba_static, f, clamp, carry, x0)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(6, c)
    new_state = Df1WideState(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack(
            [_join_i64_planes(st_out[2], st_out[3]),
             _join_i64_planes(st_out[4], st_out[5])],
            axis=-1,
        ),
    )
    return new_state, ys.reshape(t, c)


# --- dither (error-feedback) DF1 bank ----------------------------------------


def _dither_body(ba, f, clamp, carry, x0):
    """One DF1-dither step (biquad.rs:511-538) on packed carry rows
    [x1, x2, y1, y2, e]."""
    x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
    e = _as_u32(carry[4])
    acc = _mac5_q(ba, x0, x1, x2, y1, y2)
    acc = _add_i64(acc, (jnp.zeros_like(acc[0]), e))
    acc = _shl_i64(acc, 32 - f)
    e_new = acc[1] >> (32 - f) if f != 32 else acc[1]
    y0 = acc[0]
    if clamp is not None:
        u, lo, hi = (jnp.int32(v) for v in clamp)
        y0 = jnp.clip(y0 + u, lo, hi)
    return (x0, x1, y0, y1, _as_i32(e_new)), y0


def df1_dither_bank(ba, state, xs, f: int = 29, *, clamp=None,
                    time_chunk: int = 256, interpret: bool = False):
    """Error-feedback (noise-shaping) DF1 bank, Pallas fast path
    (biquad.rs:511-530; clamp variant :532-538).

    Args:
      state: Df1DitherState (xy Df1State i32, e (c,) u32).
      clamp: optional static (u, lo, hi) ints.

    Bit-identical to scanning `df1_dither_step` / `df1_dither_clamp_step`.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    clamp_static = None if clamp is None else tuple(int(v) for v in clamp)
    return _df1_dither_bank_impl(
        ba_static, state, xs, f, clamp_static,
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "clamp", "time_chunk", "interpret"),
)
def _df1_dither_bank_impl(ba_static, state, xs, f, clamp, *, time_chunk,
                          interpret):
    from .biquad import Df1DitherState

    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    xy = state.xy
    st_in = jnp.stack(
        [xy.x[..., 0], xy.x[..., 1], xy.y[..., 0], xy.y[..., 1],
         _as_i32(state.e)],
        axis=0,
    ).reshape(5, cs, 128)

    def body(carry, x0, _extras):
        return _dither_body(ba_static, f, clamp, carry, x0)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(5, c)
    new_state = Df1DitherState(
        xy=Df1State(
            x=jnp.stack([st_out[0], st_out[1]], axis=-1),
            y=jnp.stack([st_out[2], st_out[3]], axis=-1),
        ),
        e=_as_u32(st_out[4]),
    )
    return new_state, ys.reshape(t, c)


# --- runtime-coefficient DF1 bank (retune without recompile) -----------------


def df1_bank_q_coef(ba_planes, state: Df1State, xs, f: int = 29, *,
                    time_chunk: int = 256, unroll: int = 2,
                    interpret: bool = False):
    """DF1 bank with *runtime* coefficients: retune never recompiles.

    Coefficients arrive as traced data — a (5,) vector (shared across
    channels, the reference's atomic-swap property, biquad.rs:34-36 /
    config.rs:347-434) or a (5, c) array (per-channel filters, beyond
    the reference) — staged into (5, c/128, 128) VMEM planes read once
    per time chunk.  Same emulated-i64 semantics as `df1_bank_q`;
    bit-identical to it and to the scan path.
    """
    t, c = xs.shape
    ba_planes = jnp.asarray(ba_planes, jnp.int32)
    if ba_planes.ndim == 1:
        ba_planes = jnp.broadcast_to(ba_planes[:, None], (5, c))
    return _df1_bank_q_coef_impl(
        ba_planes, state, xs, f, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("f", "time_chunk", "unroll", "interpret")
)
def _df1_bank_q_coef_impl(ba_planes, state: Df1State, xs, f, *, time_chunk,
                          unroll=2, interpret=False):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)

    def prep(extras):
        (ba,) = extras
        return tuple(_split_coef(ba[i]) for i in range(5))

    def body(carry, x0, ba_split):
        x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
        acc = _mac5_presplit(ba_split, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        return (x0, x1, y0, y1), y0

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll, prep=prep), st_in,
        xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
        extra_in=(ba_planes.reshape(5, cs, 128),),
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


def _coef_planes(ba_planes, c):
    """Normalize runtime coefficients to a (5, c/128, 128) i32 stack."""
    ba_planes = jnp.asarray(ba_planes, jnp.int32)
    if ba_planes.ndim == 1:
        ba_planes = jnp.broadcast_to(ba_planes[:, None], (5, c))
    return ba_planes.reshape(5, c // 128, 128)


def df1_clamp_bank_q_coef(ba_planes, state: Df1State, xs, f: int = 29, *,
                          u: int = 0, lo: int, hi: int,
                          time_chunk: int = 256, interpret: bool = False):
    """Clamped DF1 bank with *runtime* coefficients (retune without
    recompile; per-channel (5, c) planes supported).

    Clamp bounds stay static (they are range constants, not tuning
    targets — biquad.rs:121-157).  Bit-identical to `df1_clamp_bank_q`.
    """
    return _df1_clamp_bank_q_coef_impl(
        _coef_planes(ba_planes, xs.shape[1]), state, xs, f,
        int(u), int(lo), int(hi),
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("f", "u", "lo", "hi", "time_chunk", "interpret"),
)
def _df1_clamp_bank_q_coef_impl(ba_planes, state: Df1State, xs, f, u, lo,
                                hi, *, time_chunk, interpret):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128

    def prep(extras):
        (ba,) = extras
        return tuple(_split_coef(ba[i]) for i in range(5))

    def body(carry, x0, ba_split):
        x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
        acc = _mac5_presplit(ba_split, x0, x1, x2, y1, y2)
        y0 = _shr_i64_to_i32(acc[0], acc[1], f)
        y0 = jnp.clip(y0 + jnp.int32(u), jnp.int32(lo), jnp.int32(hi))
        return (x0, x1, y0, y1), y0

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).reshape(4, cs, 128)
    ys, st_out = _bank_call(
        _seq_bank_kernel(body, prep=prep), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
        extra_in=(ba_planes,),
    )
    st_out = st_out.reshape(4, c)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c)


def df1_wide_bank_coef(ba_planes, state, xs, f: int = 29, *, clamp=None,
                       time_chunk: int = 256, interpret: bool = False):
    """Wide-state DF1 bank with *runtime* coefficients (shared (5,) or
    per-channel (5, c)).  Bit-identical to `df1_wide_bank`."""
    clamp_static = None if clamp is None else tuple(int(v) for v in clamp)
    return _df1_wide_bank_coef_impl(
        _coef_planes(ba_planes, xs.shape[1]), state, xs, f, clamp_static,
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("f", "clamp", "time_chunk", "interpret")
)
def _df1_wide_bank_coef_impl(ba_planes, state, xs, f, clamp, *, time_chunk,
                             interpret):
    from .biquad import Df1WideState

    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    y0hi, y0lo = _split_i64_planes(state.y[..., 0])
    y1hi, y1lo = _split_i64_planes(state.y[..., 1])
    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], y0hi, y0lo, y1hi, y1lo], axis=0
    ).reshape(6, cs, 128)

    def prep(extras):
        (ba,) = extras
        return tuple(_split_coef(ba[i]) for i in range(5))

    def body(carry, x0, ba_split):
        return _wide_body(ba_split, f, clamp, carry, x0)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, prep=prep), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
        extra_in=(ba_planes,),
    )
    st_out = st_out.reshape(6, c)
    new_state = Df1WideState(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack(
            [_join_i64_planes(st_out[2], st_out[3]),
             _join_i64_planes(st_out[4], st_out[5])],
            axis=-1,
        ),
    )
    return new_state, ys.reshape(t, c)


def df1_dither_bank_coef(ba_planes, state, xs, f: int = 29, *, clamp=None,
                         time_chunk: int = 256, interpret: bool = False):
    """Noise-shaping DF1 bank with *runtime* coefficients (shared (5,)
    or per-channel (5, c)).  Bit-identical to `df1_dither_bank`."""
    clamp_static = None if clamp is None else tuple(int(v) for v in clamp)
    return _df1_dither_bank_coef_impl(
        _coef_planes(ba_planes, xs.shape[1]), state, xs, f, clamp_static,
        time_chunk=time_chunk, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("f", "clamp", "time_chunk", "interpret")
)
def _df1_dither_bank_coef_impl(ba_planes, state, xs, f, clamp, *,
                               time_chunk, interpret):
    from .biquad import Df1DitherState

    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    xy = state.xy
    st_in = jnp.stack(
        [xy.x[..., 0], xy.x[..., 1], xy.y[..., 0], xy.y[..., 1],
         _as_i32(state.e)],
        axis=0,
    ).reshape(5, cs, 128)

    def prep(extras):
        (ba,) = extras
        return tuple(_split_coef(ba[i]) for i in range(5))

    def body(carry, x0, ba_split):
        return _dither_body(ba_split, f, clamp, carry, x0)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, prep=prep), st_in, xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
        extra_in=(ba_planes,),
    )
    st_out = st_out.reshape(5, c)
    new_state = Df1DitherState(
        xy=Df1State(
            x=jnp.stack([st_out[0], st_out[1]], axis=-1),
            y=jnp.stack([st_out[2], st_out[3]], axis=-1),
        ),
        e=_as_u32(st_out[4]),
    )
    return new_state, ys.reshape(t, c)


# --- Q64<f> bank: emulated 128-bit MAC ---------------------------------------
#
# The reference's `Q64<61>` row (tests/embedded/README.md:63,
# `Q<i64, i128, F>` per dsp-fixedpoint/src/lib.rs:473-492).  Mosaic has
# no 64-bit integers at all, so i64 values live as (hi i32, lo u32)
# limb pairs and the i128 accumulator as four 32-bit limbs
# (r3 sign-carrying i32, r2..r0 u32) with explicit carries — the 64-bit
# analog of the 16-bit-limb Q32 MAC above.  Bit-exact vs
# `biquad.df1_process_q64`.


def _mul_u32_u32_to_u64(a, x):
    """Exact 64-bit product of u32 values as (hi u32, lo u32)."""
    ah = a >> 16
    al = a & 0xFFFF
    xh = x >> 16
    xl = x & 0xFFFF

    ll = al * xl  # u32 exact
    hh = ah * xh
    m1 = al * xh
    m2 = ah * xl
    mid = m1 + m2
    cmid = (mid < m1).astype(jnp.uint32)

    lo = ll + (mid << 16)
    c1 = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (cmid << 16) + c1
    return hi, lo


def _mul_i64limbs(vh, vl, ch: int, cl: int):
    """(vh:vl) * static-i64-coefficient -> 128-bit (r3 i32, r2, r1, r0 u32).

    vh: i32 high limb (sign-carrying), vl: u32 low limb; the
    coefficient is split at trace time into ch (Python int, signed
    high) and cl (unsigned low).
    """
    chv = jnp.full_like(vh, jnp.int32(ch))
    clv = jnp.full_like(vl, jnp.uint32(cl))

    p0h, p0l = _mul_u32_u32_to_u64(vl, clv)  # al*bl -> limbs 1:0
    p1h, p1l = _mul_u32_i32_to_i64(vl, chv)  # al*bh -> limbs 2:1 (+sext 3)
    p2h, p2l = _mul_u32_i32_to_i64(clv, vh)  # ah*bl -> limbs 2:1 (+sext 3)
    p3h, p3l = _mul_i32_i32_to_i64(vh, chv)  # ah*bh -> limbs 3:2

    r0 = p0l

    r1 = p0h + p1l
    c2 = (r1 < p0h).astype(jnp.uint32)
    r1b = r1 + p2l
    c2 = c2 + (r1b < r1).astype(jnp.uint32)
    r1 = r1b

    # limb 2: signed mid-highs enter as bit patterns; their sign
    # extensions land in limb 3
    r2 = _as_u32(p1h) + _as_u32(p2h)
    c3 = (r2 < _as_u32(p1h)).astype(jnp.int32)
    r2b = r2 + p3l
    c3 = c3 + (r2b < r2).astype(jnp.int32)
    r2 = r2b + c2
    c3 = c3 + (r2 < r2b).astype(jnp.int32)

    r3 = p3h + (p1h >> 31) + (p2h >> 31) + c3  # wrapping i32
    return r3, r2, r1, r0


def _add_i128limbs(a, b):
    """4-limb (r3 i32, r2..r0 u32) add with carries."""
    a3, a2, a1, a0 = a
    b3, b2, b1, b0 = b
    r0 = a0 + b0
    c1 = (r0 < a0).astype(jnp.uint32)
    r1 = a1 + b1
    c2 = (r1 < a1).astype(jnp.uint32)
    r1 = r1 + c1
    c2 = c2 + (r1 < c1).astype(jnp.uint32)
    r2 = a2 + b2
    c3 = (r2 < a2).astype(jnp.int32)
    r2 = r2 + c2
    c3 = c3 + (r2 < c2).astype(jnp.int32)
    r3 = a3 + b3 + c3
    return r3, r2, r1, r0


def _shr_i128limbs_to_i64(r3, r2, r1, r0, f: int):
    """Low 64 bits of ``(r3:r2:r1:r0) >> f`` as (hi i32, lo u32), for
    static 32 < f < 64 (matches `biquad._shr_i128_to_i64`)."""
    assert 32 < f < 64
    s = f - 32
    lo = (r1 >> s) | (r2 << (32 - s))
    hi = _as_i32(r2 >> s) | (r3 << (32 - s))
    return hi, lo


def df1_bank_q64(ba, state: Df1State, xs, f: int = 61, *,
                 time_chunk: int = 256, unroll: int = 2,
                 interpret: bool = False):
    """Q64<f> DF1 biquad bank, Pallas fast path.

    Args:
      ba: (5,) i64 Q<f> coefficients (static, baked into the kernel).
      state: Df1State with i64 ``x``/``y`` of shape (c, 2), c % 128 == 0.
      xs: (t, c) i64 input block.
      f: fractional bits, 32 < f < 64 (the baseline row is Q64<61>).

    Returns (state, ys) bit-identical to `df1_process_q64` scanned.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_q64_impl(
        ba_static, state, xs, f, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )


def _split_i64(v):
    """i64 array -> (hi i32, lo i32-bit-pattern)."""
    return (v >> 32).astype(jnp.int32), (v & 0xFFFFFFFF).astype(
        jnp.uint32
    ).astype(jnp.int32)


def _join_i64(hi, lo):
    """(hi i32, lo i32-bit-pattern) -> i64."""
    return (hi.astype(jnp.int64) << 32) | _as_u32(lo).astype(jnp.int64)


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "time_chunk", "unroll", "interpret"),
)
def _df1_bank_q64_impl(ba_static, state: Df1State, xs, f: int, *,
                       time_chunk: int, unroll: int, interpret: bool):
    t, c = xs.shape
    assert c % 128 == 0
    assert 32 < f < 64
    cs = c // 128
    ba_limbs = tuple(
        (int(v) >> 32, int(v) & 0xFFFFFFFF) for v in ba_static
    )

    def hl(row):
        return row[:cs], _as_u32(row[cs:])

    def body(carry, x_row, _extras):
        # carry rows (each (2cs, 128) = [hi | lo]): x1, x2, y1, y2
        x1, x2, y1, y2 = carry
        acc = None
        for row, (ch, cl) in zip((x_row, x1, x2, y1, y2), ba_limbs):
            vh, vl = hl(row)
            p = _mul_i64limbs(vh, vl, ch, cl)
            acc = p if acc is None else _add_i128limbs(acc, p)
        y0h, y0l = _shr_i128limbs_to_i64(acc[0], acc[1], acc[2], acc[3], f)
        y0 = jnp.concatenate([y0h, _as_i32(y0l)], axis=0)
        return (x_row, x1, y0, y1), y0

    def pack(v):
        h, lo = _split_i64(v)
        return jnp.concatenate(
            [h.reshape(cs, 128), lo.reshape(cs, 128)], axis=0
        )

    st_in = jnp.stack(
        [pack(state.x[..., 0]), pack(state.x[..., 1]),
         pack(state.y[..., 0]), pack(state.y[..., 1])], axis=0
    )  # (4, 2cs, 128)

    xh, xl = _split_i64(xs)
    xs3 = jnp.concatenate(
        [xh.reshape(t, cs, 128), xl.reshape(t, cs, 128)], axis=1
    )  # (t, 2cs, 128): [hi | lo] rows

    ys3, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll), st_in, xs3,
        time_chunk=time_chunk, interpret=interpret,
    )

    def unpack(row):
        return _join_i64(
            row[:cs].reshape(c), row[cs:].reshape(c)
        )

    new_state = Df1State(
        x=jnp.stack([unpack(st_out[0]), unpack(st_out[1])], axis=-1),
        y=jnp.stack([unpack(st_out[2]), unpack(st_out[3])], axis=-1),
    )
    ys = _join_i64(
        ys3[:, :cs].reshape(t, c), ys3[:, cs:].reshape(t, c)
    )
    return new_state, ys


# --- Q16<f> bank: native-i32 accumulator -------------------------------------


def df1_bank_q16(ba, state: Df1State, xs, f: int = 13, *,
                 time_chunk: int = 512, unroll: int = 2,
                 interpret: bool = False):
    """Q16<f> DF1 biquad bank, Pallas fast path.

    The i16 baseline variant (`Q16<13>`, tests/embedded/README.md:62):
    i16 storage with an i32 accumulator (`Q<i16, i32, F>`), so — unlike
    the Q32/Q64 banks — no limb emulation at all: i16 x i16 products
    are exact in native i32, the 5-term sum wraps in i32 exactly like
    the reference accumulator, one truncating shift, wrap to i16.
    Values ride the kernel as sign-extended i32 lanes (the i16 <-> i32
    conversion happens once at the jit boundary).

    Args:
      ba: (5,) i16 Q<f> coefficients (static, baked).
      state: Df1State with i16 x/y of shape (c, 2), c % 128 == 0.
      xs: (t, c) i16 input block.

    Returns (state, ys) bit-identical to scanning
    ``biquad.df1_step_q(ba, f, s, x, dtype=jnp.int16)``.
    """
    import numpy as _np

    ba_static = tuple(int(v) for v in _np.asarray(ba).reshape(-1)[:5])
    return _df1_bank_q16_impl(
        ba_static, state, xs, f, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("ba_static", "f", "time_chunk", "unroll", "interpret"),
)
def _df1_bank_q16_impl(ba_static, state: Df1State, xs, f: int, *,
                       time_chunk: int, unroll: int = 2,
                       interpret: bool = False):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128

    def wrap16(v):
        return (v << 16) >> 16

    def body(carry, x0, _extras):
        x1, x2, y1, y2 = carry
        acc = jnp.full_like(x0, jnp.int32(ba_static[0])) * x0
        for coef, v in zip(ba_static[1:], (x1, x2, y1, y2)):
            acc = acc + jnp.full_like(x0, jnp.int32(coef)) * v
        y0 = wrap16(acc >> f)
        return (x0, x1, y0, y1), y0

    st_in = jnp.stack(
        [state.x[..., 0], state.x[..., 1], state.y[..., 0], state.y[..., 1]],
        axis=0,
    ).astype(jnp.int32).reshape(4, cs, 128)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll), st_in,
        xs.astype(jnp.int32).reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(4, c).astype(jnp.int16)
    new_state = Df1State(
        x=jnp.stack([st_out[0], st_out[1]], axis=-1),
        y=jnp.stack([st_out[2], st_out[3]], axis=-1),
    )
    return new_state, ys.reshape(t, c).astype(jnp.int16)
