"""Pallas TPU kernel for wave-digital allpass chains (channel banks).

Same structure as the biquad bank kernel (biquad_pallas.py): the whole
time loop runs in one Pallas program, channels on (c/128, 128) tiles,
the adapter-chain state in VMEM scratch.  The `c * a` Q32<32> apply is
the exact high word of the 64-bit product (limb-emulated).  Adapter
types and coefficients are static (trace-time constants).

Bit-identical to `wdf.block` / `wdf.chain_block` (equivalence-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biquad_pallas import _mul_i32_i32_to_i64
from .wdf import Tpa, WdfState


def _mul_hi32(a_const: int, x):
    """Exact high word of (a * x) for static i32 ``a`` — the Q32<32>
    truncating apply (wdf.rs:65-101 `c * a`)."""
    hi, _lo = _mul_i32_i32_to_i64(jnp.full_like(x, jnp.int32(a_const)), x)
    return hi


def _adapt_static(tpa: Tpa, x0, x1, a_const: int):
    """One two-port adapter with a static coefficient (wdf.rs:65-101)."""
    if tpa == Tpa.A:
        c = x1 - x0
        y = _mul_hi32(a_const, c) + x1
        return y + c, y
    if tpa == Tpa.B:
        c = x0 - x1
        y = _mul_hi32(a_const, c) + x1
        return y, y + c
    if tpa == Tpa.B1:
        c = x0 - x1
        y = _mul_hi32(a_const, c)
        return y + x1, y + x0
    if tpa == Tpa.X:
        return x1, x0
    if tpa == Tpa.C:
        c = x1 - x0
        y = _mul_hi32(a_const, c) - x1
        return y, y + c
    if tpa == Tpa.C1:
        c = x1 - x0
        y = _mul_hi32(a_const, c)
        return y - x1, y - x0
    if tpa == Tpa.D:
        c = x0 - x1
        y = _mul_hi32(a_const, c) - x1
        return y + c, y
    return x0, x1  # Z


def _wdf_kernel(
    st_in_ref, x_ref, y_ref, out_state_ref, state_ref, *, tpas: tuple,
    coeffs: tuple, unroll: int = 2
):
    """stages are a flat chain; state row j = z of stage j."""
    tq = pl.program_id(0)
    n_t = pl.num_programs(0)

    @pl.when(tq == 0)
    def _():
        state_ref[...] = st_in_ref[...]

    tc = x_ref.shape[0]
    n = len(tpas)

    def body(j, packed):
        # unpack once per unroll group; restacking the carry every
        # sample dominates the loop cost (see _seq_bank_kernel)
        carry = tuple(packed[r] for r in range(n))
        for u in range(unroll):
            i = j * unroll + u
            cur = x_ref[i]
            rows = [None] * n
            y_out = None
            for j2 in range(n):
                w, nxt = _adapt_static(tpas[j2], cur, carry[j2], coeffs[j2])
                if j2 == 0:
                    y_out = w
                else:
                    rows[j2 - 1] = w
                cur = nxt
            rows[n - 1] = cur
            y_ref[i] = y_out
            carry = tuple(rows)
        return jnp.stack(carry)

    st = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(tc // unroll), body, state_ref[...]
    )
    state_ref[...] = st

    @pl.when(tq == n_t - 1)
    def _():
        out_state_ref[...] = st


def wdf_bank(tpas, a, state: WdfState, xs, *, time_chunk: int = 256,
             interpret: bool = False):
    """Adapter-chain WDF over a channel bank, Pallas fast path.

    Args:
      tpas: list of Tpa (static).
      a: (N,) i32 Q32<32> coefficients (static).
      state: WdfState with z of shape (c, N), c % 128 == 0.
      xs: (t, c) i32.

    Returns (state, ys) bit-identical to `wdf.block`.
    """
    import numpy as _np

    tpas_t = tuple(Tpa(t) for t in tpas)
    coeffs = tuple(int(v) for v in _np.asarray(a).reshape(-1))
    return _wdf_bank_impl(
        tpas_t, coeffs, state, xs, time_chunk=time_chunk, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("tpas", "coeffs", "time_chunk", "interpret")
)
def _wdf_bank_impl(tpas, coeffs, state: WdfState, xs, *, time_chunk,
                   interpret):
    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    n = len(tpas)
    vmem_cap = max(8, (12 * 2**20) // (16 * c))
    while time_chunk > vmem_cap:
        time_chunk //= 2
    while t % time_chunk:
        time_chunk //= 2
    assert time_chunk >= 8

    st_in = jnp.moveaxis(state.z, -1, 0).reshape(n, cs, 128)
    xs3 = xs.reshape(t, cs, 128)
    grid = (t // time_chunk,)
    kernel = functools.partial(_wdf_kernel, tpas=tpas, coeffs=coeffs)
    ys, st_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (n, cs, 128),
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
                (n, cs, 128),
                lambda i: (i * 0, i * 0, i * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, cs, 128), jnp.int32),
            jax.ShapeDtypeStruct((n, cs, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((n, cs, 128), jnp.int32)],
        input_output_aliases={1: 0},
        interpret=interpret,
    )(st_in, xs3)

    new_state = WdfState(
        z=jnp.moveaxis(st_out.reshape(n, c), 0, -1)
    )
    return new_state, ys.reshape(t, c)


# --- serial stage chains and complementary pairs -----------------------------


def _chain_body(stages, carry, x0):
    """Serial WDF stages in one step (wdf.chain_block semantics): the
    output of stage s feeds stage s+1; state rows are the concatenated
    per-stage z vectors."""
    rows_out = []
    cur = x0
    base = 0
    for tpas, coeffs in stages:
        n = len(tpas)
        stage_rows = [None] * n
        y_out = None
        for j in range(n):
            w, nxt = _adapt_static(tpas[j], cur, carry[base + j], coeffs[j])
            if j == 0:
                y_out = w
            else:
                stage_rows[j - 1] = w
            cur = nxt
        stage_rows[n - 1] = cur
        rows_out.extend(stage_rows)
        base += n
        cur = y_out
    return tuple(rows_out), cur


def wdf_chain_bank(stages, states, xs, *, time_chunk: int = 256,
                   unroll: int = 2, interpret: bool = False):
    """Serial chain of WDF adapter chains in ONE Pallas pass
    (`wdf.chain_block` fast path).

    Args:
      stages: list of (tpas, a) with static adapter types/coefficients.
      states: list of WdfState, z shape (c, n_i).
      xs: (t, c) i32.

    Returns (new_states, ys) bit-identical to `wdf.chain_block`.
    """
    import numpy as _np

    stages_static = tuple(
        (tuple(Tpa(t) for t in tpas),
         tuple(int(v) for v in _np.asarray(a).reshape(-1)))
        for tpas, a in stages
    )
    return _wdf_chain_bank_impl(
        stages_static, tuple(states), xs, time_chunk=time_chunk,
        unroll=unroll, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("stages", "time_chunk", "unroll", "interpret"),
)
def _wdf_chain_bank_impl(stages, states, xs, *, time_chunk, unroll=2,
                         interpret=False):
    from .biquad_pallas import _bank_call, _seq_bank_kernel

    t, c = xs.shape
    assert c % 128 == 0
    cs = c // 128
    orders = [len(tpas) for tpas, _ in stages]
    st_in = jnp.concatenate(
        [jnp.moveaxis(s.z, -1, 0) for s in states], axis=0
    ).reshape(sum(orders), cs, 128)

    def body(carry, x0, _extras):
        return _chain_body(stages, carry, x0)

    ys, st_out = _bank_call(
        _seq_bank_kernel(body, unroll=unroll), st_in,
        xs.reshape(t, cs, 128),
        time_chunk=time_chunk, interpret=interpret,
    )
    st_out = st_out.reshape(sum(orders), c)
    new_states = []
    base = 0
    for n in orders:
        new_states.append(
            WdfState(z=jnp.moveaxis(st_out[base:base + n], 0, -1))
        )
        base += n
    return new_states, ys.reshape(t, c)


def wdf_pair_bank(branch0, branch1, states, xs, *, time_chunk: int = 256,
                  unroll: int = 2, interpret: bool = False):
    """Complementary allpass pair (`wdf.pair_block` fast path): both
    branch chain kernels and the butterfly in ONE jit (separate jits
    pay a full dispatch round trip each on the axon tunnel).

    Returns ((s0, s1), (sum, diff)) bit-identical to `wdf.pair_block`.
    """
    import numpy as _np

    def freeze(branch):
        return tuple(
            (tuple(Tpa(t) for t in tpas),
             tuple(int(v) for v in _np.asarray(a).reshape(-1)))
            for tpas, a in branch
        )

    return _wdf_pair_bank_impl(
        freeze(branch0), freeze(branch1), tuple(states[0]),
        tuple(states[1]), xs, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("b0", "b1", "time_chunk", "unroll", "interpret"),
)
def _wdf_pair_bank_impl(b0, b1, s0, s1, xs, *, time_chunk, unroll=2,
                        interpret=False):
    s0, y0 = _wdf_chain_bank_impl(
        b0, s0, xs, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )
    s1, y1 = _wdf_chain_bank_impl(
        b1, s1, xs, time_chunk=time_chunk, unroll=unroll,
        interpret=interpret,
    )
    return (s0, s1), (y0 + y1, y0 - y1)
