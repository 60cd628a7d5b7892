"""Standalone Pallas kernels for the half-band rate-change cascades.

TPU-native analogs of the reference's block FIR cascade benchmarks
(hbf.rs:636-672 Skylake rows; tests/embedded/src/bin/hbf.rs:29-54): the
decimate-by-2**N and interpolate-by-2**N half-band cascades as ONE
kernel each, so inter-stage intermediates live in VMEM instead of
round-tripping HBM between XLA stages.

These are the *pure FIR* counterparts of the fused IIR+cascade kernels
in ddc_pallas (`_run_fused_cascade`): same parity-plane scratch layout
and carried-tail choreography, no sequential front end — every stage is
a vectorized shifted-slice FMA over the chunk.

* `hbf_dec_cascade_bank(states, xs)` == `hbf.hbf_dec_cascade(states,
  xs, axis=0)` (stage order highest-rate/fewest-taps first,
  hbf.rs:385-421).
* `hbf_int_cascade_bank(states, xs)` == `hbf.hbf_int_cascade(states,
  xs, axis=0)` (lowest-rate/most-taps first, hbf.rs:476-512).

Both take/return the hbf.py axis=0 state tuples so they are drop-in
kernel replacements.  f32 outputs match the XLA composition to the FMA
contraction bound (~1-2 ULP across graphs, CLAUDE.md round-3 lessons);
carried tails are copies of input/output samples and match bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .biquad_pallas import _pick_time_chunk, as_vma
from .ddc_pallas import _fir_even
from .hbf import HbfDecState, HbfIntState


def _taps_key(states, taps):
    """Static (hashable) per-stage tap tuples in cascade order."""
    depth = len(states)
    return tuple(tuple(float(v) for v in np.asarray(tv)) for tv in taps)[
        :depth
    ]


# --- decimation cascade -------------------------------------------------------


def hbf_dec_cascade_bank(states, xs, *, taps=None, time_chunk: int = 512,
                         interpret: bool = False, vma=None):
    """Decimate-by-2**depth half-band cascade in one Pallas kernel.

    Args:
      states: tuple of `hbf.HbfDecState` (axis=0 layout, highest-rate
        stage first — `hbf.hbf_dec_cascade_init(depth, (c,), axis=0)`).
      xs: (t, c) f32 full-rate block, c % 128 == 0.
      taps: full tap table (default `hbf.HBF_TAPS`); stage i uses
        taps[depth-1-i], exactly like `hbf.hbf_dec_cascade`.

    Returns (new_states, y) with y (t // 2**depth, c) f32.
    """
    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS
    depth = len(states)
    stage_taps = tuple(taps[depth - 1 - i] for i in range(depth))
    tails = tuple(
        jnp.concatenate([st.odd, st.even], axis=0) for st in states
    )
    new_tails, y = _hbf_dec_cascade_impl(
        _taps_key(states, stage_taps), tails, xs,
        time_chunk=time_chunk, interpret=interpret,
        vma=as_vma(vma),
    )
    outs = []
    for tl, tv in zip(new_tails, stage_taps):
        ln = 2 * len(tv) - 1
        outs.append(HbfDecState(odd=tl[0:ln], even=tl[ln:]))
    return tuple(outs), y


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("time_chunk", "interpret", "vma"))
def _hbf_dec_cascade_impl(taps_static, tails, xs, *, time_chunk,
                          interpret, vma=None):
    depth = len(taps_static)
    r = 1 << depth
    t, c2 = xs.shape
    assert c2 % 128 == 0, "channel count must be a multiple of 128"
    assert t % r == 0
    cs = c2 // 128
    ms = [len(tv) for tv in taps_static]
    lns = [2 * m - 1 for m in ms]
    mes = [m - 1 for m in ms]
    nts = [ln + me for ln, me in zip(lns, mes)]

    # VMEM model ~18 B per full-rate sample-channel (parity planes +
    # double-buffered input), same family as _run_fused_cascade.
    vmem_cap = max(8, (10 * 2**20) // (18 * c2))
    tc = _pick_time_chunk(t, vmem_cap, 2, r, time_chunk)
    ns = [tc >> (d + 1) for d in range(depth)]
    grid = (t // tc,)

    def kernel(*refs):
        tin_refs = refs[0:depth]
        x_ref = refs[depth]
        y_ref = refs[depth + 1]
        tout_refs = refs[depth + 2:depth + 2 + depth]
        scr = refs[depth + 2 + depth:]
        t_refs = scr[0:depth]
        oe_refs = scr[depth:depth + 2 * depth]  # odd0, even0, odd1, ...

        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            for tr, tin in zip(t_refs, tin_refs):
                tr[...] = tin[...]

        # stage scratch prologue: tails into the plane heads
        for d in range(depth):
            oe_refs[2 * d][0:lns[d]] = t_refs[d][0:lns[d]]
            oe_refs[2 * d + 1][0:mes[d]] = t_refs[d][lns[d]:nts[d]]

        # stage-0 input parity split (reshape + unit slice; stride-2
        # row slices are gathers Mosaic rejects)
        xp = x_ref[...].reshape(ns[0], 2, cs, 128)
        oe_refs[1][mes[0]:mes[0] + ns[0]] = xp[:, 0]
        oe_refs[0][lns[0]:lns[0] + ns[0]] = xp[:, 1]

        for d in range(depth):
            yv = _fir_even(oe_refs[2 * d], oe_refs[2 * d + 1], lns[d],
                           ns[d], taps_static[d])
            if d + 1 < depth:
                yp = yv.reshape(ns[d + 1], 2, cs, 128)
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
            for tr, tout in zip(t_refs, tout_refs):
                tout[...] = tr[...]

    def fixed(rr):
        return pl.BlockSpec(
            (rr, cs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    walk_in = pl.BlockSpec(
        (tc, cs, 128), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    walk_out = pl.BlockSpec(
        (ns[-1], cs, 128), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(nt) for nt in nts] + [walk_in],
        out_specs=[walk_out] + [fixed(nt) for nt in nts],
        out_shape=(
            # vma: declared per the halo_rdma.py pattern so compiled
            # shard_map callers can keep the replication checker on.
            [jax.ShapeDtypeStruct((t // r, cs, 128), jnp.float32,
                                  vma=vma)]
            + [jax.ShapeDtypeStruct((nt, cs, 128), jnp.float32, vma=vma)
               for nt in nts]
        ),
        scratch_shapes=(
            [pltpu.VMEM((nt, cs, 128), jnp.float32) for nt in nts]
            + sum(
                (
                    [pltpu.VMEM((ns[d] + lns[d], cs, 128), jnp.float32),
                     pltpu.VMEM((ns[d] + mes[d], cs, 128), jnp.float32)]
                    for d in range(depth)
                ),
                [],
            )
        ),
        interpret=interpret,
    )(*[tl.reshape(nt, cs, 128) for tl, nt in zip(tails, nts)],
      xs.reshape(t, cs, 128))

    y = outs[0].reshape(t // r, c2)
    t_outs = tuple(o.reshape(nt, c2) for o, nt in zip(outs[1:], nts))
    return t_outs, y


# --- interpolation cascade ----------------------------------------------------


def hbf_int_cascade_bank(states, xs, *, taps=None, time_chunk: int = 128,
                         interpret: bool = False, vma=None):
    """Interpolate-by-2**depth half-band cascade in one Pallas kernel.

    Args:
      states: tuple of `hbf.HbfIntState` (axis=0 layout, lowest-rate
        stage first — `hbf.hbf_int_cascade_init(depth, (c,), axis=0)`).
      xs: (t, c) f32 low-rate block, c % 128 == 0.
      taps: full tap table (default `hbf.HBF_TAPS`); stage i uses
        taps[i], exactly like `hbf.hbf_int_cascade`.

    Returns (new_states, y) with y (t * 2**depth, c) f32.  Output slot
    order per stage matches hbf.rs:208-236: FIR output in even slots,
    the M-delayed input (identity center tap) in odd slots.
    """
    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS
    depth = len(states)
    stage_taps = tuple(taps[i] for i in range(depth))
    tails = tuple(st.x for st in states)
    new_tails, y = _hbf_int_cascade_impl(
        _taps_key(states, stage_taps), tails, xs,
        time_chunk=time_chunk, interpret=interpret,
        vma=as_vma(vma),
    )
    return tuple(HbfIntState(x=tl) for tl in new_tails), y


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("time_chunk", "interpret", "vma"))
def _hbf_int_cascade_impl(taps_static, tails, xs, *, time_chunk,
                          interpret, vma=None):
    depth = len(taps_static)
    r = 1 << depth
    t, c2 = xs.shape
    assert c2 % 128 == 0, "channel count must be a multiple of 128"
    cs = c2 // 128
    ms = [len(tv) for tv in taps_static]
    lns = [2 * m - 1 for m in ms]

    # VMEM model: ext scratch rows sum to (r-1)*tc, plus the
    # double-buffered input (tc) and output (r*tc) blocks: ~(3r+1)*4 B
    # per low-rate sample-channel.
    vmem_cap = max(4, (10 * 2**20) // ((3 * r + 1) * 4 * c2))
    tc = _pick_time_chunk(t, vmem_cap, 1, 1, time_chunk)
    ns = [tc << d for d in range(depth)]  # stage input rows
    grid = (t // tc,)

    def kernel(*refs):
        tin_refs = refs[0:depth]
        x_ref = refs[depth]
        y_ref = refs[depth + 1]
        tout_refs = refs[depth + 2:depth + 2 + depth]
        scr = refs[depth + 2 + depth:]
        t_refs = scr[0:depth]
        ext_refs = scr[depth:2 * depth]

        tq = pl.program_id(0)
        n_t = pl.num_programs(0)

        @pl.when(tq == 0)
        def _():
            for tr, tin in zip(t_refs, tin_refs):
                tr[...] = tin[...]

        for d in range(depth):
            ext_refs[d][0:lns[d]] = t_refs[d][...]
        ext_refs[0][lns[0]:lns[0] + tc] = x_ref[...]

        for d in range(depth):
            n, ln, m = ns[d], lns[d], ms[d]
            tv = taps_static[d]
            ext = ext_refs[d]
            # sub-block the stage so live values stay bounded (the
            # whole-chunk FIR at the last stage would hold 4*tc rows)
            bs = n
            for cand in (256, 128, 64):
                if n > cand and n % cand == 0:
                    bs = cand
                    break
            for j in range(n // bs):
                o = j * bs
                acc = None
                for i in range(m):
                    a = ext[i + o:i + o + bs]
                    b = ext[ln - i + o:ln - i + o + bs]
                    term = (b + a) * jnp.float32(tv[i])
                    acc = term if acc is None else acc + term
                cen = ext[m + o:m + o + bs]
                blk = jnp.stack([acc, cen], axis=1).reshape(
                    2 * bs, cs, 128
                )
                if d + 1 < depth:
                    ext_refs[d + 1][
                        lns[d + 1] + 2 * o:lns[d + 1] + 2 * o + 2 * bs
                    ] = blk
                else:
                    y_ref[2 * o:2 * o + 2 * bs] = blk
            t_refs[d][...] = ext[n:n + ln]

        @pl.when(tq == n_t - 1)
        def _():
            for tr, tout in zip(t_refs, tout_refs):
                tout[...] = tr[...]

    def fixed(rr):
        return pl.BlockSpec(
            (rr, cs, 128), lambda i: (i * 0, i * 0, i * 0),
            memory_space=pltpu.VMEM,
        )

    walk_in = pl.BlockSpec(
        (tc, cs, 128), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )
    walk_out = pl.BlockSpec(
        (tc * r, cs, 128), lambda i: (i, i * 0, i * 0),
        memory_space=pltpu.VMEM,
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fixed(ln) for ln in lns] + [walk_in],
        out_specs=[walk_out] + [fixed(ln) for ln in lns],
        out_shape=(
            # vma: see hbf_dec_cascade_bank.
            [jax.ShapeDtypeStruct((t * r, cs, 128), jnp.float32,
                                  vma=vma)]
            + [jax.ShapeDtypeStruct((ln, cs, 128), jnp.float32, vma=vma)
               for ln in lns]
        ),
        scratch_shapes=(
            [pltpu.VMEM((ln, cs, 128), jnp.float32) for ln in lns]
            + [pltpu.VMEM((ns[d] + lns[d], cs, 128), jnp.float32)
               for d in range(depth)]
        ),
        interpret=interpret,
    )(*[tl.reshape(ln, cs, 128) for tl, ln in zip(tails, lns)],
      xs.reshape(t, cs, 128))

    y = outs[0].reshape(t * r, c2)
    t_outs = tuple(o.reshape(ln, c2) for o, ln in zip(outs[1:], lns))
    return t_outs, y


# --- MXU banded-matmul decimation cascade -------------------------------------


def _hbf_dec_band_matrix(taps, n_out: int, kp: int) -> np.ndarray:
    """(n_out, kp + 2*n_out) banded operator of one half-band dec-by-2
    stage over [zero-pad | full-rate carry | block] rows.

    Derivation (same math as `hbf.hbf_dec_block`, round-5): with the
    stage state held as the last ``4m-2`` FULL-RATE input samples
    (right-aligned in a ``kp``-row slot, leading rows zero columns),

        y[j] = sum_i tv[i] * (ext[o + 2j+2i+1] + ext[o + 2j+4m-1-2i])
               + ext[o + 2j+2m],          o = kp - (4m-2)

    odd-history columns are odd, the even/center-tap column is even,
    so the don't-care even rows of the carry slot are never read.
    """
    taps = np.asarray(taps, np.float64)
    m = taps.shape[0]
    k = 4 * m - 2
    o = kp - k
    w = np.zeros((n_out, kp + 2 * n_out), np.float32)
    for j in range(n_out):
        for i in range(m):
            w[j, o + 2 * j + 2 * i + 1] += np.float32(taps[i])
            w[j, o + 2 * j + 4 * m - 1 - 2 * i] += np.float32(taps[i])
        w[j, o + 2 * j + 2 * m] += 1.0
    return w


def _carry_from_state(st: HbfDecState, m: int, kp: int, c2: int, jnp=jnp):
    """HbfDecState (odd ln, even m-1 planes) -> right-aligned (kp, c2)
    full-rate carry: carry[o+2r+1]=odd[r], carry[o+2r+2m]=even[r]."""
    k = 4 * m - 2
    o = kp - k
    carry = jnp.zeros((kp, c2), st.odd.dtype)
    carry = carry.at[o + 1:o + 4 * m - 2:2].set(st.odd)
    if m > 1:
        carry = carry.at[o + 2 * m:o + 4 * m - 3:2].set(st.even)
    return carry


def _state_from_carry(carry, m: int, kp: int) -> HbfDecState:
    k = 4 * m - 2
    o = kp - k
    return HbfDecState(
        odd=carry[o + 1:o + 4 * m - 2:2],
        even=carry[o + 2 * m:o + 4 * m - 3:2],
    )


def hbf_dec_cascade_mxu(states, xs, *, taps=None, block: int = 256,
                        sub: int = 32, precision: str = "split3",
                        interpret: bool = False, vma=None):
    """Decimate-by-2**depth half-band cascade as banded MXU matmuls.

    Same I/O contract as `hbf_dec_cascade_bank` (axis=0 states, (t, c)
    f32 in, (t/2**depth, c) out) but each stage is ONE (n_out, K) x
    (K, c) dot against a static banded operator instead of ~2m
    sublane-shifted FMA slices.  The round-5 depth/DMA probes showed
    the shift-based kernel issue-bound at ~180 GB/s effective while a
    bare Pallas copy streams 661 GB/s; the banded form moves the FIR
    onto the MXU (~740 F/S at block=512) and leaves the VPU only the
    scratch packing, i.e. the kernel becomes HBM-bound.

    Numerics: the dot reassociates the tap sum, so outputs are
    tolerance-gated vs `hbf.hbf_dec_cascade` (never bit-eq, CLAUDE.md
    round-3 lessons); the stage-0 carry is exact input copies.
    ``precision``:
      * "split3" (default): manual bf16 hi/lo split of both operands,
        three 1-pass dots (Wh@xh + Wh@xl + Wl@xh) — ~4e-6 rel on
        device, kernel stays HBM-bound (~2e-7 measured at 4096x1024).
      * "highest": Mosaic's own f32 decomposition — ~2e-7 rel but ~9
        MXU passes (measured 75 GS/s at block=128 vs ~140 split3).
      * "default": single bf16 pass — ~4.5e-3 rel (DATA truncation);
        documented fast path only for gain-insensitive pipelines.
    """
    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS
    depth = len(states)
    stage_taps = tuple(taps[depth - 1 - i] for i in range(depth))
    ms = [len(tv) for tv in stage_taps]
    kps = [-(-(4 * m - 2) // 8) * 8 for m in ms]
    c2 = xs.shape[1]
    carries = tuple(
        _carry_from_state(st, m, kp, c2)
        for st, m, kp in zip(states, ms, kps)
    )
    new_carries, y = _hbf_dec_mxu_impl(
        _taps_key(states, stage_taps), carries, xs, block=block,
        sub=sub, precision=precision, interpret=interpret,
        vma=as_vma(vma),
    )
    return (
        tuple(
            _state_from_carry(cr, m, kp)
            for cr, m, kp in zip(new_carries, ms, kps)
        ),
        y,
    )


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("block", "sub", "precision",
                                    "interpret", "vma"))
def _hbf_dec_mxu_impl(taps_static, carries, xs, *, block, sub,
                      precision, interpret, vma=None):
    depth = len(taps_static)
    r = 1 << depth
    t, c2 = xs.shape
    assert c2 % 128 == 0, "channel count must be a multiple of 128"
    ms = [len(tv) for tv in taps_static]
    kps = [-(-(4 * m - 2) // 8) * 8 for m in ms]

    b = min(block, t)
    while t % b or b % (8 * r):
        b -= 8
        if b <= 0:
            raise ValueError(f"no block size divides t={t} for r={r}")
    outs_rows = [b >> (d + 1) for d in range(depth)]  # per-stage rows
    # Toeplitz sub-blocking: the banded operator is shift-invariant,
    # so one (su, kp + 2su) matrix applies to every stride-2su window
    # of the stage's ext scratch — su bounds the dense-band waste
    # ((kp + 2su) MACs/row vs a ~4m-wide band) independently of the
    # frame block b.  su multiple of 8 keeps every read/write aligned.
    sus = []
    for n_out in outs_rows:
        su = min(sub, n_out)
        while n_out % su:
            su -= 8
        sus.append(max(su, 8))
    ws = [
        jnp.asarray(_hbf_dec_band_matrix(tv, su, kp))
        for tv, su, kp in zip(taps_static, sus, kps)
    ]
    grid = (t // b,)

    def kernel(*refs):
        cin = refs[0:depth]
        x_ref = refs[depth]
        w_refs = refs[depth + 1:2 * depth + 1]
        y_ref = refs[2 * depth + 1]
        cout = refs[2 * depth + 2:3 * depth + 2]
        scr = refs[3 * depth + 2:]
        car = scr[0:depth]
        ext = scr[depth:2 * depth]

        i = pl.program_id(0)
        n_i = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            for cr, ci in zip(car, cin):
                cr[...] = ci[...]

        ext[0][kps[0]:kps[0] + b] = x_ref[...]
        for d in range(depth):
            kp, n_in, n_out = kps[d], outs_rows[d] * 2, outs_rows[d]
            su = sus[d]
            ext[d][0:kp] = car[d][...]
            car[d][...] = ext[d][n_in:n_in + kp]
            # precision: Mosaic's default f32 dot truncates operands
            # to bf16 (one MXU pass; measured 4.5e-3 rel on device).
            # split3 = manual hi/lo bf16 split, three 1-pass dots; the
            # dropped Wl@xl term is ~2^-18 rel.  See docstring.
            wv = w_refs[d][...]
            if precision == "split3":
                wh = wv.astype(jnp.bfloat16)
                wl = (wv - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            win = kp + 2 * su
            for q in range(n_out // su):
                ev = ext[d][2 * su * q:2 * su * q + win]
                if precision == "split3":
                    eh = ev.astype(jnp.bfloat16)
                    el = (ev - eh.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    v = (
                        jnp.dot(wh, eh,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(wh, el,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(wl, eh,
                                  preferred_element_type=jnp.float32)
                    )
                else:
                    v = jnp.dot(wv, ev, precision=precision,
                                preferred_element_type=jnp.float32)
                if d + 1 < depth:
                    ext[d + 1][kps[d + 1] + su * q:
                               kps[d + 1] + su * q + su] = v
                else:
                    y_ref[su * q:su * q + su] = v

        @pl.when(i == n_i - 1)
        def _():
            for cr, co in zip(car, cout):
                co[...] = cr[...]

    def fixed(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    walk_in = pl.BlockSpec((b, c2), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
    walk_out = pl.BlockSpec((b // r, c2), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [fixed(kp, c2) for kp in kps]
            + [walk_in]
            + [fixed(w.shape[0], w.shape[1]) for w in ws]
        ),
        out_specs=[walk_out] + [fixed(kp, c2) for kp in kps],
        out_shape=(
            [jax.ShapeDtypeStruct((t // r, c2), jnp.float32, vma=vma)]
            + [jax.ShapeDtypeStruct((kp, c2), jnp.float32, vma=vma)
               for kp in kps]
        ),
        scratch_shapes=(
            [pltpu.VMEM((kp, c2), jnp.float32) for kp in kps]
            + [pltpu.VMEM((kp + 2 * n_out, c2), jnp.float32)
               for kp, n_out in zip(kps, outs_rows)]
        ),
        interpret=interpret,
    )(*carries, xs, *ws)
    return tuple(outs[1:]), outs[0]


# --- MXU banded-matmul interpolation cascade ----------------------------------


def _hbf_int_band_matrix(taps, su: int, kp: int) -> np.ndarray:
    """(2*su, kp + su) banded operator of one half-band int-by-2 stage
    window (same math as the shift kernel's `_hbf_int_cascade_impl`):
    FIR output in even rows, the M-delayed center tap in odd rows
    (hbf.rs:208-236), over [zero-pad | low-rate tail | window]."""
    taps = np.asarray(taps, np.float64)
    m = taps.shape[0]
    ln = 2 * m - 1
    o = kp - ln
    w = np.zeros((2 * su, kp + su), np.float32)
    for j in range(su):
        for i in range(m):
            w[2 * j, o + j + i] += np.float32(taps[i])
            w[2 * j, o + j + ln - i] += np.float32(taps[i])
        w[2 * j + 1, o + j + m] += 1.0
    return w


def hbf_int_cascade_mxu(states, xs, *, taps=None, block: int = 64,
                        sub: int = 32, precision: str = "split3",
                        interpret: bool = False, vma=None):
    """Interpolate-by-2**depth half-band cascade as banded MXU matmuls.

    Same I/O contract as `hbf_int_cascade_bank` ((t, c) low-rate in,
    (t * 2**depth, c) out, axis=0 `HbfIntState` tuple) but each stage
    window is ONE (2*su, kp+su) x (kp+su, c) dot against a static
    Toeplitz band — the interpolation twin of `hbf_dec_cascade_mxu`
    (see its docstring for the precision modes and the round-5
    issue-bound diagnosis of the shift kernels).  Stage-0 carried
    state is exact input copies; later stages and outputs are
    tolerance-gated vs `hbf.hbf_int_cascade`.
    """
    if taps is None:
        from .hbf import HBF_TAPS

        taps = HBF_TAPS
    depth = len(states)
    stage_taps = tuple(taps[i] for i in range(depth))
    ms = [len(tv) for tv in stage_taps]
    kps = [-(-(2 * m - 1) // 8) * 8 for m in ms]
    c2 = xs.shape[1]
    carries = []
    for st, m, kp in zip(states, ms, kps):
        ln = 2 * m - 1
        carry = jnp.zeros((kp, c2), st.x.dtype)
        carries.append(carry.at[kp - ln:].set(st.x))
    new_carries, y = _hbf_int_mxu_impl(
        _taps_key(states, stage_taps), tuple(carries), xs, block=block,
        sub=sub, precision=precision, interpret=interpret,
        vma=as_vma(vma),
    )
    return (
        tuple(
            HbfIntState(x=cr[kp - (2 * m - 1):])
            for cr, m, kp in zip(new_carries, ms, kps)
        ),
        y,
    )


@functools.partial(jax.jit, static_argnums=(0,),
                   static_argnames=("block", "sub", "precision",
                                    "interpret", "vma"))
def _hbf_int_mxu_impl(taps_static, carries, xs, *, block, sub,
                      precision, interpret, vma=None):
    depth = len(taps_static)
    r = 1 << depth
    t, c2 = xs.shape
    assert c2 % 128 == 0, "channel count must be a multiple of 128"
    ms = [len(tv) for tv in taps_static]
    kps = [-(-(2 * m - 1) // 8) * 8 for m in ms]

    b = min(block, t)
    while t % b or b % 8:
        b -= 8
        if b <= 0:
            raise ValueError(f"no block size divides t={t}")
    ins_rows = [b << d for d in range(depth)]  # per-stage input rows
    sus = []
    for n_in in ins_rows:
        su = min(sub, n_in)
        while n_in % su:
            su -= 8
        sus.append(max(su, 8))
    ws = [
        jnp.asarray(_hbf_int_band_matrix(tv, su, kp))
        for tv, su, kp in zip(taps_static, sus, kps)
    ]
    grid = (t // b,)

    def kernel(*refs):
        cin = refs[0:depth]
        x_ref = refs[depth]
        w_refs = refs[depth + 1:2 * depth + 1]
        y_ref = refs[2 * depth + 1]
        cout = refs[2 * depth + 2:3 * depth + 2]
        scr = refs[3 * depth + 2:]
        car = scr[0:depth]
        ext = scr[depth:2 * depth]

        i = pl.program_id(0)
        n_i = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            for cr, ci in zip(car, cin):
                cr[...] = ci[...]

        ext[0][kps[0]:kps[0] + b] = x_ref[...]
        for d in range(depth):
            kp, n_in, su = kps[d], ins_rows[d], sus[d]
            ext[d][0:kp] = car[d][...]
            car[d][...] = ext[d][n_in:n_in + kp]
            wv = w_refs[d][...]
            if precision == "split3":
                wh = wv.astype(jnp.bfloat16)
                wl = (wv - wh.astype(jnp.float32)).astype(jnp.bfloat16)
            win = kp + su
            for q in range(n_in // su):
                ev = ext[d][su * q:su * q + win]
                if precision == "split3":
                    eh = ev.astype(jnp.bfloat16)
                    el = (ev - eh.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    v = (
                        jnp.dot(wh, eh,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(wh, el,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(wl, eh,
                                  preferred_element_type=jnp.float32)
                    )
                else:
                    v = jnp.dot(wv, ev, precision=precision,
                                preferred_element_type=jnp.float32)
                if d + 1 < depth:
                    ext[d + 1][kps[d + 1] + 2 * su * q:
                               kps[d + 1] + 2 * su * q + 2 * su] = v
                else:
                    y_ref[2 * su * q:2 * su * q + 2 * su] = v

        @pl.when(i == n_i - 1)
        def _():
            for cr, co in zip(car, cout):
                co[...] = cr[...]

    def fixed(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    walk_in = pl.BlockSpec((b, c2), lambda i: (i, i * 0),
                           memory_space=pltpu.VMEM)
    walk_out = pl.BlockSpec((b * r, c2), lambda i: (i, i * 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [fixed(kp, c2) for kp in kps]
            + [walk_in]
            + [fixed(w.shape[0], w.shape[1]) for w in ws]
        ),
        out_specs=[walk_out] + [fixed(kp, c2) for kp in kps],
        out_shape=(
            [jax.ShapeDtypeStruct((t * r, c2), jnp.float32, vma=vma)]
            + [jax.ShapeDtypeStruct((kp, c2), jnp.float32, vma=vma)
               for kp in kps]
        ),
        scratch_shapes=(
            [pltpu.VMEM((kp, c2), jnp.float32) for kp in kps]
            + [pltpu.VMEM((kp + n_in, c2), jnp.float32)
               for kp, n_in in zip(kps, ins_rows)]
        ),
        interpret=interpret,
    )(*carries, xs, *ws)
    return tuple(outs[1:]), outs[0]
