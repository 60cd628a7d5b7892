"""Roofline: measured machine peaks + static op counts -> %-of-peak.

The reference publishes cycles/sample and "<4 insn/item" for its hot
paths (hbf.rs:32, cic.rs:400-422); this is the TPU analog that turns
"N GS/s" into a verdict.  Two artifacts, regenerated on-device:

* ``ROOFLINE_PEAKS.json`` — micro-probed per-category peak rates
  (lane-ops/s counted exactly as `idsp_tpu.roofline.count_ops` counts,
  so model and measurement use the same currency), plus MXU FLOPs/s
  and HBM bytes/s.
* ``ROOFLINE.md`` / ``ROOFLINE.json`` — for each flagship config: the
  statically counted ops/sample by category, the speed-of-light rate
  implied by the peaks, the measured rate, and achieved % of the
  roofline with the limiting unit named.

Run: ``python benches/roofline.py [--peaks-only] [--skip-measure]``
(detached on the device; compiles are cached).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

HERE = os.path.dirname(os.path.abspath(__file__))
PEAKS_PATH = os.path.join(HERE, "ROOFLINE_PEAKS.json")
JSON_PATH = os.path.join(HERE, "ROOFLINE.json")
MD_PATH = os.path.join(HERE, "ROOFLINE.md")


def _measure(fn, *args, iters=8, trials=6, sync=None):
    """Seconds per dispatch via the shared round-4 statistic
    (`idsp_tpu.profiling.measure_rate`): median of iteration
    differences over an auto-scaled >= ~100 ms gap.  The probes here
    are stateless (same args each call), so the state thread is a
    dummy."""
    del iters, sync  # measure_rate auto-scales and owns the fence
    from idsp_tpu.profiling import measure_rate

    sec, _diffs = measure_rate(
        lambda _s: fn(*args), None, trials=trials, stateful=False,
    )
    return sec


#: Pallas probe geometry: each grid step keeps a (PROBE_ROWS, 128)
#: tile VMEM-resident (32 vregs — enough independent lanes per round to
#: hide the VPU pipeline latency) and runs PROBE_ROUNDS dependent
#: rounds of the category's op mix.  Mosaic compiles the fori body
#: as-is (no algebraic collapse, no loop-invariant hoisting —
#: CLAUDE.md), so ops-counted / time-measured is the true issue rate.
#: The round-3 XLA-graph ring probes understated integer peaks ~4x
#: (XLA split the deep elementwise fusion across HBM round trips),
#: which made kernels "exceed" the roofline.
PROBE_ROWS = 256
PROBE_GRID = 64
PROBE_ROUNDS = 512

#: i64 has no Mosaic lowering (kernels use i32 limbs); its peaks stay
#: XLA-graph ring probes and are labeled achievable-graph rates, not
#: silicon peaks.  Only XLA scan paths are charged at them.
NACC = 8
ROUNDS = 64


def _pallas_probe_fn(jax, jnp, dtype, prep, update, interpret=False):
    """One-category probe kernel: v = update(v, prep(w)) x ROUNDS on a
    VMEM-resident (PROBE_ROWS, 128) tile, grid over independent tiles.

    ``prep`` runs once per grid step OUTSIDE the loop (Mosaic does not
    hoist, so invariant operand transforms must live here); ``update``
    is the measured round body.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        w = prep(w_ref[...])

        def step(_, v):
            return update(v, w)

        o_ref[...] = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(PROBE_ROUNDS), step, x_ref[...]
        )

    spec = pl.BlockSpec(
        (PROBE_ROWS, 128), lambda i: (i, i * 0),
        memory_space=pltpu.VMEM,
    )

    def fn(x, w):
        return pl.pallas_call(
            kernel,
            grid=(PROBE_GRID,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(
                (PROBE_GRID * PROBE_ROWS, 128), dtype
            ),
            interpret=interpret,
        )(x, w)

    return fn


def measure_peaks(jnp, jax, sync):
    """Micro-probe the chip's per-category peak rates.

    VPU categories are probed INSIDE Pallas kernels (tile resident in
    VMEM, dependent rounds with 32-vreg ILP) so the measurement sees
    the raw issue rate, not XLA's fusion scheduling.  Rates are derived
    from the SAME op counter the model uses (`count_ops`), so probe and
    model share one currency; mixed probes subtract already-measured
    categories and solve.  i64 (no Mosaic lowering) keeps the XLA-graph
    ring probe.
    """
    from idsp_tpu.roofline import count_ops

    rng = np.random.default_rng(0)
    peaks = {}
    pshape = (PROBE_GRID * PROBE_ROWS, 128)

    def pfarr(lo=0.9, hi=1.1):
        return jnp.asarray(
            rng.uniform(lo, hi, size=pshape).astype(np.float32))

    def piarr():
        return jnp.asarray(rng.integers(
            -2**30, 2**30, size=pshape, dtype=np.int64).astype(np.int32))

    def pallas_probe(dtype, prep, update, arrays, iters=8, trials=6):
        # interpret on CPU so `--peaks-only` smoke runs off-device
        # (numbers are then meaningless; the artifact is TPU-only)
        fn = _pallas_probe_fn(
            jax, jnp, dtype, prep, update,
            interpret=bool(os.environ.get("IDSP_FORCE_CPU")))
        counts = count_ops(fn, *arrays)
        dt = _measure(jax.jit(fn), *arrays, iters=iters, trials=trials,
                      sync=sync)
        return counts, dt

    ident = lambda w: w  # noqa: E731

    # --- f32 FMA chain (mul+add fuse; FMA counted as 2 lane-ops) ---
    c, dt = pallas_probe(
        jnp.float32, ident,
        lambda v, w: v * w + jnp.float32(0.5), (pfarr(), pfarr()))
    peaks["f32"] = c.f32 / dt
    print(f"peak f32      {peaks['f32']/1e12:8.3f} Tops/s "
          f"(probe {dt*1e3:.2f} ms)", flush=True)

    # --- i32 non-mul ALU (add + xor) ---
    c, dt = pallas_probe(
        jnp.int32, lambda w: w >> 1,
        lambda v, w: (v + w) ^ (v >> 3), (piarr(), piarr()))
    peaks["i32"] = c.i32 / dt
    print(f"peak i32 alu  {peaks['i32']/1e12:8.3f} Tops/s", flush=True)

    # --- i32 multiply (pure mul chain on an odd invariant operand) ---
    c, dt = pallas_probe(
        jnp.int32, lambda w: w | jnp.int32(1),
        lambda v, w: v * w, (piarr(), piarr()))
    peaks["i32_mul"] = c.i32_mul / dt
    print(f"peak i32 mul  {peaks['i32_mul']/1e12:8.3f} Tops/s",
          flush=True)

    # --- cmp + select (plus 2 i32 alu, subtracted at measured rate) ---
    c, dt = pallas_probe(
        jnp.int32, ident,
        lambda v, w: jnp.where(v > w, v - w, v + w),
        (piarr(), piarr()))
    t_alu = c.i32 / peaks["i32"]
    r_cs = (c.cmp + c.select) / max(dt - t_alu, dt * 0.05)
    peaks["cmp"] = peaks["select"] = r_cs
    print(f"peak cmp/sel  {r_cs/1e12:8.3f} Tops/s", flush=True)

    # --- convert (i32<->f32 round trip; not elidable: lossy) ---
    c, dt = pallas_probe(
        jnp.int32, ident,
        lambda v, w: (v.astype(jnp.float32).astype(jnp.int32) + w),
        (piarr(), piarr()))
    t_alu = c.i32 / peaks["i32"]
    peaks["convert"] = c.convert / max(dt - t_alu, dt * 0.05)
    print(f"peak convert  {peaks['convert']/1e12:8.3f} Tops/s",
          flush=True)

    # --- f32 divide (w/v oscillates period-2, stays finite) ---
    c, dt = pallas_probe(
        jnp.float32, ident,
        lambda v, w: w / v, (pfarr(1.2, 1.3), pfarr(1.5, 1.6)))
    peaks["div"] = c.div / dt
    print(f"peak div      {peaks['div']/1e12:8.3f} Tops/s", flush=True)

    # --- transcendental (exp; 1 f32 mul subtracted) ---
    c, dt = pallas_probe(
        jnp.float32, ident,
        lambda v, w: jnp.exp(v * jnp.float32(-0.01)),
        (pfarr(), pfarr()))
    t_f = c.f32 / peaks["f32"]
    peaks["trans"] = c.trans / max(dt - t_f, dt * 0.05)
    print(f"peak trans    {peaks['trans']/1e12:8.3f} Tops/s", flush=True)

    # --- aggregate VLIW issue (mixed-category dependent chains) ---
    # Homogeneous chains underfill the bundle (the VPU co-issues
    # different op classes per cycle); these mixed probes measure the
    # aggregate lane-op issue rate in `count_ops.issue_ops` currency.
    # The final peak also takes the silicon estimate MXU/32 (same
    # clock: 1024 lanes x 4 ALUs vs 4 MXUs x 128x128 MACs x 2 FLOPs),
    # computed after the MXU probe below.
    def i32_mix(v, w):
        v = (v + w) ^ (v >> 3)
        return jnp.where(v > w, v - w, v + w)

    c, dt = pallas_probe(jnp.int32, ident, i32_mix, (piarr(), piarr()))
    mix_rates = [c.issue_ops / dt]
    print(f"mixed i32     {mix_rates[-1]/1e12:8.3f} Tops/s (issue)",
          flush=True)

    def f32_mix(v, w):
        v = v * w + jnp.float32(0.125)
        return jnp.where(v > jnp.float32(1.0), v * jnp.float32(0.5),
                         v + jnp.float32(0.125))

    c, dt = pallas_probe(jnp.float32, ident, f32_mix, (pfarr(), pfarr()))
    mix_rates.append(c.issue_ops / dt)
    print(f"mixed f32     {mix_rates[-1]/1e12:8.3f} Tops/s (issue)",
          flush=True)

    # --- i64 (XLA graph only; x64 enabled package-wide) ---
    shp = (2048, 512)

    def ring_probe(update, arrays, iters=8, trials=6):
        def fn(*accs):
            a = list(accs)
            for _ in range(ROUNDS):
                a = [update(a, i) for i in range(NACC)]
            return tuple(a)

        counts = count_ops(fn, *arrays)
        dt = _measure(jax.jit(fn), *arrays, iters=iters, trials=trials,
                      sync=sync)
        return counts, dt

    def iarrs(dtype=np.int64):
        return tuple(
            jnp.asarray(rng.integers(
                -2**30, 2**30, size=shp, dtype=np.int64).astype(dtype))
            for _ in range(NACC)
        )

    c, dt = ring_probe(
        lambda a, i: (a[i] + a[(i + 1) % NACC]) ^ a[(i + 2) % NACC],
        iarrs())
    peaks["i64"] = c.i64 / dt
    print(f"peak i64 alu  {peaks['i64']/1e12:8.3f} Tops/s "
          f"(XLA-graph rate)", flush=True)

    c, dt = ring_probe(
        lambda a, i: a[i] * (a[(i + 1) % NACC] | jnp.int64(1)),
        iarrs())
    t_alu = c.i64 / peaks["i64"]
    peaks["i64_mul"] = c.i64_mul / max(dt - t_alu, dt * 0.25)
    print(f"peak i64 mul  {peaks['i64_mul']/1e12:8.3f} Tops/s "
          f"(XLA-graph rate)", flush=True)

    # --- MXU: bf16 and f32 matmuls ---
    m = 4096
    ab = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    bb = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))

    def mm_bf16(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def mm_f32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    flops = 2.0 * m * m * m
    dt = _measure(jax.jit(mm_bf16), ab.astype(jnp.bfloat16),
                  bb.astype(jnp.bfloat16), iters=4, sync=sync)
    peaks["mxu"] = flops / dt
    print(f"peak MXU bf16 {peaks['mxu']/1e12:8.2f} TFLOP/s", flush=True)
    dt = _measure(jax.jit(mm_f32), ab, bb, iters=4, sync=sync)
    peaks["mxu_f32"] = flops / dt
    print(f"peak MXU f32  {peaks['mxu_f32']/1e12:8.2f} TFLOP/s",
          flush=True)

    # --- HBM stream (read + write) ---
    big = jnp.asarray(rng.normal(size=(32 * 2**20,)).astype(np.float32))

    def stream(x):
        return x + jnp.float32(1.0)

    nbytes = big.size * 4 * 2  # read + write
    dt = _measure(jax.jit(stream), big, iters=8, sync=sync)
    peaks["hbm"] = nbytes / dt
    print(f"peak HBM      {peaks['hbm']/1e9:8.1f} GB/s", flush=True)

    # aggregate issue peak: best mixed-probe rate, floored by the
    # same-clock silicon estimate (see comment at the mixed probes)
    peaks["vpu_issue"] = max(*mix_rates, peaks["mxu"] / 32.0)
    print(f"peak issue    {peaks['vpu_issue']/1e12:8.3f} Tops/s "
          f"(mixed probes vs MXU/32 = {peaks['mxu']/32e12:.3f})",
          flush=True)
    return peaks


#: One-line cause for every config that measures under 50% of its
#: modeled bound (VERDICT r4 #1: "every config under 50% of its bound
#: has a one-line cause in the table").  Keyed by config name so
#: regeneration preserves them; update when the measurement moves.
CAUSES = {
    "ddc chain fastlo_fused (1 kernel) [c=512, t=32768]":
        "recurrence latency at cs=8 sub-banks (bsplit negative result,"
        " ROADMAP r4); wider banks reach ~80%",
    "df1_bank_q i32 [lanes=1024, t=32768]":
        "5-MAC limb recurrence latency; issue-bound only at cs>=16",
    "hbf dec cascade x8 (1 kernel) [lanes=1024, t=32768]":
        "~100us dispatch floor + per-stage VMEM repack; see t=131072"
        " sustained row",
    "fm receiver (composed) [c=512, t=32768]":
        "decimated DF1 stages run at 1/4 and 1/16 rate on thin blocks",
    "fm receiver (one kernel) [c=512, t=32768]":
        "c=512 I/Q-packed puts the in-kernel DF1 on half-vreg rows;"
        " sub-chunked discriminator prologue dominates (NOT"
        " compute-bound — 1024-ch whole stack hits ~80%)",
    "fm receiver (1 kernel, fast atan) [c=512, t=32768]":
        "same half-vreg layout; the cheap angle exposes the layout"
        " cost even more",
    "cic dec N=3 R=16 (1 kernel) [c=512, t=32768]":
        "~100us dispatch floor on a ~0.6ms dispatch; see t=131072"
        " sustained row",
    "hbf dec cascade x8 (1 kernel) [lanes=1024, t=131072]":
        "per-stage VMEM repack between cascade stages",
    "cic dec N=3 R=16 (1 kernel) [c=512, t=131072]":
        "integrator recurrence latency across 512-sample chunks",
    "channelizer m=1024 (matmul) [frames=1024]":
        "interleaved (m,2) complex layout pads TPU tiles 64x",
    "channelizer m=1024 (fft) [frames=1024]":
        "XLA TPU FFT lowers to gather-heavy stages",
    "channelizer m=1024 (planes) [frames=1024]":
        "FIR/concat elementwise traffic between HBM round trips"
        " before the DFT matmul; superseded by the fused 1-kernel"
        " config",
    "channelizer m=1024 (planes bf16) [frames=1024]":
        "same FIR/concat traffic; bf16 only shrinks the matmul;"
        " superseded by the fused 1-kernel config",
}


# --- flagship configs ----------------------------------------------------------


def flagship_configs(jnp):
    """Yield (name, fn, args, samples, hbm_bytes_fn).

    ``samples`` = full-rate input samples x channels (the suite's
    currency).  ``fn(*args)`` is the jittable call; static counting
    traces exactly this call.
    """
    import jax

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, cic, hbf
    from idsp_tpu.filters.biquad_pallas import df1_bank_q
    from idsp_tpu.filters.cic_pallas import cic_dec_bank
    from idsp_tpu.filters.ddc_pallas import (
        fastlo_ddc_cascade_bank, hbf1_tail_init,
    )
    from idsp_tpu.filters.hbf_pallas import hbf_dec_cascade_bank
    from idsp_tpu.pipelines import channelizer, ddc_bank, fm_disc

    rng = np.random.default_rng(0)
    c, t = 512, 32768

    def ri32(shape, lim=2**27):
        return jnp.asarray(rng.integers(
            -lim, lim, size=shape, dtype=np.int64).astype(np.int32))

    ba_q = jnp.asarray(biquad.quantize_ba(
        biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
        29))
    x1 = ri32((t,))
    steps = jnp.asarray(rng.integers(
        1 << 24, 1 << 30, size=(c,), dtype=np.int64).astype(np.int32))
    tails3 = tuple(hbf1_tail_init(2 * c, m) for m in (5, 10, 23))
    st0 = biquad.df1_init((2 * c,), jnp.int32)
    ph0 = jnp.zeros((c,), jnp.int32)

    def headline(st, tls, ph, x):
        # round-5 tuned fully-unrolled chunk (see bench.py fastlo_fused)
        return fastlo_ddc_cascade_bank(
            ba_q, st, tls, ph, steps, x, 29, time_chunk=16, unroll=16)

    yield ("ddc chain fastlo_fused (1 kernel) [c=512, t=32768]", headline,
           (st0, tails3, ph0, x1), t * c)

    xs2 = ri32((t, 2 * c))

    def df1(st, xs):
        # round-5 tuned chunking (scripts/tpu_df1_sweep.py)
        return df1_bank_q(ba_q, st, xs, 29, time_chunk=64, unroll=16)

    yield ("df1_bank_q i32 [lanes=1024, t=32768]", df1, (st0, xs2), t * 2 * c)

    xf = jnp.asarray(rng.normal(size=(t, 2 * c)).astype(np.float32))
    hbf_states = hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0)

    def hbf3(sts, xs):
        return hbf_dec_cascade_bank(sts, xs, time_chunk=512)

    yield ("hbf dec cascade x8 (1 kernel) [lanes=1024, t=32768]", hbf3, (hbf_states, xf),
           t * 2 * c)

    # FM receiver: composed vs one-kernel (VERDICT r3 weak #2 diagnosis)
    carrier = int(np.int32(123456789))
    fm_st = fm_disc.init_state((c,))
    xre, xim = ri32((t, c)), ri32((t, c))
    ba30 = jnp.asarray(biquad.quantize_ba(
        biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass()),
        30))

    def fm_composed(st, re, im):
        return fm_disc.fm_receiver(st, re, im, carrier, ba30, 30)

    yield ("fm receiver (composed) [c=512, t=32768]", fm_composed, (fm_st, xre, xim),
           t * c)

    from idsp_tpu.filters.fm_pallas import fm_disc_bank

    def fm_one(st, re, im):
        return fm_disc_bank(ba30, st, re, im, carrier, 30)

    yield ("fm receiver (one kernel) [c=512, t=32768]", fm_one, (fm_st, xre, xim), t * c)

    def fm_fast(st, re, im):
        return fm_disc_bank(ba30, st, re, im, carrier, 30, angle="fast")

    yield ("fm receiver (1 kernel, fast atan) [c=512, t=32768]", fm_fast,
           (fm_st, xre, xim), t * c)

    # CIC decimator N=3 R=16
    cic_st = cic.init(3, 1, (c,), dtype=jnp.int32)
    xcic = ri32((t, c), lim=2**16)

    def cicd(st, xs):
        return cic_dec_bank(st, xs, 15, time_chunk=512)

    yield ("cic dec N=3 R=16 (1 kernel) [c=512, t=32768]", cicd, (cic_st, xcic), t * c)

    # Production-block-size variants (ROADMAP r5 candidate 8): the
    # t=32768 HBF/CIC dispatches are ~0.6-2.8 ms, so the ~100 us
    # dispatch floor is a visible fraction of their achieved-%; a 4x
    # block shows the sustained rate the streaming runtime sees.
    tb4 = 4 * t
    xf4 = jnp.asarray(rng.normal(size=(tb4, 2 * c)).astype(np.float32))

    def hbf3_big(sts, xs):
        return hbf_dec_cascade_bank(sts, xs, time_chunk=512)

    yield ("hbf dec cascade x8 (1 kernel) [lanes=1024, t=131072]", hbf3_big,
           (hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0), xf4),
           tb4 * 2 * c)

    xcic4 = ri32((tb4, c), lim=2**16)

    def cicd_big(st, xs):
        return cic_dec_bank(st, xs, 15, time_chunk=512)

    yield ("cic dec N=3 R=16 (1 kernel) [c=512, t=131072]", cicd_big,
           (cic.init(3, 1, (c,), dtype=jnp.int32), xcic4), tb4 * c)

    # banded-MXU hbf cascade (round 5): FIR as one dot per stage
    from idsp_tpu.filters.hbf_pallas import hbf_dec_cascade_mxu

    def hbf3_mxu(sts, xs):
        return hbf_dec_cascade_mxu(sts, xs)

    yield ("hbf dec cascade x8 (mxu split3) [lanes=1024, t=131072]",
           hbf3_mxu,
           (hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0), xf4),
           tb4 * 2 * c)

    from idsp_tpu.filters.hbf_pallas import hbf_int_cascade_mxu

    xint4 = jnp.asarray(
        rng.normal(size=(tb4 // 8, 2 * c)).astype(np.float32))

    def hbf3_int_mxu(sts, xs):
        return hbf_int_cascade_mxu(sts, xs)

    yield ("hbf int cascade x8 (mxu split3) [lanes=1024, t=16384]",
           hbf3_int_mxu,
           (hbf.hbf_int_cascade_init(3, (2 * c,), axis=0), xint4),
           (tb4 // 8) * 2 * c)

    # channelizer M=1024 (both DFT modes); 1024 frames/dispatch — the
    # ~100 us dispatch floor dominates smaller batches (see
    # scripts/tpu_channelizer_probe.py)
    m = 1024
    nfr = 1024
    xch = jnp.asarray(rng.normal(size=(nfr, m, 2)).astype(np.float32))
    ch_st = channelizer.init(m, 4)

    def chan_mm(st, xs):
        return channelizer.channelize(st, xs, m=m, taps=4, dft="matmul")

    def chan_fft(st, xs):
        return channelizer.channelize(st, xs, m=m, taps=4, dft="fft")

    yield ("channelizer m=1024 (matmul) [frames=1024]", chan_mm, (ch_st, xch), nfr * m)
    yield ("channelizer m=1024 (fft) [frames=1024]", chan_fft, (ch_st, xch), nfr * m)

    zr_pl = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
    zi_pl = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
    pst = channelizer.init_planes(m, 4)

    def chan_planes(st, a, b):
        return channelizer.channelize_planes(st, a, b, m=m, taps=4)

    def chan_planes_bf16(st, a, b):
        return channelizer.channelize_planes(
            st, a, b, m=m, taps=4, twiddle_dtype=jnp.bfloat16)

    yield ("channelizer m=1024 (planes) [frames=1024]", chan_planes,
           (pst, zr_pl, zi_pl), nfr * m)
    yield ("channelizer m=1024 (planes bf16) [frames=1024]", chan_planes_bf16,
           (pst, zr_pl, zi_pl), nfr * m)

    # one-kernel FIR+cast+MXU-DFT fusion at the production frame count
    # (round 5; taps=8 matching the suite row, unlike the taps=4
    # planes configs above)
    from idsp_tpu.pipelines.channelizer_pallas import channelize_fused

    nbig = 16384
    zr_b = jnp.asarray(rng.normal(size=(nbig, m)).astype(np.float32))
    zi_b = jnp.asarray(rng.normal(size=(nbig, m)).astype(np.float32))
    pst8 = channelizer.init_planes(m, 8)

    def chan_fused(st, a, b):
        return channelize_fused(st, a, b, m=m, taps=8,
                                twiddle_dtype=jnp.bfloat16,
                                block_frames=256)

    yield ("channelizer m=1024 (fused 1 kernel) [frames=16384]",
           chan_fused, (pst8, zr_b, zi_b), nbig * m)

    # 1024-channel whole-stack DDC bank (BASELINE #5 class)
    from idsp_tpu.filters import pll as _pll

    cb, tb, d = 1024, 16384, 16
    xb = ri32((tb,))
    steps_b = jnp.asarray(rng.integers(
        1 << 24, 1 << 30, size=(cb,), dtype=np.int64).astype(np.int32))
    pll_ba = tuple(
        int(v) for v in _pll.coefficients_from_bandwidth(2e-2, 4.0))
    ba_qt = tuple(int(v) for v in np.asarray(ba_q))
    stb = ddc_bank.init_biquad(cb)

    def whole_stack(st, x):
        # tc == unroll: round-5 tuned chunking (tpu_stack_tune.py)
        return ddc_bank.ddc_bank_block_biquad(
            st, x, steps_b, ba_qt, pll_ba, decimate=d,
            lo_mode="one_kernel", time_chunk=32, unroll=32)

    yield ("1024-ch ddc bank whole stack [t=16384]", whole_stack, (stb, xb),
           tb * cb)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--peaks-only", action="store_true")
    ap.add_argument("--skip-measure", action="store_true",
                    help="static counts only (no device timing)")
    ap.add_argument("--remodel", action="store_true",
                    help="offline: re-trace counts on CPU, reuse the "
                         "stored peaks AND achieved rates from "
                         "ROOFLINE.json, rewrite the artifacts")
    ap.add_argument("--reuse-peaks", action="store_true",
                    help="reuse ROOFLINE_PEAKS.json but MEASURE the "
                         "flagship configs on-device (skips the ~15 "
                         "peak probes; peaks and configs must come "
                         "from the same device)")
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("IDSP_FORCE_CPU") or args.remodel:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from idsp_tpu.profiling import sync
    from idsp_tpu.roofline import count_ops, io_bytes, model_time

    device = str(jax.devices()[0])
    print("device:", device, flush=True)

    prior_ach = {}
    if args.remodel:
        old = json.load(open(JSON_PATH))
        device = old["device"]
        peaks = old["peaks"]
        prior_ach = {r["name"]: r.get("achieved_gs")
                     for r in old["configs"]}
    elif (args.skip_measure or args.reuse_peaks) and os.path.exists(
            PEAKS_PATH):
        stored = json.load(open(PEAKS_PATH))
        peaks = stored["peaks"]
        if args.reuse_peaks and stored.get("device") != device:
            raise SystemExit(
                f"--reuse-peaks: stored peaks are for "
                f"{stored.get('device')!r} but this device is "
                f"{device!r} — re-probe")
    else:
        peaks = measure_peaks(jnp, jax, sync)
        with open(PEAKS_PATH, "w") as fh:
            json.dump({"device": device, "peaks": peaks}, fh, indent=1)
        print(f"wrote {PEAKS_PATH}", flush=True)
    if args.peaks_only:
        return 0

    from idsp_tpu.profiling import SlowWindowGuard

    _guard = SlowWindowGuard()
    results = []
    for name, fn, fargs, samples in flagship_configs(jnp):
        if args.only and args.only not in name:
            continue
        counts = count_ops(fn, *fargs)
        ib, ob = io_bytes(fn, *fargs)
        mt = model_time(counts, peaks, hbm_bytes=float(ib + ob))
        limit_rate = samples / mt["total"] if mt["total"] else float(
            "inf")
        bound = max(("vpu", mt["vpu"]), ("mxu", mt["mxu"]),
                    ("hbm", mt["hbm"]), key=lambda kv: kv[1])[0]
        achieved = None
        pct = None
        if args.remodel:
            prev = prior_ach.get(name)
            if prev is not None:
                achieved = prev * 1e9
                pct = 100.0 * achieved / limit_rate
        elif not args.skip_measure:
            try:
                jfn = jax.jit(fn)
                # bracket the measurement with the canary: re-measure
                # (up to 2 retries) if a slow window opened mid-run
                for _retry in range(3):
                    _guard.await_good_window(name)
                    dt = _measure(jfn, *fargs, iters=6, sync=sync)
                    if _guard.check():
                        break
                    print(f"# {name}: slow window opened during the "
                          "measurement — re-measuring", flush=True)
                achieved = samples / dt
                pct = 100.0 * achieved / limit_rate
            except Exception as e:  # noqa: BLE001
                print(f"# {name}: measure failed: {str(e)[:160]}",
                      flush=True)
        rec = {
            "name": name,
            "samples": samples,
            "ops_per_sample": {
                cat: getattr(counts, cat) / samples
                for cat in ("f32", "i32", "i32_mul", "i64", "i64_mul",
                            "cmp", "select", "convert", "div", "trans",
                            "fft_flops")
                if getattr(counts, cat)
            },
            "vpu_ops_per_sample": counts.vpu_total / samples,
            "issue_ops_per_sample": counts.issue_ops / samples,
            "mxu_flops_per_sample": counts.mxu_flops / samples,
            "gather_per_sample": counts.gather_elems / samples,
            "io_bytes_per_sample": (ib + ob) / samples,
            "model_s": mt,
            "limit_gs": limit_rate / 1e9,
            "bound": bound,
            "achieved_gs": None if achieved is None else achieved / 1e9,
            "pct_of_peak": pct,
            "unknown_trips": len(counts.unknown_trip_counts),
        }
        results.append(rec)
        ach = "--" if achieved is None else f"{achieved/1e9:7.2f}"
        pc = "--" if pct is None else f"{pct:5.1f}%"
        print(f"{name:38s} vpu={counts.vpu_total/samples:7.2f} ops/S "
              f"mxu={counts.mxu_flops/samples:8.1f} F/S "
              f"limit={limit_rate/1e9:8.2f} GS/s [{bound}] "
              f"achieved={ach} GS/s ({pc})", flush=True)

    with open(JSON_PATH, "w") as fh:
        json.dump({"device": device, "peaks": peaks,
                   "configs": results}, fh, indent=1)
    write_md(device, peaks, results)
    print(f"wrote {JSON_PATH} and {MD_PATH}", flush=True)
    return 0


def write_md(device, peaks, results):
    lines = [
        "# Roofline — static op counts vs measured machine peaks",
        "",
        f"Device: `{device}`.  Regenerate: `python benches/roofline.py`.",
        "",
        "Peaks are micro-probed in the same currency as the static",
        "counter (`idsp_tpu/roofline.py`): lane-ops/s per category",
        "(an FMA counts as 2 lane-ops), MXU FLOPs/s, HBM bytes/s.",
        "The speed-of-light rate is the max of the aggregate VLIW",
        "issue bound (total lane-ops / `vpu_issue`, i64 charged as",
        "equivalent-i32 limb ops) and the per-unit caps for dedicated",
        "narrow hardware (i32 mul, convert, div, transcendental);",
        "MXU/HBM overlap.  achieved-% is then a true utilization",
        "bound, not a vibe (the round-3 model serialized categories",
        "and real kernels beat it — see idsp_tpu/roofline.py).",
        "",
        "## Machine peaks",
        "",
        "| unit | peak |",
        "|---|---|",
    ]
    if "vpu_issue" in peaks:
        lines.append(f"| VPU aggregate issue | "
                     f"{peaks['vpu_issue']/1e12:.3f} Top/s |")
    for k in ("f32", "i32", "i32_mul", "i64", "i64_mul", "cmp",
              "select", "convert", "div", "trans"):
        if k in peaks:
            lines.append(f"| {k} lane-ops | {peaks[k]/1e12:.3f} Top/s |")
    if "mxu" in peaks:
        lines.append(f"| MXU bf16 | {peaks['mxu']/1e12:.1f} TFLOP/s |")
    if "mxu_f32" in peaks:
        lines.append(
            f"| MXU f32 | {peaks['mxu_f32']/1e12:.1f} TFLOP/s |")
    if "hbm" in peaks:
        lines.append(f"| HBM | {peaks['hbm']/1e9:.0f} GB/s |")
    lines += [
        "",
        "## Flagship kernels",
        "",
        "ops/S = per full-rate input sample x channel.",
        "",
        "| config | VPU ops/S | MXU F/S | IO B/S | bound |"
        " limit GS/s | achieved GS/s | % of peak | cause if <50% |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    missing_cause = []
    for r in results:
        ach = ("—" if r["achieved_gs"] is None
               else f"{r['achieved_gs']:.2f}")
        pct = ("—" if r["pct_of_peak"] is None
               else f"{r['pct_of_peak']:.0f}%")
        cause = ""
        if r["pct_of_peak"] is not None and r["pct_of_peak"] < 50.0:
            cause = CAUSES.get(r["name"], "")
            if not cause:
                missing_cause.append(r["name"])
                cause = "(unannotated — add to benches/roofline.CAUSES)"
        lines.append(
            f"| {r['name']} | {r['vpu_ops_per_sample']:.1f} "
            f"| {r['mxu_flops_per_sample']:.0f} "
            f"| {r['io_bytes_per_sample']:.1f} | {r['bound']} "
            f"| {r['limit_gs']:.2f} | {ach} | {pct} | {cause} |")
    lines += [
        "",
        "Per-category ops/S detail lives in `ROOFLINE.json`.",
        "",
    ]
    if missing_cause:
        print(f"# WARNING: configs under 50% without a cause "
              f"annotation: {missing_cause}", flush=True)
    with open(MD_PATH, "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
