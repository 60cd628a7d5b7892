"""Named benchmark suite mirroring the reference's embedded bench configs
(tests/embedded/src/bin/{trig,biquad,hbf}.rs).

Canonical config (what RESULTS.md records): ``--channels 512 --time
32768 --iters 10 --trials 3``.  Each row reports aggregate throughput
(MS/s) over a C-channel bank — the TPU analog of the reference's
cycles/sample tables: the reference measures one core at one
sample/call; the TPU earns its keep running C channels wide, so the
honest comparison is total samples/s/chip.  Per row the suite runs
``trials`` independent timed trials (each of ``iters`` chained
dispatches) and records the median with min/max spread, so RESULTS.md is
reproducible from exactly one invocation:

    python benches/suite.py --write-md

Rows with both a scan and a Pallas path bench both — the kernel is the
production path, the scan is the semantic reference it is bit-equal to.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from dataclasses import dataclass, field

import numpy as np

sys.path.insert(0, ".")


@dataclass
class Row:
    name: str
    rates: list = field(default_factory=list)  # samples/s per trial

    @property
    def median(self):
        return statistics.median(self.rates)

    @property
    def lo(self):
        return min(self.rates)

    @property
    def hi(self):
        return max(self.rates)

    def line(self) -> str:
        spread = (
            (self.hi - self.lo) / self.median * 100 if self.median else 0.0
        )
        return (
            f"{self.name:36s} {self.median / 1e6:12.1f} MS/s"
            f"  [{self.lo / 1e6:.0f}, {self.hi / 1e6:.0f}]"
            f" ({spread:4.1f}% spread)"
        )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=512)
    ap.add_argument("--time", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--write-md", action="store_true",
                    help="regenerate benches/RESULTS.md from this run")
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on row names")
    args = ap.parse_args(argv)

    import os

    import jax

    if os.environ.get("IDSP_FORCE_CPU"):
        # the axon TPU plugin ignores JAX_PLATFORMS; this doesn't
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, cic, hbf, lowpass, pll, wdf
    from idsp_tpu.ops.trig import atan2, cossin
    from idsp_tpu.profiling import measure_roundtrip, sync

    rt = measure_roundtrip()
    c, t, iters, trials = args.channels, args.time, args.iters, args.trials
    n = c * t
    rng = np.random.default_rng(0)
    rows: list[Row] = []

    def run_trials(name, fn, state, *xargs, samples=n, stateful=True):
        """Bench one config by iteration differencing: time `iters` and
        `3*iters` chained dispatches — the fixed dispatch+readback
        overhead of the tunnel cancels in the difference (a separately
        measured round trip under/over-subtracts by tens of ms)."""
        if args.only and args.only not in name:
            return
        # jit-wrap every row uniformly: kernel WRAPPERS run eager jnp
        # ops (tail concats, phase updates, state packing) outside
        # their inner jit, and through the tunnel each eager op is a
        # separate remote dispatch — bare-wrapper rows measured the
        # tunnel's eager-dispatch overhead (fm one-kernel 0.41 GS/s
        # bare vs 3.46 under jit, SAME kernel+args, r5 isolation runs;
        # CPU repro: jax_log_compiles shows per-call eager squeeze/
        # concatenate dispatches).  Production callers run under jit.
        try:
            jfn = jax.jit(fn)
            out = jfn(state, *xargs)
            sync(out)
            fn = jfn
        except Exception:  # noqa: BLE001 — statics in args etc.
            try:
                out = fn(state, *xargs)
                sync(out)
                print(f"# {name}: measuring UNJITTED (jit wrap failed)")
            except Exception as e:  # noqa: BLE001
                print(f"# {name} skipped: {str(e)[:100]}")
                return
        _await_good_window(name)

        def timed(k):
            t0 = time.perf_counter()
            st = state
            for _ in range(k):
                res = fn(st, *xargs)
                if stateful:
                    st = res[0]
            sync(res)
            return time.perf_counter() - t0

        row = Row(name)

        # Auto-scale the iteration gap so the differenced signal is
        # >= ~100 ms of kernel time: the tunnel's READBACK itself
        # varies by tens of ms run-to-run, so a fixed small gap leaves
        # sub-ms kernels with signal ~ jitter (the round-4 bimodality
        # probe showed the channelizer's wild spreads were exactly
        # this, not the chip).
        est = max((timed(12) - timed(2)) / 10.0, 1e-6)
        gap = max(4 * iters, int(0.1 / est) + 1)
        gap = min(gap, 2000)

        def one_trial():
            # Single difference over the auto-scaled gap; the published
            # statistic is the MEDIAN across trials (Row.line), which
            # is robust to the tunnel's multi-10-ms readback jitter.
            # Do NOT min-select legs or trials: min-of-differences
            # keeps exactly the pairings where a jitter spike landed
            # in the short leg and overstates the rate (observed 156
            # GS/s for a 15 GS/s-roofline kernel — round-4 fix, see
            # profiling.measure_rate).  A non-positive difference is a
            # failed measurement — retry, never record a bogus rate.
            for _attempt in range(3):
                d1 = timed(iters)
                d2 = timed(iters + gap)
                dt = (d2 - d1) / gap
                if dt > 0:
                    row.rates.append(samples / dt)
                    return

        for _ in range(trials):
            one_trial()
        # Bracket check: a slow window can open mid-measurement after
        # the entry gate passed; discard and re-measure once if the
        # canary is now slow (round-5: the gate alone still let ~30%
        # degraded rows through on windowy runs).
        if not _guard.check():
            print(f"# {name}: slow window opened during measurement "
                  "— re-measuring", flush=True)
            _await_good_window(name)
            row.rates = []
            for _ in range(trials):
                one_trial()
        # Variance control: the chip clock wanders run-to-run; a row
        # whose min-max spread exceeds 40% of the median answers no
        # question.  Keep measuring (up to 4x the base trials) until the
        # CENTRAL spread tightens — drop the single worst outlier on
        # each side before judging, since the median is robust to them.
        def central_spread():
            rs = sorted(row.rates)
            if len(rs) >= 5:
                rs = rs[1:-1]
            med = statistics.median(rs)
            return (rs[-1] - rs[0]) / med if med else 0.0, rs

        extra_budget = 3 * trials
        while row.rates and extra_budget > 0:
            sp, _ = central_spread()
            if sp <= 0.40:
                break
            one_trial()
            extra_budget -= 1
        if row.rates and len(row.rates) >= 5:
            sp, rs = central_spread()
            if sp <= 0.40:
                # report the trimmed set so RESULTS.md reflects the
                # converged measurement, not the discarded outliers
                row.rates = rs
        if not row.rates:
            print(f"# {name}: no valid trials (clock wander)")
            return
        rows.append(row)
        print(row.line(), flush=True)

    # ---- fixtures ----
    phases = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64).astype(
            np.int32
        )
    )
    xy = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(2, t, c), dtype=np.int64).astype(
            np.int32
        )
    )
    ba5 = biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass())
    ba_q29 = jnp.asarray(biquad.quantize_ba(ba5, 29))
    xs_i = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, c), dtype=np.int64).astype(
            np.int32
        )
    )
    xs_f32 = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    xs_f64 = jnp.asarray(rng.normal(size=(t, c)))
    tc = min(512, t)

    # Slow-window canary (round 5): shared implementation, see
    # idsp_tpu.profiling.SlowWindowGuard.
    from idsp_tpu.profiling import SlowWindowGuard

    _guard = SlowWindowGuard()

    def _await_good_window(row_name):
        _guard.await_good_window(row_name)

    def scan_of(step_fn, *cfg, unroll=8):
        @jax.jit
        def run(st, xs):
            return jax.lax.scan(
                lambda s, x: step_fn(*cfg, s, x), st, xs, unroll=unroll
            )

        return run

    # ---- trig (trig.rs:28-29) ----
    run_trials("cossin slice", jax.jit(lambda p: cossin(p)), phases,
               stateful=False)
    run_trials("atan2 slice", jax.jit(lambda a: atan2(a[1], a[0])), xy,
               stateful=False)

    # ---- biquad variants (biquad.rs bench configs) ----
    run_trials("q32<29> df1 (scan)", scan_of(biquad.df1_step_q, ba_q29, 29),
               biquad.df1_init((c,), jnp.int32), xs_i)

    from idsp_tpu.filters import biquad_pallas as bp

    if c % 128 == 0:
        run_trials(
            "q32<29> df1 (pallas)",
            # round-5 tuned chunking (scripts/tpu_df1_sweep.py: 19.2 ->
            # 22.0 GS/s at lanes=1024; bit-exact at any chunking)
            lambda st, xs: bp.df1_bank_q(ba_q29, st, xs, 29, time_chunk=64,
                                         unroll=16),
            biquad.df1_init((c,), jnp.int32), xs_i,
        )
        run_trials(
            "q32<29> df1 (pallas dyncoef)",
            lambda st, xs: bp.df1_bank_q_coef(
                ba_q29, st, xs, 29, time_chunk=tc, unroll=4
            ),
            biquad.df1_init((c,), jnp.int32), xs_i,
        )

    ba_q13_16 = jnp.asarray(biquad.quantize_ba(ba5, 13, dtype=jnp.int16))
    xs_i16 = jnp.asarray(
        rng.integers(-(2**14), 2**14, size=(t, c), dtype=np.int64).astype(
            np.int16
        )
    )
    run_trials(
        "q16<13> df1 (scan)",
        scan_of(
            lambda ba, f, s, x: biquad.df1_step_q(ba, f, s, x,
                                                  dtype=jnp.int16),
            ba_q13_16, 13,
        ),
        biquad.df1_init((c,), jnp.int16), xs_i16,
    )
    if c % 128 == 0:
        run_trials(
            "q16<13> df1 (pallas)",
            lambda st, xs: bp.df1_bank_q16(ba_q13_16, st, xs, 13,
                                           time_chunk=tc, unroll=4),
            biquad.df1_init((c,), jnp.int16), xs_i16,
        )

    ba_q61 = jnp.asarray(biquad.quantize_ba(ba5, 61, dtype=jnp.int64))
    xs_i64 = jnp.asarray(
        rng.integers(-(2**55), 2**55, size=(t, c), dtype=np.int64)
    )
    run_trials("q64<61> df1 (scan, emulated i128)",
               scan_of(biquad.df1_step_q64, ba_q61, 61),
               biquad.df1_init((c,), jnp.int64), xs_i64)
    if c % 128 == 0:
        run_trials(
            "q64<61> df1 (pallas, limb i128)",
            lambda st, xs: bp.df1_bank_q64(ba_q61, st, xs, 61,
                                           time_chunk=tc),
            biquad.df1_init((c,), jnp.int64), xs_i64,
        )

    run_trials("q32 wide (scan)", scan_of(biquad.df1_wide_step, ba_q29, 29),
               biquad.df1_wide_init((c,)), xs_i)
    run_trials("q32 dither (scan)",
               scan_of(biquad.df1_dither_step, ba_q29, 29),
               biquad.df1_dither_init((c,)), xs_i)

    u, lo, hi = 0, -(2**30), 2**30

    @jax.jit
    def run_clamp(st, xs):
        return jax.lax.scan(
            lambda s, x: biquad.clamp_step(
                biquad.df1_step_q(ba_q29, 29, s, x),
                jnp.int32(u), jnp.int32(lo), jnp.int32(hi),
            ),
            st, xs, unroll=8,
        )

    run_trials("q32 clamp (scan)", run_clamp,
               biquad.df1_init((c,), jnp.int32), xs_i)

    if c % 128 == 0:
        run_trials(
            "q32 clamp (pallas)",
            lambda st, xs: bp.df1_clamp_bank_q(
                ba_q29, st, xs, 29, u=u, lo=lo, hi=hi, time_chunk=tc
            ),
            biquad.df1_init((c,), jnp.int32), xs_i,
        )
        run_trials(
            "q32 wide (pallas)",
            lambda st, xs: bp.df1_wide_bank(ba_q29, st, xs, 29,
                                            time_chunk=tc),
            biquad.df1_wide_init((c,)), xs_i,
        )
        run_trials(
            "q32 dither (pallas)",
            lambda st, xs: bp.df1_dither_bank(ba_q29, st, xs, 29,
                                              time_chunk=tc),
            biquad.df1_dither_init((c,)), xs_i,
        )
        run_trials(
            "q32 clamp+wide (pallas)",
            lambda st, xs: bp.df1_wide_bank(
                ba_q29, st, xs, 29, clamp=(u, lo, hi), time_chunk=tc
            ),
            biquad.df1_wide_init((c,)), xs_i,
        )
        run_trials(
            "q32 clamp+dither (pallas)",
            lambda st, xs: bp.df1_dither_bank(
                ba_q29, st, xs, 29, clamp=(u, lo, hi), time_chunk=tc
            ),
            biquad.df1_dither_init((c,)), xs_i,
        )

    # ---- float biquads ----
    ba_f32 = jnp.asarray(ba5.astype(np.float32))
    run_trials("f32 df1 (scan)", scan_of(biquad.df1_step, ba_f32),
               biquad.df1_init((c,), jnp.float32), xs_f32)
    run_trials("f32 df2t (scan)", scan_of(biquad.df2t_step, ba_f32),
               biquad.df2t_init((c,), jnp.float32), xs_f32)
    if c % 128 == 0:
        run_trials(
            "f32 df1 (pallas)",
            lambda st, xs: bp.df1_bank_f32(
                np.asarray(ba5, np.float32), st, xs, time_chunk=min(512, t)
            ),
            biquad.df1_init((c,), jnp.float32), xs_f32,
        )
    run_trials(
        "f32 df1 (assoc block)",
        jax.jit(lambda st, xs: biquad.df1_block_float(ba_f32, st, xs)),
        biquad.df1_init((c,), jnp.float32), xs_f32,
    )
    run_trials("f64 df1 (scan)", scan_of(biquad.df1_step, jnp.asarray(ba5)),
               biquad.df1_init((c,), jnp.float64), xs_f64)
    run_trials("f64 df2t (scan)", scan_of(biquad.df2t_step, jnp.asarray(ba5)),
               biquad.df2t_init((c,), jnp.float64), xs_f64)

    # ---- cascade4 (biquad.rs "idsp q32 Cascade4") ----
    ba_c = jnp.asarray(np.stack([biquad.quantize_ba(ba5, 29)] * 4))
    run_trials(
        "q32 cascade4 (scan)",
        scan_of(biquad.cascade_step_q, ba_c, 29, unroll=4),
        biquad.cascade_init(4, (c,), jnp.int32), xs_i,
    )
    if c % 128 == 0:

        def run_sos(states, xs):
            return bp.sos_bank_q(
                np.stack([biquad.quantize_ba(ba5, 29)] * 4), states, xs, 29,
                time_chunk=tc, unroll=4,
            )

        run_trials(
            "q32 cascade4 (pallas)", run_sos,
            [biquad.df1_init((c,), jnp.int32) for _ in range(4)], xs_i,
        )

    # ---- lowpass (biquad.rs lowpass1/lowpass2) ----
    k1 = jnp.asarray(lowpass.gains1(0.01))
    run_trials("lowpass1", jax.jit(lambda st, xs: lowpass.block(k1, st, xs)),
               lowpass.init(1, (c,)), xs_i)
    k2 = jnp.asarray(lowpass.gains2(0.01))
    run_trials("lowpass2", jax.jit(lambda st, xs: lowpass.block(k2, st, xs)),
               lowpass.init(2, (c,)), xs_i)
    if c % 128 == 0:
        from idsp_tpu.filters.lowpass_pallas import lowpass_bank

        run_trials(
            "lowpass1 (pallas)",
            lambda st, xs: lowpass_bank(
                lowpass.gains1(0.01), st, xs, time_chunk=tc
            ),
            lowpass.init(1, (c,)), xs_i,
        )
        run_trials(
            "lowpass2 (pallas)",
            lambda st, xs: lowpass_bank(
                lowpass.gains2(0.01), st, xs, time_chunk=tc
            ),
            lowpass.init(2, (c,)), xs_i,
        )

    # ---- WDF complementary allpass 7 (biquad.rs wdf-ca-7) ----
    tp = wdf.nibbles(0xAD, 2)
    b0 = [
        (tp, jnp.asarray(wdf.quantize(tp, [-0.9, 0.9]))),
        (tp, jnp.asarray(wdf.quantize(tp, [-0.6, 0.7]))),
    ]
    b1 = [
        (tp, jnp.asarray(wdf.quantize(tp, [-0.7, 0.6]))),
        (wdf.nibbles(0xA, 1),
         jnp.asarray(wdf.quantize(wdf.nibbles(0xA, 1), [0.8]))),
    ]
    wdf_states = (
        [wdf.init(2, (c,)), wdf.init(2, (c,))],
        [wdf.init(2, (c,)), wdf.init(1, (c,))],
    )
    run_trials("wdf-ca-7 (scan)",
               jax.jit(lambda sts, xs: wdf.pair_block(b0, b1, sts, xs)),
               wdf_states, xs_i)
    if c % 128 == 0:
        from idsp_tpu.filters.wdf_pallas import wdf_pair_bank

        run_trials(
            "wdf-ca-7 (pallas)",
            lambda sts, xs: wdf_pair_bank(b0, b1, sts, xs, time_chunk=tc,
                                          unroll=4),
            wdf_states, xs_i,
        )

    # ---- WDF complementary allpass 19th order (biquad.rs:143-173,
    # Gazsi 1985 Example 5; baseline 83 cyc/smp M7) ----
    g19_0 = [
        (wdf.nibbles(0x1, 1), [0.0]),
        (wdf.nibbles(0x1C, 2), [-0.226119, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.602422, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.83932, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.950847, 0.0]),
    ]
    g19_1 = [
        (wdf.nibbles(0x1C, 2), [-0.063978, 0.0]),
        (wdf.nibbles(0x1C, 2), [-0.423068, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.741327, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.905567, 0.0]),
        (wdf.nibbles(0x1D, 2), [-0.984721, 0.0]),
    ]
    b0_19 = [(tp_, jnp.asarray(wdf.quantize(tp_, gg))) for tp_, gg in g19_0]
    b1_19 = [(tp_, jnp.asarray(wdf.quantize(tp_, gg))) for tp_, gg in g19_1]
    wdf19_states = (
        [wdf.init(len(tp_), (c,)) for tp_, _ in g19_0],
        [wdf.init(len(tp_), (c,)) for tp_, _ in g19_1],
    )
    run_trials("wdf-ca-19 (scan)",
               jax.jit(lambda sts, xs: wdf.pair_block(b0_19, b1_19, sts, xs)),
               wdf19_states, xs_i)
    if c % 128 == 0:
        run_trials(
            "wdf-ca-19 (pallas)",
            lambda sts, xs: wdf_pair_bank(b0_19, b1_19, sts, xs,
                                          time_chunk=tc, unroll=4),
            wdf19_states, xs_i,
        )

    # ---- PLL bank ----
    pba = jnp.asarray(pll.coefficients_from_bandwidth(1e-2, 4.0))
    run_trials("pll bank (scan)",
               jax.jit(lambda st, xs: pll.block(pba, st, xs)),
               pll.init((c,)), phases)
    if c % 128 == 0:
        from idsp_tpu.filters.pll_pallas import pll_bank

        run_trials(
            "pll bank (pallas)",
            lambda st, xs: pll_bank(pba, st, xs, time_chunk=tc),
            pll.init((c,)), phases,
        )

    # ---- SVF / normal-form / RPLL banks ----
    from idsp_tpu.filters import normal, rpll, svf

    svf_f, svf_qi = svf.coefficients(0.01, 0.7)
    run_trials(
        "svf bank (scan)",
        jax.jit(lambda st, xs: svf.block(svf_f, svf_qi, st, xs)),
        svf.init((c,), jnp.float32), xs_f32,
    )
    nb, npole = normal.from_cookbook(
        Filter().critical_frequency(0.06).lowpass()
    )
    nb_q = np.asarray(fxp.from_float(jnp.asarray(nb), 29))
    np_q = np.asarray(fxp.from_float(jnp.asarray(npole), 29))
    run_trials(
        "normal form q32 (scan)",
        scan_of(
            lambda b, p, s, x: normal.step_q(b, p, 29, s, x),
            jnp.asarray(nb_q), jnp.asarray(np_q),
        ),
        normal.init((c,), jnp.int32), xs_i,
    )
    rcfg = rpll.RpllConfig(dt2=8, shift_frequency=12, shift_phase=11)
    r_valids = jnp.asarray(
        rng.integers(0, 64, size=(t, c), dtype=np.int64) == 0
    )
    run_trials(
        "rpll bank (scan)",
        jax.jit(lambda st, xs, v: rpll.block(rcfg, st, xs, v)),
        rpll.init((c,)), phases, r_valids,
    )
    if c % 128 == 0:
        from idsp_tpu.filters.normal_pallas import normal_bank_q
        from idsp_tpu.filters.rpll_pallas import rpll_bank
        from idsp_tpu.filters.svf_pallas import svf_bank

        run_trials(
            "svf bank (pallas)",
            lambda st, xs: svf_bank(svf_f, svf_qi, st, xs, time_chunk=tc),
            svf.init((c,), jnp.float32), xs_f32,
        )
        run_trials(
            "normal form q32 (pallas)",
            lambda st, xs: normal_bank_q(
                nb_q, np_q, st, xs, 29, time_chunk=tc, unroll=4
            ),
            normal.init((c,), jnp.int32), xs_i,
        )
        run_trials(
            "rpll bank (pallas)",
            lambda st, xs, v: rpll_bank(rcfg, st, xs, v, time_chunk=tc),
            rpll.init((c,)), phases, r_valids,
        )

    # ---- FIR / HBF (hbf.rs:29-54) ----
    del phases, xy, xs_f64  # free ~320 MB of early fixtures

    x_hbf = jnp.asarray(rng.normal(size=(c, t)).astype(np.float32))
    taps8 = jnp.asarray(
        np.array([0.01, -0.05, 0.12, 0.44], np.float32)
    )  # 8-tap even-symmetric (fir es-8 analog, biquad.rs bench)
    run_trials(
        "fir es-8 (block conv)",
        jax.jit(
            lambda st, x: hbf.fir_block(taps8, st, x, odd=False, sym=True)
        ),
        hbf.fir_init(4, False, (c,)), x_hbf,
    )
    # single-stage decimators (hbf.rs:636-655 Skylake rows): the 3-mul
    # (11-tap) last stage and the 23-mul (91-tap) first stage
    x_hbf_t = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    run_trials(
        "hbf dec 3-mul single stage (t-major)",
        jax.jit(lambda st, x: hbf.hbf_dec_block(
            hbf.HBF_TAPS[4], st, x, axis=0
        )),
        hbf.hbf_dec_init(len(hbf.HBF_TAPS[4]), (c,), axis=0), x_hbf_t,
    )
    run_trials(
        "hbf dec 23-mul single stage (t-major)",
        jax.jit(lambda st, x: hbf.hbf_dec_block(
            hbf.HBF_TAPS[0], st, x, axis=0
        )),
        hbf.hbf_dec_init(len(hbf.HBF_TAPS[0]), (c,), axis=0), x_hbf_t,
    )
    run_trials("hbf dec8 cascade",
               jax.jit(lambda st, x: hbf.hbf_dec_cascade(st, x)),
               hbf.hbf_dec_cascade_init(3, (c,)), x_hbf)
    run_trials("hbf dec8 cascade (t-major)",
               jax.jit(lambda st, x: hbf.hbf_dec_cascade(st, x, axis=0)),
               hbf.hbf_dec_cascade_init(3, (c,), axis=0), x_hbf.T)
    if c % 128 == 0:
        # the headline-chain front end: DF1 bank + in-kernel half-band
        # stage-1 decimation (ddc_pallas.df1_hbf1_bank)
        from idsp_tpu.filters.ddc_pallas import df1_hbf1_bank, hbf1_tail_init

        def run_fold(st, xs):
            bq, tail = st
            bq, tail, y2 = df1_hbf1_bank(ba_q29, bq, tail, xs, 29,
                                         time_chunk=128, unroll=4)
            return (bq, tail), y2

        run_trials(
            "q32 df1+hbf1 (pallas fused)", run_fold,
            (biquad.df1_init((c,), jnp.int32), hbf1_tail_init(c)), xs_i,
        )

        # the whole filter chain in one kernel (DF1 + 3 HBF stages,
        # 1/8-rate output — the bench.py headline front end)
        from idsp_tpu.filters.ddc_pallas import df1_hbf_cascade_bank

        taps3 = (hbf.HBF_TAPS[2], hbf.HBF_TAPS[1], hbf.HBF_TAPS[0])

        def run_fold3(st, xs):
            bq, tails = st
            bq, tails, y8 = df1_hbf_cascade_bank(
                ba_q29, bq, tails, xs, 29, taps=taps3,
                time_chunk=128, unroll=4,
            )
            return (bq, tails), y8

        run_trials(
            "q32 df1+hbf dec8 (one kernel)", run_fold3,
            (biquad.df1_init((c,), jnp.int32),
             tuple(hbf1_tail_init(c, len(tv)) for tv in taps3)), xs_i,
        )

        # the clamp (anti-windup) production variant, fused the same way
        from idsp_tpu.filters.ddc_pallas import df1_clamp_hbf_cascade_bank

        def run_fold3_clamp(st, xs):
            bq, tails = st
            bq, tails, y8 = df1_clamp_hbf_cascade_bank(
                ba_q29, bq, tails, xs, 29,
                u=0, lo=-(1 << 29), hi=(1 << 29) - 1, taps=taps3,
                time_chunk=128, unroll=4,
            )
            return (bq, tails), y8

        run_trials(
            "q32 clamp df1+hbf dec8 (one kernel)", run_fold3_clamp,
            (biquad.df1_init((c,), jnp.int32),
             tuple(hbf1_tail_init(c, len(tv)) for tv in taps3)), xs_i,
        )

        # the whole HEADLINE chain in one kernel: in-kernel fast-LO mix
        # (ops/fastlo.py, SNR-gated) + DF1 + 3 HBF stages; input is the
        # real full-rate stream, 2c I|Q lanes inside
        if c % 256 == 0:
            from idsp_tpu.filters.ddc_pallas import fastlo_ddc_cascade_bank

            ch = c // 2
            steps_lo = jnp.asarray(
                rng.integers(1 << 24, 1 << 30, size=(ch,),
                             dtype=np.int64).astype(np.int32)
            )
            x_lo = jnp.asarray(
                rng.integers(-(2**27), 2**27, size=(t,),
                             dtype=np.int64).astype(np.int32)
            )

            def run_fastlo(st, x, steps_a):
                bq, tails, ph = st
                # tc == unroll: round-5 tuned fully-unrolled chunk
                # (see bench.py fastlo_fused; ~+25% at both widths)
                bq, tails, ph, y8 = fastlo_ddc_cascade_bank(
                    ba_q29, bq, tails, ph, steps_a, x, 29, taps=taps3,
                    time_chunk=16, unroll=16,
                )
                return (bq, tails, ph), y8

            run_trials(
                "fastlo mix+df1+hbf dec8 (one kernel)", run_fastlo,
                (biquad.df1_init((c,), jnp.int32),
                 tuple(hbf1_tail_init(c, len(tv)) for tv in taps3),
                 jnp.zeros((ch,), jnp.int32)),
                x_lo, steps_lo,
                samples=ch * t,
            )
    x_hbf_lo = jnp.asarray(rng.normal(size=(c, t // 8)).astype(np.float32))
    run_trials("hbf int8 cascade",
               jax.jit(lambda st, x: hbf.hbf_int_cascade(st, x)),
               hbf.hbf_int_cascade_init(3, (c,)), x_hbf_lo)
    if c % 128 == 0:
        # standalone one-kernel cascades (hbf_pallas): inter-stage
        # intermediates stay in VMEM
        from idsp_tpu.filters.hbf_pallas import (
            hbf_dec_cascade_bank, hbf_int_cascade_bank,
        )

        run_trials(
            "hbf dec8 cascade (pallas)",
            lambda st, x: hbf_dec_cascade_bank(st, x, time_chunk=512),
            hbf.hbf_dec_cascade_init(3, (c,), axis=0), x_hbf.T,
        )
        # production width (matches the ROOFLINE.md lanes=1024 rows)
        x_hbf_w = jnp.asarray(
            rng.normal(size=(t, 2 * c)).astype(np.float32))
        run_trials(
            f"hbf dec8 cascade (pallas, lanes={2 * c})",
            lambda st, x: hbf_dec_cascade_bank(st, x, time_chunk=512),
            hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0), x_hbf_w,
            samples=t * 2 * c,
        )
        # banded-MXU cascade (round 5): each stage one dot against a
        # static banded operator; split3 = hi/lo bf16 operand split
        from idsp_tpu.filters.hbf_pallas import hbf_dec_cascade_mxu

        run_trials(
            f"hbf dec8 cascade (mxu, lanes={2 * c})",
            lambda st, x: hbf_dec_cascade_mxu(st, x),
            hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0), x_hbf_w,
            samples=t * 2 * c,
        )
        from idsp_tpu.filters.hbf_pallas import hbf_int_cascade_mxu

        x_int_w = jnp.asarray(
            rng.normal(size=(t // 8, 2 * c)).astype(np.float32))
        run_trials(
            f"hbf int8 cascade (mxu, lanes={2 * c})",
            lambda st, x: hbf_int_cascade_mxu(st, x),
            hbf.hbf_int_cascade_init(3, (2 * c,), axis=0), x_int_w,
            # full-rate (output) samples — the int-row convention
            samples=t * 2 * c,
        )
        run_trials(
            "hbf int8 cascade (pallas)",
            lambda st, x: hbf_int_cascade_bank(st, x, time_chunk=128),
            hbf.hbf_int_cascade_init(3, (c,), axis=0), x_hbf_lo.T,
        )

    # ---- FM discriminator receiver bank (BASELINE config #1) ----
    from idsp_tpu.pipelines import fm_disc

    ph_fm = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64).astype(
            np.int32
        )
    )
    re_fm, im_fm = cossin(ph_fm)
    ba_fm = jnp.asarray(fm_disc.deemphasis_coefficients(0.02))

    def run_fm(st, re, im):
        st2, y = fm_disc.fm_receiver(st, re, im, jnp.int32(12345), ba_fm)
        return st2, y

    run_trials("fm receiver bank", jax.jit(run_fm),
               fm_disc.init_state((c,)), re_fm, im_fm)
    if c % 128 == 0:
        from idsp_tpu.filters.fm_pallas import fm_disc_bank

        ba_fm_np = np.asarray(ba_fm)
        run_trials(
            "fm receiver bank (one kernel)",
            # requests tc=1024; _pick_time_chunk VMEM-clamps (at c=512
            # the effective chunk is 512 — scripts/tpu_fm_probe.py).
            # The composed path above is ~8x faster single-chip: at
            # c=512 this kernel runs the DF1 on cs=4 half-vreg rows
            # and the discriminator 8 rows at a time, so it is
            # latency/overhead-bound regardless of the angle's op
            # count (see fm_pallas.fm_disc_bank docstring)
            lambda st, re, im: fm_disc_bank(
                ba_fm_np, st, re, im, 12345, time_chunk=1024,
            ),
            fm_disc.init_state((c,)), re_fm, im_fm,
        )
        run_trials(
            "fm receiver bank (1 kernel, fast atan)",
            # SNR-gated f32 discriminator (angle="fast"): ~30 lane-
            # ops/sample for disc+angle; passes the reference FM gates
            # (tests/test_structures_pallas.py).  Measures ~equal to
            # the exact angle — the angle is not the binding cost
            lambda st, re, im: fm_disc_bank(
                ba_fm_np, st, re, im, 12345, time_chunk=1024,
                angle="fast",
            ),
            fm_disc.init_state((c,)), re_fm, im_fm,
        )

    # ---- rate-conversion round trip (BASELINE config #4) ----
    from idsp_tpu.pipelines import rate_conversion

    del ph_fm, re_fm, im_fm  # free 192 MB of fm fixtures (HBM headroom)

    run_trials(
        "rate conv 16x dec+int round trip",
        jax.jit(lambda st, x: rate_conversion.round_trip(st, x)),
        rate_conversion.init(4, (c,)), x_hbf,
    )
    if c % 128 == 0:
        run_trials(
            "rate conv 16x round trip (pallas)",
            lambda st, x: rate_conversion.round_trip_t(
                st, x, use_kernel=True
            ),
            rate_conversion.init_t(4, (c,)), x_hbf.T,
        )
        run_trials(
            "rate conv 16x round trip (mxu)",
            lambda st, x: rate_conversion.round_trip_t(
                st, x, use_kernel="mxu"
            ),
            rate_conversion.init_t(4, (c,)), x_hbf.T,
        )

    # ---- CIC (cic.rs:400-422) ----
    x_cic = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=(c, t), dtype=np.int64).astype(
            np.int32
        )
    )
    run_trials("cic dec N=3 R=16",
               jax.jit(lambda st, x: cic.decimate_block(st, x, 15)),
               cic.init(3, 1, (c,)), x_cic)
    x_cic_lo = jnp.asarray(
        rng.integers(-(2**10), 2**10, size=(c, t // 16),
                     dtype=np.int64).astype(np.int32)
    )
    run_trials("cic int N=3 R=16",
               jax.jit(lambda st, x: cic.interpolate_block(st, x, 15)),
               cic.init(3, 1, (c,)), x_cic_lo)
    if c % 128 == 0:
        # one-kernel integrator cascade + in-kernel keep-1-in-R
        from idsp_tpu.filters.cic_pallas import cic_dec_bank, cic_int_bank

        run_trials(
            "cic dec N=3 R=16 (pallas)",
            lambda st, x: cic_dec_bank(st, x, 15, time_chunk=512),
            cic.init(3, 1, (c,)), x_cic.T,
        )
        run_trials(
            "cic int N=3 R=16 (pallas)",
            lambda st, x: cic_int_bank(st, x, 15, time_chunk=512),
            cic.init(3, 1, (c,)), x_cic_lo.T,
        )

    # modular recomposition (Integrator^N -> Downsample -> Comb^N),
    # bit-equal to the monolithic path (cic.rs:305-387; the reference
    # benches the monolithic/modular/chunked triple at cic.rs:413-421 —
    # the TPU monolithic path IS the blocked/chunked formulation)
    from idsp_tpu import process

    def run_cic_mod_dec(st, x):
        ints, combs = st
        cur = x
        new_ints, new_combs = [], []
        for s in ints:
            s2, cur = process.integrator_block(s, cur)
            new_ints.append(s2)
        cur = process.downsample(cur, 16, 0)
        for s in combs:
            s2, cur = process.comb_block(s, cur)
            new_combs.append(s2)
        return (new_ints, new_combs), cur

    run_trials(
        "cic dec modular N=3 R=16", jax.jit(run_cic_mod_dec),
        ([process.integrator_init((c,)) for _ in range(3)],
         [process.delay_init(1, (c,), jnp.int32) for _ in range(3)]),
        x_cic,
    )

    def run_cic_mod_int(st, x):
        combs, ints = st
        cur = x
        new_combs, new_ints = [], []
        for s in combs:
            s2, cur = process.comb_block(s, cur)
            new_combs.append(s2)
        cur = process.hold(cur, 16)
        for s in ints:
            s2, cur = process.integrator_block(s, cur)
            new_ints.append(s2)
        return (new_combs, new_ints), cur

    run_trials(
        "cic int modular N=3 R=16", jax.jit(run_cic_mod_int),
        ([process.delay_init(1, (c,), jnp.int32) for _ in range(3)],
         [process.integrator_init((c,)) for _ in range(3)]),
        x_cic_lo,
    )

    # ---- ddc_lockin bank (BASELINE config #2: f32 quadrature mix +
    # shared-coefficient I/Q lowpass, ddc_lockin.rs:27-42) ----
    lo_fs = np.linspace(0.05, 0.45, c)
    ph_t = (
        np.arange(t, dtype=np.float64)[:, None] * (2 * np.pi * lo_fs[None])
    ) % (2 * np.pi)
    lo_cos = jnp.asarray(np.cos(ph_t).astype(np.float32))
    lo_sin = jnp.asarray(np.sin(ph_t).astype(np.float32))
    ba_ddcl = jnp.asarray(
        biquad.from_cookbook(
            Filter().critical_frequency(0.002).lowpass()
        ).astype(np.float32)
    )
    x_one = xs_f32[:, :1]

    def run_ddcl(st, lc, ls):
        iq = jnp.concatenate([x_one * lc, -(x_one * ls)], axis=1)
        return biquad.df1_block_float(ba_ddcl, st, iq)

    run_trials("ddc lockin bank (f32 assoc)", jax.jit(run_ddcl),
               biquad.df1_init((2 * c,), jnp.float32), lo_cos, lo_sin)
    if c % 128 == 0:
        from idsp_tpu.filters.ddc_pallas import ddc_lockin_bank

        ba_ddcl_np = np.asarray(ba_ddcl)
        x_flat = xs_f32[:, 0]
        run_trials(
            "ddc lockin bank (one kernel)",
            lambda st, xf: ddc_lockin_bank(
                ba_ddcl_np, st, xf, lo_fs, 0, time_chunk=tc
            ),
            biquad.df1_init((2 * c,), jnp.float32), x_flat,
        )

    # ---- polyphase channelizer M=1024 (reference example #3 scaled to
    # the BASELINE wideband config; DFT as complex MXU matmul) ----
    from idsp_tpu.pipelines import channelizer as chz

    m_ch = 1024
    n_fr = max(32, t // m_ch)
    x_fr = jnp.asarray(
        rng.normal(size=(n_fr, m_ch, 2)).astype(np.float32)
    )
    run_trials(
        "channelizer m=1024 (mxu dft)",
        jax.jit(lambda st, x: chz.channelize(st, x, m=m_ch, taps=8)),
        chz.init(m_ch, 8), x_fr, samples=n_fr * m_ch,
    )
    run_trials(
        "channelizer m=1024 (fft)",
        jax.jit(
            lambda st, x: chz.channelize(st, x, m=m_ch, taps=8, dft="fft")
        ),
        chz.init(m_ch, 8), x_fr, samples=n_fr * m_ch,
    )
    # plane-layout production path: m on lanes, frames on sublanes (the
    # trailing (m, 2) layout above pads 64x on TPU tiles).  1024 frames
    # per dispatch: the on-device sweep (scripts/tpu_channelizer_probe
    # .py, 2026-08-19) shows a fixed ~100 us dispatch floor that
    # dominates below ~1M samples/dispatch — n=256 measures the floor
    # (1.7 GS/s), n=1024 the pipeline (8.8 GS/s).
    n_pl = max(1024, t // m_ch)
    zr_pl = jnp.asarray(rng.normal(size=(n_pl, m_ch)).astype(np.float32))
    zi_pl = jnp.asarray(rng.normal(size=(n_pl, m_ch)).astype(np.float32))

    def _chz_planes(st, zr, zi, **kw):
        return chz.channelize_planes(st, zr, zi, m=m_ch, taps=8, **kw)

    run_trials(
        "channelizer m=1024 (planes, mxu)",
        jax.jit(_chz_planes), chz.init_planes(m_ch, 8), zr_pl, zi_pl,
        samples=n_pl * m_ch,
    )
    run_trials(
        "channelizer m=1024 (planes, bf16)",
        jax.jit(lambda st, a, b: _chz_planes(
            st, a, b, twiddle_dtype=jnp.bfloat16)),
        chz.init_planes(m_ch, 8), zr_pl, zi_pl,
        samples=n_pl * m_ch,
    )
    run_trials(
        "channelizer m=1024 (planes, fft)",
        jax.jit(lambda st, a, b: _chz_planes(st, a, b, dft="fft")),
        chz.init_planes(m_ch, 8), zr_pl, zi_pl,
        samples=n_pl * m_ch,
    )

    # one-kernel FIR+cast+DFT fusion (channelizer_pallas, round 5):
    # the planes path is dispatch-floor bound at n<=4096 and HBM-bound
    # above (scripts/tpu_chan_breakdown.py); the fused kernel keeps the
    # FIR accumulator in VMEM and feeds the MXU directly.  Same-n row
    # for an apples-to-apples planes comparison, plus the production
    # frame count (n=16384 at canonical t) where it reaches ~76% of the
    # MXU roofline bound.
    from idsp_tpu.pipelines.channelizer_pallas import channelize_fused

    def _chz_fused(st, a, b):
        return channelize_fused(st, a, b, m=m_ch, taps=8,
                                twiddle_dtype=jnp.bfloat16,
                                block_frames=256)

    run_trials(
        f"channelizer m=1024 (fused, n={n_pl})",
        jax.jit(_chz_fused), chz.init_planes(m_ch, 8), zr_pl, zi_pl,
        samples=n_pl * m_ch,
    )
    n_big = max(2048, t // 2)
    zr_big = jnp.asarray(rng.normal(size=(n_big, m_ch)).astype(np.float32))
    zi_big = jnp.asarray(rng.normal(size=(n_big, m_ch)).astype(np.float32))
    run_trials(
        f"channelizer m=1024 (fused, n={n_big})",
        jax.jit(_chz_fused), chz.init_planes(m_ch, 8), zr_big, zi_big,
        samples=n_big * m_ch,
    )

    del zr_big, zi_big, zr_pl, zi_pl, x_fr  # free channelizer fixtures

    # ---- 1024-channel DDC bank with per-channel PLL (BASELINE #5) ----
    from idsp_tpu.pipelines import ddc_bank

    cb = 1024
    x_bank = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64).astype(
            np.int32
        )
    )
    steps_bank = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(cb,), dtype=np.int64).astype(
            np.int32
        )
    )
    lp2_gains = tuple(int(v) for v in lowpass.gains2(0.004))
    pll_ba_t = tuple(
        int(v) for v in pll.coefficients_from_bandwidth(2e-2, 4.0)
    )
    ba_bank = tuple(
        int(v)
        for v in biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.004).lowpass()
            ),
            29,
        )
    )
    run_trials(
        "ddc bank 1024ch (lowpass2+pll)",
        lambda s, x, stp: ddc_bank.ddc_bank_block(
            s, x, stp, lp2_gains, pll_ba_t, decimate=16
        ),
        ddc_bank.init(cb), x_bank, steps_bank, samples=cb * t,
    )
    run_trials(
        "ddc bank 1024ch (biquad+pll)",
        lambda s, x, stp: ddc_bank.ddc_bank_block_biquad(
            s, x, stp, ba_bank, pll_ba_t, decimate=16
        ),
        ddc_bank.init_biquad(cb), x_bank, steps_bank, samples=cb * t,
    )
    run_trials(
        "ddc bank 1024ch (biquad+pll, fastlo)",
        lambda s, x, stp: ddc_bank.ddc_bank_block_biquad(
            s, x, stp, ba_bank, pll_ba_t, decimate=16, lo_mode="fast"
        ),
        ddc_bank.init_biquad(cb), x_bank, steps_bank, samples=cb * t,
    )
    run_trials(
        "ddc bank 1024ch (biquad+pll, 1-kernel)",
        lambda s, x, stp: ddc_bank.ddc_bank_block_biquad(
            s, x, stp, ba_bank, pll_ba_t, decimate=16,
            lo_mode="fast_fused"
        ),
        ddc_bank.init_biquad(cb), x_bank, steps_bank, samples=cb * t,
    )
    run_trials(
        "ddc bank 1024ch (whole stack, 1 kernel)",
        # tc == unroll: round-5 tuned chunking (tpu_stack_tune.py)
        lambda s, x, stp: ddc_bank.ddc_bank_block_biquad(
            s, x, stp, ba_bank, pll_ba_t, decimate=16,
            lo_mode="one_kernel", time_chunk=32, unroll=32
        ),
        ddc_bank.init_biquad(cb), x_bank, steps_bank, samples=cb * t,
    )
    run_trials(
        "ddc bank 1024ch (lp2 stack, 1 kernel)",
        # tc == unroll: round-5 tuned chunking (tpu_stack_tune.py)
        lambda s, x, stp: ddc_bank.ddc_bank_block(
            s, x, stp, lp2_gains, pll_ba_t, decimate=16,
            lo_mode="one_kernel", time_chunk=32, unroll=32
        ),
        ddc_bank.init(cb), x_bank, steps_bank, samples=cb * t,
    )

    dev = jax.devices()[0]
    header = (
        f"# device: {dev}  channels={c} block={t} iters={iters}"
        f" trials={trials} roundtrip={rt * 1e3:.1f}ms (subtracted)"
    )
    print(header)
    for r in rows:
        print(r.line())

    if args.write_md:
        write_md(rows, dev, c, t, iters, trials, rt)
    return rows


def write_md(rows, dev, c, t, iters, trials, rt):
    import datetime
    import os

    by = {r.name: r for r in rows}

    def gs(name):
        r = by.get(name)
        if r is None:
            return "—", "—"
        spread = (r.hi - r.lo) / r.median * 100 if r.median else 0.0
        return f"{r.median / 1e9:.2f} GS/s", f"{spread:.1f}%"

    lines = [
        "# Benchmark results",
        "",
        f"Generated by `python benches/suite.py --write-md` — canonical",
        f"config: {c} channels x {t}-sample blocks, {iters} chained",
        f"dispatches/trial, median of {trials} trials (min/max spread in",
        "brackets).  Fixed dispatch+readback round trip"
        f" ({rt * 1e3:.1f} ms) measured and subtracted.",
        "",
        f"Every row runs the canonical {c}x{t} config unless its name",
        "or baseline note states otherwise (channelizer rows: 1024",
        "frames x m=1024; `ddc bank 1024ch` rows: 1024 channels x",
        "16384 samples).  Rates at OTHER configs (e.g. the",
        "lanes=1024 rows in benches/ROOFLINE.md) are distinct",
        "measurements and carry the config in their name.",
        "",
        f"Hardware: {dev}.",
        "",
        "| Config | median | spread | Reference baseline (BASELINE.md) |",
        "|---|---|---|---|",
    ]
    baselines = {
        "cossin slice": "23.5 cyc/call M7",
        "atan2 slice": "52 cyc/call M7",
        "q32<29> df1 (scan)": "8.68 cyc/smp M7; >200 MS/s/SOS Skylake",
        "q32<29> df1 (pallas)": "same",
        "q32<29> df1 (pallas dyncoef)": "same (runtime retune)",
        "q16<13> df1 (scan)": "7.94 cyc/smp M7",
        "q64<61> df1 (scan, emulated i128)": "136.9 cyc/smp M7",
        "q32 wide (scan)": "22.1 cyc/smp M7",
        "q32 wide (pallas)": "same",
        "q32 dither (scan)": "11.1 cyc/smp M7",
        "q32 dither (pallas)": "same",
        "q32 clamp (scan)": "16.1 cyc/smp M7",
        "q32 clamp (pallas)": "same",
        "q32 clamp+wide (pallas)": "64.0 cyc/smp M7",
        "q32 clamp+dither (pallas)": "39.0 cyc/smp M7",
        "f32 df1 (scan)": "13.7 cyc/smp M7",
        "f32 df2t (scan)": "11.9 cyc/smp M7",
        "f32 df1 (pallas)": "—",
        "f32 df1 (assoc block)": "—",
        "f64 df1 (scan)": "44.4 cyc/smp M7",
        "q32 cascade4 (scan)": "~20 cyc/smp/SOS Skylake",
        "q32 cascade4 (pallas)": "same",
        "lowpass1": "see biquad.rs:186-189",
        "lowpass2": "see biquad.rs:186-189",
        "lowpass1 (pallas)": "same",
        "lowpass2 (pallas)": "same",
        "wdf-ca-7 (scan)": "25.1 cyc/smp M7",
        "wdf-ca-7 (pallas)": "same",
        "pll bank (scan)": "per-sample loop",
        "pll bank (pallas)": "same",
        "fir es-8 (block conv)": "115.5 cyc/smp M7",
        "hbf dec8 cascade": ">2 GS/s/core Skylake",
        "hbf dec8 cascade (pallas)": "same",
        "hbf dec8 cascade (pallas, lanes=1024)":
            "same (production width; HBM-bound — see ROOFLINE.md)",
        "hbf dec8 cascade (mxu, lanes=1024)":
            "same (banded-MXU stages, Toeplitz sub-blocked, split3 "
            "operands ~1e-5 rel; ~3.3x the shift kernel, ~95% of the "
            "HBM bound)",
        "hbf int8 cascade (mxu, lanes=1024)":
            "same (interpolation twin of the banded-MXU cascade)",
        "hbf int8 cascade": "476.7 cyc/smp M7",
        "hbf int8 cascade (pallas)": "same",
        "cic dec N=3 R=16": "2.84/1.70 cyc/smp x86 (mono/chunked)",
        "cic dec N=3 R=16 (pallas)": "same",
        "cic int N=3 R=16": "1.22/2.69 cyc/smp x86 (mono/chunked)",
        "cic int N=3 R=16 (pallas)": "same",
        "cic dec modular N=3 R=16": "3.02 cyc/smp x86 (modular)",
        "cic int modular N=3 R=16": "1.22 cyc/smp x86 (modular)",
        "f64 df2t (scan)": "40.7 cyc/smp M7",
        "wdf-ca-19 (scan)": "83.0 cyc/smp M7",
        "wdf-ca-19 (pallas)": "same",
        "q32 clamp df1+hbf dec8 (one kernel)": "fused production chain",
        "fastlo mix+df1+hbf dec8 (one kernel)":
            "full headline chain at c/2 real channels "
            "(I|Q packed in c lanes; bench.py runs c ch at 2x this "
            "rate); >= 1 GS/s north star",
        "ddc lockin bank (f32 assoc)": "ddc_lockin.rs example",
        "ddc lockin bank (one kernel)":
            "ddc_lockin.rs example (fused factored-LO kernel)",
        "fm receiver bank": "fm_disc.rs example",
        "fm receiver bank (1 kernel, fast atan)":
            "same (SNR-gated f32 discriminator; fastest single-chip "
            "FM path — beats the composed bank)",
        "fm receiver bank (one kernel)":
            "fm_disc.rs example (fused disc+atan2+DF1 kernel, "
            "bit-exact; c=512 I/Q-packed puts the in-kernel DF1 on "
            "half-vreg rows — layout-bound, not compute-bound; "
            "memory-optimal variant: full-rate dphi never touches "
            "HBM)",
        "rate conv 16x dec+int round trip": "BASELINE #4 cascade",
        "rate conv 16x round trip (pallas)": "same (2 kernel dispatches)",
        "rate conv 16x round trip (mxu)":
            "same (banded-MXU dec+int cascades, 2 dispatches)",
        "hbf dec 3-mul single stage (t-major)":
            "2.5 cyc/item, >2 GS/s/core Skylake",
        "hbf dec 23-mul single stage (t-major)":
            "2.6 cyc/item, >1 GS/s Skylake",
        "svf bank (scan)": "svf.rs (float, 3-output)",
        "svf bank (pallas)": "same",
        "normal form q32 (scan)": "normal.rs (Rader-Gold SOS)",
        "normal form q32 (pallas)": "same",
        "rpll bank (scan)": "rpll.rs (timestamp loop)",
        "rpll bank (pallas)": "same",
        "channelizer m=1024 (mxu dft)":
            "polyphase_channelizer.rs scaled to M=1024",
        "channelizer m=1024 (fft)": "same (O(M log M) DFT)",
        "channelizer m=1024 (planes, mxu)":
            "same (plane layout: m on lanes; superseded by the fused "
            "kernel as the production path)",
        "channelizer m=1024 (planes, bf16)":
            "same (bf16 twiddles, >=10x gate holds)",
        "channelizer m=1024 (planes, fft)": "same (plane layout, fft)",
        "channelizer m=1024 (fused, n=1024)":
            "same (one-kernel FIR+cast+MXU DFT; planes-size "
            "comparison row)",
        "channelizer m=1024 (fused, n=16384)":
            "same (one kernel, production frame count — ~76% of the "
            "MXU roofline bound)",
        "ddc bank 1024ch (lowpass2+pll)": "BASELINE #5 wideband bank",
        "ddc bank 1024ch (biquad+pll)": "BASELINE #5 (biquad variant)",
        "ddc bank 1024ch (biquad+pll, fastlo)":
            "BASELINE #5 (SNR-gated fast LO)",
        "ddc bank 1024ch (biquad+pll, 1-kernel)":
            "BASELINE #5 (fused mix+DF1+dec kernel)",
        "ddc bank 1024ch (whole stack, 1 kernel)":
            "BASELINE #5 (mix+DF1+dec+atan2+PLL, one kernel)",
        "ddc bank 1024ch (lp2 stack, 1 kernel)":
            "BASELINE #5 headline config, one kernel",
    }
    wandered = []
    for r in rows:
        med, spread = gs(r.name)
        mark = ""
        if spread != "—" and float(spread.rstrip("%")) > 40.0:
            mark = " †"
            wandered.append(r.name)
        lines.append(
            f"| {r.name} | {med} | {spread}{mark} |"
            f" {baselines.get(r.name, '—')} |"
        )
    lines += [
        "",
    ]
    if wandered:
        lines += [
            "† spread stayed > 40% after adaptive re-measurement (4x "
            "trial budget, outlier-trimmed): the chip's effective "
            "clock wanders run-to-run and dominates short-runtime "
            "rows; the median is the honest central estimate and the "
            "bracketed min/max bound the wander.",
            "",
        ]
    lines += [
        f"_Run date: {datetime.date.today().isoformat()}._",
        "",
        "## Raw rows",
        "",
        "```",
    ]
    lines += [r.line() for r in rows]
    lines.append("```")
    path = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
