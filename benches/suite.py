"""Named benchmark suite mirroring the reference's embedded bench configs
(tests/embedded/src/bin/{trig,biquad,hbf}.rs).

Run: ``python benches/suite.py [--channels C] [--time T]``

Each config reports aggregate throughput (MS/s) over a C-channel bank —
the TPU analog of the reference's cycles/sample tables: the reference
measures one core at one sample/call; the TPU earns its keep by running
C channels wide, so the honest comparison is total samples/s/chip.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=256)
    ap.add_argument("--time", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, cic, hbf, lowpass, pll, wdf
    from idsp_tpu.ops import accu
    from idsp_tpu.ops.trig import atan2, cossin
    from idsp_tpu.profiling import bench as _bench
    from idsp_tpu.profiling import bench_stateful as _bench_stateful
    from idsp_tpu.profiling import measure_roundtrip
    import functools

    rt = measure_roundtrip()
    bench = functools.partial(_bench, overhead=rt)
    bench_stateful = functools.partial(_bench_stateful, overhead=rt)

    c, t, iters = args.channels, args.time, args.iters
    n = c * t
    rng = np.random.default_rng(0)
    results = []

    # --- trig (trig.rs:28-29) ---
    phases = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    f_cossin = jax.jit(lambda p: cossin(p))
    results.append(bench("cossin slice", f_cossin, phases, samples=n, iters=iters))

    xy = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(2, t, c), dtype=np.int64).astype(np.int32)
    )
    f_atan2 = jax.jit(lambda a: atan2(a[1], a[0]))
    results.append(bench("atan2 slice", f_atan2, xy, samples=n, iters=iters))

    # --- biquads (biquad.rs bench configs) ---
    ba_f = Filter().critical_frequency(0.1).lowpass()
    ba5 = biquad.from_cookbook(ba_f)
    ba_q29 = jnp.asarray(biquad.quantize_ba(ba5, 29))
    xs_i = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    xs_f32 = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    xs_f64 = jnp.asarray(rng.normal(size=(t, c)))

    def mk_q(step_fn, init_fn, *cfg):
        @jax.jit
        def run(st, xs):
            return jax.lax.scan(
                lambda s, x: step_fn(*cfg, s, x), st, xs, unroll=8
            )

        return run

    run_q29 = mk_q(biquad.df1_step_q, None, ba_q29, 29)
    results.append(
        bench_stateful(
            "idsp q32<29> df1", run_q29, biquad.df1_init((c,), jnp.int32), xs_i,
            samples=n, iters=iters,
        )
    )

    # Pallas bank kernel (TPU only; falls back silently elsewhere)
    try:
        from idsp_tpu.filters.biquad_pallas import df1_bank_q

        if c % 128 == 0:
            run_pl = lambda st, xs: df1_bank_q(
                ba_q29, st, xs, 29, time_chunk=min(2048, t)
            )
            r = bench_stateful(
                "idsp q32 df1 (pallas bank)", run_pl,
                biquad.df1_init((c,), jnp.int32), xs_i, samples=n, iters=iters,
            )
            results.append(r)
    except Exception as e:  # noqa: BLE001
        print(f"# pallas bank skipped: {str(e)[:80]}")

    run_wide = mk_q(biquad.df1_wide_step, None, ba_q29, 29)
    results.append(
        bench_stateful(
            "idsp q32 wide", run_wide, biquad.df1_wide_init((c,)), xs_i,
            samples=n, iters=iters,
        )
    )

    run_dith = mk_q(biquad.df1_dither_step, None, ba_q29, 29)
    results.append(
        bench_stateful(
            "idsp q32 dither", run_dith, biquad.df1_dither_init((c,)), xs_i,
            samples=n, iters=iters,
        )
    )

    @jax.jit
    def run_clamp(st, xs):
        return jax.lax.scan(
            lambda s, x: biquad.clamp_step(
                biquad.df1_step_q(ba_q29, 29, s, x),
                jnp.int32(0), jnp.int32(-(2**30)), jnp.int32(2**30),
            ),
            st, xs, unroll=8,
        )

    results.append(
        bench_stateful(
            "idsp q32 clamp", run_clamp, biquad.df1_init((c,), jnp.int32), xs_i,
            samples=n, iters=iters,
        )
    )

    ba_f32 = jnp.asarray(ba5.astype(np.float32))
    run_f32 = mk_q(biquad.df1_step, None, ba_f32)
    results.append(
        bench_stateful(
            "idsp f32 df1 (scan)", run_f32, biquad.df1_init((c,), jnp.float32),
            xs_f32, samples=n, iters=iters,
        )
    )

    run_f32_t = mk_q(biquad.df2t_step, None, ba_f32)
    results.append(
        bench_stateful(
            "idsp f32 df2t (scan)", run_f32_t, biquad.df2t_init((c,), jnp.float32),
            xs_f32, samples=n, iters=iters,
        )
    )

    try:
        from idsp_tpu.filters.biquad_pallas import df1_bank_f32

        if c % 128 == 0:
            run_f32_pl = lambda st, xs: df1_bank_f32(
                np.asarray(ba5, np.float32), st, xs,
                time_chunk=min(512, t),
            )
            results.append(
                bench_stateful(
                    "idsp f32 df1 (pallas bank)", run_f32_pl,
                    biquad.df1_init((c,), jnp.float32), xs_f32, samples=n,
                    iters=iters,
                )
            )
    except Exception as e:  # noqa: BLE001
        print(f"# f32 pallas bank skipped: {str(e)[:80]}")

    @jax.jit
    def run_f32_blk(st, xs):
        return biquad.df1_block_float(ba_f32, st, xs)

    results.append(
        bench_stateful(
            "idsp f32 df1 (assoc block)", run_f32_blk,
            biquad.df1_init((c,), jnp.float32), xs_f32, samples=n, iters=iters,
        )
    )

    ba_f64 = jnp.asarray(ba5)
    run_f64 = mk_q(biquad.df1_step, None, ba_f64)
    results.append(
        bench_stateful(
            "idsp f64 df1 (scan)", run_f64, biquad.df1_init((c,), jnp.float64),
            xs_f64, samples=n, iters=iters,
        )
    )

    # cascade4 (biquad.rs "idsp q32 Cascade4")
    ba_c = jnp.asarray(np.stack([biquad.quantize_ba(ba5, 29)] * 4))

    @jax.jit
    def run_casc(st, xs):
        return jax.lax.scan(
            lambda s, x: biquad.cascade_step_q(ba_c, 29, s, x), st, xs, unroll=4
        )

    results.append(
        bench_stateful(
            "idsp q32 cascade4", run_casc,
            biquad.cascade_init(4, (c,), jnp.int32), xs_i, samples=n,
            iters=iters,
        )
    )

    # --- lowpass (biquad.rs lowpass1/lowpass2) ---
    k1 = jnp.asarray(lowpass.gains1(0.01))
    run_lp1 = jax.jit(lambda st, xs: lowpass.block(k1, st, xs))
    results.append(
        bench_stateful(
            "lowpass1", run_lp1, lowpass.init(1, (c,)), xs_i, samples=n,
            iters=iters,
        )
    )
    k2 = jnp.asarray(lowpass.gains2(0.01))
    run_lp2 = jax.jit(lambda st, xs: lowpass.block(k2, st, xs))
    results.append(
        bench_stateful(
            "lowpass2", run_lp2, lowpass.init(2, (c,)), xs_i, samples=n,
            iters=iters,
        )
    )

    # --- WDF complementary allpass 7 (biquad.rs wdf-ca-7) ---
    tp = wdf.nibbles(0xAD, 2)
    b0 = [
        (tp, jnp.asarray(wdf.quantize(tp, [-0.9, 0.9]))),
        (tp, jnp.asarray(wdf.quantize(tp, [-0.6, 0.7]))),
    ]
    b1 = [
        (tp, jnp.asarray(wdf.quantize(tp, [-0.7, 0.6]))),
        (wdf.nibbles(0xA, 1), jnp.asarray(wdf.quantize(wdf.nibbles(0xA, 1), [0.8]))),
    ]
    run_wdf = jax.jit(
        lambda sts, xs: wdf.pair_block(b0, b1, sts, xs)
    )
    wdf_states = (
        [wdf.init(2, (c,)), wdf.init(2, (c,))],
        [wdf.init(2, (c,)), wdf.init(1, (c,))],
    )
    results.append(
        bench_stateful(
            "idsp wdf-ca-7", run_wdf, wdf_states, xs_i, samples=n, iters=iters
        )
    )

    # --- PLL bank ---
    pba = jnp.asarray(pll.coefficients_from_bandwidth(1e-2, 4.0))
    run_pll = jax.jit(lambda st, xs: pll.block(pba, st, xs))
    results.append(
        bench_stateful(
            "pll bank", run_pll, pll.init((c,)), phases, samples=n, iters=iters
        )
    )

    # --- HBF cascades (hbf.rs:29-54) ---
    x_hbf = jnp.asarray(rng.normal(size=(c, t)).astype(np.float32))
    run_dec = jax.jit(lambda st, x: hbf.hbf_dec_cascade(st, x))
    results.append(
        bench_stateful(
            "hbf dec8 cascade", run_dec, hbf.hbf_dec_cascade_init(3, (c,)),
            x_hbf, samples=n, iters=iters,
        )
    )
    x_hbf_lo = jnp.asarray(rng.normal(size=(c, t // 8)).astype(np.float32))
    run_int = jax.jit(lambda st, x: hbf.hbf_int_cascade(st, x))
    results.append(
        bench_stateful(
            "hbf int8 cascade", run_int, hbf.hbf_int_cascade_init(3, (c,)),
            x_hbf_lo, samples=n, iters=iters,
        )
    )

    # --- CIC (cic.rs:400-422) ---
    run_cic_d = jax.jit(lambda st, x: cic.decimate_block(st, x, 15))
    x_cic = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=(c, t), dtype=np.int64).astype(np.int32)
    )
    results.append(
        bench_stateful(
            "cic dec N=3 R=16", run_cic_d, cic.init(3, 1, (c,)), x_cic,
            samples=n, iters=iters,
        )
    )

    print(f"# device: {jax.devices()[0]}  channels={c} block={t} roundtrip={rt*1e3:.1f}ms (subtracted)")
    for r in results:
        print(r.row())
    return results


if __name__ == "__main__":
    main()
