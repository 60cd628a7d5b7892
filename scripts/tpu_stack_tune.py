"""Whole-stack 1024-ch kernel (fastlo_ddc_bank_block) chunk sweep.

Apply the round-5 fully-unrolled-chunk discovery (tc == unroll) to the
BASELINE #5 one-kernel stacks (mix+DF1+dec+atan2+PLL and the lp2
variant), currently at tc=128/u=4.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, lowpass, pll
    from idsp_tpu.filters.ddc_pallas import (
        fastlo_ddc_bank_block,
        fastlo_ddc_bank_block_lp,
    )
    from idsp_tpu.profiling import SlowWindowGuard, measure_rate, sync

    c, t, d = 1024, 16384, 16
    rng = np.random.default_rng(0)
    guard = SlowWindowGuard()
    ba_q = tuple(int(v) for v in np.asarray(biquad.quantize_ba(
        biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
        29)))
    pll_ba = tuple(int(v) for v in pll.coefficients_from_bandwidth(
        2e-2, 4.0))
    lp_gains = tuple(int(v) for v in np.asarray(lowpass.gains2(0.01)))
    x = jnp.asarray(rng.integers(-(2**27), 2**27, size=(t,),
                                 dtype=np.int64).astype(np.int32))
    steps = jnp.asarray(rng.integers(1 << 24, 1 << 30, size=(c,),
                                     dtype=np.int64).astype(np.int32))
    ph0 = jnp.zeros((c,), jnp.int32)

    for name, runner in (
        ("biquad stack", lambda tc, u: (
            lambda st, x: (lambda bq, pl, ph, y: ((bq, pl), y))(
                *fastlo_ddc_bank_block(
                    ba_q, pll_ba, st[0], st[1], ph0, steps, x, 29,
                    d=d, time_chunk=tc, unroll=u)),
            (biquad.df1_init((2 * c,), jnp.int32), pll.init((c,))))),
        ("lp2 stack", lambda tc, u: (
            lambda st, x: (lambda lp, pl, ph, *ys: ((lp, pl), ys))(
                *fastlo_ddc_bank_block_lp(
                    lp_gains, pll_ba, st[0], st[1], ph0, steps, x,
                    n=2, d=d, time_chunk=tc, unroll=u)),
            (lowpass.init(2, (2 * c,)), pll.init((c,))))),
    ):
        for tc, u in ((128, 4), (64, 16), (32, 32), (16, 16), (64, 64)):
            fn, st0 = runner(tc, u)
            jfn = jax.jit(fn)
            try:
                out = jfn(st0, x)
                sync(out)
            except Exception as e:  # noqa: BLE001
                print(f"{name} tc={tc} u={u}: skipped "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            guard.await_good_window(f"{name} tc={tc}")
            sec, diffs = measure_rate(jfn, st0, x, trials=8)
            sp = (max(diffs) - min(diffs)) / sec * 100
            print(f"{name:12s} tc={tc:4d} u={u:2d}: "
                  f"{c * t / sec / 1e9:6.2f} GS/s (spread {sp:.0f}%)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
