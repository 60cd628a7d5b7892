"""fastlo fused cascade at 512 LANES (256 real channels): tc sweep.

The suite's `fastlo mix+df1+hbf dec8 (one kernel)` row runs ch=c/2
real channels in c=512 lanes; isolated measurement shows tc=16/u=16 is
catastrophically bimodal at this width (2.97 GS/s median, one 20.8
trial) while the same tc at 1024 lanes is reliably 13.1.  Find the
per-width tuning.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad
    from idsp_tpu.filters.ddc_pallas import (
        fastlo_ddc_cascade_bank,
        hbf1_tail_init,
    )
    from idsp_tpu.profiling import measure_rate, sync

    t = 32768
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
        .astype(np.int32))

    ch = 256  # 512 lanes
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(ch,), dtype=np.int64)
        .astype(np.int32))
    for tc, unroll in ((16, 16), (32, 32), (64, 16), (64, 64),
                       (128, 4), (128, 16), (256, 8)):
        def chain(state, x, tc=tc, unroll=unroll):
            bq_iq, tails, phase0 = state
            bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                ba_q, bq_iq, tails, phase0, steps, x, 29,
                time_chunk=tc, unroll=unroll)
            return (bq_iq, tails, phase0), y8

        state = (
            biquad.df1_init((2 * ch,), jnp.int32),
            tuple(hbf1_tail_init(2 * ch, mm) for mm in (5, 10, 23)),
            jnp.zeros((ch,), jnp.int32),
        )
        jfn = jax.jit(chain)
        try:
            out = jfn(state, x)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"tc={tc} unroll={unroll}: skipped "
                  f"{type(e).__name__}: {str(e)[:80]}", flush=True)
            continue
        sec, diffs = measure_rate(jfn, state, x, trials=8)
        spread = (max(diffs) - min(diffs)) / sec * 100
        print(f"512-lane tc={tc:4d} unroll={unroll:2d}: "
              f"{ch * t / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
