"""Wide-headline sweep round 2: unroll=16, tc=64, x_layout variants.

Round 1 (tpu_wide_sweep.py): unroll=8 moved 12.1 -> 12.7 GS/s; tc and
t were flat.  Probe deeper unroll and the lane-replicated x operand.
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

    c, t = 1024, 32768
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64)
        .astype(np.int32))
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
        .astype(np.int32))

    for xl in ("replicate", "lanes"):
        for tc in (64, 128, 256):
            for unroll in (8, 16):
                if tc % unroll:
                    continue

                def chain(state, x, tc=tc, unroll=unroll, xl=xl):
                    bq_iq, tails, phase0 = state
                    bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                        ba_q, bq_iq, tails, phase0, steps, x, 29,
                        time_chunk=tc, unroll=unroll, x_layout=xl)
                    return (bq_iq, tails, phase0), y8

                state = (
                    biquad.df1_init((2 * c,), jnp.int32),
                    tuple(hbf1_tail_init(2 * c, mm) for mm in (5, 10, 23)),
                    jnp.zeros((c,), jnp.int32),
                )
                jfn = jax.jit(chain)
                try:
                    out = jfn(state, x)
                    sync(out)
                except Exception as e:  # noqa: BLE001
                    print(f"xl={xl} tc={tc} unroll={unroll}: skipped "
                          f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                    continue
                sec, diffs = measure_rate(jfn, state, x, trials=6)
                spread = (max(diffs) - min(diffs)) / sec * 100
                print(f"wide xl={xl:9s} tc={tc:4d} unroll={unroll:2d}: "
                      f"{c * t / sec / 1e9:6.2f} GS/s "
                      f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
