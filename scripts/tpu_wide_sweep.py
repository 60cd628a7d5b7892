"""Wide-headline (c=1024) fastlo_fused parameter sweep.

bench.py's production-width config reuses the 512-channel tuning
(time_chunk=128, unroll=4) and measured 12.04 GS/s; the 1024-ch
whole-stack kernel reaches 14.7.  Sweep time_chunk/unroll/t for the
wide chain to find its own optimum (VERDICT r4 #5: target >= 15).
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

    c = 1024
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64)
        .astype(np.int32))

    for t in (32768, 65536):
        x = jnp.asarray(
            rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
            .astype(np.int32))
        for tc in (128, 256, 512):
            for unroll in (4, 8):
                def chain(state, x, tc=tc, unroll=unroll):
                    bq_iq, tails, phase0 = state
                    bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                        ba_q, bq_iq, tails, phase0, steps, x, 29,
                        time_chunk=tc, unroll=unroll)
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
                    print(f"tc={tc} unroll={unroll} t={t}: skipped "
                          f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                    continue
                sec, diffs = measure_rate(jfn, state, x, trials=6)
                lo, hi = min(diffs), max(diffs)
                spread = (hi - lo) / sec * 100
                print(f"wide c=1024 tc={tc:4d} unroll={unroll} t={t:6d}: "
                      f"{c * t / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
