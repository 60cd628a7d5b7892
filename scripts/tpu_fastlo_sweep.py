#!/usr/bin/env python
"""Sweep time_chunk x unroll for the one-kernel fast-LO DDC chain on
the real chip; prints ms/block and GS/s per config.

Run standalone in the background (never kill mid-compile — wedges the
axon tunnel)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad
    from idsp_tpu.filters.ddc_pallas import (
        fastlo_ddc_cascade_bank, hbf1_tail_init,
    )
    from idsp_tpu.filters import hbf

    print("device:", jax.devices()[0], flush=True)
    c, t = 512, 32768
    c2 = 2 * c
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64).astype(
            np.int32
        )
    )
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64).astype(
            np.int32
        )
    )
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
            29,
        )
    )
    taps3 = (hbf.HBF_TAPS[2], hbf.HBF_TAPS[1], hbf.HBF_TAPS[0])

    for tc in (64, 128, 256):
        for unroll in (2, 4, 8):
          for layout in (("replicate", "lanes") if tc % 128 == 0
                         else ("replicate",)):
            try:
                def run(st, xx):
                    bq, tails, ph = st
                    bq, tails, ph, y8 = fastlo_ddc_cascade_bank(
                        ba_q, bq, tails, ph, steps, xx, 29, taps=taps3,
                        time_chunk=tc, unroll=unroll, x_layout=layout,
                    )
                    return (bq, tails, ph), y8

                st = (
                    biquad.df1_init((c2,), jnp.int32),
                    tuple(hbf1_tail_init(c2, len(tv)) for tv in taps3),
                    jnp.zeros((c,), jnp.int32),
                )
                s, y = run(st, x)
                _ = float(jnp.sum(y))

                def timed(k):
                    t0 = time.perf_counter()
                    ss = st
                    for _ in range(k):
                        ss, yy = run(ss, x)
                    _ = float(jnp.sum(yy))
                    return time.perf_counter() - t0

                # median of wide-gap differences (round-4 fix: min-
                # selection keeps jitter-lucky pairings and overstates
                # — see profiling.measure_rate)
                import statistics

                diffs = []
                for _ in range(5):
                    d1 = timed(10)
                    d2 = timed(60)
                    dt = (d2 - d1) / 50
                    if dt > 0:
                        diffs.append(dt)
                med = statistics.median(diffs)
                rate = c * t / med
                print(f"tc={tc:4d} unroll={unroll} x={layout:9s}"
                      f"  {med * 1e3:7.3f} ms  {rate / 1e9:6.2f} GS/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"tc={tc:4d} unroll={unroll} x={layout:9s}  FAILED:"
                      f" {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
