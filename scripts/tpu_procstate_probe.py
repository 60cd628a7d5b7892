"""Reproduce the long-process slowdown of the tc=16 fastlo kernel.

Observed (2026-08-20): fastlo_ddc_cascade_bank at tc=16/unroll=16
measures ~13 GS/s (c=512) in FRESH processes (bench.py, confirm
probes) but 1.5-2.8 GS/s in the long-running suite/roofline processes
— reproducibly, across runs, while tc=128 configs and df1 banks stay
fast in the same processes (the slow-window canary passed seconds
before the slow measurements).

This probe measures the kernel fresh, then applies candidate process
states one at a time and re-measures:
  1. ~2.5 GB of live device arrays (suite holds hundreds of buffers);
  2. ~40 additional live compiled executables (jitted trivial fns on
     distinct shapes);
  3. a trace of the kernel via the roofline static counter
     (idsp_tpu.roofline.count_ops).
"""

import sys
import time

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

    t, c = 32768, 512
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
        .astype(np.int32))
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64)
        .astype(np.int32))

    def measure(tag, tc, unroll):
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
        out = jfn(state, x)
        sync(out)
        sec, diffs = measure_rate(jfn, state, x, trials=6)
        spread = (max(diffs) - min(diffs)) / sec * 100
        print(f"{tag:36s} tc={tc:3d}/u={unroll:2d}: "
              f"{c * t / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
              flush=True)

    print(f"t0={time.strftime('%H:%M:%S')}", flush=True)
    measure("fresh", 16, 16)
    measure("fresh", 128, 4)

    # state 1: ~2.5 GB of live device arrays
    hoard = []
    for i in range(40):
        hoard.append(jnp.asarray(
            rng.normal(size=(4096, 4096)).astype(np.float32)) + i)
    sync(hoard[-1])
    measure("after 2.5 GB live arrays", 16, 16)

    # state 2: ~40 more live executables
    keep = []
    for i in range(40):
        f = jax.jit(lambda v, i=i: v * (i + 2) + 1)
        z = jnp.zeros((8 + i, 128), jnp.float32)
        keep.append((f, f(z)))
    sync(keep[-1][1])
    measure("after 40 extra executables", 16, 16)

    # state 3: roofline static-counter trace of this kernel
    try:
        from idsp_tpu.roofline import count_ops

        def chain16(state, x):
            bq_iq, tails, phase0 = state
            bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                ba_q, bq_iq, tails, phase0, steps, x, 29,
                time_chunk=16, unroll=16)
            return (bq_iq, tails, phase0), y8

        state = (
            biquad.df1_init((2 * c,), jnp.int32),
            tuple(hbf1_tail_init(2 * c, mm) for mm in (5, 10, 23)),
            jnp.zeros((c,), jnp.int32),
        )
        count_ops(chain16, state, x)
        print("# counted ops via roofline.count_ops", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"# count_ops failed: {str(e)[:120]}", flush=True)
    measure("after count_ops trace", 16, 16)
    measure("after count_ops trace", 128, 4)

    del hoard, keep
    measure("after freeing", 16, 16)
    return 0


if __name__ == "__main__":
    sys.exit(main())
