"""df1_bank_q chunk/unroll sweep: does the fully-unrolled chunk help
the flagship integer kernel the way it helped the fused headline?

Roofline has df1_bank_q at 43% of its issue bound (recurrence
latency); the headline chain moved 12.1 -> 15.3 GS/s at c=1024 with
tc=32/unroll=32 (no fori loop).  Sweep the same axes here, with a
bit-exactness check vs the canonical config first.
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
    from idsp_tpu.filters.biquad_pallas import df1_bank_q
    from idsp_tpu.profiling import measure_rate, sync

    t, c = 32768, 1024
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    xs = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t, c), dtype=np.int64)
        .astype(np.int32))
    st0 = biquad.df1_init((c,), jnp.int32)

    # bit-exactness: the kernel is documented bit-identical to the scan
    # for ANY chunking; spot-check tc=32/u=32 vs tc=512/u=2 on device.
    _, y_ref = jax.jit(lambda s, x: df1_bank_q(
        ba_q, s, x, 29, time_chunk=512))(st0, xs)
    _, y_32 = jax.jit(lambda s, x: df1_bank_q(
        ba_q, s, x, 29, time_chunk=32, unroll=32))(st0, xs)
    eq = bool(jnp.all(y_ref == y_32))
    print(f"tc=32/u=32 bit-eq vs tc=512/u=2: {'OK' if eq else 'MISMATCH'}",
          flush=True)

    for tc, unroll in ((512, 2), (512, 4), (128, 8), (64, 16),
                       (32, 32), (64, 64), (16, 16)):
        def run(s, x, tc=tc, unroll=unroll):
            return df1_bank_q(ba_q, s, x, 29, time_chunk=tc,
                              unroll=unroll)

        jfn = jax.jit(run)
        try:
            out = jfn(st0, xs)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"tc={tc} unroll={unroll}: skipped "
                  f"{type(e).__name__}: {str(e)[:80]}", flush=True)
            continue
        sec, diffs = measure_rate(jfn, st0, xs, trials=8)
        spread = (max(diffs) - min(diffs)) / sec * 100
        print(f"df1_bank_q c={c} tc={tc:4d} unroll={unroll:2d}: "
              f"{t * c / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
