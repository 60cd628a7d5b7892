"""Probe: sub-chunked in-kernel mix (ddc_mix_df1_bank mix_sub sweep)
vs the split-chain champion (tpu_split_probe.py: 4.40 ms)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, hbf
    from idsp_tpu.filters.ddc_pallas import ddc_mix_df1_bank

    c = 512
    t = 32768
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}", flush=True)

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

    def diff_time(run, state):
        s = run(state)
        _ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))

        def timed(iters):
            t0 = time.perf_counter()
            cur = state
            for _ in range(iters):
                cur = run(cur)
            leaf = jax.tree.leaves(cur)[0]
            _ = float(jnp.sum(leaf.astype(jnp.float32)))
            return time.perf_counter() - t0

        n1, n2 = 5, 20
        best = float("inf")
        for _ in range(3):
            d1 = timed(n1)
            d2 = timed(n2)
            best = min(best, max((d2 - d1) / (n2 - n1), 1e-9))
        return best

    def probe(name, run, state):
        try:
            secs = diff_time(run, state)
            print(f"{name:44s} {secs*1e3:8.3f} ms "
                  f"({c*t/secs/1e9:6.2f} GS/s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name:44s} FAIL {type(e).__name__}: {msg}", flush=True)

    st0 = (biquad.df1_init((2 * c,), jnp.int32), jnp.zeros((c,), jnp.int32))
    for tc in (256, 512):
        for sub in (16, 32, 64):
            @jax.jit
            def front(st, tc=tc, sub=sub):
                bq_iq, phase0 = st
                bq_iq, phase0, yiq = ddc_mix_df1_bank(
                    ba_q, bq_iq, phase0, steps, x, 29, time_chunk=tc,
                    mix_sub=sub, out_dtype=jnp.float32,
                )
                return (bq_iq, phase0)

            probe(f"fused sub-mix tc={tc} sub={sub}", front, st0)

    # full chain with the best-looking configs
    for tc, sub in ((256, 32), (512, 32), (512, 64)):
        @jax.jit
        def chain_fused(st, tc=tc, sub=sub):
            bq_iq, dec, phase0 = st
            bq_iq, phase0, yiq = ddc_mix_df1_bank(
                ba_q, bq_iq, phase0, steps, x, 29, time_chunk=tc,
                mix_sub=sub, out_dtype=jnp.float32,
            )
            dec, ziq = hbf.hbf_dec_cascade(dec, yiq, axis=0)
            return (bq_iq, dec, phase0)

        stf = (
            biquad.df1_init((2 * c,), jnp.int32),
            hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0),
            jnp.zeros((c,), jnp.int32),
        )
        probe(f"FULL fused tc={tc} sub={sub} + hbf", chain_fused, stf)


if __name__ == "__main__":
    main()
