"""Stage-by-stage timing of the headline DDC chain on the real chip.

Identifies where the fused chain loses time vs the sum of stages
(round-1 ROADMAP item 1 / round-2 VERDICT weak item 3).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, hbf
    from idsp_tpu.filters.biquad_pallas import df1_bank_q
    from idsp_tpu.ops.trig import cossin
    from idsp_tpu.profiling import measure_roundtrip, sync

    c = 512
    t = 32768
    iters = 10
    rng = np.random.default_rng(0)
    rt = measure_roundtrip()
    print(f"device={jax.devices()[0]} rt={rt*1e3:.1f}ms", flush=True)

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
    phase0 = jnp.zeros((c,), jnp.int32)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
            29,
        )
    )

    def timeit(name, fn, *args, per_block=True):
        out = fn(*args)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            sync(out)
            best = min(best, (time.perf_counter() - t0 - rt) / iters)
        print(f"{name:34s} {best*1e3:8.3f} ms/block "
              f"({c*t/best/1e9:6.2f} GS/s)", flush=True)
        return best

    # --- stage A: NCO mix ---
    @jax.jit
    def mix(x, steps, phase0):
        idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
            jnp.int32
        )
        phases = phase0[None, :] + steps[None, :] * idx[:, None]
        lo_re, lo_im = cossin(phases)
        xi = x[:, None]
        mi = fxp.q_apply(lo_re, xi, 32)
        mq = fxp.q_apply(-lo_im, xi, 32)
        return jnp.concatenate([mi, mq], axis=1)

    miq = mix(x, steps, phase0)
    sync(miq)
    timeit("A mix (cossin+apply+concat)", mix, x, steps, phase0)

    # --- stage B: biquad bank kernel ---
    bq0 = biquad.df1_init((2 * c,), jnp.int32)

    def bq(st, miq):
        return df1_bank_q(ba_q, st, miq, 29, time_chunk=512)

    timeit("B biquad pallas (t,1024)", bq, bq0, miq)
    for tc in (256, 1024, 2048):
        timeit(f"B biquad pallas tc={tc}",
               lambda st, m: df1_bank_q(ba_q, st, m, 29, time_chunk=tc),
               bq0, miq)

    # --- stage C: cast + transpose ---
    @jax.jit
    def castT(yiq):
        return yiq[:, :c].astype(jnp.float32).T, yiq[:, c:].astype(
            jnp.float32
        ).T

    timeit("C astype+transpose x2", castT, miq)

    # --- stage D: HBF cascade ---
    fi = jnp.asarray(rng.normal(size=(c, t)).astype(np.float32))
    dec0 = hbf.hbf_dec_cascade_init(3, (c,))

    def hb(st, fi):
        return hbf.hbf_dec_cascade(st, fi)

    timeit("D hbf dec8 (c,t) one comp", hb, dec0, fi)

    fiq = jnp.asarray(rng.normal(size=(2 * c, t)).astype(np.float32))
    dec0s = hbf.hbf_dec_cascade_init(3, (2 * c,))
    timeit("D hbf dec8 (2c,t) stacked", hb, dec0s, fiq)

    # --- full chains ---
    def make_chain(stacked_hbf: bool):
        def chain(state, x, steps):
            bq_iq, dec, phase0 = state
            idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
                jnp.int32
            )
            phases = phase0[None, :] + steps[None, :] * idx[:, None]
            lo_re, lo_im = cossin(phases)
            xi = x[:, None]
            mi = fxp.q_apply(lo_re, xi, 32)
            mq = fxp.q_apply(-lo_im, xi, 32)
            miq = jnp.concatenate([mi, mq], axis=1)
            bq_iq, yiq = df1_bank_q(ba_q, bq_iq, miq, 29, time_chunk=512)
            if stacked_hbf:
                fiq = yiq.astype(jnp.float32).T  # (2c, t)
                dec, ziq = hbf.hbf_dec_cascade(dec, fiq)
                out = ziq
            else:
                fi = yiq[:, :c].astype(jnp.float32).T
                fq = yiq[:, c:].astype(jnp.float32).T
                dec_i, dec_q = dec
                dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
                dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
                dec = (dec_i, dec_q)
                out = (zi, zq)
            return (bq_iq, dec, phase0 + steps * jnp.int32(t)), out

        return chain

    st_split = (
        biquad.df1_init((2 * c,), jnp.int32),
        (hbf.hbf_dec_cascade_init(3, (c,)),
         hbf.hbf_dec_cascade_init(3, (c,))),
        jnp.zeros((c,), jnp.int32),
    )
    st_stacked = (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (2 * c,)),
        jnp.zeros((c,), jnp.int32),
    )

    def bench_chain(name, chain_fn, st0, donate):
        if donate:
            fn = jax.jit(chain_fn, donate_argnums=(0,))
        else:
            fn = jax.jit(chain_fn)
        def fresh():
            # donation invalidates the argument buffers: hand the jit a
            # copy each trial
            return jax.tree.map(jnp.copy, st0) if donate else st0

        s, out = fn(fresh(), x, steps)
        sync(out)
        best = float("inf")
        for _ in range(3):
            s = fresh()
            sync(s)
            t0 = time.perf_counter()
            for _ in range(iters):
                s, out = fn(s, x, steps)
            sync(out)
            best = min(best, (time.perf_counter() - t0 - rt) / iters)
        print(f"{name:34s} {best*1e3:8.3f} ms/block "
              f"({c*t/best/1e9:6.2f} GS/s)", flush=True)

    bench_chain("FULL split-hbf", make_chain(False), st_split, False)
    bench_chain("FULL split-hbf donate", make_chain(False), st_split, True)
    bench_chain("FULL stacked-hbf donate", make_chain(True), st_stacked, True)

    # fused mix+biquad kernel + time-major HBF (no transpose)
    from idsp_tpu.filters.ddc_pallas import ddc_mix_df1_bank

    def chain_fused(state, x, steps):
        bq_iq, dec, phase0 = state
        bq_iq, phase0, yiq = ddc_mix_df1_bank(
            ba_q, bq_iq, phase0, steps, x, 29, time_chunk=512,
            out_dtype=jnp.float32,
        )
        dec, ziq = hbf.hbf_dec_cascade(dec, yiq, axis=0)
        return (bq_iq, dec, phase0), ziq

    st_fused = (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0),
        jnp.zeros((c,), jnp.int32),
    )
    bench_chain("FULL fused mix+bq, t-major hbf", chain_fused, st_fused,
                False)
    bench_chain("FULL fused donate", chain_fused, st_fused, True)


if __name__ == "__main__":
    main()
