"""Locate the slow stage of the fused DDC chain (bench.py regression:
4.06 GS/s split-path -> 0.79 GS/s).  Each probe is failure-isolated.

Times with iteration differencing (same methodology as bench.py).
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
    from idsp_tpu.filters.ddc_pallas import ddc_mix_df1_bank
    from idsp_tpu.ops.trig import cossin

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
            print(f"{name:40s} {secs*1e3:8.3f} ms "
                  f"({c*t/secs/1e9:6.2f} GS/s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name:40s} FAIL {type(e).__name__}: {msg}", flush=True)

    # 1. fused kernel alone at several time chunks
    st0 = (biquad.df1_init((2 * c,), jnp.int32), jnp.zeros((c,), jnp.int32))
    for tc in (64, 128, 256):
        for dt, tag in ((jnp.float32, "f32"), (jnp.int32, "i32")):
            @jax.jit
            def front(st, tc=tc, dt=dt):
                bq_iq, phase0 = st
                bq_iq, phase0, yiq = ddc_mix_df1_bank(
                    ba_q, bq_iq, phase0, steps, x, 29, time_chunk=tc,
                    out_dtype=dt,
                )
                return (bq_iq, phase0)

            probe(f"fused mix+DF1 tc={tc} ({tag} out)", front, st0)

    # 2. time-major HBF alone on (t, 2c) f32
    yiq = jnp.asarray(rng.normal(size=(t, 2 * c)).astype(np.float32))

    @jax.jit
    def hbf_t(dec):
        dec, z = hbf.hbf_dec_cascade(dec, yiq, axis=0)
        return dec

    probe("hbf dec8 time-major (t,2c)", hbf_t,
          hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0))

    # 2b. lane-major control on (2c, t)
    fiq = jnp.asarray(rng.normal(size=(2 * c, t)).astype(np.float32))

    @jax.jit
    def hbf_l(dec):
        dec, z = hbf.hbf_dec_cascade(dec, fiq)
        return dec

    probe("hbf dec8 lane-major (2c,t)", hbf_l,
          hbf.hbf_dec_cascade_init(3, (2 * c,)))

    # 3. full fused chain at the best tc
    for tc in (128, 256):
        @jax.jit
        def chain_fused(st, tc=tc):
            bq_iq, dec, phase0 = st
            bq_iq, phase0, yiq = ddc_mix_df1_bank(
                ba_q, bq_iq, phase0, steps, x, 29, time_chunk=tc,
                out_dtype=jnp.float32,
            )
            dec, ziq = hbf.hbf_dec_cascade(dec, yiq, axis=0)
            return (bq_iq, dec, phase0)

        stf = (
            biquad.df1_init((2 * c,), jnp.int32),
            hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0),
            jnp.zeros((c,), jnp.int32),
        )
        probe(f"FULL fused tc={tc} + t-major hbf", chain_fused, stf)

    # 4. control: the old split chain (pallas mode of bench.py)
    @jax.jit
    def chain_split(st):
        bq_iq, dec_i, dec_q, phase0 = st
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
        fi = yiq[:, :c].astype(jnp.float32).T
        fq = yiq[:, c:].astype(jnp.float32).T
        dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
        dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
        return (bq_iq, dec_i, dec_q, phase0 + steps * jnp.int32(t))

    sts = (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (c,)),
        hbf.hbf_dec_cascade_init(3, (c,)),
        jnp.zeros((c,), jnp.int32),
    )
    probe("FULL split (pallas mode control)", chain_split, sts)


if __name__ == "__main__":
    main()
