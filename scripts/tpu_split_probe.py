"""Component probe of the SPLIT DDC chain (bench.py headline), after
the tuple-carry kernel fix.  Finds the fastest composition:

  XLA mix (cossin select + q_apply)  ->  df1_bank_q (tc, out_dtype)
  ->  HBF dec8 (time-major vs lane-major+transpose).

Iteration differencing, same methodology as bench.py.
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

    def mix(phase0):
        idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
            jnp.int32
        )
        phases = phase0[None, :] + steps[None, :] * idx[:, None]
        lo_re, lo_im = cossin(phases)
        xi = x[:, None]
        mi = fxp.q_apply(lo_re, xi, 32)
        mq = fxp.q_apply(-lo_im, xi, 32)
        return jnp.concatenate([mi, mq], axis=1)  # (t, 2c)

    # 1. mix alone
    @jax.jit
    def mix_only(phase0):
        miq = mix(phase0)
        return phase0 + steps, miq

    probe("mix alone (cossin+q_apply, XLA)", lambda s: mix_only(s)[0],
          jnp.zeros((c,), jnp.int32))

    # 2. df1 bank alone on (t, 2c), various tc / out dtypes
    miq0 = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t, 2 * c),
                     dtype=np.int64).astype(np.int32)
    )
    for tc in (256, 512, 1024):
        for od, tag in ((None, "i32"), (jnp.float32, "f32")):
            @jax.jit
            def bank(st, tc=tc, od=od):
                st, ys = df1_bank_q(ba_q, st, miq0, 29, time_chunk=tc,
                                    out_dtype=od)
                return st

            probe(f"df1 bank 1024-lane tc={tc} out={tag}", bank,
                  biquad.df1_init((2 * c,), jnp.int32))

    # 3. full split, time-major HBF, f32 from kernel epilogue
    @jax.jit
    def chain_tmajor(st):
        bq_iq, dec, phase0 = st
        miq = mix(phase0)
        bq_iq, yiq = df1_bank_q(ba_q, bq_iq, miq, 29, time_chunk=512,
                                out_dtype=jnp.float32)
        dec, ziq = hbf.hbf_dec_cascade(dec, yiq, axis=0)
        return (bq_iq, dec, phase0 + steps * jnp.int32(t))

    probe("FULL split t-major f32-epilogue", chain_tmajor, (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0),
        jnp.zeros((c,), jnp.int32),
    ))

    # 4. control: lane-major + transpose (old bench pallas mode)
    @jax.jit
    def chain_lmajor(st):
        bq_iq, dec_i, dec_q, phase0 = st
        miq = mix(phase0)
        bq_iq, yiq = df1_bank_q(ba_q, bq_iq, miq, 29, time_chunk=512)
        fi = yiq[:, :c].astype(jnp.float32).T
        fq = yiq[:, c:].astype(jnp.float32).T
        dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
        dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
        return (bq_iq, dec_i, dec_q, phase0 + steps * jnp.int32(t))

    probe("FULL split l-major transpose (control)", chain_lmajor, (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (c,)),
        hbf.hbf_dec_cascade_init(3, (c,)),
        jnp.zeros((c,), jnp.int32),
    ))


if __name__ == "__main__":
    main()
