"""Experiment: SOS cascade kernel strategy.

The in-kernel all-stages cascade regressed to 250 MS/s in the suite
(16-row carry, possibly spilling).  Compare:
  a) in-kernel cascade, unroll=2 (current sos_bank_q)
  b) in-kernel cascade, unroll=1
  c) stage-major loop of df1_bank_q launches (bit-identical semantics)
Also validate + time the new lowpass bank kernel on device.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, lowpass
    from idsp_tpu.filters import biquad_pallas as bp
    from idsp_tpu.filters.lowpass_pallas import lowpass_bank
    from idsp_tpu.profiling import sync

    print("device:", jax.devices()[0], flush=True)
    c, t = 512, 32768
    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, c), dtype=np.int64).astype(
            np.int32
        )
    )
    ba5 = biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass())
    bas = np.stack([biquad.quantize_ba(ba5, 29)] * 4)

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)

        def timed(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            sync(out)
            return time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            d1 = min(timed(5), timed(5))
            d2 = min(timed(15), timed(15))
            best = min(best, (d2 - d1) / 10)
        print(f"{name:40s} {best*1e3:8.3f} ms ({c*t/best/1e9:6.2f} GS/s)",
              flush=True)

    states = [biquad.df1_init((c,), jnp.int32) for _ in range(4)]

    # (a) current
    def run_a(xs):
        _, y = bp.sos_bank_q(bas, states, xs, 29, time_chunk=512)
        return y

    # (c) stage loop of df1 bank launches
    def run_c(xs):
        y = xs
        for i in range(4):
            _, y = bp.df1_bank_q(jnp.asarray(bas[i]), states[i], y, 29,
                                 time_chunk=512)
        return y

    ya = run_a(xs)
    yc = run_c(xs)
    print("a == c:", np.array_equal(np.asarray(ya), np.asarray(yc)),
          flush=True)
    timeit("sos in-kernel (unroll=2, current)", run_a, xs)
    timeit("sos stage-loop of df1 banks", run_c, xs)

    # (b) unroll=1 via a patched wrapper
    orig = bp._seq_bank_kernel

    def k1(body, unroll=2):
        return orig(body, unroll=1)

    bp._seq_bank_kernel = k1
    bp._sos_bank_q_impl._clear_cache()

    def run_b(xs):
        _, y = bp.sos_bank_q(bas, states, xs, 29, time_chunk=512)
        return y

    yb = run_b(xs)
    print("b == a:", np.array_equal(np.asarray(yb), np.asarray(ya)),
          flush=True)
    timeit("sos in-kernel (unroll=1)", run_b, xs)
    bp._seq_bank_kernel = orig
    bp._sos_bank_q_impl._clear_cache()

    # lowpass bank: validate + time
    for n, k in ((1, lowpass.gains1(0.01)), (2, lowpass.gains2(0.01))):
        st = lowpass.init(n, (c,))
        st_ref, ys_ref = lowpass.block(jnp.asarray(k), st, xs)
        st_pl, ys_pl = lowpass_bank(k, st, xs, time_chunk=512)
        ok = np.array_equal(np.asarray(ys_pl), np.asarray(ys_ref))
        print(f"lowpass{n} bank bit-exact: {ok}", flush=True)

        def run_lp(xs, k=k, st=st):
            return lowpass_bank(k, st, xs, time_chunk=512)[1]

        timeit(f"lowpass{n} bank (pallas)", run_lp, xs)


if __name__ == "__main__":
    main()
