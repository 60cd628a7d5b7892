"""Cascade strategy round 2: stage grouping inside one jit.

group=4: one kernel, 16-row carry (the slow current sos_bank_q)
group=2: two kernels back-to-back in one jit, 8-row carries
group=1: four kernels in one jit, 4-row carries
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
    from idsp_tpu.filters import biquad
    from idsp_tpu.filters import biquad_pallas as bp
    from idsp_tpu.profiling import sync

    print("device:", jax.devices()[0], flush=True)
    c, t = 512, 32768
    cs = c // 128
    rng = np.random.default_rng(0)
    xs3 = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, cs, 128),
                     dtype=np.int64).astype(np.int32)
    )
    ba5 = biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass())
    bas = tuple(int(v) for v in np.stack(
        [biquad.quantize_ba(ba5, 29)] * 4).reshape(-1))

    def make(group):
        @jax.jit
        def run(st_in, xs3):
            # st_in: (16, cs, 128); process stages in groups
            y = xs3
            outs = []
            for g0 in range(0, 4, group):
                rows = st_in[4 * g0: 4 * (g0 + group)]

                def body(carry, x0, _extras, g0=g0):
                    cur = x0
                    rs = []
                    for n in range(group):
                        ba_n = bas[5 * (g0 + n): 5 * (g0 + n) + 5]
                        x1, x2 = carry[4 * n], carry[4 * n + 1]
                        y1, y2 = carry[4 * n + 2], carry[4 * n + 3]
                        acc = bp._mac5_q(ba_n, cur, x1, x2, y1, y2)
                        y0 = bp._shr_i64_to_i32(acc[0], acc[1], 29)
                        rs.extend([cur, x1, y0, y1])
                        cur = y0
                    return jnp.stack(rs), cur

                y, st_out = bp._bank_call(
                    bp._seq_bank_kernel(body), rows, y,
                    time_chunk=512, interpret=False,
                )
                outs.append(st_out)
            return y, jnp.concatenate(outs, axis=0)

        return run

    st_in = jnp.zeros((16, cs, 128), jnp.int32)

    ref = None
    for group in (4, 2, 1):
        run = make(group)
        y, _ = run(st_in, xs3)
        if ref is None:
            ref = np.asarray(y)
        else:
            print(f"group={group} equal: "
                  f"{np.array_equal(ref, np.asarray(y))}", flush=True)
        sync(y)

        def timed(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = run(st_in, xs3)
            sync(out[0])
            return time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            d1 = min(timed(4), timed(4))
            d2 = min(timed(12), timed(12))
            best = min(best, (d2 - d1) / 8)
        print(f"group={group}: {best*1e3:8.3f} ms ({c*t/best/1e9:6.2f} GS/s)",
              flush=True)


if __name__ == "__main__":
    main()
