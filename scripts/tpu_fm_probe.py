"""On-device sweep of fm_disc_bank (one-kernel FM receiver) configs.

The suite row recorded ~0.9 GS/s vs 7.8 GS/s for the composed XLA
path (benches/RESULTS.md) — 9x slower.  Hypotheses: (a) trig_sub=8
sub-passes add loop overhead, (b) the in-kernel atan2 select/limb
chain at FULL rate is simply ~1.5x XLA's fused cost and the kernel
saves only ~4 B/sample of HBM traffic, so it can never win here
(unlike the DDC whole-stack kernel, whose atan2 runs post-decimation
at 1/16 rate).  This probe distinguishes them.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from idsp_tpu.filters.fm_pallas import fm_disc_bank  # noqa: E402
from idsp_tpu.ops.trig import cossin  # noqa: E402
from idsp_tpu.pipelines import fm_disc  # noqa: E402
from idsp_tpu.profiling import sync  # noqa: E402


def main():
    c, t = 512, 32768
    rng = np.random.default_rng(7)
    ph = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64)
        .astype(np.int32)
    )
    re, im = cossin(ph)
    ba = np.asarray(fm_disc.deemphasis_coefficients(0.02))
    st0 = fm_disc.init_state((c,))

    def bench(label, fn):
        try:
            out = fn(st0, re, im)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"{label:42s} SKIP: {str(e)[:90]}", flush=True)
            return

        def timed(k):
            t0 = time.perf_counter()
            st = st0
            for _ in range(k):
                st, y = fn(st, re, im)
            sync(y)
            return time.perf_counter() - t0

        best = float("inf")
        for _ in range(5):
            d1 = min(timed(4), timed(4))
            d2 = min(timed(12), timed(12))
            dt = (d2 - d1) / 8
            if dt > 0:
                best = min(best, dt)
        rate = c * t / best / 1e9
        print(f"{label:42s} {rate:8.2f} GS/s", flush=True)

    ba_j = jnp.asarray(ba)
    bench(
        "composed XLA (fm_receiver)",
        jax.jit(lambda st, r, i: fm_disc.fm_receiver(
            st, r, i, jnp.int32(12345), ba_j)),
    )
    from idsp_tpu.filters.fm_pallas import fm_effective_time_chunk

    t_len, c_len = 32768, 512  # matches the fixture above
    for tc in (256, 512, 1024):
        for ts in (8, 16, 32, 64, 128):
            if ts > tc:
                continue
            # the EFFECTIVE chunk after the VMEM clamp (ADVICE r3:
            # requested tc can silently alias configs) — from the
            # kernel module's own budget, never re-derived
            eff = fm_effective_time_chunk(c_len, t_len, tc, trig_sub=ts)
            bench(
                f"one kernel tc={tc}(eff={eff}) trig_sub={ts}",
                lambda st, r, i, tc=tc, ts=ts: fm_disc_bank(
                    ba, st, r, i, 12345, time_chunk=tc, trig_sub=ts
                ),
            )
    for ts in (32, 128, 512):
        bench(
            f"one kernel FAST atan tc=1024 trig_sub={ts}",
            lambda st, r, i, ts=ts: fm_disc_bank(
                ba, st, r, i, 12345, time_chunk=1024, trig_sub=ts,
                angle="fast",
            ),
        )


if __name__ == "__main__":
    main()
