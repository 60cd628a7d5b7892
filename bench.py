"""Headline benchmark: DDC chain throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star of 1 Gsample/s/chip on the
biquad(+HBF) DDC chain.

Current chain (round 1): fixed-point FM/DDC receiver — cossin DDS,
conjugate-product discriminator, atan2, Q32<30> DF1 deemphasis — over a
1024-channel bank; the biquad is a lax.scan over time with channels on
the vector lanes.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idsp_tpu.ops.trig import cossin
    from idsp_tpu.pipelines import fm_disc

    c = 1024
    t = 4096
    rng = np.random.default_rng(0)
    phases = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    re, im = cossin(phases)
    re, im = jax.block_until_ready((re, im))
    ba_q = jnp.asarray(fm_disc.deemphasis_coefficients(0.02))
    state = fm_disc.init_state((c,))

    def run(state, re, im):
        return fm_disc.fm_receiver(state, re, im, jnp.int32(12345), ba_q)

    # warmup/compile
    out = run(state, re, im)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        st, y = run(st, re, im)
    jax.block_until_ready((st, y))
    dt = time.perf_counter() - t0

    samples = c * t * iters
    rate = samples / dt
    baseline = 1e9  # north-star Gsample/s/chip
    print(
        json.dumps(
            {
                "metric": "ddc_chain_samples_per_s",
                "value": rate,
                "unit": "samples/s",
                "vs_baseline": rate / baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
