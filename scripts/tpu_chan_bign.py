"""Channelizer XLA planes path at production frame counts.

The stage breakdown (tpu_chan_breakdown.py) showed every component
dispatch-floor-bound at n=1024-4096 (even a bare concat+cast costs
~450 us); rate scales with dispatch size.  Measure the full planes
path at n = 8192..32768 to find the sustained plateau.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.pipelines import channelizer as chz
    from idsp_tpu.profiling import measure_rate, sync

    m, taps = 1024, 8
    rng = np.random.default_rng(0)

    for nfr in (8192, 16384, 32768):
        zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        st = chz.init_planes(m, taps)
        ns = nfr * m
        for tw, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            jfn = jax.jit(lambda s, a, b, tw=tw: chz.channelize_planes(
                s, a, b, m=m, taps=taps, twiddle_dtype=tw))
            out = jfn(st, zr, zi)
            sync(out)
            sec, diffs = measure_rate(lambda _s: jfn(st, zr, zi), None,
                                      trials=6, stateful=False)
            lo, hi = min(diffs), max(diffs)
            spread = (hi - lo) / sec * 100
            print(f"full planes {name} [n={nfr}]  {sec * 1e6:9.1f} us  "
                  f"{ns / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
