"""Fused channelizer at n=32768: does the sustained rate hold?

The XLA planes path dropped 9.2 -> 6.2 GS/s from n=16384 to 32768;
check the fused kernel's behavior at the same scale (134 MB/plane
working set) and the bf=128 block for comparison.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.pipelines import channelizer as chz
    from idsp_tpu.pipelines.channelizer_pallas import channelize_fused
    from idsp_tpu.profiling import SlowWindowGuard, measure_rate, sync

    m, taps = 1024, 8
    rng = np.random.default_rng(0)
    guard = SlowWindowGuard()

    for nfr in (16384, 32768):
        zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        st = chz.init_planes(m, taps)
        for bf in (256, 128):
            jfn = jax.jit(lambda s, a, b, bf=bf: channelize_fused(
                s, a, b, m=m, taps=taps, twiddle_dtype=jnp.bfloat16,
                block_frames=bf))
            out = jfn(st, zr, zi)
            sync(out)
            guard.await_good_window(f"n={nfr} bf={bf}")
            sec, diffs = measure_rate(lambda _s: jfn(st, zr, zi), None,
                                      trials=8, stateful=False)
            spread = (max(diffs) - min(diffs)) / sec * 100
            print(f"fused bf16 bf={bf} [n={nfr:5d}]  {sec * 1e6:9.1f} us"
                  f"  {nfr * m / sec / 1e9:6.2f} GS/s "
                  f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
