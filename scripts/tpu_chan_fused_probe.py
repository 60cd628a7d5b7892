"""On-device probe: fused one-kernel channelizer vs the XLA planes path.

Correctness first (tolerance vs channelize_planes + bin-power gate on a
tone), then rates at m=1024 over n = 4096..16384 frames for bf16/f32
twiddles and a couple of block sizes.
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
    from idsp_tpu.profiling import measure_rate, sync

    m, taps = 1024, 8
    rng = np.random.default_rng(0)

    # correctness: tone + noise, fused vs planes (f32 tw), plus gate
    nfr = 1024
    ch = 100
    x = chz.tone(ch / m, m * nfr)
    zr, zi = chz.planes_from_stream(x[..., 0], x[..., 1], m)
    st = chz.init_planes(m, taps)
    _, yr0, yi0 = jax.jit(
        lambda s, a, b: chz.channelize_planes(s, a, b, m=m, taps=taps)
    )(st, zr, zi)
    _, yr1, yi1 = jax.jit(
        lambda s, a, b: channelize_fused(s, a, b, m=m, taps=taps,
                                         twiddle_dtype=jnp.float32)
    )(st, zr, zi)
    a0 = np.asarray(yr0, np.float64) + 1j * np.asarray(yi0, np.float64)
    a1 = np.asarray(yr1, np.float64) + 1j * np.asarray(yi1, np.float64)
    scale = np.abs(a0).max()
    err = np.abs(a1 - a0).max() / scale
    print(f"fused f32 vs planes rel err: {err:.2e}", flush=True)
    p = (np.abs(a1) ** 2)[128:].mean(axis=0)
    k = int(np.argmax(p))
    others = np.delete(p, k)
    print(f"bin gate: argmax={k} (want {ch}) ratio="
          f"{p[k] / others.max():.1f}x", flush=True)

    _, yr2, yi2 = jax.jit(
        lambda s, a, b: channelize_fused(s, a, b, m=m, taps=taps,
                                         twiddle_dtype=jnp.bfloat16)
    )(st, zr, zi)
    a2 = np.asarray(yr2, np.float64) + 1j * np.asarray(yi2, np.float64)
    p2 = (np.abs(a2) ** 2)[128:].mean(axis=0)
    k2 = int(np.argmax(p2))
    print(f"bf16 bin gate: argmax={k2} ratio="
          f"{p2[k2] / np.delete(p2, k2).max():.1f}x  rel err vs f32 "
          f"path: {np.abs(a2 - a0).max() / scale:.2e}", flush=True)

    # rates
    for nfr in (4096, 8192, 16384):
        zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        st = chz.init_planes(m, taps)
        ns = nfr * m
        for tw, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            for bf in (128, 256, 512):
                def run(s, a, b, tw=tw, bf=bf):
                    return channelize_fused(s, a, b, m=m, taps=taps,
                                            twiddle_dtype=tw,
                                            block_frames=bf)

                jfn = jax.jit(run)
                try:
                    out = jfn(st, zr, zi)
                    sync(out)
                except Exception as e:  # noqa: BLE001
                    print(f"fused {name} bf={bf} [n={nfr}]: skipped "
                          f"{type(e).__name__}: {str(e)[:100]}",
                          flush=True)
                    continue
                sec, diffs = measure_rate(lambda _s: jfn(st, zr, zi),
                                          None, trials=6, stateful=False)
                spread = (max(diffs) - min(diffs)) / sec * 100
                print(f"fused {name} bf={bf} [n={nfr:5d}]  "
                      f"{sec * 1e6:9.1f} us  {ns / sec / 1e9:6.2f} GS/s "
                      f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
