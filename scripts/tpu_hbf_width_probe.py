"""Why is the suite's `hbf dec8 cascade (pallas)` row ~20x under the
roofline's measurement of the same kernel?

Suite config: (32768, 512) input built as `x_hbf.T` (eager transpose
of a (c, t) array).  Roofline config: (32768, 1024) built directly.
Probe the axes separately: width 512 vs 1024, directly-built vs
transposed input buffer, and time_chunk.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.filters import hbf
    from idsp_tpu.filters.hbf_pallas import hbf_dec_cascade_bank
    from idsp_tpu.profiling import measure_rate, sync

    t = 32768
    rng = np.random.default_rng(0)

    for c in (512, 1024):
        x_direct = jnp.asarray(
            rng.normal(size=(t, c)).astype(np.float32))
        x_t = jnp.asarray(
            rng.normal(size=(c, t)).astype(np.float32)).T
        for src, x in (("direct", x_direct), ("transposed", x_t)):
            for tc in (512, 256):
                run = jax.jit(
                    lambda st, xs, tc=tc: hbf_dec_cascade_bank(
                        st, xs, time_chunk=tc))

                st0 = hbf.hbf_dec_cascade_init(3, (c,), axis=0)
                try:
                    out = run(st0, x)
                    sync(out)
                except Exception as e:  # noqa: BLE001
                    print(f"c={c} {src} tc={tc}: skipped "
                          f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                    continue
                sec, diffs = measure_rate(run, st0, x, trials=6)
                spread = (max(diffs) - min(diffs)) / sec * 100
                print(f"hbf dec8 c={c:4d} {src:10s} tc={tc:3d}: "
                      f"{t * c / sec / 1e9:6.2f} GS/s "
                      f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
