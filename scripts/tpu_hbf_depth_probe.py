"""Decompose the hbf dec cascade kernel's cost by stage depth.

The kernel reaches ~40-42 GS/s vs a 144 GS/s HBM bound (28%,
ROOFLINE.md).  Measure depth=1/2/3 cascades at (131072, 1024) and a
time_chunk sweep: the depth increments separate per-stage VMEM-repack
cost from the input-DMA floor, and the depth-1 bound (6 B/S -> ~108
GS/s) calibrates how much of the gap is the FIR itself.
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
    from idsp_tpu.profiling import SlowWindowGuard, measure_rate, sync

    t, c = 131072, 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    guard = SlowWindowGuard()

    for depth in (1, 2, 3):
        for tc in (512, 1024, 2048):
            jfn = jax.jit(lambda st, xs, tc=tc: hbf_dec_cascade_bank(
                st, xs, time_chunk=tc))
            st0 = hbf.hbf_dec_cascade_init(depth, (c,), axis=0)
            try:
                out = jfn(st0, x)
                sync(out)
            except Exception as e:  # noqa: BLE001
                print(f"depth={depth} tc={tc}: skipped "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                continue
            guard.await_good_window(f"depth={depth} tc={tc}")
            sec, diffs = measure_rate(jfn, st0, x, trials=8)
            spread = (max(diffs) - min(diffs)) / sec * 100
            print(f"hbf dec depth={depth} tc={tc:5d}: "
                  f"{sec * 1e6:9.1f} us  {t * c / sec / 1e9:6.2f} GS/s "
                  f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
