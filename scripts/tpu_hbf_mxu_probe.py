"""Banded-MXU hbf cascade vs the shift-based kernel, on device.

Correctness (tolerance vs the XLA cascade) first, then rates at
(131072, 1024) across block sizes, against the shift kernel's 42 GS/s
and the ~147 GS/s HBM-bound model.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.filters import hbf
    from idsp_tpu.filters.hbf_pallas import (
        hbf_dec_cascade_bank,
        hbf_dec_cascade_mxu,
    )
    from idsp_tpu.profiling import SlowWindowGuard, measure_rate, sync

    rng = np.random.default_rng(0)
    guard = SlowWindowGuard()

    # correctness on device
    t0, c0 = 4096, 1024
    xs = jnp.asarray(rng.normal(size=(t0, c0)).astype(np.float32))
    _, y_ref = jax.jit(lambda st, x: hbf.hbf_dec_cascade(
        st, x, axis=0))(hbf.hbf_dec_cascade_init(3, (c0,), axis=0), xs)
    for prec in ("split3", "highest", "default"):
        _, y_m = jax.jit(lambda st, x, p=prec: hbf_dec_cascade_mxu(
            st, x, block=512, precision=p))(
            hbf.hbf_dec_cascade_init(3, (c0,), axis=0), xs)
        sc = float(jnp.abs(y_ref).max())
        d = float(jnp.abs(y_m - y_ref).max())
        print(f"mxu vs xla dmax ({prec}): {d / sc:.2e} rel",
              flush=True)

    t, c = 131072, 1024
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))

    jref = jax.jit(lambda st, xx: hbf_dec_cascade_bank(
        st, xx, time_chunk=512))
    st0 = hbf.hbf_dec_cascade_init(3, (c,), axis=0)
    out = jref(st0, x)
    sync(out)
    guard.await_good_window("shift kernel")
    sec, diffs = measure_rate(jref, st0, x, trials=8)
    print(f"shift kernel tc=512     : {sec * 1e6:9.1f} us  "
          f"{t * c / sec / 1e9:6.2f} GS/s "
          f"(spread {(max(diffs) - min(diffs)) / sec * 100:.0f}%)",
          flush=True)

    for b, prec in ((128, "split3"), (256, "split3"),
                    (512, "split3"), (256, "default")):
        jfn = jax.jit(lambda st, xx, b=b, p=prec: hbf_dec_cascade_mxu(
            st, xx, block=b, precision=p))
        try:
            out = jfn(st0, x)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"mxu block={b}: skipped {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            continue
        guard.await_good_window(f"mxu b={b}")
        sec, diffs = measure_rate(jfn, st0, x, trials=8)
        print(f"mxu cascade b={b:4d} {prec:7s}: {sec * 1e6:9.1f} us  "
              f"{t * c / sec / 1e9:6.2f} GS/s "
              f"(spread {(max(diffs) - min(diffs)) / sec * 100:.0f}%)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
