"""Pallas-grid DMA ceiling: pure copy and decimating-copy kernels.

The hbf cascade kernels run ~160-190 GB/s effective HBM (depth probe)
vs the 651 GB/s elementwise-stream peak.  Is that the Pallas grid's
DMA ceiling, or our parity/repack scratch choreography?  Measure:
  1. copy: y[block] = x[block]   (read+write, same shape)
  2. decim: y[block] = x[block] rows 0 mod 8 (read-dominated, 1/8 out)
  3. the same copy via plain XLA (jnp addition) for reference
at (131072, 1024) f32 across block sizes.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.profiling import SlowWindowGuard, measure_rate, sync

    t, c = 131072, 1024
    cs = c // 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, cs, 128)).astype(np.float32))
    guard = SlowWindowGuard()
    nbytes_in = t * c * 4

    def report(name, jfn, arg, nbytes):
        out = jfn(arg)
        sync(out)
        guard.await_good_window(name)
        sec, diffs = measure_rate(lambda _s: jfn(arg), None, trials=8,
                                  stateful=False)
        spread = (max(diffs) - min(diffs)) / sec * 100
        print(f"{name:28s} {sec * 1e6:9.1f} us  "
              f"{nbytes / sec / 1e9:6.1f} GB/s (spread {spread:.0f}%)",
              flush=True)

    for tc in (512, 2048):
        def copy_kernel(x_ref, y_ref):
            y_ref[...] = x_ref[...]

        walk = pl.BlockSpec((tc, cs, 128), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
        copy = jax.jit(lambda xx, tc=tc, walk=walk: pl.pallas_call(
            copy_kernel, grid=(t // tc,), in_specs=[walk],
            out_specs=walk,
            out_shape=jax.ShapeDtypeStruct((t, cs, 128), jnp.float32),
        )(xx))
        report(f"pallas copy tc={tc}", copy, x, 2 * nbytes_in)

        def dec_kernel(x_ref, y_ref, tc=tc):
            y_ref[...] = x_ref[...].reshape(tc // 8, 8, cs, 128)[:, 0]

        walk_out = pl.BlockSpec((tc // 8, cs, 128),
                                lambda i: (i, i * 0, i * 0),
                                memory_space=pltpu.VMEM)
        dec = jax.jit(lambda xx, tc=tc, walk=walk, walk_out=walk_out:
                      pl.pallas_call(
            dec_kernel, grid=(t // tc,), in_specs=[walk],
            out_specs=walk_out,
            out_shape=jax.ShapeDtypeStruct((t // 8, cs, 128),
                                           jnp.float32),
        )(xx))
        report(f"pallas dec8 copy tc={tc}", dec, x,
               nbytes_in + nbytes_in // 8)

    xla_copy = jax.jit(lambda xx: xx + 1.0)
    report("xla elementwise", xla_copy, x, 2 * nbytes_in)
    return 0


if __name__ == "__main__":
    sys.exit(main())
