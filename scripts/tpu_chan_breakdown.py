"""Channelizer M=1024 stage breakdown: where do the 575us go?

The planes path (suite row: 3.3 GS/s sustained) sits at 7% of its
23.65 GS/s MXU bound (ROOFLINE.md).  Time each stage in isolation —
FIR only, cast+concat only, DFT matmul only — plus the full path at
frames={1024, 4096} to expose the dispatch floor, all under
`profiling.measure_rate` (median of wide-gap differences).

Run detached on the device; one line per config.
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
    coeff = np.asarray(chz.prototype(m, taps), np.float32).reshape(taps, m)
    w = chz._dft_matrix(m)
    wr32 = np.real(w).astype(np.float32)
    wi32 = np.imag(w).astype(np.float32)
    wblk32 = jnp.asarray(np.block([[wr32, wi32], [-wi32, wr32]]))
    wblk16 = wblk32.astype(jnp.bfloat16)

    def report(name, fn, *args, samples):
        jfn = jax.jit(fn)
        out = jfn(*args)
        sync(out)
        sec, diffs = measure_rate(lambda _s: jfn(*args), None, trials=6,
                                  stateful=False)
        lo, hi = min(diffs), max(diffs)
        spread = (hi - lo) / sec * 100
        print(f"{name:42s} {sec * 1e6:9.1f} us  {samples / sec / 1e9:6.2f}"
              f" GS/s (spread {spread:.0f}%)", flush=True)

    for nfr in (1024, 4096):
        zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        st = chz.init_planes(m, taps)
        ns = nfr * m

        # full path
        report(f"full planes f32 [n={nfr}]",
               lambda s, a, b: chz.channelize_planes(s, a, b, m=m,
                                                     taps=taps),
               st, zr, zi, samples=ns)
        report(f"full planes bf16 [n={nfr}]",
               lambda s, a, b: chz.channelize_planes(
                   s, a, b, m=m, taps=taps, twiddle_dtype=jnp.bfloat16),
               st, zr, zi, samples=ns)

        # FIR only (concat + 8 slice-mul-adds + state slice), no DFT
        def fir_only(s, a, b):
            extr = jnp.concatenate([s.hist_r, a], axis=-2)
            exti = jnp.concatenate([s.hist_i, b], axis=-2)
            accr = accti = None
            n = a.shape[-2]
            for tap in range(taps):
                cr = jnp.asarray(coeff[tap])
                slr = jax.lax.slice_in_dim(
                    extr, taps - 1 - tap, taps - 1 - tap + n, axis=-2)
                sli = jax.lax.slice_in_dim(
                    exti, taps - 1 - tap, taps - 1 - tap + n, axis=-2)
                accr = slr * cr if accr is None else accr + slr * cr
                accti = sli * cr if accti is None else accti + sli * cr
            return accr, accti

        report(f"FIR only [n={nfr}]", fir_only, st, zr, zi, samples=ns)

        # DFT matmul only, from a pre-formed (n, 2m) f32 ab
        ab32 = jnp.concatenate([zr, zi], axis=-1)
        ab16 = ab32.astype(jnp.bfloat16)
        report(f"matmul only f32 [n={nfr}]",
               lambda ab: jnp.einsum("nk,km->nm", ab, wblk32,
                                     preferred_element_type=jnp.float32),
               ab32, samples=ns)
        report(f"matmul only cast+bf16 [n={nfr}]",
               lambda ab: jnp.einsum(
                   "nk,km->nm", ab.astype(jnp.bfloat16), wblk16,
                   preferred_element_type=jnp.float32),
               ab32, samples=ns)
        report(f"matmul only pre-bf16 [n={nfr}]",
               lambda ab: jnp.einsum("nk,km->nm", ab, wblk16,
                                     preferred_element_type=jnp.float32),
               ab16, samples=ns)

        # concat+cast only (the glue between FIR and matmul)
        report(f"concat+cast only [n={nfr}]",
               lambda a, b: jnp.concatenate([a, b],
                                            axis=-1).astype(jnp.bfloat16),
               zr, zi, samples=ns)
    return 0


if __name__ == "__main__":
    sys.exit(main())
