#!/usr/bin/env python
"""Channelizer M=1024 DFT-shape probe: current 4-real-matmul planes
path vs a single block matmul [ar ai] @ [[wr wi],[-wi wr]] (same
FLOPs, bigger K/N tiles for the MXU, one pass over the planes).

Median-of-wide-gap differencing (profiling.measure_rate discipline).
Run standalone detached; never kill mid-compile."""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from idsp_tpu.pipelines import channelizer

    print("device:", jax.devices()[0], flush=True)
    m, taps, nfr = 1024, 4, 1024
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
    zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
    st = channelizer.init_planes(m, taps)

    w = np.exp(-2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    wr32 = np.real(w).astype(np.float32)
    wi32 = np.imag(w).astype(np.float32)

    def measure(name, fn):
        s = fn(st, zr, zi)
        _ = float(jnp.sum(s[1]))

        def timed(k):
            t0 = time.perf_counter()
            ss = st
            for _ in range(k):
                res = fn(ss, zr, zi)
                ss = res[0]
            _ = float(jnp.sum(res[1]))
            return time.perf_counter() - t0

        diffs = []
        for _ in range(5):
            d1 = timed(10)
            d2 = timed(110)
            if d2 > d1:
                diffs.append((d2 - d1) / 100)
        if not diffs:
            print(f"{name:34s} no positive difference (jitter)",
                  flush=True)
            return
        med = statistics.median(diffs)
        sp = (max(diffs) - min(diffs)) / med * 100
        print(f"{name:34s} {med*1e6:9.1f} us  "
              f"{nfr*m/med/1e9:6.2f} GS/s (spread {sp:.0f}%)", flush=True)

    for tw in ("float32", "bfloat16"):
        measure(
            f"planes 4-matmul {tw}",
            lambda st_, a, b, tw=tw: channelizer.channelize_planes(
                st_, a, b, m=m, taps=taps,
                twiddle_dtype=jnp.dtype(tw)),
        )

    # block variant: one (n, 2m) @ (2m, 2m) matmul
    for tw in ("float32", "bfloat16"):
        dt = jnp.dtype(tw)
        wblk = jnp.asarray(
            np.block([[wr32, wi32], [-wi32, wr32]])).astype(dt)
        coeff = np.asarray(
            channelizer.prototype(m, taps), np.float32).reshape(taps, m)

        @jax.jit
        def block_fn(st_, a, b, wblk=wblk, dt=dt):
            extr = jnp.concatenate([st_.hist_r, a], axis=-2)
            exti = jnp.concatenate([st_.hist_i, b], axis=-2)
            accr = accti = None
            n = a.shape[-2]
            for tap in range(taps):
                cr = jnp.asarray(coeff[tap])
                slr = jax.lax.slice_in_dim(
                    extr, taps - 1 - tap, taps - 1 - tap + n, axis=-2)
                sli = jax.lax.slice_in_dim(
                    exti, taps - 1 - tap, taps - 1 - tap + n, axis=-2)
                tr, ti = slr * cr, sli * cr
                accr = tr if accr is None else accr + tr
                accti = ti if accti is None else accti + ti
            ns = channelizer.PlanesState(
                hist_r=jax.lax.slice_in_dim(extr, n, taps - 1 + n, axis=-2),
                hist_i=jax.lax.slice_in_dim(exti, n, taps - 1 + n, axis=-2),
            )
            ab = jnp.concatenate([accr, accti], axis=-1).astype(dt)
            y = jnp.einsum("nk,km->nm", ab, wblk,
                           preferred_element_type=jnp.float32)
            return ns, y[:, :m], y[:, m:]

        measure(f"planes block-matmul {tw}", block_fn)


if __name__ == "__main__":
    main()
