"""On-device channelizer M=1024 variant sweep (VERDICT r3 weak #3).

Isolates where the time goes: pure DFT matmul of the exact shapes,
FIR-only, fused variants (4-matmul vs single combined real matmul vs
bf16 vs fft), and frame-count scaling.  Prints GS/s per variant.
Run detached on the device; exits cleanly.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from idsp_tpu.pipelines import channelizer as chz
    from idsp_tpu.profiling import sync

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m, taps = 1024, 8

    def measure(fn, *args, iters=16):
        out = fn(*args)
        sync(out)

        def timed(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(*args)
            sync(out)
            return time.perf_counter() - t0

        # median of wide-gap differences (round-4 discipline: NEVER
        # min-select — see profiling.measure_rate / CLAUDE.md)
        import statistics

        est = max((timed(10) - timed(2)) / 8.0, 1e-6)
        it = min(max(iters, int(0.1 / est) + 1), 2000)
        diffs = []
        for _ in range(6):
            d1 = timed(10)
            d2 = timed(10 + it)
            if d2 > d1:
                diffs.append((d2 - d1) / it)
        if not diffs:
            return float("nan")
        return statistics.median(diffs)

    w = chz._dft_matrix(m)
    wr = jnp.asarray(np.real(w).astype(np.float32))
    wi = jnp.asarray(np.imag(w).astype(np.float32))
    wbig = jnp.asarray(
        np.block([[np.real(w), np.imag(w)],
                  [-np.imag(w), np.real(w)]]).astype(np.float32)
    )

    for nfr in (256, 1024, 4096):
        zr = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zi = jnp.asarray(rng.normal(size=(nfr, m)).astype(np.float32))
        zb = jnp.concatenate([zr, zi], axis=-1)
        n_s = nfr * m

        # 1. pure DFT: four real matmuls
        def dft4(ar, ai):
            yr = ar @ wr - ai @ wi
            yi = ar @ wi + ai @ wr
            return yr, yi

        dt = measure(jax.jit(dft4), zr, zi)
        print(f"n={nfr:5d} dft 4x matmul        "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 2. pure DFT: one combined (n,2m)@(2m,2m)
        def dft1(z):
            return z @ wbig

        dt = measure(jax.jit(dft1), zb)
        print(f"n={nfr:5d} dft combined matmul  "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 3. combined in bf16
        wbig_bf = wbig.astype(jnp.bfloat16)

        def dft1b(z):
            return jnp.dot(z.astype(jnp.bfloat16), wbig_bf,
                           preferred_element_type=jnp.float32)

        dt = measure(jax.jit(dft1b), zb)
        print(f"n={nfr:5d} dft combined bf16    "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 4. fft
        def dftf(ar, ai):
            zf = jnp.fft.fft((ar + 1j * ai).astype(jnp.complex64),
                             axis=-1)
            return zf.real.astype(jnp.float32), zf.imag.astype(
                jnp.float32)

        dt = measure(jax.jit(dftf), zr, zi)
        print(f"n={nfr:5d} dft fft              "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 5. FIR only (polyphase accumulate, no DFT)
        pst = chz.init_planes(m, taps)
        proto = chz.prototype(m, taps)
        coeff = np.asarray(proto, np.float32).reshape(taps, m)

        def fir2(st, ar, ai):
            extr = jnp.concatenate([st.hist_r, ar], axis=-2)
            exti = jnp.concatenate([st.hist_i, ai], axis=-2)
            accr = acci = None
            for tap in range(taps):
                cr = jnp.asarray(coeff[tap])
                sr = jax.lax.slice_in_dim(
                    extr, taps - 1 - tap, taps - 1 - tap + nfr, axis=-2)
                si = jax.lax.slice_in_dim(
                    exti, taps - 1 - tap, taps - 1 - tap + nfr, axis=-2)
                accr = sr * cr if accr is None else accr + sr * cr
                acci = si * cr if acci is None else acci + si * cr
            return accr, acci

        dt = measure(jax.jit(fir2), pst, zr, zi)
        print(f"n={nfr:5d} fir only             "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 6. full channelize_planes (4-matmul path)
        def full(st, ar, ai):
            return chz.channelize_planes(st, ar, ai, m=m, taps=taps)

        dt = measure(jax.jit(full), pst, zr, zi)
        print(f"n={nfr:5d} full planes (4mm)    "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)

        # 7. full with fft
        def full_fft(st, ar, ai):
            return chz.channelize_planes(st, ar, ai, m=m, taps=taps,
                                         dft="fft")

        dt = measure(jax.jit(full_fft), pst, zr, zi)
        print(f"n={nfr:5d} full planes (fft)    "
              f"{n_s/dt/1e9:7.2f} GS/s ({dt*1e6:8.1f} us)", flush=True)


if __name__ == "__main__":
    main()
