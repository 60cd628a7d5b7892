"""Chunk-tuning sweep for the remaining bank kernels.

The tc==unroll fully-unrolled chunk lifted the headline chain ~25-30%
and df1_bank_q ~15% (round-5 discovery).  Sweep the same axis on the
other per-sample recurrence banks: pll, svf, normal, lowpass2,
lockin one-kernel, fm one-kernel.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.filters import lowpass, pll, svf
    from idsp_tpu.filters.lowpass_pallas import lowpass_bank
    from idsp_tpu.filters.pll_pallas import pll_bank
    from idsp_tpu.filters.svf_pallas import svf_bank
    from idsp_tpu.profiling import measure_rate, sync

    t, c = 32768, 512
    rng = np.random.default_rng(0)

    def ri32(shape, lim=2**27):
        return jnp.asarray(rng.integers(
            -lim, lim, size=shape, dtype=np.int64).astype(np.int32))

    def sweep(name, make_run, st0, *xargs, samples, tcs=(128, 64, 32)):
        for tc in tcs:
            run = jax.jit(make_run(tc))
            try:
                out = run(st0, *xargs)
                sync(out)
            except Exception as e:  # noqa: BLE001
                print(f"{name} tc={tc}: skipped {type(e).__name__}: "
                      f"{str(e)[:80]}", flush=True)
                continue
            sec, diffs = measure_rate(run, st0, *xargs, trials=6)
            spread = (max(diffs) - min(diffs)) / sec * 100
            print(f"{name:28s} tc={tc:4d}: {samples / sec / 1e9:6.2f} "
                  f"GS/s (spread {spread:.0f}%)", flush=True)

    # pll bank
    pba = tuple(int(v) for v in pll.coefficients_from_bandwidth(2e-2, 4.0))
    xpll = ri32((t, c), lim=2**30)
    sweep("pll bank", lambda tc: (lambda st, x: pll_bank(
        pba, st, x, time_chunk=tc)), pll.init((c,)), xpll, samples=t * c)

    # svf bank
    svf_f, svf_qi = svf.coefficients(0.01, 0.7)
    xsvf = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    sweep("svf bank", lambda tc: (lambda st, x: svf_bank(
        svf_f, svf_qi, st, x, time_chunk=tc)),
        svf.init((c,), jnp.float32), xsvf, samples=t * c)

    # lowpass2 bank
    k2 = jnp.asarray(lowpass.gains2(0.01))
    xlp = ri32((t, c))
    sweep("lowpass2 bank", lambda tc: (lambda st, x: lowpass_bank(
        k2, st, x, time_chunk=tc)), lowpass.init(2, (c,)), xlp,
        samples=t * c)

    # fm one-kernel (fast atan): time_chunk axis
    from idsp_tpu.filters.fm_pallas import fm_disc_bank
    from idsp_tpu.pipelines import fm_disc

    ba_fm = np.asarray(fm_disc.deemphasis_coefficients(0.02))
    re_fm, im_fm = ri32((t, c)), ri32((t, c))
    for tcf in (2048, 1024, 512, 256):
        runf = jax.jit(
            lambda st, re, im, tcf=tcf: fm_disc_bank(
                ba_fm, st, re, im, 12345, time_chunk=tcf,
                angle="fast"))

        st0 = fm_disc.init_state((c,))
        try:
            out = runf(st0, re_fm, im_fm)
            sync(out)
        except Exception as e:  # noqa: BLE001
            print(f"fm fast tc={tcf}: skipped {str(e)[:80]}", flush=True)
            continue
        sec, diffs = measure_rate(runf, st0, re_fm, im_fm, trials=6)
        spread = (max(diffs) - min(diffs)) / sec * 100
        print(f"fm one-kernel fast           tc={tcf:4d}: "
              f"{t * c / sec / 1e9:6.2f} GS/s (spread {spread:.0f}%)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
