"""Confirm the tc=32/unroll=32 fully-unrolled headline config.

tpu_headline_sweep.py found tc=32/unroll=32 at 12.7 (c=512) and 15.3
GS/s (c=1024) but with 17-50% spreads.  This probe (a) checks accuracy
— the fast-LO coarse/fine factorization depends on the chunk size, so
tc=32 output is compared against the canonical tc=128/unroll=4 output
and against the EXACT-LO composed chain (SNR gate), and (b) re-measures
with a bigger trial budget, including the tc=16 tail.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad
    from idsp_tpu.filters.ddc_pallas import (
        df1_hbf_cascade_bank,
        fastlo_ddc_cascade_bank,
        hbf1_tail_init,
    )
    from idsp_tpu.ops.trig import cossin
    from idsp_tpu.profiling import measure_rate, sync

    t = 32768
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64)
        .astype(np.int32))

    # --- accuracy at c=512 ---
    c = 512
    steps = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64)
        .astype(np.int32))

    def run_cfg(tc, unroll):
        state = (
            biquad.df1_init((2 * c,), jnp.int32),
            tuple(hbf1_tail_init(2 * c, mm) for mm in (5, 10, 23)),
            jnp.zeros((c,), jnp.int32),
        )
        bq, tails, ph = state
        bq, tails, ph, y8 = jax.jit(
            lambda bq, tails, ph, x, tc=tc, u=unroll:
            fastlo_ddc_cascade_bank(ba_q, bq, tails, ph, steps, x, 29,
                                    time_chunk=tc, unroll=u)
        )(bq, tails, ph, x)
        return np.asarray(y8, np.float64)

    y128 = run_cfg(128, 4)
    y32 = run_cfg(32, 32)
    # exact-LO composed chain as the reference signal
    idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
        jnp.int32)
    phases = jnp.zeros((c,), jnp.int32)[None, :] + steps[None, :] * idx[
        :, None]
    lo_re, lo_im = cossin(phases)
    xi = x[:, None]
    mi = fxp.q_apply(lo_re, xi, 32)
    mq = fxp.q_apply(-lo_im, xi, 32)
    miq = jnp.concatenate([mi, mq], axis=1)
    bq0 = biquad.df1_init((2 * c,), jnp.int32)
    tails0 = tuple(hbf1_tail_init(2 * c, mm) for mm in (5, 10, 23))
    _, _, yex = jax.jit(
        lambda bq, tails, miq: df1_hbf_cascade_bank(
            ba_q, bq, tails, miq, 29, time_chunk=128, unroll=4)
    )(bq0, tails0, miq)
    yex = np.asarray(yex, np.float64)

    sc = np.abs(yex).max()
    for name, y in (("tc=128/u=4", y128), ("tc=32/u=32", y32)):
        derr = np.abs(y - yex)
        rms = np.sqrt((derr**2).mean()) / sc
        snr = -20 * np.log10(max(rms, 1e-300))
        print(f"{name:12s} vs exact-LO: max rel "
              f"{derr.max() / sc:.3e}  rms-SNR {snr:6.1f} dB", flush=True)
    d32 = np.abs(y32 - y128).max() / sc
    print(f"tc=32 vs tc=128 fastlo max rel diff: {d32:.3e}", flush=True)

    # --- rates, bigger budget ---
    for c_m in (512, 1024):
        steps_m = jnp.asarray(
            rng.integers(1 << 24, 1 << 30, size=(c_m,), dtype=np.int64)
            .astype(np.int32))
        for tc, unroll in ((16, 16), (32, 16), (32, 32), (64, 64)):
            def chain(state, x, tc=tc, unroll=unroll, steps=steps_m):
                bq_iq, tails, phase0 = state
                bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                    ba_q, bq_iq, tails, phase0, steps, x, 29,
                    time_chunk=tc, unroll=unroll)
                return (bq_iq, tails, phase0), y8

            state = (
                biquad.df1_init((2 * c_m,), jnp.int32),
                tuple(hbf1_tail_init(2 * c_m, mm) for mm in (5, 10, 23)),
                jnp.zeros((c_m,), jnp.int32),
            )
            jfn = jax.jit(chain)
            try:
                out = jfn(state, x)
                sync(out)
            except Exception as e:  # noqa: BLE001
                print(f"c={c_m} tc={tc} unroll={unroll}: skipped "
                      f"{type(e).__name__}: {str(e)[:80]}", flush=True)
                continue
            sec, diffs = measure_rate(jfn, state, x, trials=10)
            spread = (max(diffs) - min(diffs)) / sec * 100
            print(f"c={c_m:4d} tc={tc:4d} unroll={unroll:2d}: "
                  f"{c_m * t / sec / 1e9:6.2f} GS/s "
                  f"(spread {spread:.0f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
