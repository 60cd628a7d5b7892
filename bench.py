"""Headline benchmark: biquad+HBF DDC chain throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star of 1 Gsample/s/chip on the
biquad(+HBF) DDC chain.

Chain (full-rate input samples counted): per-channel NCO mix (cossin
DDS, Q32 conjugate multiply) -> Q32<29> DF1 biquad lowpass on I/Q ->
HBF decimate-by-8 cascade on I/Q.

Methodology notes (remote axon TPU):
* `block_until_ready` does not actually fence on the axon tunnel; a
  scalar readback (`float(jnp.sum(...))`) does.
* The fixed dispatch+readback overhead (~30-120 ms depending on sync
  style) is eliminated by iteration differencing: time n1 and n2
  chained dispatches, divide the difference.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, hbf
    from idsp_tpu.filters.biquad_pallas import df1_bank_q
    from idsp_tpu.ops.trig import cossin

    c = 512  # channels (canonical headline config, rounds 1-4)
    c_wide = 1024  # production-width config: throughput scales with
    #              bank width (r4: 512-ch at ~58% of its issue bound,
    #              1024-ch whole stack at ~81% — VERDICT r4 #5)
    t = 32768  # full-rate samples per block per channel
    rng = np.random.default_rng(0)

    x = jnp.asarray(
        rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64).astype(np.int32)
    )
    steps_all = jnp.asarray(
        rng.integers(1 << 24, 1 << 30, size=(c_wide,), dtype=np.int64).astype(
            np.int32)
    )
    steps = steps_all[:c]
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()), 29
        )
    )

    def make_chain(mode: str, c=c, steps=steps):
        def chain(state, x):
            bq_iq, dec_i, dec_q, phase0 = state
            if mode == "fastlo_fused":
                # The ENTIRE chain in one kernel: in-kernel fast-LO mix
                # (coarse/fine factored tables) + DF1 + 3-stage HBF.
                # The full-rate mixed stream never touches HBM.
                from idsp_tpu.filters.ddc_pallas import (
                    fastlo_ddc_cascade_bank,
                )

                # tc == unroll: the fully-unrolled chunk (no fori loop
                # in the kernel) measured fastest at both widths in the
                # round-5 sweeps (scripts/tpu_headline_tc32.py,
                # tpu_tc16_confirm.py: c=512 10.4 -> ~13.2, c=1024
                # 12.1 -> ~16.2 GS/s); accuracy vs the exact-LO chain
                # is unchanged (119.3 dB rms-SNR at tc=32 and tc=128).
                bq_iq, tails, phase0, y8 = fastlo_ddc_cascade_bank(
                    ba_q, bq_iq, dec_q, phase0, steps, x, 29,
                    time_chunk=16, unroll=16,
                )
                new_state = (bq_iq, dec_i, tails, phase0)
                return new_state, (y8[:, :c], y8[:, c:])
            if mode == "fold3_fastlo":
                # Fast-LO variant of fold3: coarse/fine factored LO
                # (ops/fastlo.py) replaces the per-sample 128-way
                # select-chain cossin with one f32 complex multiply.
                # SNR-gated (not bit-exact): passes the reference DDS
                # spectral suite with margin (tests/test_fastlo.py).
                from idsp_tpu.filters.ddc_pallas import (
                    df1_hbf_cascade_bank,
                )
                from idsp_tpu.ops.fastlo import fastlo_mix

                miq = fastlo_mix(x, phase0, steps, 128)
                bq_iq, tails, y8 = df1_hbf_cascade_bank(
                    ba_q, bq_iq, dec_q, miq, 29,
                    time_chunk=128, unroll=4,
                )
                new_state = (bq_iq, dec_i, tails,
                             phase0 + steps * jnp.int32(t))
                return new_state, (y8[:, :c], y8[:, c:])
            if mode == "fold3":
                # The ENTIRE filter chain in one Pallas kernel: DF1
                # biquad + all three half-band stages, emitting at 1/8
                # rate.  Ties fold2 on speed (stage 3 is cheap at 1/4
                # rate) with one dispatch and 4x less output HBM.
                from idsp_tpu.filters.ddc_pallas import (
                    df1_hbf_cascade_bank,
                )

                idx = (
                    jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF
                ).astype(jnp.int32)
                phases = phase0[None, :] + steps[None, :] * idx[:, None]
                lo_re, lo_im = cossin(phases)
                xi = x[:, None]
                mi = fxp.q_apply(lo_re, xi, 32)
                mq = fxp.q_apply(-lo_im, xi, 32)
                miq = jnp.concatenate([mi, mq], axis=1)
                bq_iq, tails, y8 = df1_hbf_cascade_bank(
                    ba_q, bq_iq, dec_q, miq, 29,
                    time_chunk=128, unroll=4,
                )
                new_state = (bq_iq, dec_i, tails,
                             phase0 + steps * jnp.int32(t))
                return new_state, (y8[:, :c], y8[:, c:])
            if mode == "fold2":
                # Two HBF stages folded into the kernel (quarter-rate
                # output); measured ~7% faster than fold with lower
                # variance (scripts head-to-head).
                from idsp_tpu.filters.ddc_pallas import df1_hbf12_bank

                idx = (
                    jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF
                ).astype(jnp.int32)
                phases = phase0[None, :] + steps[None, :] * idx[:, None]
                lo_re, lo_im = cossin(phases)
                xi = x[:, None]
                mi = fxp.q_apply(lo_re, xi, 32)
                mq = fxp.q_apply(-lo_im, xi, 32)
                miq = jnp.concatenate([mi, mq], axis=1)
                tail1, tail2 = dec_q
                bq_iq, tail1, tail2, y4 = df1_hbf12_bank(
                    ba_q, bq_iq, tail1, tail2, miq, 29,
                    time_chunk=128, unroll=4,
                )
                dec_i, ziq = hbf.hbf_dec_block(
                    hbf.HBF_TAPS[0], dec_i, y4, axis=0
                )
                new_state = (bq_iq, dec_i, (tail1, tail2),
                             phase0 + steps * jnp.int32(t))
                return new_state, (ziq[:, :c], ziq[:, c:])
            if mode == "fold":
                # One HBF stage folded into the kernel (the sequential
                # loop writes even/odd rows to separate VMEM scratch,
                # making the stride-2 de-interleave free; half-rate
                # output) -> 2-stage time-major HBF for the rest.
                from idsp_tpu.filters.ddc_pallas import df1_hbf1_bank

                idx = (
                    jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF
                ).astype(jnp.int32)
                phases = phase0[None, :] + steps[None, :] * idx[:, None]
                lo_re, lo_im = cossin(phases)
                xi = x[:, None]
                mi = fxp.q_apply(lo_re, xi, 32)
                mq = fxp.q_apply(-lo_im, xi, 32)
                miq = jnp.concatenate([mi, mq], axis=1)  # (t, 2c) I|Q
                bq_iq, tail, y2 = df1_hbf1_bank(
                    ba_q, bq_iq, dec_q, miq, 29, time_chunk=128, unroll=4
                )
                dec_i, ziq = hbf.hbf_dec_cascade(dec_i, y2, axis=0)
                new_state = (bq_iq, dec_i, tail,
                             phase0 + steps * jnp.int32(t))
                return new_state, (ziq[:, :c], ziq[:, c:])
            if mode == "split":
                # Unfolded control: XLA mix (cossin select chain fuses
                # into the concat
                # output buffer) -> Pallas DF1 bank with the f32 cast in
                # the kernel epilogue -> time-major HBF (no transpose).
                # The fully-fused mix+DF1 kernel (mode "fused") is
                # slower: Mosaic materializes the 128-way cossin select
                # chain at ~84 B/elem of scratch, ~2.3x XLA's cost.
                idx = (
                    jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF
                ).astype(jnp.int32)
                phases = phase0[None, :] + steps[None, :] * idx[:, None]
                lo_re, lo_im = cossin(phases)
                xi = x[:, None]
                mi = fxp.q_apply(lo_re, xi, 32)
                mq = fxp.q_apply(-lo_im, xi, 32)
                miq = jnp.concatenate([mi, mq], axis=1)  # (t, 2c) I|Q
                bq_iq, yiq = df1_bank_q(
                    ba_q, bq_iq, miq, 29, time_chunk=512,
                    out_dtype=jnp.float32,
                )
                dec_i, ziq = hbf.hbf_dec_cascade(dec_i, yiq, axis=0)
                new_state = (bq_iq, dec_i, dec_q,
                             phase0 + steps * jnp.int32(t))
                return new_state, (ziq[:, :c], ziq[:, c:])
            if mode == "fused":
                # fused NCO+mix+biquad Pallas kernel (f32 epilogue): miq
                # never leaves VMEM, and the time-major (axis=0) HBF
                # needs no transpose (ddc_pallas.py; bit-identical mix
                # and filter semantics vs the unfused path)
                from idsp_tpu.filters.ddc_pallas import ddc_mix_df1_bank

                bq_iq, phase0, yiq = ddc_mix_df1_bank(
                    ba_q, bq_iq, phase0, steps, x, 29, time_chunk=512,
                    out_dtype=jnp.float32,
                )
                dec_i, ziq = hbf.hbf_dec_cascade(dec_i, yiq, axis=0)
                new_state = (bq_iq, dec_i, dec_q, phase0)
                return new_state, (ziq[:, :c], ziq[:, c:])
            idx = (
                jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF
            ).astype(jnp.int32)
            phases = phase0[None, :] + steps[None, :] * idx[:, None]
            lo_re, lo_im = cossin(phases)
            xi = x[:, None]
            mi = fxp.q_apply(lo_re, xi, 32)
            mq = fxp.q_apply(-lo_im, xi, 32)
            miq = jnp.concatenate([mi, mq], axis=1)  # (t, 2c) I|Q
            if mode == "pallas":
                bq_iq, yiq = df1_bank_q(
                    ba_q, bq_iq, miq, 29, time_chunk=512
                )
            else:
                bq_iq, yiq = biquad.df1_process_q(
                    ba_q, 29, bq_iq, miq, unroll=8
                )
            phase0 = phase0 + steps * jnp.int32(t)
            fi = yiq[:, :c].astype(jnp.float32).T  # (c, t) for the conv path
            fq = yiq[:, c:].astype(jnp.float32).T
            dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
            dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
            new_state = (bq_iq, dec_i, dec_q, phase0)
            return new_state, (zi, zq)

        return jax.jit(chain)

    def make_state(mode: str, c=c):
        if mode in ("fold3", "fold3_fastlo", "fastlo_fused"):
            from idsp_tpu.filters.ddc_pallas import hbf1_tail_init

            return (
                biquad.df1_init((2 * c,), jnp.int32),
                None,
                tuple(
                    hbf1_tail_init(2 * c, m) for m in (5, 10, 23)
                ),
                jnp.zeros((c,), jnp.int32),
            )
        if mode == "fold2":
            from idsp_tpu.filters.ddc_pallas import hbf1_tail_init

            return (
                biquad.df1_init((2 * c,), jnp.int32),
                hbf.hbf_dec_init(
                    len(hbf.HBF_TAPS[0]), (2 * c,), axis=0
                ),
                (hbf1_tail_init(2 * c, 5), hbf1_tail_init(2 * c, 10)),
                jnp.zeros((c,), jnp.int32),
            )
        if mode == "fold":
            from idsp_tpu.filters.ddc_pallas import hbf1_tail_init

            # dec_q slot carries the stage-1 tail; dec_i the 2-stage rest
            return (
                biquad.df1_init((2 * c,), jnp.int32),
                hbf.hbf_dec_cascade_init(2, (2 * c,), axis=0),
                hbf1_tail_init(2 * c),
                jnp.zeros((c,), jnp.int32),
            )
        if mode in ("split", "fused"):
            return (
                biquad.df1_init((2 * c,), jnp.int32),
                hbf.hbf_dec_cascade_init(3, (2 * c,), axis=0),
                None,
                jnp.zeros((c,), jnp.int32),
            )
        return (
            biquad.df1_init((2 * c,), jnp.int32),
            hbf.hbf_dec_cascade_init(3, (c,)),
            hbf.hbf_dec_cascade_init(3, (c,)),
            jnp.zeros((c,), jnp.int32),
        )

    # compile + warm; prefer the fast-LO fully-fused chain, then the
    # exact-LO folded kernels, the split composition, and the scan.
    # The selected mode is reported in the JSON so a silent fallback
    # (a broken fast path degrading the headline) is visible.
    #
    # Only ENVIRONMENT failures may demote the mode (Mosaic lowering
    # gaps on this backend, VMEM budget, backend init flaps) — a
    # genuine kernel bug must fail the bench loudly, not silently
    # publish a slower mode's number (VERDICT r3 weak #6).
    def _expected_fallback(e: Exception) -> bool:
        if isinstance(e, RuntimeError) and "UNAVAILABLE" in str(e):
            raise e  # backend down: handled by _main_with_retry
        msg = f"{type(e).__name__}: {e}"
        return any(
            key in msg
            for key in (
                "Mosaic",            # kernel lowering gap on this backend
                "legalize",          # MLIR legalization failure
                "RESOURCE_EXHAUSTED",
                "vmem",
                "VMEM",
                "Unsupported",
                "NotImplementedError",
                "INTERNAL",          # tunnel-side compile service errors
            )
        )

    run = None
    for mode in ("fastlo_fused", "fold3_fastlo", "fold3", "fold2", "fold",
                 "split", "fused", "pallas", "scan"):
        try:
            run = make_chain(mode)
            state = make_state(mode)
            s, (zi, zq) = run(state, x)
            _ = float(jnp.sum(zi))
            break
        except Exception as e:  # noqa: BLE001 — filtered just below
            if not _expected_fallback(e):
                raise
            print(f"# mode {mode} unavailable on this backend: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            run = None
    assert run is not None

    # Median of wide-gap iteration differences (round-4 statistic:
    # the tunnel's readback jitter is the same order as a handful of
    # dispatches, and min-selecting differences keeps exactly the
    # jitter-lucky pairings — see profiling.measure_rate, the single
    # shared implementation).
    from idsp_tpu.profiling import measure_rate

    # iters=None auto-scales the gap to >= ~100 ms of kernel time —
    # a fixed 100-iteration gap leaves sub-ms dispatches with signal
    # on the order of the 30-60 ms readback jitter (ADVICE r4).
    sec, _diffs = measure_rate(run, state, x, iters=None, trials=8)
    rate = c * t / sec
    baseline = 1e9

    # Production-width config (VERDICT r4 #5): same chain at 1024
    # channels.  Reported alongside the canonical 512-ch headline —
    # rates are per-deployment, and the wide bank fills vregs.
    rate_wide = None
    try:
        run_w = make_chain(mode, c=c_wide, steps=steps_all)
        state_w = make_state(mode, c=c_wide)
        s_w, (zi_w, _zq_w) = run_w(state_w, x)
        _ = float(jnp.sum(zi_w))
        sec_w, _ = measure_rate(run_w, state_w, x, iters=None, trials=8)
        rate_wide = c_wide * t / sec_w
    except Exception as e:  # noqa: BLE001 — same env-failure filter
        if not _expected_fallback(e):
            raise
        print(f"# wide config (c={c_wide}) unavailable: "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    rec = {
        "metric": "biquad_hbf_ddc_chain_samples_per_s",
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / baseline,
        "mode": mode,
        "channels": c,
    }
    if rate_wide is not None:
        rec["c1024_samples_per_s"] = rate_wide
        rec["c1024_vs_baseline"] = rate_wide / baseline
    print(json.dumps(rec))


def _main_with_retry():
    """The axon tunnel flaps for hours at a time (see ROADMAP round-3
    note); a failed backend init takes ~25 min to time out AND is
    cached by JAX for the process lifetime — so retry by re-exec'ing
    the process, not in-process."""
    import os
    import sys

    retries = int(os.environ.get("IDSP_BENCH_INIT_RETRIES", "2"))
    attempt = int(os.environ.get("IDSP_BENCH_ATTEMPT", "0"))
    try:
        main()
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e) or attempt >= retries:
            raise
        print(f"# backend unavailable (attempt {attempt + 1}/"
              f"{retries + 1}); re-exec in 120 s", flush=True)
        time.sleep(120)
        os.environ["IDSP_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retry()
