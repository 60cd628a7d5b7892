"""Experiment: unroll factor of the in-kernel time loop (df1 bank).

The fori body is a dependent chain (5 limb MACs -> shift -> state);
unrolling interleaves independent channel-tile work across iterations
and amortizes loop overhead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad
    from idsp_tpu.filters.biquad_pallas import (
        _add_i64,
        _mul_i32_i32_to_i64,
        _shr_i64_to_i32,
    )
    from idsp_tpu.profiling import measure_roundtrip, sync

    rt = measure_roundtrip()
    print(f"device={jax.devices()[0]} rt={rt*1e3:.1f}ms", flush=True)

    c, t = 1024, 32768
    cs = c // 128
    rng = np.random.default_rng(0)
    xs3 = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, cs, 128),
                     dtype=np.int64).astype(np.int32)
    )
    ba = tuple(
        int(v)
        for v in biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
            29,
        )
    )
    st_in = jnp.zeros((4, cs, 128), jnp.int32)

    def make(time_chunk, unroll):
        def kernel(st_in_ref, x_ref, y_ref, out_state_ref, state_ref):
            tq = pl.program_id(0)
            n_t = pl.num_programs(0)

            @pl.when(tq == 0)
            def _():
                state_ref[...] = st_in_ref[...]

            b0, b1, b2, a1, a2 = (jnp.int32(v) for v in ba)
            tc = x_ref.shape[0]

            def one(i, x1, x2, y1, y2):
                x0 = x_ref[i]
                acc = _mul_i32_i32_to_i64(jnp.full_like(x0, b0), x0)
                acc = _add_i64(acc, _mul_i32_i32_to_i64(
                    jnp.full_like(x0, b1), x1))
                acc = _add_i64(acc, _mul_i32_i32_to_i64(
                    jnp.full_like(x0, b2), x2))
                acc = _add_i64(acc, _mul_i32_i32_to_i64(
                    jnp.full_like(x0, a1), y1))
                acc = _add_i64(acc, _mul_i32_i32_to_i64(
                    jnp.full_like(x0, a2), y2))
                y0 = _shr_i64_to_i32(acc[0], acc[1], 29)
                y_ref[i] = y0
                return x0, x1, y0, y1

            def body(j, carry):
                x1, x2, y1, y2 = carry[0], carry[1], carry[2], carry[3]
                for u in range(unroll):
                    x1, x2, y1, y2 = one(j * unroll + u, x1, x2, y1, y2)
                return jnp.stack([x1, x2, y1, y2])

            st = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(tc // unroll), body, state_ref[...]
            )
            state_ref[...] = st

            @pl.when(tq == n_t - 1)
            def _():
                out_state_ref[...] = st

        grid = (t // time_chunk,)
        walk = pl.BlockSpec((time_chunk, cs, 128),
                            lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
        fixed = pl.BlockSpec((4, cs, 128), lambda i: (i * 0, i * 0, i * 0),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def run(st_in, xs3):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[fixed, walk],
                out_specs=[walk, fixed],
                out_shape=[
                    jax.ShapeDtypeStruct((t, cs, 128), jnp.int32),
                    jax.ShapeDtypeStruct((4, cs, 128), jnp.int32),
                ],
                scratch_shapes=[pltpu.VMEM((4, cs, 128), jnp.int32)],
                input_output_aliases={1: 0},
            )(st_in, xs3)

        return run

    # reference correctness vs scan on a small prefix
    from idsp_tpu.filters.biquad_pallas import df1_bank_q

    ref_state, ref_y = df1_bank_q(
        jnp.asarray(np.asarray(ba, np.int64).astype(np.int32)),
        biquad.df1_init((c,), jnp.int32), xs3.reshape(t, c), 29,
        time_chunk=512,
    )

    for tc_chunk in (512,):
        for unroll in (1, 2, 4, 8):
            run = make(tc_chunk, unroll)
            ys, st_out = run(st_in, xs3)
            ok = np.array_equal(
                np.asarray(ys.reshape(t, c)), np.asarray(ref_y)
            )
            sync(ys)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    ys, st_out = run(st_in, xs3)
                sync(ys)
                best = min(best, (time.perf_counter() - t0 - rt) / 5)
            print(
                f"tc={tc_chunk} unroll={unroll}: {best*1e3:7.3f} ms "
                f"({c*t/best/1e9:6.2f} GS/s bank) {'OK' if ok else 'BAD'}",
                flush=True,
            )




def chain_compare():
    """Rerun the full chain twice in one process to chase the bench.py
    (7.5ms) vs profile (4.5ms) discrepancy."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, hbf
    from idsp_tpu.filters.biquad_pallas import df1_bank_q
    from idsp_tpu.ops.trig import cossin
    from idsp_tpu.profiling import measure_roundtrip, sync
    import time

    c, t, iters = 512, 32768, 10
    rng = np.random.default_rng(0)
    rt = measure_roundtrip()
    x = jnp.asarray(rng.integers(-(2**27), 2**27, size=(t,),
                                 dtype=np.int64).astype(np.int32))
    steps = jnp.asarray(rng.integers(1 << 24, 1 << 30, size=(c,),
                                     dtype=np.int64).astype(np.int32))
    ba_q = jnp.asarray(biquad.quantize_ba(
        biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()), 29))

    def chain(state, x):
        bq_iq, dec_i, dec_q, phase0 = state
        idx = (jnp.arange(1, t + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
            jnp.int32)
        phases = phase0[None, :] + steps[None, :] * idx[:, None]
        lo_re, lo_im = cossin(phases)
        xi = x[:, None]
        mi = fxp.q_apply(lo_re, xi, 32)
        mq = fxp.q_apply(-lo_im, xi, 32)
        miq = jnp.concatenate([mi, mq], axis=1)
        bq_iq, yiq = df1_bank_q(ba_q, bq_iq, miq, 29, time_chunk=512)
        fi = yiq[:, :c].astype(jnp.float32).T
        fq = yiq[:, c:].astype(jnp.float32).T
        dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
        dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
        return (bq_iq, dec_i, dec_q, phase0 + steps * jnp.int32(t)), (zi, zq)

    run = jax.jit(chain)
    state = (
        biquad.df1_init((2 * c,), jnp.int32),
        hbf.hbf_dec_cascade_init(3, (c,)),
        hbf.hbf_dec_cascade_init(3, (c,)),
        jnp.zeros((c,), jnp.int32),
    )
    s, (zi, zq) = run(state, x)
    _ = float(jnp.sum(zi))
    for trial in range(6):
        t0 = time.perf_counter()
        s = state
        for _ in range(iters):
            s, (zi, zq) = run(s, x)
        _ = float(jnp.sum(zi)) + float(jnp.sum(zq))
        dt = time.perf_counter() - t0 - rt
        print(f"chain trial {trial}: {dt/iters*1e3:7.3f} ms/block "
              f"({c*t*iters/dt/1e9:5.2f} GS/s)", flush=True)


if __name__ == "__main__":
    main()
    chain_compare()
