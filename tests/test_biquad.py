"""Biquad architectures + coefficient design gates.

Golden vectors are the reference's doctests (exact-value regressions,
SURVEY.md §4.6) plus the cross-architecture equivalence tests
(biquad.rs:671-699).
"""

import numpy as np
import jax
import jax.numpy as jnp

from idsp_tpu.filters import biquad
from idsp_tpu.design import Filter, PidBuilder, Action, freqz_ba5


def _run_df1_q(ba_q, f, xs):
    st = biquad.df1_init((), jnp.int32)
    _, ys = biquad.df1_process_q(jnp.asarray(ba_q), f, st, jnp.asarray(xs, jnp.int32))
    return list(np.asarray(ys))


def test_lowpass_q30_golden_steps():
    # coefficients.rs:289-301 doctest:
    # critical_frequency(0.1).gain(1000).lowpass() as Q32<30>,
    # [3,-4,5,7,-3,2] -> [5,3,9,25,42,49]
    ba = Filter().critical_frequency(0.1).gain_linear(1000.0).lowpass()
    ba_q = biquad.quantize_ba(biquad.from_cookbook(ba), 30)
    assert _run_df1_q(ba_q, 30, [3, -4, 5, 7, -3, 2]) == [5, 3, 9, 25, 42, 49]


def test_highpass_q30_golden_steps():
    # coefficients.rs:315-327 doctest -> [5,-9,11,12,-1,17]
    ba = Filter().critical_frequency(0.1).gain_linear(1000.0).highpass()
    ba_q = biquad.quantize_ba(biquad.from_cookbook(ba), 30)
    assert _run_df1_q(ba_q, 30, [3, -4, 5, 7, -3, 2]) == [5, -9, 11, 12, -1, 17]


def test_identity_and_hold():
    # biquad.rs:173-212 doctests.
    xs = jnp.asarray(np.array([3.0, -1.0, 2.5], np.float32))
    ba = jnp.asarray(biquad.identity(np.float32))
    st = biquad.df1_init((), jnp.float32)
    _, ys = biquad.df1_process(ba, st, xs)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(xs))

    st = biquad.df1_set_y(biquad.df1_init((), jnp.float32), 2.0)
    ba_h = jnp.asarray(biquad.hold(np.float32))
    _, ys = biquad.df1_process(ba_h, st, xs)
    np.testing.assert_allclose(np.asarray(ys), np.full(3, 2.0))


def test_df1_matches_df2t_float():
    # biquad.rs:671-682
    ba = jnp.asarray(
        biquad.from_cookbook(np.array([[0.7, -0.4, 0.1], [1.0, -0.2, 0.05]]))
    ).astype(jnp.float32)
    xs = jnp.asarray(
        np.array([-1.0, 0.25, 0.75, -0.5, 0.125, 0.0, 0.5, -0.25], np.float32)
    )
    _, y1 = biquad.df1_process(ba, biquad.df1_init((), jnp.float32), xs)
    _, y2 = jax.lax.scan(
        lambda s, x: biquad.df2t_step(ba, s, x), biquad.df2t_init((), jnp.float32), xs
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_cascade_matches_repeated_single_stage():
    # biquad.rs:684-699
    stage = biquad.from_cookbook(
        np.array([[0.5, 0.25, 0.125], [1.0, -0.1, 0.02]])
    ).astype(np.float32)
    ba_c = jnp.asarray(np.stack([stage] * 3))
    xs = jnp.asarray(
        np.array([-0.75, 0.5, 0.0, 0.25, -0.125, 1.0, -0.5, 0.375], np.float32)
    )
    st = biquad.cascade_init(3, (), jnp.float32)
    _, yc = jax.lax.scan(lambda s, x: biquad.cascade_step(ba_c, s, x), st, xs)

    sts = [biquad.df1_init((), jnp.float32) for _ in range(3)]

    def rep_step(states, x):
        new_states = []
        cur = x
        for s in states:
            s2, cur = biquad.df1_step(jnp.asarray(stage), s, cur)
            new_states.append(s2)
        return tuple(new_states), cur

    _, yr = jax.lax.scan(rep_step, tuple(sts), xs)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yr), atol=1e-6)


def test_df1_block_float_matches_scan():
    # Associative-scan block path vs sequential reference.
    rng = np.random.default_rng(3)
    ba = jnp.asarray(
        biquad.from_cookbook(np.array([[0.3, 0.2, 0.1], [1.0, -0.4, 0.2]]))
    )
    xs = jnp.asarray(rng.normal(size=(257, 4)))
    st = biquad.df1_init((4,), jnp.float64)
    st_a, ys_a = biquad.df1_process(ba, st, xs)
    st_b, ys_b = biquad.df1_block_float(ba, st, xs)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_a.y), np.asarray(st_b.y), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_a.x), np.asarray(st_b.x))


def test_clamp_offset():
    # BiquadClamp doctests (biquad.rs:125-156): u/min/max act at the
    # summing junction.
    ba = jnp.asarray(np.zeros(5))
    st = biquad.df1_init((), jnp.float64)
    _, y = biquad.clamp_step(biquad.df1_step(ba, st, jnp.float64(0.0)), 5.0, -jnp.inf, jnp.inf)
    assert float(y) == 5.0
    _, y = biquad.clamp_step(biquad.df1_step(ba, st, jnp.float64(0.0)), 0.0, 5.0, jnp.inf)
    assert float(y) == 5.0
    _, y = biquad.clamp_step(biquad.df1_step(ba, st, jnp.float64(0.0)), 0.0, -jnp.inf, -5.0)
    assert float(y) == -5.0


def test_df1_wide_and_dither_identity():
    # Identity biquads leave the stream unchanged in all integer paths
    # (dither doctest biquad.rs:493-509).
    f = 30
    ba_q = jnp.asarray(biquad.quantize_ba(biquad.identity(), f))
    xs = jnp.asarray(np.array([6, -7, 123456, -2**30], np.int32))

    st = biquad.df1_dither_init(())
    _, ys = jax.lax.scan(lambda s, x: biquad.df1_dither_step(ba_q, f, s, x), st, xs)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(xs))

    stw = biquad.df1_wide_init(())
    _, ys = jax.lax.scan(lambda s, x: biquad.df1_wide_step(ba_q, f, s, x), stw, xs)
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(xs))


def test_dither_reduces_dc_quantization_error():
    # A very-low-frequency lowpass driven by a small constant: the plain
    # DF1 truncation biases the output; error feedback recovers the mean.
    ba = Filter().critical_frequency(1e-3).lowpass()
    f = 30
    ba_q = jnp.asarray(biquad.quantize_ba(biquad.from_cookbook(ba), f))
    n = 4096
    xs = jnp.full((n,), 1000, jnp.int32)
    st = biquad.df1_dither_init(())
    _, ys = jax.lax.scan(lambda s, x: biquad.df1_dither_step(ba_q, f, s, x), st, xs)
    tail = np.asarray(ys[-512:], dtype=np.float64)
    assert abs(tail.mean() - 1000.0) < 2.0


def test_pid_golden():
    # pid.rs:573-590
    b = (
        PidBuilder()
        .with_gain(Action.I, 1e-3)
        .with_gain(Action.P, 1.0)
        .with_gain(Action.D, 1e2)
        .with_limit(Action.I, 1e3)
        .with_limit(Action.D, 1e1)
        .build(1.0, dtype=np.float32)
    )
    want = [9.181_909, -18.272_726, 9.090_908, 1.909_090_8, -0.909_090_8]
    np.testing.assert_allclose(b, want, rtol=4e-7)


def test_pid_integrator_gain():
    # pid.rs:100-108 doctest: first output of a pure I controller.
    tau, ki = 1e-3, 1e-4
    ba = PidBuilder().with_gain(Action.I, ki).build(tau)
    st = biquad.df1_init((), jnp.float64)
    _, y = biquad.df1_step(jnp.asarray(ba), st, jnp.float64(5.0))
    assert abs(float(y[1] if isinstance(y, tuple) else y) / (5.0 * tau * ki) - 1.0) < 1e-6


def test_pid_order_p_is_proportional():
    from idsp_tpu.design import Order

    ba = PidBuilder(order=Order.P).with_gain(Action.P, 3.0).build(1.0)
    np.testing.assert_allclose(ba, [3.0, 0, 0, 0, 0], atol=1e-12)


def test_freqz_lowpass_dc_gain():
    ba = Filter().critical_frequency(0.1).gain_linear(2.0).lowpass()
    ba5 = biquad.from_cookbook(ba)
    h0 = freqz_ba5(ba5, 0.0)
    assert abs(abs(h0) - 2.0) < 1e-9
    # -3 dB at the critical frequency for unity-gain critical Q.
    ba = Filter().critical_frequency(0.1).lowpass()
    h = freqz_ba5(biquad.from_cookbook(ba), 0.1)
    assert abs(20 * np.log10(abs(h)) + 3.01) < 0.1


def test_forward_gain_and_zpk():
    assert biquad.forward_gain(biquad.proportional(np.float64(3.0))) == 3.0
    ba = biquad.from_zpk((0.5, 0.5), (0.1, 0.2), 2.0)
    assert ba.shape == (5,)


def test_atomic_coefficient_swap_without_state_reset():
    # The DF1 atomic-retune property (biquad.rs:34-36): coefficients can
    # change between blocks with the carried state, and the result
    # equals a single filter that switched coefficients at that sample.
    rng = np.random.default_rng(9)
    ba_a = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass()), 29
        )
    )
    ba_b = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.2).highpass()), 29
        )
    )
    xs = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=512, dtype=np.int64).astype(np.int32)
    )
    st = biquad.df1_init((), jnp.int32)
    st_mid, y1 = biquad.df1_process_q(ba_a, 29, st, xs[:256])
    _, y2 = biquad.df1_process_q(ba_b, 29, st_mid, xs[256:])
    y_swap = np.concatenate([np.asarray(y1), np.asarray(y2)])

    # per-sample switch reference
    st = biquad.df1_init((), jnp.int32)
    outs = []
    for i in range(512):
        ba = ba_a if i < 256 else ba_b
        st, y = biquad.df1_step_q(ba, 29, st, xs[i])
        outs.append(int(y))
    np.testing.assert_array_equal(y_swap, np.array(outs, np.int32))
