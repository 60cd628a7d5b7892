"""stream.py composition model tests."""

import numpy as np
import jax.numpy as jnp

from idsp_tpu import stream
from idsp_tpu.design import Filter
from idsp_tpu.filters import biquad


def test_stage_scan_and_block_agree():
    ba = jnp.asarray(
        biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass())
    )
    stage = stream.Stage(
        step=lambda cfg, s, x: biquad.df1_step(cfg, s, x),
        block=lambda cfg, s, xs: biquad.df1_block_float(cfg, s, xs),
    )
    xs = jnp.asarray(np.random.default_rng(0).normal(size=(128,)))
    st = biquad.df1_init((), jnp.float64)
    st_a, ys_a = stage.scan(ba, st, xs)
    st_b, ys_b = stage(ba, st, xs)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b), atol=1e-9)


def test_chain_composition():
    ba = jnp.asarray(
        biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass())
    )
    stage = stream.Stage(step=lambda cfg, s, x: biquad.df1_step(cfg, s, x))
    run = stream.chain((stage, ba), (stage, ba))
    xs = jnp.asarray(np.random.default_rng(1).normal(size=(64,)))
    states = (
        biquad.df1_init((), jnp.float64),
        biquad.df1_init((), jnp.float64),
    )
    (s0, s1), ys = run(states, xs)
    # equals manual serial application
    st_a = biquad.df1_init((), jnp.float64)
    st_b = biquad.df1_init((), jnp.float64)
    _, mid = biquad.df1_process(ba, st_a, xs)
    _, want = biquad.df1_process(ba, st_b, mid)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(want), atol=1e-12)


def test_lanes_shares_config():
    ba = jnp.asarray(
        biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass())
    )
    stage = stream.Stage(step=lambda cfg, s, x: biquad.df1_step(cfg, s, x))
    run = stream.lanes(stage)
    xs = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 32))
    )  # (lane, time)
    states = biquad.df1_init((4,), jnp.float64)
    sts, ys = run(ba, states, xs)
    # lane 2 equals scalar processing of its stream
    st = biquad.df1_init((), jnp.float64)
    _, want = biquad.df1_process(ba, st, xs[2])
    np.testing.assert_allclose(np.asarray(ys[2]), np.asarray(want))


def test_frame_lane_major_views():
    x = jnp.arange(12)
    fm = stream.frame_major(x, 3)
    assert fm.shape == (4, 3)
    lm = stream.lane_major(x, 3)
    assert lm.shape == (3, 4)


def test_delay_line_block():
    tail = jnp.zeros((2,), jnp.int32)
    x = jnp.arange(6, dtype=jnp.int32)
    ext, new_tail = stream.delay_line_block(x, tail)
    np.testing.assert_array_equal(np.asarray(ext), [0, 0, 0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(np.asarray(new_tail), [4, 5])
