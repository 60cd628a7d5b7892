"""Auxiliary subsystems: checkpoint/restore, formatting, sharded channelizer."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from idsp_tpu import checkpoint, fmt
from idsp_tpu.filters import biquad, pll


def test_checkpoint_roundtrip(tmp_path):
    st = biquad.Df1State(
        x=jnp.asarray(np.array([[1, 2], [3, 4]], np.int32)),
        y=jnp.asarray(np.array([[5, 6], [7, 8]], np.int32)),
    )
    path = os.path.join(str(tmp_path), "state")
    checkpoint.save(path, st)
    like = biquad.df1_init((2,), jnp.int32)
    st2 = checkpoint.restore(path, like)
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(st2.y), np.asarray(st.y))


def test_checkpoint_resume_continues_stream(tmp_path):
    # A checkpointed PLL resumes bit-exactly mid-stream.
    from idsp_tpu.ops import accu

    ba = jnp.asarray(pll.coefficients_from_bandwidth(2e-2, 4.0))
    xs = accu.ramp(jnp.int32(0), jnp.int32(0x0300_0000), 512)
    st = pll.init()
    st_mid, y1 = pll.block(ba, st, xs[:256])
    path = os.path.join(str(tmp_path), "pll")
    checkpoint.save(path, st_mid)
    st_res = checkpoint.restore(path, pll.init())
    _, y2a = pll.block(ba, st_mid, xs[256:])
    _, y2b = pll.block(ba, st_res, xs[256:])
    np.testing.assert_array_equal(np.asarray(y2a), np.asarray(y2b))


def test_fmt():
    assert fmt.q_repr(0x35, 4) == repr(3.3125)
    assert fmt.q_bin(0x35, 4, 8) == "0011.0101"
    assert fmt.q_hex(0x35, 4, 8) == "3.5"
    assert "Q(bits=0x35" in fmt.q_debug(0x35, 4)
    s = fmt.format_array([0x20000000, -0x20000000], 30)
    assert "0.5" in s and "-0.5" in s


def test_channelizer_channel_sharded():
    # TP obligation (SURVEY §2 item 4): the polyphase bank with its
    # channel axis sharded over the mesh gives the same values.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from idsp_tpu.parallel import make_mesh
    from idsp_tpu.pipelines import channelizer

    m = 64
    mesh = make_mesh({"tp": 8})
    x = channelizer.frames_from_stream(channelizer.tone(7 / m, m * 64), m)
    st = channelizer.init(m, 8)
    _, y_ref = channelizer.channelize(st, x, m=m, taps=8)

    sh = NamedSharding(mesh, P(None, "tp", None))
    x_sh = jax.device_put(x, sh)
    st_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "tp", None))),
        st,
    )
    _, y_sh = channelizer.channelize(st_sh, x_sh, m=m, taps=8)
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )


def test_measure_rate_median_statistic():
    """profiling.measure_rate: positive median of wide-gap differences,
    stateful chaining, and the no-positive-difference failure path."""
    import jax.numpy as jnp
    import pytest

    from idsp_tpu import profiling

    import time as _time

    # A deterministic ~0.5 ms per-dispatch cost: with ALL differences
    # kept (no censoring — ADVICE r4), a microsecond-scale jitted step
    # would leave the median at timing-noise scale.
    def step(s, x):
        _time.sleep(5e-4)
        return (s + jnp.sum(x), s)

    dt, diffs = profiling.measure_rate(
        step, jnp.float32(0), jnp.ones((64, 64)),
        iters=(2, 12), trials=3,
    )
    assert dt > 0 and len(diffs) == 3
    import statistics

    assert dt == statistics.median(diffs)

    # a degenerate gap must be rejected up front, not divide by zero
    with pytest.raises(ValueError):
        profiling.measure_rate(
            step, jnp.float32(0), jnp.ones((4,)),
            iters=(5, 5), trials=2,
        )
    # ... and so must an empty short leg (timed(0) never runs the step)
    with pytest.raises(ValueError):
        profiling.measure_rate(
            step, jnp.float32(0), jnp.ones((4,)),
            iters=(0, 10), trials=2,
        )
