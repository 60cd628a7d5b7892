"""Masked event-stream adapters: the Option calculus.

Mirrors the reference adapter contracts: Hold doctest
(adapters.rs:100-106), TryDecimator tick contract + error taxonomy
(adapters.rs:157-222), Interpolator/Downsample framing
(adapters.rs:26-83), Map lift (adapters.rs:240-257).
"""

import numpy as np
import jax.numpy as jnp

from idsp_tpu import masked
from idsp_tpu.masked import Masked


def test_hold_reference_doctest():
    # Hold(5): None -> 5, Some(7) -> 7, None -> 7 (adapters.rs:100-106)
    m = Masked(
        valid=jnp.asarray([False, True, False]),
        value=jnp.asarray([0, 7, 0], jnp.int32),
    )
    carry, y = masked.hold(jnp.int32(5), m)
    np.testing.assert_array_equal(np.asarray(y), [5, 7, 7])
    assert int(carry) == 7


def test_hold_streaming_equals_one_shot():
    rng = np.random.default_rng(0)
    t, c = 256, 3
    v = jnp.asarray(rng.random((c, t)) < 0.1)
    x = jnp.asarray(rng.integers(-100, 100, size=(c, t), dtype=np.int64)
                    .astype(np.int32))
    carry0 = jnp.full((c,), -1, jnp.int32)
    _, y_one = masked.hold(carry0, Masked(v, x))
    carry = carry0
    outs = []
    for lo in range(0, t, 64):
        carry, y = masked.hold(
            carry, Masked(v[:, lo:lo + 64], x[:, lo:lo + 64])
        )
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs, axis=-1),
                                  np.asarray(y_one))


def test_try_decimate_reference_contract():
    # alternating tick (the adapters.rs:144-156 doctest): [1, 2] with
    # tick on the second slot -> 2
    m = Masked(
        valid=jnp.asarray([False, True]),
        value=jnp.asarray([1, 2], jnp.int32),
    )
    y, err = masked.try_decimate(m, 2)
    assert int(y[0]) == 2 and int(err[0]) == masked.OK

    # never ticks -> NoTick (adapters.rs:199-206)
    y, err = masked.try_decimate(
        Masked(jnp.zeros(2, bool), jnp.asarray([1, 2], jnp.int32)), 2
    )
    assert int(err[0]) == masked.NO_TICK

    # double tick -> ExtraTick, first value kept (y.replace semantics)
    y, err = masked.try_decimate(
        Masked(jnp.ones(2, bool), jnp.asarray([1, 2], jnp.int32)), 2
    )
    assert int(err[0]) == masked.EXTRA_TICK
    assert int(y[0]) == 1


def test_try_decimate_property_one_tick_per_frame():
    rng = np.random.default_rng(1)
    t, r = 64 * 8, 8
    pos = rng.integers(0, r, size=t // r)
    v = np.zeros(t, bool)
    v[np.arange(t // r) * r + pos] = True
    x = rng.integers(-1000, 1000, size=t).astype(np.int32)
    y, err = masked.try_decimate(Masked(jnp.asarray(v), jnp.asarray(x)), r)
    np.testing.assert_array_equal(np.asarray(err), 0)
    np.testing.assert_array_equal(
        np.asarray(y), x.reshape(-1, r)[np.arange(t // r), pos]
    )


def test_decimate_counters_accumulate():
    t, r = 32, 4
    v = np.zeros(t, bool)
    v[0] = True          # frame 0: one tick
    v[4] = v[5] = True   # frame 1: extra
    # frames 2..7: no tick
    m = Masked(jnp.asarray(v), jnp.arange(t, dtype=jnp.int32))
    y, ctr = masked.decimate(m, r)
    np.testing.assert_array_equal(np.asarray(ctr), [6, 1])
    _, ctr2 = masked.decimate(m, r, counters=ctr)
    np.testing.assert_array_equal(np.asarray(ctr2), [12, 2])


def test_downsample_interpolate_framing():
    x = jnp.arange(6, dtype=jnp.int32)
    m = masked.downsample(x, 3, phase=1)
    np.testing.assert_array_equal(
        np.asarray(m.valid), [False, True, False, False, True, False]
    )
    y, err = masked.try_decimate(m, 3)
    np.testing.assert_array_equal(np.asarray(err), 0)
    np.testing.assert_array_equal(np.asarray(y), [1, 4])

    mi = masked.interpolate(jnp.asarray([5, 9], jnp.int32), 4, phase=2)
    np.testing.assert_array_equal(
        np.asarray(mi.valid),
        [False, False, True, False, False, False, True, False],
    )
    np.testing.assert_array_equal(np.asarray(mi.value[2]), 5)
    np.testing.assert_array_equal(np.asarray(mi.value[6]), 9)
    # round trip: interpolate then hold reproduces a ZOH staircase
    carry, yz = masked.hold(jnp.int32(0), mi)
    np.testing.assert_array_equal(
        np.asarray(yz), [0, 0, 5, 5, 5, 5, 9, 9]
    )


def test_mask_lift_state_advances_only_on_valid():
    # lifted integrator == dense integrator on the valid subsequence
    def step(cfg, s, x):
        s2 = s + x
        return s2, s2

    lifted = masked.mask_lift(step)
    rng = np.random.default_rng(2)
    t = 128
    v = rng.random(t) < 0.3
    x = rng.integers(-10, 10, size=t).astype(np.int32)

    s = jnp.int32(0)
    got = []
    for i in range(t):
        s, my = lifted(None, s, Masked(jnp.asarray(v[i]),
                                       jnp.asarray(x[i])))
        if v[i]:
            got.append(int(my.value))
    want = np.cumsum(x[v]).tolist()
    assert got == want


def test_rpll_block_masked_matches_block():
    from idsp_tpu.filters import rpll

    cfg = rpll.RpllConfig(dt2=5, shift_frequency=12, shift_phase=10)
    rng = np.random.default_rng(3)
    t = 256
    v = jnp.asarray(rng.random(t) < 0.05)
    x = jnp.asarray(rng.integers(-(2**31), 2**31, size=t,
                                 dtype=np.int64).astype(np.int32))
    st = rpll.init()
    st1, out1 = rpll.block(cfg, st, x, v)
    st2, out2 = rpll.block_masked(cfg, rpll.init(), Masked(v, x))
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(st1.f), np.asarray(st2.f))


def test_map_masked_preserves_framing():
    m = Masked(jnp.asarray([True, False]), jnp.asarray([3, 4], jnp.int32))
    m2 = masked.map_masked(lambda v: v * 2, m)
    np.testing.assert_array_equal(np.asarray(m2.valid),
                                  np.asarray(m.valid))
    np.testing.assert_array_equal(np.asarray(m2.value), [6, 8])
