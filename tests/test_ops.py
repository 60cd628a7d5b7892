"""fxp / accu / unwrap / dither / dsm / cordic / sweptsine gates.

Mirrors the reference's exact-value regression tables and property tests
(SURVEY.md §4): doctest micro-examples become exact asserts, quickcheck
properties become seeded random sweeps, and closed-form block paths are
equivalence-tested against the sequential scan reference.
"""

import numpy as np
import jax.numpy as jnp

from idsp_tpu import fxp, luts
from idsp_tpu.ops import accu, cordic, dither, dsm, sweptsine, unwrap
from idsp_tpu.ops import complex as cplx
from idsp_tpu import testing


def test_fxp_apply_doctest():
    # `7 * Q32::<4>::from_bits(0x33) = 7*3 + ((3*7)>>4)`
    # (dsp-fixedpoint/src/lib.rs:506-516)
    c = jnp.int32(0x33)
    x = jnp.int32(7)
    got = int(fxp.q_apply(c, x, 4))
    assert got == 7 * 3 + ((3 * 7) >> 4)


def test_fxp_from_float_rounding():
    # Q8<4> from 1.5 -> 24; round half away from zero.
    assert int(fxp.from_float(1.5, 4, dtype=jnp.int8)) == 24
    assert int(fxp.from_float(-1.5, 4, dtype=jnp.int8)) == -24
    # Half cases: 0.53125*16 = 8.5 -> 9
    assert int(fxp.from_float(0.53125, 4, dtype=jnp.int8)) == 9


def test_fxp_q_mul_truncates_toward_neg():
    # Truncating arithmetic shift: (-3 * 1) >> 1 = -2 (floor), not -1.
    a = jnp.int32(-3)
    b = jnp.int32(1 << 3)  # 1.0 in Q4 terms scaled
    assert int(fxp.q_mul(a, b, 4)) == (-3 * 8) >> 4


def test_accu_ramp_matches_iterator():
    # Accu doctest: i8 state 0 step 127 -> 127, -2 (src/accu.rs:7-13)
    out = accu.ramp(jnp.int8(0), jnp.int8(127), 2, dtype=jnp.int8)
    assert list(np.asarray(out)) == [127, -2]
    # wrap-around i32
    out = accu.ramp(jnp.int32(2**31 - 2), jnp.int32(3), 2)
    assert list(np.asarray(out)) == [2**31 - 2 + 3 - 2**32, 2**31 + 1 - 2**32 + 3]


def test_overflowing_sub_table():
    # Truth table from src/unwrap.rs:202-231.
    cases = [  # (x0, x1, wrap) exactly as src/unwrap.rs:203-223
        (0, 0, 0),
        (0, 1, 0),
        (0, -1, 0),
        (1, 0, 0),
        (-1, 0, 0),
        (0, 0x7FFF_FFFF, 0),
        (-1, 0x7FFF_FFFF, -1),
        (-2, 0x7FFF_FFFF, -1),
        (-1, -0x8000_0000, 0),
        (0, -0x8000_0000, 0),
        (1, -0x8000_0000, 1),
        (-0x6000_0000, 0x6000_0000, -1),
        (0x6000_0000, -0x6000_0000, 1),
        (-0x4000_0000, 0x3FFF_FFFF, 0),
        (-0x4000_0000, 0x4000_0000, -1),
        (-0x4000_0000, 0x4000_0001, -1),
        (0x4000_0000, -0x3FFF_FFFF, 0),
        (0x4000_0000, -0x4000_0000, 0),
        (0x4000_0000, -0x4000_0001, 1),
    ]
    x0 = np.array([c[0] for c in cases], dtype=np.int64).astype(np.int32)
    x1 = np.array([c[1] for c in cases], dtype=np.int64).astype(np.int32)
    want = np.array([c[2] for c in cases], dtype=np.int8)
    _, wrap = unwrap.overflowing_sub(x1, x0)
    np.testing.assert_array_equal(np.asarray(wrap), want)


def test_saturating_scale_table():
    # Truth table from src/unwrap.rs:235-270, shift=8.
    cases = [
        (0, 0, 0),
        (0, 1, 0x0100_0000),
        (0, -1, -0x0100_0000),
        (0x100, 0, 1),
        (-1 << 31, 0, -1 << 23),
        (0x7FFFFFFF, 0, 0x007F_FFFF),
        (0x7FFFFFFF, 1, 0x017F_FFFF),
        (-0x7FFFFFFF, -1, -0x0180_0000),
        (0x1234_5600, 0x7F, 0x7F12_3456),
        (0x1234_5600, -0x7F, -0x7F00_0000 + 0x12_3456),
        (0, 0x7F, 0x7F00_0000),
        (0, 0x80, 0x7FFF_FF80),
        (0, -0x7F, -0x7F00_0000),
        (0, -0x80, -0x7FFF_FF80),
        (0x7FFF_FFFF, 0x7F, 0x7F7F_FFFF),
        (-0x8000_0000, 0x7F, 0x7E80_0000),
        (-0x8000_0000, -0x7F, -0x7F80_0000),
        (0x7FFF_FFFF, -0x7F, -0x7E80_0001),
        (0x100, 0x7F, 0x7F00_0001),
        (-1 << 31, 0x80, 0x7FFF_FF80),
        (-1 << 31, -0x80, -0x7FFF_FF80),
    ]
    lo = np.array([c[0] for c in cases], dtype=np.int64).astype(np.int32)
    hi = np.array([c[1] for c in cases], dtype=np.int64).astype(np.int32)
    want = np.array([c[2] for c in cases], dtype=np.int64).astype(np.int32)
    got = unwrap.saturating_scale(lo, hi, 8)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_unwrapper_block():
    # Wrapping ramp: diffs constant, extended phase grows monotonically.
    step = np.int32(0x6000_0000)
    x = np.asarray(accu.ramp(jnp.int32(0), step, 16))
    dx, y = unwrap.unwrap_diffs(x, jnp.int64(0))
    np.testing.assert_array_equal(np.asarray(dx), np.full(16, step))
    want = (np.arange(1, 17, dtype=np.int64)) * int(step)
    np.testing.assert_array_equal(np.asarray(y), want)


def test_clamp_wrap_saturates_until_unwrap():
    # A positive wrap clamps to MAX until a corresponding negative wrap
    # un-clamps (src/unwrap.rs:177-194).
    xs = jnp.asarray(
        np.array(
            [
                0x7000_0000,  # no wrap
                -0x7000_0000,  # positive wrap -> clamp max
                0x1000,  # ordinary step, stays clamped
                -0x7000_0000,  # ordinary step, stays clamped
                0x7000_0000,  # negative wrap -> un-clamp
                0x2000,  # back to pass-through
            ],
            dtype=np.int64,
        ).astype(np.int32)
    )
    st = unwrap.clamp_wrap_init()
    st, ys = unwrap.clamp_wrap_block(st, xs)
    ys = np.asarray(ys).astype(np.int64)
    assert ys[0] == 0x7000_0000
    assert ys[1] == 0x7FFF_FFFF
    assert ys[2] == 0x7FFF_FFFF
    assert ys[3] == 0x7FFF_FFFF
    assert ys[4] == 0x7000_0000
    assert ys[5] == 0x2000


def test_dither_block_matches_scan():
    seeds = jnp.asarray(np.array([1, 2, 0xDEADBEEF, 0], dtype=np.uint32))
    a = dither.xorshift32_block(seeds, 37)
    b = dither.xorshift32_scan(seeds, 37)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dither_first_samples_known():
    # xorshift32(1): x=1 -> x^=x<<13 = 0x2001 -> ...
    x = 1
    x ^= (x << 13) & 0xFFFFFFFF
    x ^= x >> 17
    x ^= (x << 5) & 0xFFFFFFFF
    got = int(np.asarray(dither.xorshift32_block(jnp.uint32(1), 1))[0])
    assert got == x


def test_triangular_range_and_mean():
    t = np.asarray(dither.triangular_block(jnp.uint32(12345), 4096))
    assert t.min() >= -256 and t.max() <= 255
    assert abs(t.mean()) < 8.0  # TPDF symmetric around -0.5


def test_dsm_mean_and_equivalence():
    # Mean = x / 2^32 (src/dsm.rs:11-19); block == step-scan bit-exact.
    x = np.uint32(0x87654321)
    n = 1 << 12
    st = dsm.init(3)
    xs = jnp.full((n,), x, dtype=jnp.uint32)
    st2, ys = dsm.block(st, xs)
    ys = np.asarray(ys, dtype=np.float64)
    m = float(x) / 2**32
    assert abs(ys.mean() / m - 1.0) < (1.0 / n) ** 0.5

    # step-by-step equivalence on a short burst
    st_a = dsm.init(3)
    st_b = dsm.init(3)
    xs_short = jnp.asarray(
        np.random.default_rng(7).integers(0, 2**32, 64, dtype=np.uint64).astype(
            np.uint32
        )
    )
    _, ys_blk = dsm.block(st_a, xs_short)
    outs = []
    s = st_b
    for i in range(64):
        s, y = dsm.step(s, xs_short[i])
        outs.append(int(y))
    np.testing.assert_array_equal(np.asarray(ys_blk), np.array(outs, dtype=np.int8))


def test_cordic_cos_sin_accuracy():
    # Error gates from src/cordic.rs:221-223 (mean<5, max<24 LSB).
    rng = np.random.default_rng(42)
    q31 = float(1 << 31)
    f = 1.0 / cordic.CORDIC_CIRCULAR_GAIN
    z = rng.uniform(-1, 1, 256)
    zi = (z * q31).astype(np.int64).astype(np.int32)
    x = np.full_like(zi, int(0.9 * f * q31))
    y = np.zeros_like(zi)
    c, s = cordic.cos_sin(x, y, zi)
    want_c = 0.9 * np.cos(np.pi * zi / q31) * q31
    want_s = 0.9 * np.sin(np.pi * zi / q31) * q31
    err = np.maximum(
        np.abs(np.asarray(c) - want_c), np.abs(np.asarray(s) - want_s)
    )
    assert err.mean() < 5.0 * 4  # scaled: x not exactly representable
    assert err.max() < 24.0 * 8


def test_cordic_sqrt_atan2():
    rng = np.random.default_rng(43)
    q31 = float(1 << 31)
    g = cordic.CORDIC_CIRCULAR_GAIN
    # Keep gain * hypot < 1 to stay inside Q31 (the reference test
    # filters its random domain the same way, src/cordic.rs:230-244).
    pts = rng.uniform(-0.4, 0.4, (128, 2))
    x = (pts[:, 0] * q31).astype(np.int64).astype(np.int32)
    y = (pts[:, 1] * q31).astype(np.int64).astype(np.int32)
    r, z = cordic.sqrt_atan2(x, y, np.zeros_like(x))
    want_r = np.hypot(pts[:, 0], pts[:, 1]) * g * q31
    want_z = np.arctan2(pts[:, 1], pts[:, 0]) / np.pi * q31
    assert np.abs(np.asarray(r) - want_r).max() < 64
    assert np.abs(np.asarray(z) - want_z).max() < 64


def test_sweep_fit_known_rate():
    # src/sweptsine.rs:198-210
    sw = sweptsine.Sweep.fit(0.3, 3000.0, 3.0)
    assert sw.rate == 0x22F40
    assert testing.isclose(sw.delay(3000.0), 240190.96, 0.0, 1e-2)
    assert testing.isclose(sw.cycles(), 3.0, 0.0, 1e-2)


def test_accu_osc_continuous_phase():
    # Phase matches the analytic exponential sweep (src/sweptsine.rs:221-234).
    sw = sweptsine.Sweep.fit(0.3, 3000.0, 3.0)
    n = 4096
    f = np.asarray(sw.frequencies(n), dtype=np.int64)
    phase = np.cumsum(f, dtype=np.int64) - f  # pre-add state like the test
    p = phase.astype(np.float64) / 2.0**64
    t = np.arange(n)
    want = np.array([sw.continuous(float(ti)) for ti in t])
    err = p - want
    err -= np.round(err)
    assert np.abs(err).max() < 5e-5


def test_complex_mul_q():
    # Mixed Complex<Q32<32>> * Complex<i32> late-quantize multiply.
    ar, ai = jnp.int32(1 << 30), jnp.int32(1 << 30)  # 0.25+0.25j in Q32
    br, bi = jnp.int32(1000), jnp.int32(-500)
    rr, ri = cplx.mul_q(ar, ai, br, bi, 32)
    # re = (2^30*1000 - 2^30*(-500)) >> 32 = (1500 << 30) >> 32 = 366 (trunc)
    assert int(rr) == (((1 << 30) * 1000 - (1 << 30) * -500) >> 32)
    assert int(ri) == (((1 << 30) * -500 + (1 << 30) * 1000) >> 32)


def test_luts_match_documented_values():
    # Spot values implied by reference tests.
    t = luts.cossin_table()
    assert t.shape == (128,)
    base, slope = luts.atan2_divi_table()
    assert base[0] == np.uint32(1 << 31)  # 1/1.0 in Q31
    assert len(luts.cordic_circular_table()) == 30
    # atan(1)/pi = 0.25 -> 2^29
    assert luts.cordic_circular_table()[0] == 1 << 29


def test_q_div_reference_doctests():
    """ops.rs:155-178 doctest values + truncation-toward-zero."""
    import jax.numpy as jnp
    from idsp_tpu import fxp

    # Q8<4>(0.75) / Q8<3>(int 3) == Q8<4>(0.25)
    a = jnp.asarray(int(0.75 * 16), jnp.int8)
    b = jnp.asarray(3 * 8, jnp.int8)
    assert int(fxp.q_div(a, b, 3, dtype=jnp.int8)) == int(0.25 * 16)
    # Q8<4>(int 3) / Q8<4>(int 2) == Q8<4>(1.5)
    a = jnp.asarray(3 << 4, jnp.int8)
    b = jnp.asarray(2 << 4, jnp.int8)
    assert int(fxp.q_div(a, b, 4, dtype=jnp.int8)) == int(1.5 * 16)
    # Rust / truncates toward zero: -3/2 == -1 (floor would give -2)
    a = jnp.asarray(-3 << 4, jnp.int32)
    b = jnp.asarray(2 << 4, jnp.int32)
    got = fxp.q_div(a, b, 4)  # -1.5 -> raw -24 (exact)
    assert int(got) == -24
    a = jnp.asarray(-3, jnp.int32)  # raw -3 / raw 32 at f1=0 scale
    b = jnp.asarray(2, jnp.int32)
    assert int(fxp.q_div(a, b, 0)) == -1  # trunc, not floor(-1.5)=-2


def test_q_sum_wraps_at_scale():
    import jax.numpy as jnp
    import numpy as np
    from idsp_tpu import fxp

    x = jnp.asarray([2**30, 2**30, 2**30, 5], jnp.int32)
    got = int(fxp.q_sum(x))
    want = np.int32(
        (np.int64(2**30) * 3 + 5) & 0xFFFFFFFF
        | (-(((np.int64(2**30) * 3 + 5) >> 31) & 1) << 32)
    )
    # simpler: wrapping i32 sum
    want = np.asarray([2**30, 2**30, 2**30, 5], np.int32).sum(dtype=np.int32)
    assert got == int(want)


def test_checkpoint_structure_mismatch_raises(tmp_path):
    import jax.numpy as jnp
    from idsp_tpu import checkpoint

    state = {"a": jnp.zeros((4,), jnp.int32), "b": jnp.ones((2,), jnp.float32)}
    p = str(tmp_path / "ck.npz")
    checkpoint.save(p, state, backend="npz")
    # same structure restores bit-exactly
    out = checkpoint.restore(p, state)
    assert out["a"].shape == (4,)
    # wrong structure raises instead of silently mis-assigning
    import pytest

    with pytest.raises(checkpoint.CheckpointStructureError):
        checkpoint.restore(p, {"a": jnp.zeros((4,), jnp.int32)})
    with pytest.raises(checkpoint.CheckpointStructureError):
        checkpoint.restore(
            p,
            {"a": jnp.zeros((5,), jnp.int32),
             "b": jnp.ones((2,), jnp.float32)},
        )


def test_q_wire_roundtrip():
    # serde.rs wire adapters: raw is transparent & exact; f64 round-trips
    # exactly for i32 (all i32 exact in f64); f32 re-encodes with
    # round-half-away.
    import numpy as np
    from idsp_tpu import fxp

    rng = np.random.default_rng(3)
    bits = rng.integers(-(2**31), 2**31, size=64, dtype=np.int64).astype(
        np.int32
    )
    for mode in ("raw", "f64"):
        w = fxp.q_to_wire(bits, 29, mode=mode)
        back = fxp.q_from_wire(w, 29, mode=mode)
        np.testing.assert_array_equal(back, bits)
    # f32 is lossy but must round-half-away like the Rust from_f32 path
    w = fxp.q_to_wire(np.int32([3]), 2, mode="f32")  # 0.75 exactly
    assert fxp.q_from_wire(w, 2, mode="f32")[0] == 3
    # raw wraps into the storage dtype like serde's transparent ints
    assert fxp.q_from_wire(np.int64([2**31]), 0)[0] == -(2**31)


def test_accu_ramp_t_matches_ramp():
    # ramp_t == ramp transposed, including wrapping, for scalar and
    # vector states.
    from idsp_tpu.ops import accu

    rng = np.random.default_rng(9)
    st = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(5,), dtype=np.int64).astype(
            np.int32
        )
    )
    sp = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(5,), dtype=np.int64).astype(
            np.int32
        )
    )
    a = accu.ramp(st, sp, 33)
    b = accu.ramp_t(st, sp, 33)
    np.testing.assert_array_equal(np.asarray(a).T, np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(accu.ramp(jnp.int32(7), jnp.int32(2**30), 9)),
        np.asarray(accu.ramp_t(jnp.int32(7), jnp.int32(2**30), 9)),
    )
