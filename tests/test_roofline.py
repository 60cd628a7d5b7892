"""Static op-accounting unit tests (idsp_tpu.roofline).

The roofline's counts are load-bearing (RESULTS/ROOFLINE publish
achieved-%-of-peak derived from them), so the counting rules are
pinned here on tiny functions with hand-computable tallies.
"""

import jax
import jax.numpy as jnp
import pytest

from idsp_tpu.roofline import OpCounts, count_ops, model_time


def test_count_basic_categories():
    def f(a, b):
        s = a + b                      # f32 alu
        m = a * b                      # f32 alu
        c = s > m                      # cmp
        return jnp.where(c, s, m)      # select

    n = 8 * 128
    cnt = count_ops(f, jnp.ones((8, 128)), jnp.ones((8, 128)))
    assert cnt.f32 == 2 * n
    assert cnt.cmp == n
    assert cnt.select == n


def test_same_width_int_convert_is_free():
    """i32<->u32 converts are bit-pattern reinterprets (the emulated
    limb code's _as_u32/_as_i32) — counted as moves, not lane-ops."""
    def f(a):
        u = a.astype(jnp.uint32)       # free bitcast
        g = u.astype(jnp.float32)      # real convert
        return g

    n = 8 * 128
    cnt = count_ops(f, jnp.ones((8, 128), jnp.int32))
    assert cnt.convert == n            # only the u32 -> f32
    assert cnt.move_elems >= n         # the i32 -> u32


def test_fori_trip_count_scales_body():
    def f(x):
        return jax.lax.fori_loop(0, 7, lambda i, v: v * v + v, x)

    n = 8 * 128
    cnt = count_ops(f, jnp.ones((8, 128)))
    assert cnt.f32 == 7 * 2 * n        # mul + add per trip


def test_scan_length_scales_body():
    def f(x):
        def step(c, _):
            return c + x, None

        out, _ = jax.lax.scan(step, x, None, length=5)
        return out

    n = 8 * 128
    cnt = count_ops(f, jnp.ones((8, 128)))
    assert cnt.f32 == 5 * n


def test_mxu_flops_from_dot():
    def f(a, b):
        return a @ b

    cnt = count_ops(f, jnp.ones((64, 32)), jnp.ones((32, 16)))
    assert cnt.mxu_flops == 2 * 64 * 16 * 32


def test_model_time_is_max_of_units():
    peaks = {"vpu_issue": 1e12, "mxu": 1e14, "hbm": 1e11,
             "i32_mul": 1e11}
    cnt = OpCounts(i32=1e9, i32_mul=2e9)
    mt = model_time(cnt, peaks, hbm_bytes=1e9)
    # aggregate issue: 3e9/1e12 = 3e-3; i32_mul unit cap: 2e9/1e11 =
    # 2e-2 (binding); hbm: 1e9/1e11 = 1e-2
    assert mt["vpu"] == pytest.approx(2e-2)
    assert mt["total"] == pytest.approx(2e-2)


def test_model_time_missing_mxu_peak_raises():
    with pytest.raises(ValueError, match="mxu"):
        model_time(OpCounts(mxu_flops=10.0), {"vpu_issue": 1e12})
