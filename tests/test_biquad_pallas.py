"""Pallas biquad bank kernel: bit-exactness vs the scan reference."""

import numpy as np
import jax
import jax.numpy as jnp

from idsp_tpu.design import Filter
from idsp_tpu.filters import biquad
from idsp_tpu.filters.biquad_pallas import df1_bank_q


def test_pallas_df1_bank_bitexact():
    c, t = 128, 512
    rng = np.random.default_rng(0)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass()), 29
        )
    )
    xs = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    st = biquad.Df1State(
        x=jnp.asarray(
            rng.integers(-(2**31), 2**31, size=(c, 2), dtype=np.int64).astype(
                np.int32
            )
        ),
        y=jnp.asarray(
            rng.integers(-(2**31), 2**31, size=(c, 2), dtype=np.int64).astype(
                np.int32
            )
        ),
    )

    st_ref, ys_ref = biquad.df1_process_q(ba_q, 29, st, xs)
    st_pl, ys_pl = df1_bank_q(
        ba_q, st, xs, 29, time_chunk=128, interpret=True
    )

    np.testing.assert_array_equal(np.asarray(ys_pl), np.asarray(ys_ref))
    np.testing.assert_array_equal(np.asarray(st_pl.x), np.asarray(st_ref.x))
    np.testing.assert_array_equal(np.asarray(st_pl.y), np.asarray(st_ref.y))


def test_pallas_df1_bank_gain_extremes():
    # saturated coefficients and extreme inputs still match bit-for-bit
    c, t = 128, 256
    ba_q = jnp.asarray(
        np.array(
            [2**31 - 1, -(2**31), 0x1234_5678, -0x0765_4321, 1], np.int64
        ).astype(np.int32)
    )
    xs = jnp.asarray(
        np.tile(
            np.array(
                [2**31 - 1, -(2**31), 0, 1, -1, 0x7FFF, -0x8000], np.int64
            ).astype(np.int32),
            (t // 7 + 1,),
        )[: t, None].repeat(c, axis=1)
    )
    st = biquad.df1_init((c,), jnp.int32)
    _, ys_ref = biquad.df1_process_q(ba_q, 30, st, xs)
    _, ys_pl = df1_bank_q(ba_q, st, xs, 30, time_chunk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ys_pl), np.asarray(ys_ref))


def test_pallas_sos_cascade_bitexact():
    from idsp_tpu.filters.biquad_pallas import sos_bank_q

    c, t = 128, 256
    rng = np.random.default_rng(7)
    bas = np.stack(
        [
            biquad.quantize_ba(
                biquad.from_cookbook(Filter().critical_frequency(fc).lowpass()),
                29,
            )
            for fc in (0.05, 0.1, 0.15)
        ]
    )
    xs = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    states = [biquad.df1_init((c,), jnp.int32) for _ in range(3)]
    sts_pl, ys_pl = sos_bank_q(bas, states, xs, 29, time_chunk=128, interpret=True)

    # stage-major reference
    y = xs
    refs = []
    for i in range(3):
        st = biquad.df1_init((c,), jnp.int32)
        st, y = biquad.df1_process_q(jnp.asarray(bas[i]), 29, st, y)
        refs.append(st)
    np.testing.assert_array_equal(np.asarray(ys_pl), np.asarray(y))
    for a, b in zip(sts_pl, refs):
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))


def test_pallas_f32_bank_matches_scan():
    from idsp_tpu.filters.biquad_pallas import df1_bank_f32

    c, t = 128, 256
    rng = np.random.default_rng(5)
    ba = biquad.from_cookbook(
        Filter().critical_frequency(0.07).lowpass()
    ).astype(np.float32)
    xs = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    st = biquad.df1_init((c,), jnp.float32)
    st_ref, ys_ref = biquad.df1_process(jnp.asarray(ba), st, xs)
    st_pl, ys_pl = df1_bank_f32(ba, st, xs, time_chunk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ys_pl), np.asarray(ys_ref))
    np.testing.assert_array_equal(np.asarray(st_pl.y), np.asarray(st_ref.y))


def test_pallas_wdf_bank_bitexact():
    from idsp_tpu.filters import wdf
    from idsp_tpu.filters.wdf_pallas import wdf_bank

    c, t = 128, 256
    rng = np.random.default_rng(6)
    tpas = wdf.nibbles(0xAD, 2)
    a = wdf.quantize(tpas, [-0.9, 0.9])
    xs = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(t, c), dtype=np.int64).astype(np.int32)
    )
    st = wdf.init(2, (c,))

    # reference scan (channels on trailing axes)
    st_ref, ys_ref = wdf.block(tpas, jnp.asarray(a), st, xs)
    st_pl, ys_pl = wdf_bank(tpas, a, st, xs, time_chunk=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ys_pl), np.asarray(ys_ref))
    np.testing.assert_array_equal(np.asarray(st_pl.z), np.asarray(st_ref.z))
