"""Standalone half-band cascade Pallas kernels vs the XLA composition.

Equivalence pattern of reference src/cic.rs:305-387 (modular vs
monolithic): the one-kernel dec/int cascades must match
`hbf.hbf_dec_cascade` / `hbf.hbf_int_cascade` (axis=0) — tails are
copies of samples and must be bit-exact; f32 FIR outputs are gated at
the FMA-contraction bound (different graphs contract differently).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from idsp_tpu.filters import hbf
from idsp_tpu.filters.hbf_pallas import (
    hbf_dec_cascade_bank,
    hbf_int_cascade_bank,
)

C = 128


def _ulp_gate(have, want, k):
    have = np.asarray(have)
    want = np.asarray(want)
    scale = np.float32(max(np.abs(want).max(), 1.0))
    assert np.abs(have - want).max() <= k * np.spacing(scale)


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_dec_cascade_bank_matches_xla(depth):
    rng = np.random.default_rng(7 + depth)
    t = 1024
    x = jnp.asarray(rng.normal(size=(t, C)).astype(np.float32))

    st_ref = hbf.hbf_dec_cascade_init(depth, (C,), axis=0)
    st_pl = hbf.hbf_dec_cascade_init(depth, (C,), axis=0)
    # two blocks: exercises the carried tails across calls AND the
    # in-call grid carry (time_chunk < t)
    for blk in (x[: t // 2], x[t // 2:]):
        st_ref, y_ref = hbf.hbf_dec_cascade(st_ref, blk, axis=0)
        st_pl, y_pl = hbf_dec_cascade_bank(
            st_pl, blk, time_chunk=128, interpret=True
        )
        _ulp_gate(y_pl, y_ref, 16)
    # stage-0 tails are copies of raw input samples: bit-exact; later
    # stages carry upstream FIR outputs: FMA-contraction gate
    np.testing.assert_array_equal(np.asarray(st_pl[0].odd),
                                  np.asarray(st_ref[0].odd))
    np.testing.assert_array_equal(np.asarray(st_pl[0].even),
                                  np.asarray(st_ref[0].even))
    for a, b in zip(st_pl[1:], st_ref[1:]):
        _ulp_gate(a.odd, b.odd, 16)
        _ulp_gate(a.even, b.even, 16)


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_int_cascade_bank_matches_xla(depth):
    rng = np.random.default_rng(17 + depth)
    t = 256
    x = jnp.asarray(rng.normal(size=(t, C)).astype(np.float32))

    st_ref = hbf.hbf_int_cascade_init(depth, (C,), axis=0)
    st_pl = hbf.hbf_int_cascade_init(depth, (C,), axis=0)
    for blk in (x[: t // 2], x[t // 2:]):
        st_ref, y_ref = hbf.hbf_int_cascade(st_ref, blk, axis=0)
        st_pl, y_pl = hbf_int_cascade_bank(
            st_pl, blk, time_chunk=32, interpret=True
        )
        assert y_pl.shape == ((t // 2) << depth, C)
        _ulp_gate(y_pl, y_ref, 16)
    # the stage-0 tail is a raw input copy: bit-exact; later stages
    # carry upstream interpolated output (half FIR values): FMA gate
    np.testing.assert_array_equal(np.asarray(st_pl[0].x),
                                  np.asarray(st_ref[0].x))
    for a, b in zip(st_pl[1:], st_ref[1:]):
        _ulp_gate(a.x, b.x, 16)


def test_channel_sharded_cascades_bitexact():
    """Both cascade kernels under channel (dp) sharding: per-channel
    FIR math is independent — N-device results are BIT-identical."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from idsp_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh({"dp": n_dev})
    c2 = 128 * n_dev
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(256, c2)).astype(np.float32))

    def run_dec(s, xv):
        return hbf_dec_cascade_bank(s, xv, time_chunk=128, interpret=True)

    st = hbf.hbf_dec_cascade_init(3, (c2,), axis=0)
    st_ref, y_ref = run_dec(st, x)
    sspec = (hbf.HbfDecState(odd=P(None, "dp"), even=P(None, "dp")),) * 3
    fn = jax.jit(
        shard_map(
            run_dec, mesh=mesh,
            in_specs=(sspec, P(None, "dp")),
            out_specs=(sspec, P(None, "dp")),
            # JAX 0.9.0 interpret-mode vma limitation; repro + exit gate:
            # scripts/jax_vma_repro.py (re-test on each JAX upgrade)
            check_vma=False,
        )
    )
    st_sh, y_sh = fn(st, x)
    np.testing.assert_array_equal(np.asarray(y_sh), np.asarray(y_ref))

    xl = jnp.asarray(rng.normal(size=(32, c2)).astype(np.float32))

    def run_int(s, xv):
        return hbf_int_cascade_bank(s, xv, time_chunk=16, interpret=True)

    sti = hbf.hbf_int_cascade_init(3, (c2,), axis=0)
    sti_ref, yi_ref = run_int(sti, xl)
    ispec = (hbf.HbfIntState(x=P(None, "dp")),) * 3
    fni = jax.jit(
        shard_map(
            run_int, mesh=mesh,
            in_specs=(ispec, P(None, "dp")),
            out_specs=(ispec, P(None, "dp")),
            # JAX 0.9.0 interpret-mode vma limitation; repro + exit gate:
            # scripts/jax_vma_repro.py (re-test on each JAX upgrade)
            check_vma=False,
        )
    )
    sti_sh, yi_sh = fni(sti, xl)
    np.testing.assert_array_equal(np.asarray(yi_sh), np.asarray(yi_ref))


def test_rate_conversion_kernel_path_depth4():
    """BASELINE config #4 via the one-kernel cascades at depth 4 ==
    the XLA pipeline (time-major), FMA-contraction gated."""
    from idsp_tpu.pipelines import rate_conversion

    rng = np.random.default_rng(4)
    t = 512
    x = jnp.asarray(rng.normal(size=(t, C)).astype(np.float32))
    st_k = rate_conversion.init_t(4, (C,))
    st_x = rate_conversion.init_t(4, (C,))
    st_k, y_k = rate_conversion.round_trip_t(
        st_k, x, use_kernel=True, interpret=True
    )
    st_x, y_x = rate_conversion.round_trip_t(st_x, x)
    assert y_k.shape == (t, C)
    _ulp_gate(y_k, y_x, 32)


def test_round_trip_dec_int_kernels():
    """16x-style round trip (BASELINE config #4 core) through both
    kernels: int(dec(x)) passes a tone within the cascade passband."""
    depth = 3
    t = 2048
    n = np.arange(t)
    f0 = 0.01  # well inside the 0.4/2**depth passband of the low rate
    x = jnp.asarray(
        np.broadcast_to(
            np.cos(2 * np.pi * f0 * n)[:, None], (t, C)
        ).astype(np.float32)
    )
    dst = hbf.hbf_dec_cascade_init(depth, (C,), axis=0)
    ist = hbf.hbf_int_cascade_init(depth, (C,), axis=0)
    dst, low = hbf_dec_cascade_bank(dst, x, time_chunk=256, interpret=True)
    ist, y = hbf_int_cascade_bank(ist, low, time_chunk=32, interpret=True)
    assert y.shape == (t, C)
    # equivalence vs the XLA round-trip composition (the
    # rate_conversion pipeline's core), FMA-contraction gated
    dst2 = hbf.hbf_dec_cascade_init(depth, (C,), axis=0)
    ist2 = hbf.hbf_int_cascade_init(depth, (C,), axis=0)
    _, low_ref = hbf.hbf_dec_cascade(dst2, x, axis=0)
    _, y_ref = hbf.hbf_int_cascade(ist2, low_ref, axis=0)
    _ulp_gate(y, y_ref, 32)


def test_dec_cascade_mxu_matches_xla():
    # banded-MXU cascade (round 5): each stage is one (n_out, K) x
    # (K, c) dot against a static banded operator.  Output and the
    # stage>=1 carried states (copies of MXU-computed intermediates)
    # match the XLA cascade to FMA-contraction tolerance; the stage-0
    # carry (copies of raw input) and streaming identity are exact.
    from idsp_tpu.filters.hbf_pallas import hbf_dec_cascade_mxu

    t, c = 256, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    st_ref, y_ref = hbf.hbf_dec_cascade(
        hbf.hbf_dec_cascade_init(3, (c,), axis=0), x, axis=0)
    st_m, y_m = hbf_dec_cascade_mxu(
        hbf.hbf_dec_cascade_init(3, (c,), axis=0), x, block=64,
        interpret=True)
    sc = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_m - y_ref).max()) < 1e-5 * sc
    np.testing.assert_array_equal(np.asarray(st_m[0].odd),
                                  np.asarray(st_ref[0].odd))
    np.testing.assert_array_equal(np.asarray(st_m[0].even),
                                  np.asarray(st_ref[0].even))
    for a, b in zip(st_m[1:], st_ref[1:]):
        assert float(jnp.abs(a.odd - b.odd).max()) < 1e-5 * sc
        assert float(jnp.abs(a.even - b.even).max()) < 1e-5 * sc

    st_s = hbf.hbf_dec_cascade_init(3, (c,), axis=0)
    st_s, ya = hbf_dec_cascade_mxu(st_s, x[: t // 2], block=64,
                                   interpret=True)
    _, yb = hbf_dec_cascade_mxu(st_s, x[t // 2:], block=64,
                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([ya, yb], axis=0)), np.asarray(y_m))


def test_int_cascade_mxu_matches_xla():
    # interpolation twin of the banded-MXU cascade: FIR rows even,
    # center-tap delay rows odd, per Toeplitz window dot.
    from idsp_tpu.filters.hbf_pallas import hbf_int_cascade_mxu

    t, c = 64, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    st_r, y_ref = hbf.hbf_int_cascade(
        hbf.hbf_int_cascade_init(3, (c,), axis=0), x, axis=0)
    st_m, y_m = hbf_int_cascade_mxu(
        hbf.hbf_int_cascade_init(3, (c,), axis=0), x, block=32,
        sub=16, interpret=True)
    sc = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_m - y_ref).max()) < 5e-5 * sc
    np.testing.assert_array_equal(np.asarray(st_m[0].x),
                                  np.asarray(st_r[0].x))
    for a, b in zip(st_m[1:], st_r[1:]):
        assert float(jnp.abs(a.x - b.x).max()) < 5e-5 * sc

    st_s = hbf.hbf_int_cascade_init(3, (c,), axis=0)
    st_s, ya = hbf_int_cascade_mxu(st_s, x[: t // 2], block=32, sub=16,
                                   interpret=True)
    _, yb = hbf_int_cascade_mxu(st_s, x[t // 2:], block=32, sub=16,
                                interpret=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([ya, yb], axis=0)), np.asarray(y_m))


def test_round_trip_mxu_kernels():
    # rate_conversion round trip through the banded-MXU cascades
    from idsp_tpu.pipelines import rate_conversion as rc

    t, c, depth = 256, 128, 4
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    _, y_ref = rc.round_trip_t(rc.init_t(depth, (c,)), x)
    _, y_m = rc.round_trip_t(rc.init_t(depth, (c,)), x,
                             use_kernel="mxu", interpret=True)
    sc = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y_m - y_ref).max()) < 5e-5 * max(sc, 1e-9)
