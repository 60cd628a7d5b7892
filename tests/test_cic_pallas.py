"""CIC bank kernels vs the XLA block paths — bit-exact.

Pure wrapping integer arithmetic: the kernel integrator cascade must
reproduce `cic.decimate_block` / `cic.interpolate_block` (axis=0)
exactly, including carried integrator/comb/zoh state (the cic.rs:305-387
modular-equivalence pattern, third implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from idsp_tpu.filters import cic
from idsp_tpu.filters.cic_pallas import cic_dec_bank, cic_int_bank

C = 128


def _eq(a, b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _eq_state(a: cic.CicState, b: cic.CicState):
    _eq(a.combs, b.combs)
    _eq(a.integrators, b.integrators)
    _eq(a.zoh, b.zoh)


@pytest.mark.parametrize("n,m,rate", [(3, 1, 15), (2, 2, 7), (1, 1, 3)])
def test_cic_dec_bank_bit_exact(n, m, rate):
    rng = np.random.default_rng(100 + n)
    t = 960 if rate == 15 else 512
    # full-range wrapping input: decimator arithmetic wraps by design
    x = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, C), dtype=np.int64).astype(
            np.int32
        )
    )
    st_ref = cic.init(n, m, (C,))
    st_pl = cic.init(n, m, (C,))
    for blk in (x[: t // 2], x[t // 2:]):
        st_ref, y_ref = cic.decimate_block(st_ref, blk, rate, axis=0)
        st_pl, y_pl = cic_dec_bank(st_pl, blk, rate, time_chunk=240,
                                   interpret=True)
        _eq(y_pl, y_ref)
    _eq_state(st_pl, st_ref)


def test_channel_sharded_cic_dec_bitexact():
    """cic_dec_bank under channel (dp) sharding: per-channel integer
    math is independent — the 8-device result is BIT-identical."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from idsp_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh({"dp": n_dev})
    c2 = 128 * n_dev
    t = 480
    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(t, c2), dtype=np.int64).astype(
            np.int32
        )
    )
    st = cic.init(3, 1, (c2,))

    def run(s, xv):
        return cic_dec_bank(s, xv, 15, time_chunk=240, interpret=True)

    st_ref, y_ref = run(st, x)
    st_spec = cic.CicState(
        combs=P("dp", None, None), integrators=P("dp", None), zoh=P("dp")
    )
    fn = jax.jit(
        shard_map(
            run, mesh=mesh,
            in_specs=(st_spec, P(None, "dp")),
            out_specs=(st_spec, P(None, "dp")),
            # JAX 0.9.0 interpret-mode vma limitation; repro + exit gate:
            # scripts/jax_vma_repro.py (re-test on each JAX upgrade)
            check_vma=False,
        )
    )
    st_sh, y_sh = fn(st, x)
    _eq(y_sh, y_ref)
    _eq_state(st_sh, st_ref)


@pytest.mark.parametrize("n,m,rate", [(3, 1, 15), (2, 2, 7)])
def test_cic_int_bank_bit_exact(n, m, rate):
    rng = np.random.default_rng(200 + n)
    t = 128
    # bounded input so the interpolator integrators do not overflow
    # (cic.rs:149-172 contract)
    lim = 2**31 // cic.gain(rate, n, m) // 4
    x = jnp.asarray(
        rng.integers(-lim, lim, size=(t, C), dtype=np.int64).astype(
            np.int32
        )
    )
    st_ref = cic.init(n, m, (C,))
    st_pl = cic.init(n, m, (C,))
    for blk in (x[: t // 2], x[t // 2:]):
        st_ref, y_ref = cic.interpolate_block(st_ref, blk, rate, axis=0)
        st_pl, y_pl = cic_int_bank(st_pl, blk, rate, time_chunk=256,
                                   interpret=True)
        assert y_pl.shape == ((t // 2) * (rate + 1), C)
        _eq(y_pl, y_ref)
    _eq_state(st_pl, st_ref)
