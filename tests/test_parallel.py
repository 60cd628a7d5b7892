"""Distributed-vs-single-device equivalence (SURVEY.md §4.10).

The reference's cross-implementation equivalence pattern (cic.rs:305-387)
applied across the mesh: the same bits/values must come out of the
1-device and N-device shardings.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from idsp_tpu.filters import biquad
from idsp_tpu.parallel import make_mesh, sharded_df1_float
from idsp_tpu.parallel.stream import halo_exchange_prev, time_sharded_prev


def test_halo_exchange_prev():
    mesh = make_mesh({"sp": 4})
    x = jnp.arange(32, dtype=jnp.int32).reshape(32)  # 8 per device

    def f(x):
        return halo_exchange_prev(x, "sp", 2, fill=-1)

    out = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("sp"), out_specs=P("sp"))
    )(x)
    out = np.asarray(out).reshape(4, 2)
    np.testing.assert_array_equal(out[0], [-1, -1])
    np.testing.assert_array_equal(out[1], [6, 7])
    np.testing.assert_array_equal(out[2], [14, 15])
    np.testing.assert_array_equal(out[3], [22, 23])


def test_time_sharded_prev():
    mesh = make_mesh({"sp": 4})
    x = jnp.arange(16, dtype=jnp.int32)

    def f(x):
        prev, valid = time_sharded_prev(
            x, "sp", jnp.int32(-7), jnp.asarray(False)
        )
        return prev, valid

    prev, valid = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("sp"), out_specs=(P("sp"), P("sp")))
    )(x)
    prev = np.asarray(prev)
    valid = np.asarray(valid)
    want_prev = np.concatenate([[-7], np.arange(15)])
    np.testing.assert_array_equal(prev, want_prev)
    assert not valid[0] and valid[1:].all()


def test_sharded_df1_matches_sequential():
    mesh = make_mesh({"sp": 8})
    rng = np.random.default_rng(11)
    from idsp_tpu.design import Filter

    ba = jnp.asarray(
        biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass())
    )
    n, c = 256, 3
    xs = jnp.asarray(rng.normal(size=(n, c)))
    st = biquad.Df1State(
        x=jnp.asarray(rng.normal(size=(c, 2))),
        y=jnp.asarray(rng.normal(size=(c, 2))),
    )

    # sequential reference
    st_ref, ys_ref = biquad.df1_process(ba, st, xs)

    def f(xs):
        return sharded_df1_float(ba, st, xs, "sp")

    st_sh, ys_sh = jax.jit(
        shard_map(
            f,
            mesh=mesh,
            in_specs=P("sp"),
            out_specs=(P(), P("sp")),
        )
    )(xs)

    np.testing.assert_allclose(
        np.asarray(ys_sh), np.asarray(ys_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_sh.y), np.asarray(st_ref.y), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_array_equal(np.asarray(st_sh.x), np.asarray(st_ref.x))


def test_channel_sharded_fm_bank():
    """A bank of FM channels sharded over the mesh gives the same bits
    as unsharded execution."""
    from jax.sharding import NamedSharding

    from idsp_tpu.pipelines import fm_disc

    mesh = make_mesh({"dp": 8})
    c, n = 16, 128
    rng = np.random.default_rng(5)
    phases = rng.integers(-(2**31), 2**31, size=(n, c), dtype=np.int64).astype(
        np.int32
    )
    from idsp_tpu.ops.trig import cossin

    re, im = cossin(jnp.asarray(phases))
    ba_q = jnp.asarray(fm_disc.deemphasis_coefficients(0.02))
    st = fm_disc.init_state((c,))

    _, y_ref = fm_disc.fm_receiver(st, re, im, jnp.int32(1000), ba_q)

    sh = NamedSharding(mesh, P(None, "dp"))
    re_s = jax.device_put(re, sh)
    im_s = jax.device_put(im, sh)
    _, y_sh = fm_disc.fm_receiver(st, re_s, im_s, jnp.int32(1000), ba_q)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_sh))
