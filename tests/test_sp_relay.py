"""Bit-exact time-sharded fixed-point DF1 (sequential carry relay)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from idsp_tpu.design import Filter
from idsp_tpu.filters import biquad
from idsp_tpu.parallel import make_mesh
from idsp_tpu.parallel.stream import sharded_df1_q_relay


def test_relay_matches_sequential_bitexact():
    mesh = make_mesh({"sp": 4})
    rng = np.random.default_rng(0)
    ba = biquad.quantize_ba(
        biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass()), 29
    )
    n, c = 256, 3
    xs = jnp.asarray(
        rng.integers(-(2**24), 2**24, size=(n, c), dtype=np.int64).astype(np.int32)
    )
    st = biquad.Df1State(
        x=jnp.asarray(
            rng.integers(-(2**20), 2**20, size=(c, 2), dtype=np.int64).astype(
                np.int32
            )
        ),
        y=jnp.asarray(
            rng.integers(-(2**20), 2**20, size=(c, 2), dtype=np.int64).astype(
                np.int32
            )
        ),
    )

    st_ref, ys_ref = biquad.df1_process_q(jnp.asarray(ba), 29, st, xs)

    fn = jax.jit(
        shard_map(
            lambda x: sharded_df1_q_relay(ba, st, x, 29, "sp"),
            mesh=mesh,
            in_specs=P("sp"),
            out_specs=(P(), P("sp")),
        )
    )
    st_sh, ys_sh = fn(xs)
    np.testing.assert_array_equal(np.asarray(ys_sh), np.asarray(ys_ref))
    np.testing.assert_array_equal(np.asarray(st_sh.y), np.asarray(st_ref.y))
    np.testing.assert_array_equal(np.asarray(st_sh.x), np.asarray(st_ref.x))
