"""RDMA halo exchange: equivalence with the ppermute path on an
8-device virtual mesh (Pallas TPU interpret mode simulates the
cross-device DMAs on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from idsp_tpu.parallel import make_mesh
from idsp_tpu.parallel.stream import halo_exchange_prev


def test_rdma_halo_matches_ppermute():
    from idsp_tpu.parallel.halo_rdma import halo_exchange_prev_rdma

    mesh = make_mesh({"sp": 8})
    t_loc, c = 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(-(2**30), 2**30, size=(8 * t_loc, c),
                     dtype=np.int64).astype(np.int32)
    )

    def via_ppermute(x):
        return halo_exchange_prev(x, "sp", 3, fill=-7)

    def via_rdma(x):
        return halo_exchange_prev_rdma(x, "sp", 3, fill=-7, interpret=True)

    f_pp = jax.jit(
        shard_map(via_ppermute, mesh=mesh, in_specs=P("sp"),
                  out_specs=P("sp"))
    )
    f_rd = jax.jit(
        shard_map(via_rdma, mesh=mesh, in_specs=P("sp"),
                  # JAX 0.9.0 interpret-mode vma limitation; repro + exit gate:
                  # scripts/jax_vma_repro.py (re-test on each JAX upgrade)
                  out_specs=P("sp"), check_vma=False)
    )
    want = np.asarray(f_pp(x))
    got = np.asarray(f_rd(x))
    np.testing.assert_array_equal(got, want)


def test_rdma_halo_single_device_self_ring():
    """Size-1 axis: the ring wraps to self; masked output is all fill."""
    from idsp_tpu.parallel.halo_rdma import halo_exchange_prev_rdma

    mesh = make_mesh({"sp": 1})
    x = jnp.arange(32, dtype=jnp.int32).reshape(16, 2)

    f = jax.jit(
        shard_map(
            lambda x: halo_exchange_prev_rdma(x, "sp", 2, fill=9,
                                              interpret=True),
            mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
            # JAX 0.9.0 interpret-mode vma limitation; repro + exit gate:
            # scripts/jax_vma_repro.py (re-test on each JAX upgrade)
            check_vma=False,
        )
    )
    out = np.asarray(f(x))
    np.testing.assert_array_equal(out, np.full((2, 2), 9, np.int32))
