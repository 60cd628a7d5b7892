"""Minimal reproducer: Pallas INTERPRET mode cannot run under
shard_map's vma checker on JAX 0.9.0.

Seven test sites pass ``check_vma=False`` for exactly this reason
(tests/test_hbf_pallas.py, tests/test_halo_rdma.py,
tests/test_parallel.py, tests/test_cic_pallas.py); the COMPILED path
runs with the checker ON in the device validator
(scripts/tpu_validate_kernels.py, "fused cascade vma" entry).

Mechanism: in interpret mode the kernel body is replayed as regular
traced ops, and constants created INSIDE the body carry an empty vma
set while the block inputs carry {mesh axis}; the first mixed op
fails with:

    ValueError: Primitive mul requires varying manual axes to match,
    but got [frozenset({'dp'}), frozenset()]. Please open an issue at
    https://github.com/jax-ml/jax/issues and as a temporary
    workaround pass the check_vma=False argument to `jax.shard_map`

(Declaring ``vma=`` on the pallas_call out_shape does not help — the
failure is inside the replayed body, before the output is formed.)
No egress from this environment to file/locate the upstream issue;
re-run this script on each JAX upgrade and drop the workarounds when
it prints OK.

Run: python scripts/jax_vma_repro.py   (exit 0 = fixed upstream,
exit 1 = still broken, workaround still required)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax import shard_map  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.sharding import Mesh  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> int:
    def kern(x_ref, o_ref):
        # the in-body constant 2.0 replays with empty vma under
        # interpret mode — that's the whole bug
        o_ref[...] = x_ref[...] * jnp.float32(2.0)

    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(
                x.shape, x.dtype, vma=frozenset({"dp"})
            ),
            interpret=True,
        )(x)

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    g = jax.jit(
        shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"))
    )
    try:
        out = g(jnp.ones((4, 8), jnp.float32))
    except ValueError as e:
        print(f"jax {jax.__version__}: still broken — keep the "
              f"check_vma=False workarounds\n  {str(e)[:200]}")
        return 1
    assert float(jnp.sum(out)) == 64.0
    print(f"jax {jax.__version__}: FIXED — remove the check_vma=False "
          "workarounds (grep tests/ for this script's name)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
