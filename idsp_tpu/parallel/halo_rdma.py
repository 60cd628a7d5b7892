"""Pallas remote-DMA halo exchange (ICI RDMA).

`halo_exchange_prev` (parallel/stream.py) moves FIR overlap-save tails
with an XLA `ppermute` — correct, but each hop is a full XLA collective
with its own scheduling.  This module provides the latency-oriented
alternative the SURVEY (§5 communication backend) calls for: a Pallas
kernel that ships the block tail directly into the right neighbor's
VMEM with `pltpu.make_async_remote_copy`, synchronized by a neighbor
barrier — the reference's block-edge `copy_within` state carry
(hbf.rs:93-101) become a one-hop RDMA.

The transfer is a symmetric ring (device n-1 wraps to 0) so every
device both sends and receives — the wrapped entry into device 0 is
masked to ``fill`` afterwards, mirroring `halo_exchange_prev`.

Runs inside `shard_map` over a 1-D mesh axis.  On CPU meshes the
kernel runs in TPU interpret mode (`pltpu.InterpretParams` simulates
cross-device DMA), which is how the 8-device equivalence test runs
without hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def halo_exchange_prev_rdma(x, axis_name: str, h: int = 1, *, fill=0,
                            interpret=None, collective_id: int = 7):
    """Return the ``h`` rows preceding this device's block via RDMA.

    Drop-in equivalent of `stream.halo_exchange_prev` (device 0 gets
    ``fill``), but the hop is a Pallas `make_async_remote_copy` over
    ICI instead of an XLA `ppermute`.

    Args:
      x: this device's (n, ...) time-major block (inside shard_map).
      interpret: None = auto (interpret on CPU backends); or pass an
        explicit bool / `pltpu.InterpretParams`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    n = x.shape[0]
    assert h <= n

    def kernel(x_ref, out_ref, send_sem, recv_sem):
        num = jnp.int32(jax.lax.axis_size(axis_name))
        my = jax.lax.axis_index(axis_name).astype(jnp.int32)
        right = jax.lax.rem(my + jnp.int32(1), num)
        left = jax.lax.rem(my + num - jnp.int32(1), num)

        # Neighbor barrier: the destination's output buffer must exist
        # before data lands in it.
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)

        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(n - h, h)],
            dst_ref=out_ref,
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()

    out = pl.pallas_call(
        kernel,
        # vma: the output varies over the mesh axis (each device gets
        # its neighbor's tail) — required by shard_map's VMA checker.
        out_shape=jax.ShapeDtypeStruct(
            (h,) + x.shape[1:], x.dtype, vma=frozenset({axis_name})
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=interpret,
    )(x)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, jnp.full_like(out, fill), out)
