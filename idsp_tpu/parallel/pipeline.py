"""Pipeline parallelism: cascade stages across mesh devices.

The reference nests cascade stages in one core (`Major` scratch
pipelines, hbf.rs:385-421; stage-major SOS sweeps, py.rs:51-74).  On a
mesh, each device owns one stage and blocks stream through the chain:
device s processes block k-s at step k and hands its output to device
s+1 via `ppermute` — a software systolic pipeline with S-1 fill
bubbles, after which all stages run concurrently.

Implemented here for a homogeneous biquad (SOS) cascade: each device
holds one stage's coefficients; the payload is one time block.  The
machinery (scan over steps + neighbor ppermute + masked stage select)
generalizes to any equal-shape stage chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..filters import biquad
from .stream import replicate_from


def pipelined_sos_cascade(ba_stages, xs_blocks, f: int, axis_name: str):
    """Run an S-stage fixed-point SOS cascade pipelined over S devices.

    Runs inside `shard_map` over ``axis_name`` with size S.

    Args:
      ba_stages: (S, 5) i32 coefficients, replicated.
      xs_blocks: (nb, tb, ...) i32 input blocks, replicated.
      f: fractional bits.

    Returns:
      (nb, tb, ...) outputs of the full cascade (replicated), equal to
      the sequential stage-major sweep.
    """
    s_count = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    nb, tb = xs_blocks.shape[0], xs_blocks.shape[1]
    ch_shape = xs_blocks.shape[2:]

    my_ba = ba_stages[stage]

    def step(carry, k):
        state, prev_out = carry
        # receive the upstream device's last output
        inbox = jax.lax.ppermute(
            prev_out, axis_name, [(i, i + 1) for i in range(s_count - 1)]
        )
        # device 0 reads the source stream; block index k - stage
        my_block_idx = jnp.clip(k - stage, 0, nb - 1)
        src = jax.lax.dynamic_index_in_dim(
            xs_blocks, my_block_idx, axis=0, keepdims=False
        )
        x_in = jnp.where(stage == 0, src, inbox)
        # process one block through this device's stage
        new_state, y = biquad.df1_process_q(my_ba, f, state, x_in)
        # devices whose block index is out of range hold state instead
        active = (k - stage >= 0) & (k - stage < nb)
        new_state = jax.tree.map(
            lambda n, o: jnp.where(active, n, o), new_state, state
        )
        y = jnp.where(active, y, jnp.zeros_like(y))
        # emit the LAST stage's output, replicated
        out = replicate_from(y, axis_name, s_count - 1)
        return (new_state, y), out

    state0 = biquad.df1_init(ch_shape, jnp.int32)
    prev0 = jnp.zeros((tb,) + ch_shape, jnp.int32)
    # the scan carry is device-varying (each device holds its own stage
    # state); mark the replicated zeros accordingly for the VMA checker
    state0, prev0 = jax.lax.pcast(
        (state0, prev0), (axis_name,), to="varying"
    )
    steps = jnp.arange(nb + s_count - 1, dtype=jnp.int32)
    _, outs = jax.lax.scan(step, (state0, prev0), steps)
    # block j of the final output leaves the last device at step j + S - 1
    return outs[s_count - 1 :]


def run_pipelined_sos(mesh, ba_stages, xs_blocks, f: int, axis_name: str = "pp"):
    """Convenience jit+shard_map wrapper (replicated in/out)."""
    from jax import shard_map

    fn = jax.jit(
        shard_map(
            lambda ba, xb: pipelined_sos_cascade(ba, xb, f, axis_name),
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(),
        )
    )
    return fn(ba_stages, xs_blocks)
