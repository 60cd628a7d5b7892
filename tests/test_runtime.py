"""Host streaming runtime: native ring buffer + StreamExecutor.

The streamed run must be bit-identical to the one-shot run over the
concatenated input — the package-wide carried-state block contract
(the reference's explicit block-edge state carry, src/hbf.rs:93-101).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from idsp_tpu.design import Filter
from idsp_tpu.filters import biquad
from idsp_tpu.runtime import RingBuffer, StreamExecutor, producer_thread


def test_ringbuffer_roundtrip_and_wraparound():
    rb = RingBuffer(256)  # rounds to a small power of two
    cap = rb.capacity
    assert cap >= 256 and rb.writable == cap and rb.readable == 0

    data = np.arange(50, dtype=np.int32)
    assert rb.try_write(data)
    assert rb.readable == data.nbytes
    out = rb.read(50, np.int32, timeout=1.0)
    np.testing.assert_array_equal(out, data)
    assert rb.readable == 0

    # force wrap-around: repeatedly write/read chunks whose size does
    # not divide the capacity
    chunk = np.arange(13, dtype=np.int32)
    for k in range(40):
        assert rb.try_write(chunk + 100 * k)
        got = rb.read(13, np.int32, timeout=1.0)
        np.testing.assert_array_equal(got, chunk + 100 * k)

    # oversize write must be rejected whole (all-or-nothing)
    too_big = np.zeros(cap // 4 + 1, np.int32)
    while rb.try_write(np.zeros(64, np.int32)):
        pass  # fill up
    assert not rb.try_write(too_big)


def test_ringbuffer_eof_semantics():
    rb = RingBuffer(1024)
    rb.try_write(np.arange(8, dtype=np.int32))
    rb.close()
    # drains what remains...
    np.testing.assert_array_equal(
        rb.read(8, np.int32, timeout=1.0), np.arange(8, dtype=np.int32)
    )
    # ...then reports EOF instead of blocking
    assert rb.read(8, np.int32, timeout=1.0) is None


def test_ringbuffer_threaded_producer():
    # ring must hold a full read quantum (1000 items) plus an in-flight
    # producer chunk (777) — writes/reads are all-or-nothing
    rb = RingBuffer(16384)
    total = np.arange(100_000, dtype=np.int32)
    th = producer_thread(rb, total, chunk_items=777)
    got = []
    while True:
        buf = rb.read(1000, np.int32, timeout=10.0)
        if buf is None:
            break
        got.append(buf)
    th.join(timeout=10.0)
    np.testing.assert_array_equal(np.concatenate(got), total)


def test_stream_executor_bitexact_vs_oneshot():
    c, tb, nb = 64, 128, 10
    rng = np.random.default_rng(21)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.05).lowpass()),
            29,
        )
    )
    xs = rng.integers(
        -(2**27), 2**27, size=(nb * tb, c), dtype=np.int64
    ).astype(np.int32)

    # one-shot reference over the concatenated stream
    st_ref, ys_ref = biquad.df1_process_q(
        ba_q, 29, biquad.df1_init((c,), jnp.int32), jnp.asarray(xs)
    )

    block_fn = jax.jit(lambda s, x: biquad.df1_process_q(ba_q, 29, s, x))
    ex = StreamExecutor(
        block_fn, biquad.df1_init((c,), jnp.int32), (tb, c),
        dtype=np.int32, ring_blocks=4, max_inflight=2, timeout=20.0,
    )
    producer_thread(ex.ring, xs, chunk_items=941)  # irregular chunks
    st, ys = ex.run()

    assert ex.blocks_processed == nb
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y) for y in ys]), np.asarray(ys_ref)
    )
    np.testing.assert_array_equal(np.asarray(st.y), np.asarray(st_ref.y))
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st_ref.x))


def test_stream_executor_timeout_on_stall():
    ex = StreamExecutor(
        jax.jit(lambda s, x: (s, x)), jnp.zeros(()), (16, 4),
        dtype=np.int32, timeout=0.2,
    )
    t0 = time.perf_counter()
    try:
        ex.run(n_blocks=1)
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        pass
    assert time.perf_counter() - t0 < 5.0


def test_stream_executor_overlap_monitor_mode():
    # collect=False keeps only the carried state (monitor/telemetry use)
    c, tb, nb = 64, 64, 6
    rng = np.random.default_rng(22)
    xs = rng.integers(-(2**20), 2**20, size=(nb * tb, c),
                      dtype=np.int64).astype(np.int32)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.1).lowpass()),
            29,
        )
    )
    block_fn = jax.jit(lambda s, x: biquad.df1_process_q(ba_q, 29, s, x))
    ex = StreamExecutor(
        block_fn, biquad.df1_init((c,), jnp.int32), (tb, c),
        dtype=np.int32, timeout=20.0,
    )

    # slow producer on a thread: the executor must wait, not misread
    def slow_feed():
        for k in range(nb):
            time.sleep(0.02)
            ex.ring.write(xs[k * tb:(k + 1) * tb], timeout=10.0)
        ex.ring.close()

    th = threading.Thread(target=slow_feed, daemon=True)
    th.start()
    st, ys = ex.run(collect=False)
    th.join(timeout=10.0)
    assert ys is None and ex.blocks_processed == nb
    st_ref, _ = biquad.df1_process_q(
        ba_q, 29, biquad.df1_init((c,), jnp.int32), jnp.asarray(xs)
    )
    np.testing.assert_array_equal(np.asarray(st.y), np.asarray(st_ref.y))


def test_stream_executor_duplex_out_ring():
    # duplex: a consumer thread drains results from an output ring
    # while the executor computes — byte stream equals the one-shot run
    c, tb, nb = 64, 64, 8
    rng = np.random.default_rng(23)
    xs = rng.integers(-(2**26), 2**26, size=(nb * tb, c),
                      dtype=np.int64).astype(np.int32)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.08).lowpass()),
            29,
        )
    )
    block_fn = jax.jit(lambda s, x: biquad.df1_process_q(ba_q, 29, s, x))
    ex = StreamExecutor(
        block_fn, biquad.df1_init((c,), jnp.int32), (tb, c),
        dtype=np.int32, timeout=20.0,
    )
    from idsp_tpu.runtime import RingBuffer as RB

    out_ring = RB(4 * tb * c * 4)
    drained = []

    def consume():
        while True:
            buf = out_ring.read(tb * c, np.int32, timeout=10.0)
            if buf is None:
                return
            drained.append(buf.reshape(tb, c))

    th_c = threading.Thread(target=consume, daemon=True)
    th_c.start()
    producer_thread(ex.ring, xs, chunk_items=1333)
    st, _ = ex.run(collect=False, out_ring=out_ring)
    th_c.join(timeout=20.0)

    _, ys_ref = biquad.df1_process_q(
        ba_q, 29, biquad.df1_init((c,), jnp.int32), jnp.asarray(xs)
    )
    assert len(drained) == nb
    np.testing.assert_array_equal(
        np.concatenate(drained), np.asarray(ys_ref)
    )


def test_stream_executor_with_channel_sharding():
    # the executor composes with mesh sharding: the jitted stage runs
    # channel-sharded over the 8-device CPU mesh, streamed == one-shot
    from jax.sharding import NamedSharding, PartitionSpec as P

    from idsp_tpu.parallel import make_mesh

    c, tb, nb = 128, 64, 6
    mesh = make_mesh({"dp": 8})
    shard = NamedSharding(mesh, P(None, "dp"))
    rng = np.random.default_rng(24)
    xs = rng.integers(-(2**26), 2**26, size=(nb * tb, c),
                      dtype=np.int64).astype(np.int32)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.03).lowpass()),
            29,
        )
    )

    @jax.jit
    def block_fn(s, x):
        return biquad.df1_process_q(
            ba_q, 29, s, jax.lax.with_sharding_constraint(x, shard)
        )

    ex = StreamExecutor(
        block_fn, biquad.df1_init((c,), jnp.int32), (tb, c),
        dtype=np.int32, timeout=20.0,
    )
    producer_thread(ex.ring, xs)
    st, ys = ex.run()
    st_ref, ys_ref = biquad.df1_process_q(
        ba_q, 29, biquad.df1_init((c,), jnp.int32), jnp.asarray(xs)
    )
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y) for y in ys]), np.asarray(ys_ref)
    )
    np.testing.assert_array_equal(np.asarray(st.y), np.asarray(st_ref.y))


def test_stream_executor_checkpoint_resume(tmp_path):
    # crash-resume: state checkpointed every 2 blocks; a fresh executor
    # restored from the checkpoint finishes the stream identically
    from idsp_tpu import checkpoint

    c, tb, nb = 64, 64, 8
    rng = np.random.default_rng(25)
    xs = rng.integers(-(2**26), 2**26, size=(nb * tb, c),
                      dtype=np.int64).astype(np.int32)
    ba_q = jnp.asarray(
        biquad.quantize_ba(
            biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass()),
            29,
        )
    )
    block_fn = jax.jit(lambda s, x: biquad.df1_process_q(ba_q, 29, s, x))
    ck = str(tmp_path / "state.npz")

    # phase 1: process the first half, checkpointing
    ex1 = StreamExecutor(
        block_fn, biquad.df1_init((c,), jnp.int32), (tb, c),
        dtype=np.int32, timeout=20.0,
        checkpoint_path=ck, checkpoint_every=2,
    )
    producer_thread(ex1.ring, xs[: nb // 2 * tb])
    ex1.run()
    assert ex1.blocks_processed == nb // 2

    # phase 2: "crash", restore, process the second half
    st0 = checkpoint.restore(ck, biquad.df1_init((c,), jnp.int32))
    ex2 = StreamExecutor(block_fn, st0, (tb, c), dtype=np.int32,
                         timeout=20.0)
    producer_thread(ex2.ring, xs[nb // 2 * tb:])
    st, ys2 = ex2.run()

    st_ref, ys_ref = biquad.df1_process_q(
        ba_q, 29, biquad.df1_init((c,), jnp.int32), jnp.asarray(xs)
    )
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(y) for y in ys2]),
        np.asarray(ys_ref)[nb // 2 * tb:],
    )
    np.testing.assert_array_equal(np.asarray(st.y), np.asarray(st_ref.y))


def test_stream_executor_rejects_partial_tail():
    # a stream that ends mid-block is data loss, not clean EOF
    ex = StreamExecutor(
        jax.jit(lambda s, x: (s, x)), jnp.zeros(()), (16, 4),
        dtype=np.int32, timeout=5.0,
    )
    ex.ring.write(np.arange(16 * 4 + 7, dtype=np.int32), timeout=5.0)
    ex.ring.close()
    try:
        ex.run()
        raise AssertionError("expected ValueError for partial tail")
    except ValueError as e:
        assert "partial block" in str(e)
    assert ex.blocks_processed == 1
