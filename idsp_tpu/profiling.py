"""Profiling and throughput measurement.

Replaces the reference's DWT-cycle embedded harness
(tests/embedded/src/lib.rs:17-42) with wall-clock samples/s counters
(double-run compile-cost cancellation like the reference's
call-twice-minus-once trick) and `jax.profiler` trace capture.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Force completion of all computation feeding ``tree``.

    `jax.block_until_ready` does not actually fence on some remote
    backends (the axon TPU tunnel); a scalar readback does.  Returns
    the readback value so callers can also use it as a checksum.
    """
    jax.block_until_ready(tree)
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


@dataclass(frozen=True)
class BenchResult:
    """Throughput of one benchmark config."""

    name: str
    samples: int
    seconds: float

    @property
    def samples_per_s(self) -> float:
        return self.samples / self.seconds

    @property
    def ns_per_sample(self) -> float:
        return self.seconds / self.samples * 1e9

    def row(self) -> str:
        return (
            f"{self.name:36s} {self.samples_per_s / 1e6:12.1f} MS/s"
            f" {self.ns_per_sample:10.3f} ns/sample"
        )


def measure_roundtrip(iters: int = 3) -> float:
    """The fixed dispatch + scalar-readback round trip (~30 ms through
    the axon tunnel, ~0 locally) to subtract from chained timings."""
    triv = jax.jit(lambda v: v + 1)
    z = jnp.zeros((8,), jnp.int32)
    sync(triv(z))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(triv(z))
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name: str, fn, *args, samples: int, iters: int = 5, warmup: int = 1,
          overhead: float = 0.0):
    """Time ``fn(*args)`` (compiled path): warm up, then run ``iters``
    back-to-back and block once.  ``samples`` is per-call item count.
    ``overhead`` (seconds) is subtracted from the total (the fixed
    dispatch round trip, see `measure_roundtrip`)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = max(time.perf_counter() - t0 - overhead, 1e-9)
    return BenchResult(name=name, samples=samples * iters, seconds=dt)


def bench_stateful(name: str, fn, state, *args, samples: int, iters: int = 5,
                   overhead: float = 0.0):
    """Like `bench` but threads a state carry so iterations chain (no
    artificial parallelism between timing iterations)."""
    out = fn(state, *args)
    sync(out)
    t0 = time.perf_counter()
    st = state
    for _ in range(iters):
        res = fn(st, *args)
        st = res[0]
    sync(res)
    dt = max(time.perf_counter() - t0 - overhead, 1e-9)
    return BenchResult(name=name, samples=samples * iters, seconds=dt)


def measure_rate(step, state, *args, iters=None,
                 trials: int = 6, stateful: bool = True):
    """Robust chained-dispatch throughput: MEDIAN of iteration
    differences.

    Times ``k1`` and ``k2`` chained dispatches (state threaded so the
    device cannot overlap iterations) and forms
    ``(t(k2) - t(k1)) / (k2 - k1)`` per trial.  The fixed
    dispatch+readback overhead of the axon tunnel cancels in each
    difference; the median over trials is robust to that overhead's
    multi-10-ms variance.  Selecting the MINIMUM difference instead
    (the pre-round-4 discipline) systematically overstates rates: an
    overhead spike landing in the k1 leg shrinks the difference, and
    min-selection keeps exactly those lucky pairings — observed up to
    a bogus 156 GS/s for a kernel whose issue roofline is 15 GS/s.
    Use a k2 - k1 gap large enough that the expected kernel time over
    the gap dwarfs the ~30-60 ms readback jitter; the default
    ``iters=None`` auto-scales the gap to >= ~100 ms of estimated
    kernel time (the readback itself varies by tens of ms, so a fixed
    small gap leaves sub-ms kernels with signal ~ jitter).

    ``step(state, *args)`` must return the new state first (or the
    value itself when ``stateful=False``).  Returns
    ``(seconds_per_dispatch, diffs)`` with ALL per-trial differences
    for spread reporting; seconds_per_dispatch is their median.
    Non-positive differences are kept (censoring them would bias the
    median upward exactly in the jitter-dominated regime this guards
    against); raises only if the median itself is non-positive.
    """
    import statistics

    if iters is not None:
        k1, k2 = iters
        if k1 < 1:
            raise ValueError(f"need k1 >= 1 dispatch in the short leg, got {iters}")
        if k2 <= k1:
            raise ValueError(f"iters gap must be positive, got {iters}")
    out = step(state, *args)
    sync(out)

    def timed(k):
        t0 = time.perf_counter()
        st = state
        for _ in range(k):
            res = step(st, *args)
            if stateful:
                st = res[0]
        sync(res)
        return time.perf_counter() - t0

    if iters is None:
        est = max((timed(12) - timed(2)) / 10.0, 1e-6)
        k1 = 10
        k2 = k1 + min(max(40, int(0.1 / est) + 1), 2000)
    diffs = []
    for _ in range(trials):
        d1 = timed(k1)
        d2 = timed(k2)
        diffs.append((d2 - d1) / (k2 - k1))
    med = statistics.median(diffs)
    if med <= 0:
        raise RuntimeError(
            "non-positive median iteration difference (dispatch jitter"
            f" exceeds the signal — raise the gap; k1={k1} k2={k2})"
        )
    return med, diffs


class SlowWindowGuard:
    """Detect (and wait out) multi-minute device slow states.

    The shared chip behind the axon tunnel has slow windows where every
    kernel runs 5-10x under its normal rate for minutes at a time: the
    round-5 full-suite run measured a contiguous block of rows far
    below their probe-verified rates (fm one-kernel 0.31 GS/s vs 3.4
    across data/state variations in scripts/tpu_fm_ab.py) while rows
    before and after the window were fast with single-digit spreads.

    Before each benchmark row, call :meth:`await_good_window`: it times
    a fixed canary kernel and, while the canary runs ``ratio``x slower
    than the best canary seen so far, sleeps rather than letting the
    caller publish a rate that measures the window, not the kernel.
    The wait is bounded (``max_wait_s`` per row); on timeout the caller
    proceeds and the ordinary spread machinery annotates the row.
    """

    def __init__(self, canary=None, ratio: float = 2.5,
                 max_wait_s: float = 600.0, sleep_s: float = 20.0,
                 best_path: str = "/root/repo/benches/CANARY.json"):
        self._canary = canary or _default_canary
        self.ratio = ratio
        self.max_wait_s = max_wait_s
        self.sleep_s = sleep_s
        self.best = None
        self.enabled = True
        # Cross-run baseline: a run that STARTS inside a mild window
        # would otherwise calibrate "best" to the window itself and
        # never gate (observed: a full suite run with every HBM-heavy
        # row 2-4x low and zero gate fires).  Persist the best canary
        # seen on this device; on per-row timeout the floor resets to
        # the in-run best so a genuinely changed device cannot stall
        # every row.
        self._best_path = best_path
        try:
            import json as _json

            with open(best_path) as fh:
                self.best = float(_json.load(fh)["best_s"])
        except Exception:  # noqa: BLE001 — no baseline yet
            pass

    def _record_best(self, dt: float) -> None:
        if self.best is None or dt < self.best:
            self.best = dt
            if self._best_path:
                try:
                    import json as _json

                    with open(self._best_path, "w") as fh:
                        _json.dump({"best_s": dt}, fh)
                except Exception:  # noqa: BLE001
                    pass

    def check(self) -> bool:
        """One canary shot: True if the device is currently fast.
        Use to BRACKET a measurement (gate before, check after) — a
        window can open mid-measurement after the gate passed; a
        measurement bracketed by a bad canary should be re-run."""
        if not self.enabled:
            return True
        try:
            dt = self._canary()
        except Exception:  # noqa: BLE001
            self.enabled = False
            return True
        self._record_best(dt)
        return dt <= self.ratio * self.best

    def await_good_window(self, label: str = "") -> None:
        if not self.enabled:
            return
        deadline = time.time() + self.max_wait_s
        while True:
            try:
                dt = self._canary()
            except Exception as e:  # noqa: BLE001 — no kernel path (CPU)
                self.enabled = False
                print(f"# slow-window canary disabled: {str(e)[:80]}",
                      flush=True)
                return
            self._record_best(dt)
            if dt <= self.ratio * self.best:
                return
            if time.time() > deadline:
                print(f"# {label}: slow window never cleared (canary "
                      f"{dt:.2f}s vs best {self.best:.2f}s) — measuring"
                      " anyway and resetting the baseline to the"
                      " in-run best", flush=True)
                self.best = dt  # device may genuinely have changed
                return
            print(f"# slow window (canary {dt:.2f}s vs best "
                  f"{self.best:.2f}s) — waiting {self.sleep_s:.0f} s",
                  flush=True)
            time.sleep(self.sleep_s)


_CANARY_CACHE = {}


def _default_canary() -> float:
    """Seconds for a two-component chained probe: 20 df1_bank_q
    dispatches on (8192, 512) i32 (VPU/issue-sensitive, ~6 ms) plus a
    jitted 64x-chained elementwise pass over a 134 MB f32 buffer
    (HBM-sensitive, ~26 ms at the 660 GB/s stream rate).

    Both components matter: the round-5 windows degraded HBM-bound
    rows 2-5x while compute-bound kernels (and a compute-only canary)
    barely moved — consistent with co-tenant bandwidth contention —
    and the combined ~32 ms of kernel time is enough for a 2x
    slowdown to clear the tunnel's 30-60 ms readback jitter."""
    import numpy as np

    from .design import Filter
    from .filters import biquad
    from .filters.biquad_pallas import df1_bank_q

    if "args" not in _CANARY_CACHE:
        rng = np.random.default_rng(12345)
        ba_q = jnp.asarray(biquad.quantize_ba(
            biquad.from_cookbook(
                Filter().critical_frequency(0.02).lowpass()), 29))
        x = jnp.asarray(
            rng.integers(-(2**24), 2**24, size=(8192, 512),
                         dtype=np.int64).astype(np.int32))
        st = biquad.df1_init((512,), jnp.int32)
        st1, y = df1_bank_q(ba_q, st, x, 29, time_chunk=64, unroll=16)
        sync(y)  # compile + warm before the first timed call
        big = jnp.asarray(
            rng.normal(size=(4096, 4096)).astype(np.float32))

        # fori with a TRACED trip count: a Python-unrolled add chain
        # would fuse into one read-modify-write pass; the loop carry
        # round-trips the 67 MB buffer through HBM per iteration
        # (256 x 134 MB ~ 34 GB ~ 52 ms at the stream peak; the
        # buffer is kept small — a 134 MB canary buffer OOMed the
        # full suite on top of its own fixtures).
        @jax.jit
        def stream(v, n):
            return jax.lax.fori_loop(0, n, lambda i, vv: vv + 1.0, v)

        n128 = jnp.int32(256)
        sync(stream(big, n128))
        _CANARY_CACHE["args"] = (ba_q, st, x, stream, big, n128)
    ba_q, st, x, stream, big, n128 = _CANARY_CACHE["args"]
    t0 = time.perf_counter()
    s2 = st
    for _ in range(20):
        s2, y = df1_bank_q(ba_q, s2, x, 29, time_chunk=64, unroll=16)
    sync(y)
    sync(stream(big, n128))
    return time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/idsp_tpu_trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
