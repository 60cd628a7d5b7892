"""Multi-chip scaling harness (BASELINE.json north star: >= 80%
samples/s efficiency 1 chip -> 2+ hosts).

Runs the channel-sharded DDC chain (NCO mix -> Q32 DF1 biquad -> HBF
decimate-by-8) at 1/2/4/... devices, weak scaling (fixed channels per
device), and reports:

* samples/s per device count + weak-scaling efficiency vs 1 device;
* bytes moved over collectives per block (parsed from the compiled
  HLO), per collective kind — the channel-parallel chain should be
  zero; the sequence-parallel biquad pays ppermute + all_gather;
* the same table for the SP (time-sharded) float biquad, the
  collective-heavy path.

Runs unchanged on real multi-chip hardware (it uses whatever
`jax.devices()` offers); with fewer real devices than requested it
falls back to virtual CPU devices (``--virtual``, default when only
one device is present).  Virtual-CPU timings validate the *scaling
machinery and collective volume*, not absolute throughput.

Usage: python benches/scaling.py [--devices 1,2,4,8] [--write-md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--channels-per-device", type=int, default=128)
    ap.add_argument("--time", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--real", action="store_true",
                    help="use the real devices jax.devices() offers "
                         "(default: a virtual CPU mesh — the axon TPU "
                         "plugin ignores JAX_PLATFORMS, so virtual vs "
                         "real must be decided before backend init)")
    ap.add_argument("--write-md", action="store_true")
    return ap.parse_args(argv)


def _collective_bytes(compiled_text: str) -> dict:
    """Sum output bytes of collective ops in a compiled HLO dump.

    Crude but effective: every collective op line carries its result
    shape; bytes = product(dims) * dtype size.
    """
    sizes = {"f32": 4, "f64": 8, "s32": 4, "s64": 8, "u32": 4, "u64": 8,
             "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "bf16": 2}
    out: dict[str, int] = {}
    pat = re.compile(
        r"=\s*(\w+)\[([\d,]*)\][^ ]*\s+(all-gather|collective-permute|"
        r"all-reduce|reduce-scatter|all-to-all)"
    )
    for m in pat.finditer(compiled_text):
        dtype, dims, kind = m.groups()
        nbytes = sizes.get(dtype, 4)
        for d in dims.split(","):
            if d.strip():
                nbytes *= int(d)
        out[kind] = out.get(kind, 0) + nbytes
    return out


def main(argv=None):
    args = _parse_args(argv)
    dev_counts = [int(v) for v in args.devices.split(",")]

    if not args.real:
        # Must happen before backend init: XLA_FLAGS is read when the
        # CPU client is created, and the axon plugin ignores the
        # JAX_PLATFORMS env var (config.update works).
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(dev_counts)}"
        )
    import jax

    if not args.real:
        jax.config.update("jax_platforms", "cpu")
    args.virtual = not args.real

    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

    from idsp_tpu import fxp
    from idsp_tpu.design import Filter
    from idsp_tpu.filters import biquad, hbf
    from idsp_tpu.ops.trig import cossin
    from idsp_tpu.parallel.stream import sharded_df1_float
    from idsp_tpu.profiling import sync

    #: Per-direction ICI bandwidth assumed for the projection column,
    #: bytes/s.  v5e-class chips move ~45 GB/s per link per direction
    #: on the 2D torus (scaling-book mental model); the projection
    #: charges ALL of a step's collective bytes to ONE link direction,
    #: i.e. it is conservative for ring collectives that use both.
    ICI_GBPS = 45e9

    #: Measured SINGLE-CHIP rates for each strategy's kernel class
    #: (benches/RESULTS.md, TPU v5 lite, r4 run) — the compute leg of
    #: the projected-ICI column.  samples/s.
    RATE_1CHIP = {
        "dp": 10.3e9,   # fastlo_fused DDC chain headline (bench.py)
        "sp": 1.18e9,   # f64 df1 (scan) row
        "pp": 2.58e9,   # q32<29> df1 (scan) row (one SOS per stage)
        "tp": 3.3e9,    # channelizer m=1024 (planes) row
    }

    cpd, t = args.channels_per_device, args.time
    rng = np.random.default_rng(0)
    ba5 = biquad.from_cookbook(Filter().critical_frequency(0.02).lowpass())
    ba_q = jnp.asarray(biquad.quantize_ba(ba5, 29))

    rows = []

    def add_row(name, nd, rate, eff, coll, samples_per_step,
                rate_1chip=None):
        """rate_1chip: measured single-chip GS/s for this kernel class
        (benches/RESULTS.md), used for the projected-ICI column."""
        t_step = samples_per_step / rate if rate else float("inf")
        nbytes = sum(coll.values())
        proj = None
        if rate_1chip:
            # Analytic ICI bridge (VERDICT r4 #6): on real hardware the
            # per-device compute time is samples/device / single-chip
            # rate, and the collective rides ICI at ICI_GBPS.  The
            # virtual-CPU *measured* columns share one host's cores and
            # say nothing about this.
            t_comp = samples_per_step / nd / rate_1chip
            t_ici = nbytes / ICI_GBPS
            proj = t_comp / (t_comp + t_ici)
        coll_s = (
            ", ".join(f"{k}={v / 1e3:.1f}kB" for k, v in sorted(coll.items()))
            or "none"
        )
        rows.append({
            "name": name, "nd": nd, "rate": rate, "eff": eff,
            "coll_s": coll_s, "t_step": t_step, "proj": proj,
        })
        return coll_s

    def chain_fn(state, x, steps, phase0):
        """Per-shard DDC chain: runs identically on each dp slice."""
        tt = x.shape[0]
        bq, dec_i, dec_q = state
        idx = (jnp.arange(1, tt + 1, dtype=jnp.int64) & 0xFFFFFFFF).astype(
            jnp.int32
        )
        phases = phase0[None, :] + steps[None, :] * idx[:, None]
        lo_re, lo_im = cossin(phases)
        xi = x[:, None]
        mi = fxp.q_apply(lo_re, xi, 32)
        mq = fxp.q_apply(-lo_im, xi, 32)
        miq = jnp.concatenate([mi, mq], axis=1)
        bq, yiq = biquad.df1_process_q(ba_q, 29, bq, miq, unroll=8)
        cc = steps.shape[0]
        fi = yiq[:, :cc].astype(jnp.float32).T
        fq = yiq[:, cc:].astype(jnp.float32).T
        dec_i, zi = hbf.hbf_dec_cascade(dec_i, fi)
        dec_q, zq = hbf.hbf_dec_cascade(dec_q, fq)
        return (bq, dec_i, dec_q), (zi, zq)

    print(f"# platform={jax.devices()[0].platform} "
          f"n_avail={len(jax.devices())} cpd={cpd} t={t}", flush=True)

    # --- machinery baseline: a no-op shard_map step per device count.
    # On the virtual CPU mesh every "device" shares one host's cores,
    # so strong-scaling rows pay (a) core contention and (b) shard_map
    # dispatch machinery.  This row isolates (b): its per-step time is
    # the floor ANY row pays at that device count, and the "mach%"
    # column reports it as a fraction of each row's step time
    # (VERDICT r4 #6).
    noop_step_s = {}
    for nd in dev_counts:
        if nd > len(jax.devices()):
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), ("mx",))
        buf = jnp.zeros((nd * cpd, 128), jnp.float32)
        fn = jax.jit(
            shard_map(
                lambda s: s + jnp.float32(1.0), mesh=mesh,
                in_specs=(P("mx"),), out_specs=P("mx"),
            )
        )
        out = fn(buf)
        sync(out)
        best = float("inf")
        for _ in range(3):
            b2 = buf
            t0 = time.perf_counter()
            for _ in range(max(args.iters * 8, 16)):
                b2 = fn(b2)
            sync(b2)
            best = min(best, time.perf_counter() - t0)
        noop_step_s[nd] = best / max(args.iters * 8, 16)
        print(f"noop shard_map x{nd}: {noop_step_s[nd] * 1e6:.0f} us/step",
              flush=True)

    def mach_pct(nd, t_step):
        f = noop_step_s.get(nd)
        return None if (f is None or not t_step) else 100.0 * f / t_step

    base_rate = None
    for nd in dev_counts:
        if nd > len(jax.devices()):
            print(f"# skip {nd} devices (only {len(jax.devices())})")
            continue
        c = cpd * nd
        mesh = Mesh(np.array(jax.devices()[:nd]), ("dp",))
        steps = jnp.asarray(
            rng.integers(1 << 24, 1 << 30, size=(c,), dtype=np.int64).astype(
                np.int32
            )
        )
        x = jnp.asarray(
            rng.integers(-(2**27), 2**27, size=(t,), dtype=np.int64).astype(
                np.int32
            )
        )
        phase0 = jnp.zeros((c,), jnp.int32)
        state = (
            biquad.df1_init((2 * cpd,), jnp.int32),
            hbf.hbf_dec_cascade_init(3, (cpd,)),
            hbf.hbf_dec_cascade_init(3, (cpd,)),
        )
        # channel-sharded: state + per-channel params sharded on dp,
        # the sample stream replicated
        fn = jax.jit(
            shard_map(
                chain_fn,
                mesh=mesh,
                in_specs=(P("dp"), P(), P("dp"), P("dp")),
                out_specs=(P("dp"), P("dp")),
            )
        )
        # shard_map state specs: leaves are (2*cpd,...) per device ->
        # global (2*c, ...)
        gstate = (
            biquad.df1_init((2 * c,), jnp.int32),
            hbf.hbf_dec_cascade_init(3, (c,)),
            hbf.hbf_dec_cascade_init(3, (c,)),
        )
        lowered = fn.lower(gstate, x, steps, phase0)
        compiled = lowered.compile()
        coll = _collective_bytes(compiled.as_text())

        out = fn(gstate, x, steps, phase0)
        sync(out)
        best = float("inf")
        for _ in range(3):
            st = gstate
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, z = fn(st, x, steps, phase0)
            sync(z)
            best = min(best, time.perf_counter() - t0)
        rate = c * t * args.iters / best
        if nd == dev_counts[0]:
            base_rate = rate / nd
        eff = rate / (nd * base_rate) if base_rate else float("nan")
        coll_s = add_row(f"dp chain x{nd}", nd, rate, eff, coll,
                         c * t, RATE_1CHIP["dp"])
        print(f"dp chain x{nd}: {rate / 1e6:.1f} MS/s  eff={eff:.2f}"
              f"  collectives/block: {coll_s}", flush=True)

    # SP (time-sharded) float biquad — the collective-paying path
    sp_base = None
    for nd in dev_counts:
        if nd > len(jax.devices()):
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), ("sp",))
        c_sp = cpd
        tt = t  # fixed total length: strong scaling for SP
        xs = jnp.asarray(rng.normal(size=(tt, c_sp)))
        st = biquad.df1_init((c_sp,), jnp.float64)
        ba_f = jnp.asarray(ba5)

        def sp_fn(st, xs):
            return sharded_df1_float(ba_f, st, xs, "sp")

        fn = jax.jit(
            shard_map(
                sp_fn, mesh=mesh,
                in_specs=(P(), P("sp")),
                out_specs=(P(), P("sp")),
            )
        )
        compiled = fn.lower(st, xs).compile()
        coll = _collective_bytes(compiled.as_text())
        out = fn(st, xs)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = st
            for _ in range(args.iters):
                s2, ys = fn(s2, xs)
            sync(ys)
            best = min(best, time.perf_counter() - t0)
        rate = c_sp * tt * args.iters / best
        if sp_base is None:
            sp_base = rate
        eff = rate / sp_base
        coll_s = add_row(f"sp df1 x{nd}", nd, rate, eff, coll,
                         c_sp * tt, RATE_1CHIP["sp"])
        print(f"sp df1 x{nd}: {rate / 1e6:.1f} MS/s  speedup={eff:.2f}"
              f"  collectives/block: {coll_s}", flush=True)

    # PP: S-stage pipelined SOS cascade, one stage per device, block
    # storage sharded over the pipe (O(nb/S) memory per device).  The
    # cascade DEEPENS with the device count at fixed stream length — an
    # ideal pipeline holds samples/s constant as stages are added, so
    # efficiency is rate(nd) / rate(1).
    pp_base = None
    for nd in dev_counts:
        if nd > len(jax.devices()):
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), ("pp",))
        nb = 4 * nd  # blocks divisible by the stage count
        tb = max(64, t // nb)
        bas = jnp.asarray(
            [
                biquad.quantize_ba(
                    biquad.from_cookbook(
                        Filter().critical_frequency(
                            0.02 + 0.01 * (i % 4)
                        ).lowpass()
                    ),
                    29,
                )
                for i in range(nd)
            ]
        )
        xb = jnp.asarray(
            rng.integers(
                -(2**24), 2**24, size=(nb, tb, cpd), dtype=np.int64
            ).astype(np.int32)
        )

        from jax import shard_map as _shard_map
        from idsp_tpu.parallel.pipeline import pipelined_sos_cascade_sharded

        # cyclic block sharding (block b on device b mod S) — the
        # state-rotating schedule's layout; see pipeline.py.
        xc = xb.reshape((nb // nd, nd, tb, cpd))
        fn = jax.jit(
            _shard_map(
                lambda ba, x: pipelined_sos_cascade_sharded(
                    ba, x[:, 0], nb, 29, "pp"
                )[:, None],
                mesh=mesh,
                in_specs=(P(), P(None, "pp")),
                out_specs=P(None, "pp"),
            )
        )
        compiled = fn.lower(bas, xc).compile()
        coll = _collective_bytes(compiled.as_text())
        out = fn(bas, xc)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ys = fn(bas, xc)
            sync(ys)
            best = min(best, time.perf_counter() - t0)
        rate = nb * tb * cpd * args.iters / best
        if pp_base is None:
            pp_base = rate
        eff = rate / pp_base
        coll_s = add_row(f"pp sos x{nd}", nd, rate, eff, coll,
                         nb * tb * cpd, RATE_1CHIP["pp"])
        print(f"pp sos x{nd} ({nd} stages): {rate / 1e6:.1f} MS/s"
              f"  eff={eff:.2f}  collectives/block: {coll_s}", flush=True)

    # TP: polyphase channelizer with the DFT contraction axis sharded
    # and psum'd partials — strong scaling of a fixed M-branch bank.
    from idsp_tpu.pipelines import channelizer

    tp_base = None
    m_ch = 256
    taps_ch = 8
    n_frames = max(8, t // m_ch)
    for nd in dev_counts:
        if nd > len(jax.devices()) or m_ch % nd:
            continue
        mesh = Mesh(np.array(jax.devices()[:nd]), ("tp",))
        xf = jnp.asarray(
            rng.normal(size=(n_frames, m_ch, 2)).astype(np.float32)
        )
        st_tp = channelizer.init(m_ch, taps_ch)

        from jax import shard_map as _shard_map

        def mk_tp(out_mode, ospec):
            return jax.jit(
                _shard_map(
                    lambda st, x: channelizer.channelize_tp(
                        st, x, "tp", m=m_ch, taps=taps_ch,
                        out_mode=out_mode,
                    ),
                    mesh=mesh,
                    in_specs=(P(None, "tp", None), P(None, "tp", None)),
                    out_specs=(P(None, "tp", None), ospec),
                )
            )

        fn = mk_tp("replicated", P())
        compiled = fn.lower(st_tp, xf).compile()
        coll = _collective_bytes(compiled.as_text())
        out = fn(st_tp, xf)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s2 = st_tp
            for _ in range(args.iters):
                s2, ys = fn(s2, xf)
            sync(ys)
            best = min(best, time.perf_counter() - t0)
        rate = n_frames * m_ch * args.iters / best
        if tp_base is None:
            tp_base = rate
        eff = rate / tp_base
        coll_s = add_row(f"tp channelizer m{m_ch} x{nd}", nd, rate, eff,
                         coll, n_frames * m_ch, RATE_1CHIP["tp"])
        print(f"tp channelizer m{m_ch} x{nd}: {rate / 1e6:.1f} MS/s"
              f"  speedup={eff:.2f}  collectives/block: {coll_s}",
              flush=True)

        # reduce-scatter output variant: the canonical fix for the flat
        # all-reduce bytes above — psum_scatter leaves y channel-sharded
        # and moves 1/n_dev the bytes on the wire (VERDICT r4 #6).
        if nd > 1:
            fn_rs = mk_tp("scatter", P(None, "tp", None))
            compiled = fn_rs.lower(st_tp, xf).compile()
            coll_rs = _collective_bytes(compiled.as_text())
            out = fn_rs(st_tp, xf)
            sync(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                s2 = st_tp
                for _ in range(args.iters):
                    s2, ys = fn_rs(s2, xf)
                sync(ys)
                best = min(best, time.perf_counter() - t0)
            rate_rs = n_frames * m_ch * args.iters / best
            eff_rs = rate_rs / tp_base
            coll_s = add_row(
                f"tp channelizer m{m_ch} x{nd} (reduce-scatter)", nd,
                rate_rs, eff_rs, coll_rs, n_frames * m_ch,
                RATE_1CHIP["tp"])
            print(f"tp channelizer m{m_ch} x{nd} (rs): "
                  f"{rate_rs / 1e6:.1f} MS/s  speedup={eff_rs:.2f}"
                  f"  collectives/block: {coll_s}", flush=True)

    if args.write_md:
        path = os.path.join(os.path.dirname(__file__), "SCALING.md")
        with open(path, "w") as fh:
            fh.write(
                "# Scaling harness results\n\n"
                f"Platform: {jax.devices()[0].platform} "
                f"({'virtual CPU mesh' if args.virtual else 'real devices'});"
                f" {cpd} channels/device, {t}-sample blocks.\n\n"
                "Channel (dp) rows are weak scaling — efficiency is\n"
                "rate / (n * single-device rate).  SP rows are strong\n"
                "scaling of a fixed-length stream (speedup vs 1\n"
                "device).  PP rows pipeline an S = n_devices stage SOS\n"
                "cascade with sharded block storage — an ideal pipeline\n"
                "holds samples/s constant as stages deepen, so eff =\n"
                "rate(n)/rate(1).  TP rows strong-scale a fixed\n"
                "256-branch channelizer with the DFT contraction\n"
                "sharded + psum'd (or psum_scatter'd: the\n"
                "reduce-scatter rows).  Collective volume is per\n"
                "compiled step, parsed from HLO.\n\n"
                "## Reading the measured columns (virtual CPU mesh)\n\n"
                "All N virtual devices share ONE host's cores, and the\n"
                "x1 baseline already uses them all through XLA's\n"
                "threading — so the measured eff columns are dominated\n"
                "by host-core contention plus shard_map machinery, NOT\n"
                "by the design's communication.  Two columns decompose\n"
                "this:\n\n"
                "* **mach%** — the no-op shard_map step's time at that\n"
                "  device count as a fraction of the row's step time\n"
                "  (pure dispatch/mesh machinery floor; measured\n"
                f"  no-op step: "
                f"{', '.join(f'x{k}={v * 1e6:.0f}us' for k, v in sorted(noop_step_s.items()))}).\n"
                "* **proj ICI eff** — the analytic leg of the >= 80%\n"
                "  north star: per-device compute time from the\n"
                "  MEASURED single-chip TPU rate of the row's kernel\n"
                "  class (benches/RESULTS.md) vs its collective bytes\n"
                f"  over a {ICI_GBPS / 1e9:.0f} GB/s ICI direction\n"
                "  (v5e-class link, all bytes charged to one\n"
                "  direction).  This is what survives on real\n"
                "  multi-chip hardware; the >= 80% north star applies\n"
                "  to THIS column until a real mesh is available.\n\n"
                "The tp rows' backwards-scaling (rate FALLS as devices\n"
                "are added while all-reduce bytes stay flat) is exactly\n"
                "this machinery story: the per-device DFT partial\n"
                "shrinks to a thin (n, m/N)@(m/N, m) matmul that loses\n"
                "cache blocking, the shared host gains no silicon, and\n"
                "the all-reduce adds a sync per step.  The projected\n"
                "column shows the design itself is ICI-cheap; the\n"
                "reduce-scatter variant moves 1/N the bytes for\n"
                "channel-sharded consumers.\n\n"
                "| config | devices | MS/s | eff/speedup | collectives"
                " | mach% | proj ICI eff |\n"
                "|---|---|---|---|---|---|---|\n"
            )
            for r in rows:
                mp = mach_pct(r["nd"], r["t_step"])
                mp_s = "—" if mp is None else f"{mp:.0f}%"
                pj_s = "—" if r["proj"] is None else f"{r['proj']:.3f}"
                fh.write(f"| {r['name']} | {r['nd']} |"
                         f" {r['rate'] / 1e6:.1f} |"
                         f" {r['eff']:.2f} | {r['coll_s']} | {mp_s} |"
                         f" {pj_s} |\n")
        print(f"wrote {path}")
    return rows


if __name__ == "__main__":
    main()
