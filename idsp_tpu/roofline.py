"""Static op accounting + measured machine peaks = utilization roofline.

The reference publishes cycles/sample and instructions/item for every
hot path (hbf.rs:32 "<4 insn/item", cic.rs:400-422 cycle tables,
tests/embedded/src/lib.rs:17-42 cycle-exact harness).  This module is
the TPU analog: every kernel here is *statically shaped*, so the exact
vector-op count per sample can be derived by walking the traced jaxpr
(including inside `pallas_call` bodies and loop trip counts), and the
chip's achievable per-category throughput is measured once by
micro-probes (`benches/roofline.py`).  achieved-%-of-peak =
model-time / measured-time, where model-time charges each op category
at its measured peak rate (all VPU categories share issue slots, so
their times add; the MXU and HBM terms run concurrently and take max).

Counting rules (documented simplifications):
* ALU ops (add/mul/shift/logic/compare/select/convert) are charged one
  "lane-op" per output element, split by category (f32 / i32 / i64 /
  select / convert / div / transcendental).  i64 lane-ops on TPU lower
  to >= 2 i32 ops; they are reported raw and charged at the measured
  i64 rate.
* Data-movement primitives (slice/reshape/broadcast/concat/copy/iota)
  are counted separately (`move_elems`) and NOT charged in the model:
  in VMEM they are usually folded into the consumer's operand layout.
  Gathers are tracked separately (TPU gathers are slow — CLAUDE.md).
* `dot_general`/`conv` are charged 2*M*N*K FLOPs against the MXU peak.
* `while` loops take their trip count from the loop bound when it is a
  literal in the cond jaxpr (the kernels' `fori_loop` bounds are
  static); otherwise the body is charged once and the loop is recorded
  in `unknown_trip_counts` so the caller KNOWS the count is a floor.
* `cond` branches are charged at the maximum across branches (the
  `pl.when` prologues this meets are one-grid-step amortized).

Time model (round 4 — the round-3 model serialized all categories at
their homogeneous-probe rates and real kernels beat it by up to 2.6x,
because the VPU is VLIW and co-issues different op classes in one
bundle; a roofline whose "peak" is beaten is not a roofline):
* The primary VPU bound is AGGREGATE ISSUE: total lane-ops divided by
  the chip's peak lane-op issue rate ``peaks["vpu_issue"]`` (measured
  by mixed-category probes and cross-checked against the silicon
  estimate lanes x ALUs x clock — `benches/roofline.py`).  i64 ops
  have no Mosaic lowering; they are charged as conservative
  equivalent-i32 lane-ops (x2 alu, x3 mul — a LOWER bound on their
  true cost, keeping the limit an upper bound).
* Categories with dedicated, narrower hardware (i32 multiply, convert,
  divide, transcendental) additionally impose per-unit caps at their
  homogeneous-probe rates; the VPU time is the max of the aggregate
  bound and every per-unit bound (units overlap, they don't add).
* MXU and HBM terms overlap with the VPU and each other: total time =
  max of the three.  achieved/limit <= 1 is then a true utilization
  bound for single-kernel configs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

# primitive name -> category
_ALU_I = {
    "add", "sub", "mul", "neg", "and", "or", "xor", "not",
    "shift_left", "shift_right_arithmetic", "shift_right_logical",
    "min", "max", "abs", "sign", "clamp", "population_count", "clz",
    "add_any",
}
_ALU_F = {
    "add", "sub", "mul", "neg", "min", "max", "abs", "sign", "clamp",
    "floor", "ceil", "round", "nextafter", "copysign", "add_any",
    "integer_pow", "square",
}
_CMP = {"lt", "le", "gt", "ge", "eq", "ne", "is_finite"}
_SELECT = {"select_n", "where"}
_CONVERT = {"convert_element_type", "bitcast_convert_type"}
_DIV = {"div", "rem"}
_TRANS = {
    "exp", "log", "log1p", "expm1", "sin", "cos", "tan", "asin",
    "acos", "atan", "atan2", "sinh", "cosh", "tanh", "sqrt", "rsqrt",
    "cbrt", "logistic", "erf", "pow", "exp2", "log2",
}
_MOVE = {
    "slice", "squeeze", "reshape", "broadcast_in_dim", "concatenate",
    "transpose", "rev", "pad", "copy", "iota", "expand_dims",
    "dynamic_slice", "dynamic_update_slice", "get", "swap",
    "masked_load", "masked_swap", "convert_layout", "roll",
}
_GATHER = {"gather", "scatter", "scatter-add", "take", "scatter_add"}
_MXU = {"dot_general", "conv_general_dilated"}
_ZERO_COST = {
    "stop_gradient", "debug_callback", "program_id", "num_programs",
    "axis_index", "create_token",
}


@dataclass
class OpCounts:
    """Lane-op tallies by category (absolute counts, not per sample)."""

    f32: float = 0.0
    i32: float = 0.0
    i32_mul: float = 0.0
    i64: float = 0.0
    i64_mul: float = 0.0
    cmp: float = 0.0
    select: float = 0.0
    convert: float = 0.0
    div: float = 0.0
    trans: float = 0.0
    mxu_flops: float = 0.0
    fft_flops: float = 0.0
    move_elems: float = 0.0
    gather_elems: float = 0.0
    other: dict = field(default_factory=dict)
    unknown_trip_counts: list = field(default_factory=list)

    @property
    def vpu_total(self) -> float:
        """All lane-ops that occupy VPU issue slots."""
        # fft charged at the f32 lane rate (XLA TPU FFT is a VPU/MXU
        # mix; this is the conservative single-rate choice)
        return (self.f32 + self.i32 + self.i32_mul + self.i64
                + self.i64_mul + self.cmp + self.select
                + self.convert + self.div + self.trans
                + self.fft_flops)

    @property
    def issue_ops(self) -> float:
        """Lane-ops charged against the aggregate VLIW issue bound.

        i64 ops (XLA-graph only, no Mosaic lowering) are translated to
        equivalent i32 lane-ops at LOWER-bound costs (add/logic >= 2
        i32 ops for the carry chain, mul >= 3 32-bit partial products)
        so the resulting time bound stays a true lower bound.
        """
        return (self.f32 + self.i32 + self.i32_mul + self.cmp
                + self.select + self.convert + self.div + self.trans
                + self.fft_flops + 2.0 * self.i64 + 3.0 * self.i64_mul)

    def scaled(self, k: float) -> "OpCounts":
        out = OpCounts(**{
            f: getattr(self, f) * k
            for f in ("f32", "i32", "i32_mul", "i64", "i64_mul", "cmp",
                      "select", "convert", "div", "trans", "mxu_flops",
                      "fft_flops", "move_elems", "gather_elems")
        })
        out.other = {n: v * k for n, v in self.other.items()}
        out.unknown_trip_counts = list(self.unknown_trip_counts)
        return out

    def add(self, o: "OpCounts", k: float = 1.0):
        for f in ("f32", "i32", "i32_mul", "i64", "i64_mul", "cmp",
                  "select", "convert", "div", "trans", "mxu_flops",
                  "fft_flops", "move_elems", "gather_elems"):
            setattr(self, f, getattr(self, f) + getattr(o, f) * k)
        for n, v in o.other.items():
            self.other[n] = self.other.get(n, 0.0) + v * k
        self.unknown_trip_counts += o.unknown_trip_counts

    def table(self, per: float = 1.0) -> str:
        rows = [
            ("f32 lane-ops", self.f32), ("i32 lane-ops", self.i32),
            ("i32 multiplies", self.i32_mul),
            ("i64 lane-ops", self.i64),
            ("i64 multiplies", self.i64_mul), ("compares", self.cmp),
            ("selects", self.select), ("converts", self.convert),
            ("div/rem", self.div), ("transcendental", self.trans),
            ("fft FLOPs (at f32 rate)", self.fft_flops),
            ("VPU total", self.vpu_total),
            ("MXU FLOPs", self.mxu_flops),
            ("move elems (uncharged)", self.move_elems),
            ("gather elems", self.gather_elems),
        ]
        lines = [f"{n:26s} {v / per:12.2f}" for n, v in rows if v]
        for n, v in sorted(self.other.items()):
            lines.append(f"other:{n:20s} {v / per:12.2f}")
        return "\n".join(lines)


def _out_elems(eqn) -> float:
    return float(sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                     if hasattr(v.aval, "shape")))


def _dtype_kind(eqn):
    try:
        dt = eqn.outvars[0].aval.dtype
    except Exception:  # noqa: BLE001 — abstract tokens etc.
        return "i32"
    if dt.kind == "f" or dt.kind == "c":
        return "f32"
    if dt.itemsize >= 8:
        return "i64"
    return "i32"


def _literal_trip_count(eqn) -> float | None:
    """Trip count of a fori-style `while`: resolve the `lt i0, bound`
    compare in the cond jaxpr back to the loop's init operands (JAX
    carries both the counter and the bound in the while carry)."""
    from jax._src.core import Literal

    cond = eqn.params["cond_jaxpr"]
    ncc = eqn.params.get("cond_nconsts", 0)
    nbc = eqn.params.get("body_nconsts", 0)
    init = list(eqn.invars[ncc + nbc:])
    jx = cond.jaxpr

    def resolve(a):
        if isinstance(a, Literal):
            return a.val
        if a in jx.invars:
            idx = jx.invars.index(a) - ncc
            if 0 <= idx < len(init) and isinstance(init[idx], Literal):
                return init[idx].val
        return None

    for e2 in jx.eqns:
        if e2.primitive.name == "lt" and len(e2.invars) == 2:
            lo = resolve(e2.invars[0])
            hi = resolve(e2.invars[1])
            if lo is None or hi is None:
                return None
            try:
                return float(max(int(hi) - int(lo), 0))
            except (TypeError, ValueError):
                return None
    return None


def _count_jaxpr(jx, counts: OpCounts, scale: float):
    for eqn in jx.eqns:
        name = eqn.primitive.name
        if name in ("pjit", "jit", "closed_call", "core_call",
                    "custom_jvp_call", "custom_vjp_call", "remat",
                    "checkpoint", "custom_vjp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get(
                "call_jaxpr"
            )
            if inner is not None:
                _count_jaxpr(getattr(inner, "jaxpr", inner), counts,
                             scale)
            continue
        if name == "pallas_call":
            gm = eqn.params.get("grid_mapping")
            grid = getattr(gm, "grid", ()) or ()
            k = float(np.prod([int(g) for g in grid])) if grid else 1.0
            _count_jaxpr(eqn.params["jaxpr"], counts, scale * k)
            continue
        if name == "scan":
            length = float(eqn.params.get("length", 1))
            body = eqn.params["jaxpr"]
            _count_jaxpr(getattr(body, "jaxpr", body), counts,
                         scale * length)
            continue
        if name == "while":
            trip = _literal_trip_count(eqn)
            if trip is None:
                trip = 1.0
                counts.unknown_trip_counts.append(str(eqn))
            body = eqn.params["body_jaxpr"]
            _count_jaxpr(getattr(body, "jaxpr", body), counts,
                         scale * trip)
            # the loop-control compare itself
            counts.cmp += scale * trip
            continue
        if name == "cond":
            branches = eqn.params.get("branches", ())
            best = None
            for br in branches:
                sub = OpCounts()
                _count_jaxpr(getattr(br, "jaxpr", br), sub, scale)
                if best is None or sub.vpu_total > best.vpu_total:
                    best = sub
            if best is not None:
                counts.add(best)
            continue
        if name in _ZERO_COST:
            continue

        n = _out_elems(eqn) * scale
        if name in _MXU:
            # FLOPs = 2 * prod(out) * K (contraction length)
            try:
                dn = eqn.params["dimension_numbers"]
                (lc, _rc) = dn[0] if isinstance(dn, tuple) else (
                    dn.lhs_contracting_dimensions, None
                )
                lhs = eqn.invars[0].aval.shape
                kdim = float(np.prod([int(lhs[i]) for i in lc]))
            except Exception:  # noqa: BLE001
                kdim = 1.0
            counts.mxu_flops += 2.0 * n * kdim
            continue
        if name == "fft":
            import math

            lens = eqn.params.get("fft_lengths", ())
            nfft = float(np.prod([int(v) for v in lens])) or 1.0
            counts.fft_flops += 5.0 * n * math.log2(max(nfft, 2.0))
            continue
        if name in _GATHER:
            counts.gather_elems += n
            continue
        if name in _MOVE:
            counts.move_elems += n
            continue
        if name in _CMP:
            counts.cmp += n
            continue
        if name in _SELECT:
            counts.select += n
            continue
        if name in _CONVERT:
            # same-width integer converts (i32<->u32, the emulated-limb
            # code's _as_u32/_as_i32) and explicit bitcasts are
            # bit-pattern reinterprets — free on TPU, counted as moves
            # so the issue bound isn't inflated (the whole-stack kernel
            # measured >100% of the round-4 model before this).
            free = name == "bitcast_convert_type"
            if not free:
                try:
                    di = eqn.invars[0].aval.dtype
                    do = eqn.outvars[0].aval.dtype
                    free = (di.kind in "iu" and do.kind in "iu"
                            and di.itemsize == do.itemsize)
                except Exception:  # noqa: BLE001 — abstract tokens
                    free = False
            if free:
                counts.move_elems += n
            else:
                counts.convert += n
            continue
        if name in _DIV:
            counts.div += n
            continue
        if name in _TRANS:
            counts.trans += n
            continue
        kind = _dtype_kind(eqn)
        if kind == "f32" and name in _ALU_F:
            counts.f32 += n
            continue
        if kind == "i64" and name in _ALU_I:
            if name == "mul":
                counts.i64_mul += n
            else:
                counts.i64 += n
            continue
        if kind == "i32" and name in _ALU_I:
            if name == "mul":
                counts.i32_mul += n
            else:
                counts.i32 += n
            continue
        counts.other[name] = counts.other.get(name, 0.0) + n


def count_ops(fn, *args, **kwargs) -> OpCounts:
    """Statically count lane-ops of ``fn(*args, **kwargs)``.

    Traces with `jax.make_jaxpr` (no execution) and walks the full
    jaxpr, descending into pallas_call bodies (× grid), scans
    (× length) and fori-style whiles (× literal bound).
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    counts = OpCounts()
    _count_jaxpr(jaxpr.jaxpr, counts, 1.0)
    return counts


def io_bytes(fn, *args, **kwargs) -> tuple[int, int]:
    """(input_bytes, output_bytes) of the traced fn — the HBM traffic
    floor for a single fused kernel (intermediate HBM of multi-kernel
    graphs is not visible statically)."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    ib = sum(
        int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
        for v in jaxpr.jaxpr.invars
        if hasattr(v.aval, "shape")
    )
    ob = sum(
        int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
        for v in jaxpr.jaxpr.outvars
        if hasattr(v.aval, "shape")
    )
    return ib, ob


# --- time model ---------------------------------------------------------------

#: categories with dedicated, narrower hardware than the general ALU
#: slots: their homogeneous-probe rates are true unit saturation
#: points and impose per-unit caps on top of the aggregate issue
#: bound.  Plain ALU / compare / select co-issue across VLIW slots and
#: must NOT be serialized (the round-3 model did, and real kernels
#: beat its "peak" by up to 2.6x).
PER_UNIT_CATEGORIES = ("i32_mul", "convert", "div", "trans")

#: 1024 VPU lanes x 4 ALUs vs 4 MXUs x 128x128 MACs x 2 FLOPs — both
#: scale with the same core clock, so peak lane-op issue is exactly
#: MXU-peak/32 on this silicon (v5e-class TensorCore).  Used as the
#: fallback when the peaks dict predates the ``vpu_issue`` probe.
_VPU_ISSUE_PER_MXU_FLOP = 1.0 / 32.0


def vpu_issue_rate(peaks: dict) -> float:
    """Aggregate VLIW lane-op issue peak (lane-ops/s).

    Prefers the mixed-category probe measurement
    (``peaks["vpu_issue"]``); falls back to the silicon estimate
    derived from the measured MXU peak (same-clock scaling, see
    `_VPU_ISSUE_PER_MXU_FLOP`), then to 2x the best homogeneous
    category rate (homogeneous chains underfill the bundle ~2x)."""
    r = peaks.get("vpu_issue")
    if r:
        return float(r)
    if peaks.get("mxu"):
        return float(peaks["mxu"]) * _VPU_ISSUE_PER_MXU_FLOP
    return 2.0 * max(
        v for k, v in peaks.items()
        if k in ("f32", "i32", "cmp", "select") and v
    )


def model_time(counts: OpCounts, peaks: dict, hbm_bytes: float = 0.0
               ) -> dict:
    """Speed-of-light time (s) for the counted work given measured
    peaks: {"vpu_issue": ops/s, "i32_mul": ops/s, ..., "mxu": flops/s,
    "hbm": bytes/s}.

    VPU time = max(aggregate-issue bound, each per-unit cap) — the
    units overlap, they don't add (see module docstring, round-4
    model).  Returns {"vpu": t, "mxu": t, "hbm": t, "total":
    max-of-units, "by_cat": {...}} — total assumes perfect
    VPU/MXU/HBM overlap, so achieved/total <= 1 is a true utilization
    bound.  ``by_cat["issue"]`` is the aggregate bound; other by_cat
    entries are the per-unit caps actually imposed.
    """
    by_cat = {}
    t_vpu = 0.0
    if counts.issue_ops:
        t_issue = counts.issue_ops / vpu_issue_rate(peaks)
        by_cat["issue"] = t_issue
        t_vpu = t_issue
    for cat in PER_UNIT_CATEGORIES:
        ops = getattr(counts, cat)
        rate = peaks.get(cat)
        if not ops:
            continue
        if not rate:
            # A stale peaks file must not silently LOOSEN the bound
            # (the mxu/hbm branches below already raise) — ADVICE r4.
            raise ValueError(
                f"counted {ops} '{cat}' ops but the peaks dict has no"
                f" '{cat}' rate — re-run the peak probes"
                " (benches/roofline.py --peaks)"
            )
        tt = ops / rate
        by_cat[cat] = tt
        t_vpu = max(t_vpu, tt)
    t_mxu = 0.0
    if counts.mxu_flops:
        mxu = peaks.get("mxu")
        if not mxu:
            raise ValueError(
                "counted MXU FLOPs but the peaks dict has no 'mxu'"
                " rate — re-run the peak probes (benches/roofline.py)"
            )
        t_mxu = counts.mxu_flops / mxu
    t_hbm = 0.0
    if hbm_bytes:
        hbm = peaks.get("hbm")
        if not hbm:
            raise ValueError(
                "hbm_bytes given but the peaks dict has no 'hbm' rate"
            )
        t_hbm = hbm_bytes / hbm
    return {
        "vpu": t_vpu,
        "mxu": t_mxu,
        "hbm": t_hbm,
        "total": max(t_vpu, t_mxu, t_hbm),
        "by_cat": by_cat,
    }
