"""Fixed-point formatting (debug representation).

Equivalent of the reference `dsp-fixedpoint` format module
(dsp-fixedpoint/src/format.rs): Display as scaled float, Debug as raw
bits, and binary/octal/hex with an explicit radix point.
"""

from __future__ import annotations

import numpy as np


def q_repr(bits: int, f: int) -> str:
    """Display form: the scaled value (format.rs Display-as-f64)."""
    return repr(bits * 2.0**-f)


def q_debug(bits: int, f: int) -> str:
    """Debug form: raw bits and scale."""
    return f"Q(bits={bits:#x}, f={f})"


def _radix_point(digits: str, frac_digits: int) -> str:
    if frac_digits <= 0:
        return digits + "0" * (-frac_digits)
    if frac_digits >= len(digits):
        digits = digits.rjust(frac_digits + 1, "0")
    return digits[:-frac_digits] + "." + digits[-frac_digits:]


def q_bin(bits: int, f: int, width: int = 32) -> str:
    """Binary with radix point (format.rs:36-53 Binary)."""
    u = bits & ((1 << width) - 1)
    return _radix_point(format(u, f"0{width}b"), f)


def q_oct(bits: int, f: int, width: int = 32) -> str:
    """Octal with radix point (fraction padded to a 3-bit boundary)."""
    pad = (-f) % 3
    u = (bits & ((1 << width) - 1)) << pad
    digits = format(u, f"0{-(-(width + pad) // 3)}o")
    return _radix_point(digits, (f + pad) // 3)


def q_hex(bits: int, f: int, width: int = 32) -> str:
    """Hex with radix point every 4 bits."""
    u = bits & ((1 << width) - 1)
    digits = format(u, f"0{width // 4}x")
    return _radix_point(digits, -(-f // 4))


def format_array(bits, f: int, limit: int = 8) -> str:
    """Compact scaled repr of a Q array for logs/debugging."""
    a = np.asarray(bits).reshape(-1)
    vals = [f"{v * 2.0 ** -f:.6g}" for v in a[:limit]]
    suffix = ", ..." if a.size > limit else ""
    return f"Q<{f}>[{', '.join(vals)}{suffix}]"
