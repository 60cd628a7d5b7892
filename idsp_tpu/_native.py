"""Shared loader for the native C helpers (content-hash rebuild).

Used by `golden.py` (the scalar golden model) and `runtime.py` (the
streaming ring buffer).  The rebuild is keyed on a sha256 of the source
plus the compile flags — NOT mtimes: a git checkout gives source and
binary identical timestamps, so a stale committed .so would silently
shadow source changes (e.g. a binary built without ``-fwrapv``
differing exactly on the wrap cases the flag exists for).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def load_native(src_name: str, lib_name: str, flags: tuple[str, ...],
                link: tuple[str, ...] = ()) -> ctypes.CDLL:
    """Compile ``native/src_name`` into ``native/lib_name`` if stale
    (content-hash stamp) and load it."""
    src = os.path.join(_NATIVE_DIR, src_name)
    so = os.path.join(_NATIVE_DIR, lib_name)
    with open(src, "rb") as fh:
        digest = hashlib.sha256(
            fh.read() + " ".join(flags + link).encode()
        ).hexdigest()
    stamp = so + ".sha256"
    stale = True
    if os.path.exists(so) and os.path.exists(stamp):
        with open(stamp) as fh:
            stale = fh.read().strip() != digest
    if stale:
        subprocess.run(["cc", *flags, "-o", so, src, *link], check=True)
        with open(stamp, "w") as fh:
            fh.write(digest + "\n")
    return ctypes.CDLL(so)
