"""Native (C++) host kernels.

The reference implements its entire runtime in C++; here the XLA compiler is
the runtime, and C++ is used where it is genuinely the right tool: the
sequential bulge-chase value recurrence of band->tridiagonal (the stage the
reference also keeps on CPU, ``eigensolver/band_to_tridiag/mc.h``).

Kernels are built lazily with the system toolchain (g++ -O3 -shared) and
cached next to the source; everything has a pure-numpy fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    srcs = [os.path.join(_HERE, f) for f in ("chase.cpp", "hh_chase.cpp")]
    out = os.path.join(_HERE, "libdlaf_native.so")
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    # -mprefer-vector-width=512: gcc defaults to 256-bit vectors on
    # avx512 parts; the chase's dot/axpy loops are 2x wider with zmm
    cmd = ["g++", "-O3", "-march=native", "-mprefer-vector-width=512",
           "-shared", "-fPIC", "-std=c++17",
           *srcs, "-o", out, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return out
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None (numpy fallback)."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("DLAF_DISABLE_NATIVE", "").upper() in \
                ("1", "ON", "TRUE", "YES"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            _LIB = ctypes.CDLL(path)
        except OSError:
            _LIB = None
        return _LIB
