"""Native C ABI shim build helper (g++ + libpythonX.Y embedding)."""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(__file__)


def build_shim() -> str | None:
    """Build (lazily) and return the path of ``libdlaf_tpu_c.so``."""
    src = os.path.join(_HERE, "dlaf_c_shim.cpp")
    out = os.path.join(_HERE, "libdlaf_tpu_c.so")
    if os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or "/usr/local/lib"
    pyver = sysconfig.get_config_var("LDVERSION") or \
        sysconfig.get_python_version()
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src,
           f"-I{inc}", f"-L{libdir}", f"-lpython{pyver}",
           f"-Wl,-rpath,{libdir}", "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return out
    except subprocess.CalledProcessError as exc:
        raise RuntimeError(
            f"shim build failed:\n{exc.stderr.decode()}") from exc
