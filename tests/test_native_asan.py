"""ASAN/UBSAN run of the hand-threaded native kernels.

The analogue of the reference's sanitizer CI job
(``/root/reference/ci/cpu/asan_ubsan_lsan.yml:13-43``): the two C++
kernels (551 + 252 LoC of threads/atomics, including the pump
cancel/exception paths) are rebuilt with
``-fsanitize=address,undefined`` and driven through the real Python
call paths in a subprocess (LD_PRELOAD'd asan runtime); any sanitizer
report aborts the run.  Leak checking is off (CPython itself
"leaks" interned objects at exit, like the reference's lsan
suppressions file).
"""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
NATIVE = os.path.join(REPO, "dlaf_tpu", "ops", "native")
WORKER = os.path.join(HERE, "helpers", "asan_worker.py")


def _libasan():
    try:
        out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                             capture_output=True, text=True, timeout=30)
    except Exception:
        return None
    path = out.stdout.strip()
    return path if os.path.sep in path and os.path.exists(path) else None


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_kernels_under_asan_ubsan(tmp_path):
    libasan = _libasan()
    if libasan is None:
        pytest.skip("libasan runtime not found")
    so = tmp_path / "libdlaf_native_asan.so"
    srcs = [os.path.join(NATIVE, f) for f in ("chase.cpp", "hh_chase.cpp")]
    build = subprocess.run(
        ["g++", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=undefined", "-shared", "-fPIC",
         "-std=c++17", *srcs, "-o", str(so), "-lpthread"],
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr[-2000:]

    env = dict(os.environ)
    env.update({
        "LD_PRELOAD": libasan,
        "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
        "UBSAN_OPTIONS": "halt_on_error=1:print_stacktrace=1",
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_ENABLE_X64": "1",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    res = subprocess.run([sys.executable, WORKER, str(so)], env=env,
                         cwd=REPO, capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, (res.stdout[-2000:], res.stderr[-4000:])
    for line in ("hh chase d ok", "hh chase s ok", "hh chase streamed ok",
                 "hh chase pump ok", "givens chase ok"):
        assert line in res.stdout, res.stdout
    assert "AddressSanitizer" not in res.stderr, res.stderr[-4000:]
    assert "runtime error" not in res.stderr, res.stderr[-4000:]
