"""Native C ABI: compile a pure-C test program against libdlaf_tpu_c.so
and run the reference-style pdpotrf + pdsyevd round trips
(``src/c_api/eigensolver/eigensolver.cpp``-equivalent path, but through a
real linkable shared library)."""

import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
NATIVE = os.path.join(REPO, "dlaf_tpu", "api", "native")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_c_roundtrip(tmp_path):
    from dlaf_tpu.api.native import build_shim
    shim = build_shim()
    assert shim is not None

    exe = str(tmp_path / "test_c_api")
    subprocess.run(
        ["gcc", "-O1", os.path.join(NATIVE, "test_c_api.c"),
         "-L" + NATIVE, "-ldlaf_tpu_c", f"-Wl,-rpath,{NATIVE}", "-lm",
         "-o", exe],
        check=True, capture_output=True, timeout=120)

    env = dict(os.environ)
    env["DLAF_TPU_ROOT"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    res = subprocess.run([exe], env=env, capture_output=True, timeout=560,
                         text=True)
    assert res.returncode == 0, (res.stdout, res.stderr)
    assert "pdpotrf ok" in res.stdout
    assert "pdsyevd ok" in res.stdout
    assert "pdsyevd_partial_spectrum ok" in res.stdout
