"""Real multi-process distributed execution (2 processes x 4 devices).

The reference runs every distributed test as a genuine MPI job
(``cmake/DLAF_AddTest.cmake:107-120``, 6 ranks); the TPU-native analogue
spawns two JAX processes joined via ``jax.distributed`` (gloo CPU
collectives) and runs distributed Cholesky + the full HEEV chain over a
grid spanning both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
WORKER = os.path.join(HERE, "helpers", "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cholesky_and_heev(tmp_path):
    port = str(_free_port())
    env = dict(os.environ)
    env.update({
        "DLAF_MP_TMP": str(tmp_path),
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_CPU_COLLECTIVES_IMPL": "gloo",
        "JAX_ENABLE_X64": "0",
        "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    })
    procs = [subprocess.Popen([sys.executable, WORKER, str(i), port],
                              env=env, cwd=REPO, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "cholesky ok" in out
        assert "mp chase ok" in out
        assert "io ok" in out
        assert "heev ok" in out
