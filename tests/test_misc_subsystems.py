"""Subsystem tests: partitioner-cholesky option, trace utils, comm miniapp."""

import numpy as np
import jax.numpy as jnp
import pytest

from dlaf_tpu import DistMatrix, cholesky_factorization
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.tune import set_tune_parameters
from dlaf_tpu.utils.trace import StageTimer, annotate, profile


def test_partitioner_cholesky(dist_grid):
    n, nb = 17, 4
    a = mu.random_hermitian_positive_definite(n, np.float64, 1)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    set_tune_parameters(cholesky_distributed_algo="partitioner")
    try:
        f = np.tril(np.asarray(cholesky_factorization(m).to_natural()))
    finally:
        set_tune_parameters(cholesky_distributed_algo="kloop")
    np.testing.assert_allclose(f @ f.T, a, rtol=0, atol=1e-10)


def test_stage_timer_and_trace(tmp_path):
    t = StageTimer()
    with annotate("stage-a"):
        _ = jnp.ones(4).sum()
    t.mark("a")
    assert t.stages["a"] >= 0
    with profile(str(tmp_path)):
        _ = jnp.ones(4).sum()
    import io
    buf = io.StringIO()
    t.report(file=buf)
    assert "total" in buf.getvalue()


def test_communication_miniapp(capsys):
    from dlaf_tpu.miniapp import communication
    rc = communication.main(["-n", "64", "-b", "16", "--nruns", "1",
                             "--grid-rows", "2", "--grid-cols", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "GB/s" in out and "all-reduce" in out


def test_device_side_generators():
    """Device-born generators (no host buffer): Hermitian, safely SPD."""
    import numpy as np

    from dlaf_tpu.matrix import util as mu

    for dt in (np.float32, np.complex64):
        h = np.asarray(mu.random_hermitian_device(129, dt, seed=3))
        assert np.allclose(h, h.conj().T)
        assert np.all(np.isreal(np.diag(h)))
        a = np.asarray(
            mu.random_hermitian_positive_definite_device(129, dt, seed=3))
        w = np.linalg.eigvalsh(a)
        assert w.min() > 129          # centered at 2n, radius ~sqrt(n)


def test_weak_scaling_table(tmp_path):
    """run_scaling --mode weak + plot_scaling --weak: the efficiency
    table compares per-device rates ACROSS matrix sizes (reference
    plot_*_weak.py definition)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    csv = str(tmp_path / "weak.csv")
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
                "PYTHONPATH": repo})
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "run_scaling.py"),
         "cholesky", "--mode", "weak", "-n", "128", "-b", "32",
         "--grids", "1x1", "2x2", "--nruns", "1", "--out", csv],
        env=env, cwd=repo, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    r2 = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "plot_scaling.py"),
         csv, "--weak"], env=env, cwd=repo, capture_output=True,
        text=True, timeout=120)
    assert r2.returncode == 0, (r2.stdout, r2.stderr[-1500:])
    assert "weak scaling" in r2.stdout and "eff %" in r2.stdout
    # two grid rows with different matrix sizes in ONE table
    lines = [ln for ln in r2.stdout.splitlines()
             if ln.strip().startswith(("1x", "2x"))]
    assert len(lines) == 2, r2.stdout
    ns = {ln.split()[2] for ln in lines}
    assert len(ns) == 2, r2.stdout       # n grew with the grid
