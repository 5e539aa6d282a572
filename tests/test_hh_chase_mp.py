"""Lock-step multi-process region chase vs the numpy oracle.

Single-process execution of the multi-process protocol
(:mod:`dlaf_tpu.algorithms.eigensolver.hh_chase_mp`): the full lock-step
pipeline ``step = 2*group + region`` with fixed-size message buffers and
allgather transport, plus a simulated 3-process run where each "process"
owns a subset of regions and the allgather is a local exchange — the
chase is deterministic numpy arithmetic, so equality with the
single-region numpy chase is exact.  Mirrors the reference's distributed
``band_to_tridiag`` tests (``test/unit/eigensolver/
test_band_to_tridiag.cpp``).
"""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.hh_chase import hh_band_to_tridiagonal
from dlaf_tpu.algorithms.eigensolver.hh_chase_mp import (
    hh_band_to_tridiagonal_mp, hh_chase_regions_mp)


def _rand_band(n, b, dtype, seed):
    rng = np.random.default_rng(seed)
    ab = rng.standard_normal((b + 1, n))
    if np.issubdtype(dtype, np.complexfloating):
        ab = ab + 1j * rng.standard_normal((b + 1, n))
    return ab.astype(dtype)


@pytest.mark.parametrize("n,b,nparts,group", [
    (37, 4, 3, 5), (64, 8, 4, 16), (129, 8, 5, 8),
    (120, 16, 3, None), (50, 4, 8, 1), (40, 4, 2, None),
    (200, 8, 6, 4), (256, 16, 4, None),
])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_mp_chase_single_process(n, b, nparts, group, dtype):
    ab = _rand_band(n, b, dtype, seed=n + b)
    ref = hh_band_to_tridiagonal(ab.copy(), b, force_numpy=True)
    out = hh_band_to_tridiagonal_mp(ab.copy(), b, nparts=nparts,
                                    group_size=group, process_id=0,
                                    num_processes=1)
    np.testing.assert_allclose(out.d, ref.d, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.e, ref.e, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.V, ref.V, rtol=0, atol=1e-12)
    if ref.phases is not None:
        np.testing.assert_allclose(out.phases, ref.phases, rtol=0,
                                   atol=1e-12)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_mp_chase_simulated_processes(dtype):
    """Drive P=3 instances in lock-step with a shared in-memory
    allgather: every process owns distinct regions, each produces only
    its owned band columns + V rows, and the summed reassembly matches
    the oracle exactly."""
    n, b, nparts, P = 160, 8, 6, 3
    ab = _rand_band(n, b, dtype, seed=11)
    ref = hh_band_to_tridiagonal(ab.copy(), b, force_numpy=True)

    import threading
    barrier = threading.Barrier(P)
    slots = [None] * P

    def make_allgather(pid):
        def allgather(buf):
            slots[pid] = buf.copy()
            barrier.wait()
            out = np.stack(slots)
            barrier.wait()
            return out
        return allgather

    results = [None] * P

    def run(pid):
        out = hh_band_to_tridiagonal_mp(
            ab.copy(), b, nparts=nparts, process_id=pid,
            num_processes=P, allgather=make_allgather(pid))
        results[pid] = out

    threads = [threading.Thread(target=run, args=(p,)) for p in range(P)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for out in results:
        np.testing.assert_allclose(out.d, ref.d, rtol=0, atol=1e-12)
        np.testing.assert_allclose(out.e, ref.e, rtol=0, atol=1e-12)
        np.testing.assert_allclose(out.V, ref.V, rtol=0, atol=1e-12)


def test_mp_region_ownership_disjoint():
    """Each simulated process's *pre-reassembly* contribution covers
    disjoint column ranges (the P-fold memory/stream reduction claim)."""
    n, b, nparts, P = 128, 8, 4, 2
    ab = _rand_band(n, b, np.float64, seed=5)
    ab2 = np.zeros((2 * b + 1, n))
    ab2[: b + 1] = ab

    contributions = []
    calls = {"k": 0}

    def allgather(buf):
        # single process drives all regions; capture final reassembly
        calls["k"] += 1
        return buf[None]

    out_ab2, V = hh_chase_regions_mp(ab2.copy(), n, b, nparts=nparts,
                                     process_id=0, num_processes=1,
                                     allgather=allgather)
    assert calls["k"] > 2 * nparts      # lock-step exchanges happened
    ref = hh_band_to_tridiagonal(ab.copy(), b, force_numpy=True)
    np.testing.assert_allclose(out_ab2[0], ref.d, rtol=0, atol=1e-12)
