"""Band->tridiagonal + back-transform tests (reference:
``test/unit/eigensolver/test_band_to_tridiag.cpp``, ``test_bt_band_to_
tridiag.cpp``).

The chase runs on host (like the reference's CPU-only backend); checks:
eigenvalues preserved, and Q2 (materialized through the wave back-transform)
is unitary with Band == Q2 T Q2^H.
"""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.band_to_tridiag import (
    band_to_tridiagonal, rotation_schedule)
from dlaf_tpu.algorithms.eigensolver.bt_band_to_tridiag import (
    bt_band_to_tridiagonal)
from dlaf_tpu.matrix import util as mu


def _random_band(n, b, dtype, seed):
    """Hermitian matrix with lower bandwidth b, plus its band storage."""
    a = mu.random_hermitian(n, dtype, seed)
    full = np.zeros_like(a)
    for i in range(-b, b + 1):
        full += np.diagflat(np.diagonal(a, i), i)
    ab = np.zeros((b + 1, n), dtype)
    for i in range(b + 1):
        ab[i, : n - i] = np.diagonal(full, -i)
    return full, ab


def _tridiag(d, e):
    return np.diag(d) + np.diag(e, 1) + np.diag(e, -1)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("n,b", [(4, 2), (8, 3), (13, 4), (16, 8), (9, 2),
                                 (12, 11), (3, 2), (2, 1), (7, 1)])
def test_band_to_tridiag_eigenvalues(n, b, dtype):
    full, ab = _random_band(n, b, dtype, seed=n * 13 + b)
    res = band_to_tridiagonal(ab, b)
    assert res.d.shape == (n,) and res.e.shape == (max(n - 1, 0),)
    t = _tridiag(res.d, res.e)
    got = np.linalg.eigvalsh(t)
    want = np.linalg.eigvalsh(full)
    eps = np.finfo(np.float64).eps
    np.testing.assert_allclose(got, want, rtol=0, atol=300 * n * eps)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("n,b", [(8, 3), (13, 4), (16, 8), (7, 2)])
def test_bt_band_to_tridiag(n, b, dtype):
    full, ab = _random_band(n, b, dtype, seed=n * 17 + b)
    res = band_to_tridiagonal(ab, b)
    # materialize Q2 by back-transforming the identity
    q2 = np.asarray(bt_band_to_tridiagonal(res, np.eye(n, dtype=dtype)))
    eps = np.finfo(np.float64).eps
    tol = 300 * n * eps
    np.testing.assert_allclose(q2 @ q2.conj().T, np.eye(n), rtol=0, atol=tol)
    t = _tridiag(res.d, res.e).astype(dtype)
    np.testing.assert_allclose(q2 @ t @ q2.conj().T, full, rtol=0,
                               atol=tol * max(1, np.abs(full).max()))


def test_schedule_static_and_cached():
    s1 = rotation_schedule(16, 4)
    s2 = rotation_schedule(16, 4)
    assert s1 is s2  # lru_cache
    p, q, k = s1
    assert (p > q).all() and (k >= 2).all()


def test_band1_passthrough():
    """b == 1: already tridiagonal (real); complex gets phase-realified."""
    n = 6
    full, ab = _random_band(n, 1, np.complex128, 5)
    res = band_to_tridiagonal(ab, 1)
    got = np.linalg.eigvalsh(_tridiag(res.d, res.e))
    want = np.linalg.eigvalsh(full)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    q2 = np.asarray(bt_band_to_tridiagonal(res, np.eye(n, dtype=np.complex128)))
    t = _tridiag(res.d, res.e).astype(np.complex128)
    np.testing.assert_allclose(q2 @ t @ q2.conj().T, full, rtol=0, atol=1e-12)
