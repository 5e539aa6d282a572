"""Cholesky factorization tests (reference: ``test_cholesky.cpp``).

Sizes sweep tile-boundary edge cases {0, <nb, =nb, >nb, non-divisible}; every
grid shape from the fixture; correctness is residual-based:
|| tri(L) tri(L)^H - A || / ||A|| within a dtype tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import DistMatrix, cholesky_factorization
from dlaf_tpu.matrix import util as mu

SIZES = [(0, 4), (3, 4), (4, 4), (5, 4), (17, 4), (34, 8)]
DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 20 * max(n, 1) * eps


@pytest.mark.parametrize("n,nb", SIZES)
def test_cholesky_sizes(grid, n, nb):
    _check_cholesky(grid, n, nb, np.float64, "L")


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_cholesky_dtypes(dist_grid, dtype, uplo):
    _check_cholesky(dist_grid, 17, 4, dtype, uplo)


def _check_cholesky(grid, n, nb, dtype, uplo):
    a = mu.random_hermitian_positive_definite(n, dtype, seed=n + nb)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    f = np.asarray(cholesky_factorization(m, uplo).to_natural())
    if uplo == "L":
        t = np.tril(f)
        resid = t @ t.conj().T - a
    else:
        t = np.triu(f)
        resid = t.conj().T @ t - a
    if n == 0:
        assert f.shape == (0, 0)
        return
    rel = np.linalg.norm(resid) / np.linalg.norm(a)
    assert rel < tol(dtype, n), rel


def test_cholesky_matches_lapack(dist_grid):
    """Lower factor must equal LAPACK's exactly up to roundoff (unique)."""
    n, nb = 29, 8
    a = mu.random_hermitian_positive_definite(n, np.float64, seed=3)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    f = np.tril(np.asarray(cholesky_factorization(m).to_natural()))
    np.testing.assert_allclose(f, np.linalg.cholesky(a), rtol=0, atol=1e-12)


def test_cholesky_rejects_bad_args():
    m = DistMatrix.from_natural(jnp.zeros((4, 6)), 2)
    with pytest.raises(ValueError):
        cholesky_factorization(m)
    sq = DistMatrix.from_natural(jnp.eye(4), 2)
    with pytest.raises(ValueError):
        cholesky_factorization(sq, uplo="X")


def test_cholesky_ignores_other_triangle(dist_grid):
    """Input may hold garbage in the non-referenced triangle (LAPACK-like)."""
    n, nb = 19, 4
    a = mu.random_hermitian_positive_definite(n, np.float64, seed=5)
    dirty = np.triu(mu.random(n, n, np.float64, 6), 1) + np.tril(a)
    m = DistMatrix.from_natural(jnp.asarray(dirty), nb, dist_grid)
    f = np.tril(np.asarray(cholesky_factorization(m).to_natural()))
    np.testing.assert_allclose(f, np.linalg.cholesky(a), rtol=0, atol=1e-12)
