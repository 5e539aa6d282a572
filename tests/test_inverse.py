"""Inverse tests (reference: ``test/unit/inverse/``).

TRTRI and POTRI residual-based checks across grid shapes and sizes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import (DistMatrix, cholesky_factorization, cholesky_inverse,
                      inverse_from_cholesky_factor, triangular_inverse)
from dlaf_tpu.matrix import util as mu


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 100 * max(n, 1) * eps


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("n,nb", [(3, 4), (4, 4), (17, 4), (16, 4)])
def test_trtri(grid, uplo, n, nb):
    dtype = np.float64
    a = mu.random_lower_triangular(n, dtype, n) if uplo == "L" else \
        mu.random_upper_triangular(n, dtype, n)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    inv = np.asarray(triangular_inverse(uplo, "N", m).to_natural())
    t = np.tril(inv) if uplo == "L" else np.triu(inv)
    resid = np.linalg.norm(t @ a - np.eye(n)) / max(
        np.linalg.norm(a) * np.linalg.norm(t), 1)
    assert resid < tol(dtype, n), resid


@pytest.mark.parametrize("diag", ["N", "U"])
def test_trtri_unit_diag(dist_grid, diag):
    n, nb, dtype = 13, 4, np.float64
    a = mu.random_lower_triangular(n, dtype, 2)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    inv = np.asarray(triangular_inverse("L", diag, m).to_natural())
    ref = np.tril(a)
    if diag == "U":
        np.fill_diagonal(ref, 1.0)
    resid = np.linalg.norm(np.tril(inv) @ ref - np.eye(n))
    assert resid < tol(dtype, n) * np.linalg.norm(ref), resid


@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_potri(grid, uplo, dtype):
    n, nb = 17, 4
    a = mu.random_hermitian_positive_definite(n, dtype, 31)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    f = cholesky_factorization(m, uplo)
    inv = np.asarray(inverse_from_cholesky_factor(uplo, f).to_natural())
    tri = np.tril(inv) if uplo == "L" else np.triu(inv)
    full = tri + tri.conj().T - np.diag(np.diag(tri).real)
    resid = np.linalg.norm(full @ a - np.eye(n)) / np.linalg.cond(a)
    assert resid < tol(dtype, n), resid


def test_cholesky_inverse_end_to_end(dist_grid):
    n, nb, dtype = 16, 4, np.float64
    a = mu.random_hermitian_positive_definite(n, dtype, 33)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    inv = np.asarray(cholesky_inverse("L", m).to_natural())
    full = np.tril(inv) + np.tril(inv, -1).T
    np.testing.assert_allclose(full, np.linalg.inv(a), rtol=0,
                               atol=tol(dtype, n))
