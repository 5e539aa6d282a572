"""Generalized-to-standard reduction tests (reference:
``test/unit/eigensolver/test_gen_to_std.cpp``)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu import DistMatrix, cholesky_factorization
from dlaf_tpu.algorithms.eigensolver.gen_to_std import generalized_to_standard
from dlaf_tpu.matrix import util as mu


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 100 * max(n, 1) * eps


@pytest.mark.parametrize("n,nb", [(3, 4), (4, 4), (17, 4), (16, 4)])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_gen_to_std(grid, n, nb, uplo):
    dtype = np.float64
    _check(grid, n, nb, uplo, dtype)


@pytest.mark.parametrize("dtype", [np.complex128])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_gen_to_std_complex(dist_grid, uplo, dtype):
    _check(dist_grid, 13, 4, uplo, dtype)


def _check(grid, n, nb, uplo, dtype):
    a = mu.random_hermitian_positive_definite(n, dtype, 41)
    b = mu.random_hermitian_positive_definite(n, dtype, 42)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
    fb = cholesky_factorization(mb, uplo)
    out = np.asarray(generalized_to_standard(uplo, ma, fb).to_natural())

    f = sla.cholesky(b, lower=(uplo == "L"))
    if uplo == "L":
        want = sla.solve_triangular(f, a, lower=True)
        want = sla.solve_triangular(f, want.conj().T, lower=True).conj().T
    else:
        want = sla.solve_triangular(f, a, lower=False, trans="C")
        want = sla.solve_triangular(
            f, want.conj().T, lower=False, trans="C").conj().T
    mask = np.tril(np.ones((n, n), bool)) if uplo == "L" else \
        np.triu(np.ones((n, n), bool))
    scale = max(np.abs(want).max(), 1)
    np.testing.assert_allclose(out[mask], want[mask], rtol=0,
                               atol=tol(dtype, n) * scale)


def test_gen_to_std_eigenvalues(dist_grid):
    """End-to-end invariant: eig(std form) == generalized eig(A, B)."""
    n, nb, dtype = 16, 4, np.float64
    a = mu.random_hermitian_positive_definite(n, dtype, 43)
    b = mu.random_hermitian_positive_definite(n, dtype, 44)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    fb = cholesky_factorization(mb, "L")
    out = np.asarray(generalized_to_standard("L", ma, fb).to_natural())
    std = np.tril(out) + np.tril(out, -1).T
    got = np.linalg.eigvalsh(std)
    want = sla.eigh(a, b, eigvals_only=True)
    np.testing.assert_allclose(got, want, rtol=0, atol=tol(dtype, n) * 10)
