"""Full eigensolver tests (reference:
``test/unit/eigensolver/test_eigensolver.cpp``, ``test_gen_eigensolver.cpp``).

The reference's correctness pattern (``test_eigensolver_correctness.h``):
residual-based — || A V - V Lambda || within a type-dependent tolerance and
V orthonormal — over sizes {0, <nb, =nb, >nb, non-divisible}, sub-block
bands, partial spectrum, and both uplos; all grid shapes via fixtures.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu import (DistMatrix, cholesky_factorization,
                      hermitian_eigensolver,
                      hermitian_generalized_eigensolver)
from dlaf_tpu.matrix import util as mu


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 1000 * max(n, 1) * eps


def _check_heev(grid, n, nb, dtype, uplo="L", band=None, n_ev=None):
    a = mu.random_hermitian(n, dtype, seed=n * 3 + nb)
    # poison the non-referenced triangle (LAPACK-style contract)
    noise = mu.random(n, n, dtype, 1) * 10
    dirty = np.tril(a) + np.triu(noise, 1) if uplo == "L" else \
        np.triu(a) + np.tril(noise, -1)
    m = DistMatrix.from_natural(jnp.asarray(dirty), nb, grid)
    lam, v = hermitian_eigensolver(m, uplo, band_size=band,
                                   eigenvalues_index_end=n_ev,
                                   leaf_size=8)
    lam = np.asarray(lam)
    v = np.asarray(v.to_natural())
    k = n if n_ev is None else n_ev
    assert lam.shape == (k,) and v.shape == (n, k)
    if n == 0 or k == 0:
        return
    t = tol(dtype, n) * max(1.0, np.abs(a).max())
    # eigenvalues ascending, match LAPACK
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(lam, want[:k], rtol=0, atol=t)
    # orthonormal columns
    np.testing.assert_allclose(v.conj().T @ v, np.eye(k), rtol=0, atol=t)
    # residual
    np.testing.assert_allclose(a @ v, v * lam[None, :], rtol=0, atol=t)


@pytest.mark.parametrize("n,nb", [(0, 4), (3, 4), (4, 4), (13, 4), (16, 4),
                                  (21, 8)])
def test_heev_sizes(grid, n, nb):
    _check_heev(grid, n, nb, np.float64)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_heev_dtypes_uplo(dist_grid, dtype, uplo):
    _check_heev(dist_grid, 13, 4, dtype, uplo)


@pytest.mark.parametrize("band", [2, 4])
def test_heev_sub_block_band(dist_grid, band):
    _check_heev(dist_grid, 16, 8, np.float64, band=band)


def test_heev_partial_spectrum(dist_grid):
    _check_heev(dist_grid, 16, 4, np.float64, n_ev=5)
    _check_heev(dist_grid, 16, 4, np.float64, n_ev=0)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_hegv(dist_grid, dtype):
    n, nb = 13, 4
    a = mu.random_hermitian(n, dtype, seed=51)
    b = mu.random_hermitian_positive_definite(n, dtype, seed=52)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    lam, v = hermitian_generalized_eigensolver(ma, mb, "L", leaf_size=8)
    lam = np.asarray(lam)
    v = np.asarray(v.to_natural())
    t = tol(dtype, n) * max(1.0, np.abs(a).max(), np.abs(b).max())
    want = sla.eigh(a, b, eigvals_only=True)
    np.testing.assert_allclose(lam, want, rtol=0, atol=t * 10)
    # residual A v = lambda B v; B-orthonormality
    np.testing.assert_allclose(a @ v, (b @ v) * lam[None, :], rtol=0,
                               atol=t * 10)
    np.testing.assert_allclose(v.conj().T @ b @ v, np.eye(n), rtol=0,
                               atol=t * 10)


def test_hegv_factorized(dist_grid):
    n, nb, dtype = 12, 4, np.float64
    a = mu.random_hermitian(n, dtype, seed=53)
    b = mu.random_hermitian_positive_definite(n, dtype, seed=54)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    fb = cholesky_factorization(mb, "L")
    lam, v = hermitian_generalized_eigensolver(ma, fb, "L", factorized=True,
                                               leaf_size=8)
    want = sla.eigh(a, b, eigvals_only=True)
    np.testing.assert_allclose(np.asarray(lam), want, rtol=0,
                               atol=tol(dtype, n) * 20)
