"""Reduction-to-band tests (reference:
``test/unit/eigensolver/test_reduction_to_band.cpp``).

Checks: (1) the output band region is genuinely banded, (2) the band matrix
is orthogonally similar to A (eigenvalue match vs scipy), (3) explicit
reconstruction A == Q B Q^H from the stored V/taus for small cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu import DistMatrix
from dlaf_tpu.algorithms.eigensolver.reduction_to_band import (
    extract_band, reduction_to_band, t_factor)
from dlaf_tpu.matrix import util as mu


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 200 * max(n, 1) * eps


def _band_from_output(out, n, nb):
    """Materialize the Hermitian band matrix from the reduction output."""
    band = np.zeros_like(out)
    for i in range(-min(nb, n - 1), min(nb, n - 1) + 1):
        d = np.diagonal(out, offset=i)
        band += np.diagflat(d, i)
    return band


def _q_from_output(out, taus, n, nb):
    """Accumulate Q = H_0 H_1 ... from stored reflectors (test-only)."""
    nt = -(-n // nb)
    q = np.eye(n, dtype=out.dtype)
    for k in range(nt - 1):
        c0 = (k + 1) * nb
        pm = n - c0
        V = np.zeros((pm, nb), dtype=out.dtype)
        pan = out[c0:, k * nb:(k + 1) * nb]
        for j in range(nb):
            if taus[k, j] != 0:
                V[j, j] = 1.0
                V[j + 1:, j] = pan[j + 1:, j]
        T = np.asarray(t_factor(jnp.asarray(V), jnp.asarray(taus[k])))
        h = np.eye(n, dtype=out.dtype)
        h[c0:, c0:] -= V @ T @ V.conj().T
        q = q @ h
    return q


@pytest.mark.parametrize("n,nb", [(8, 4), (12, 4), (13, 4), (16, 8), (3, 4)])
def test_red2band_eigenvalues(grid, n, nb):
    dtype = np.float64
    _check_eigenvalues(grid, n, nb, dtype)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_red2band_dtypes(dist_grid, dtype):
    _check_eigenvalues(dist_grid, 13, 4, dtype)


def _check_eigenvalues(grid, n, nb, dtype):
    a = mu.random_hermitian(n, dtype, seed=n * 7 + nb)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    out_m, taus = reduction_to_band(m)
    out = np.asarray(out_m.to_natural())
    band = _band_from_output(out, n, nb)
    # band really is Hermitian-banded
    assert np.allclose(band, band.conj().T, atol=tol(dtype, n))
    got = np.linalg.eigvalsh(band)
    want = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(got, want, rtol=0, atol=tol(dtype, n))


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_red2band_reconstruction(dist_grid, dtype):
    """A == Q B Q^H with Q accumulated from the stored V/taus."""
    n, nb = 12, 4
    a = mu.random_hermitian(n, dtype, seed=77)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    out_m, taus = reduction_to_band(m)
    out = np.asarray(out_m.to_natural())
    band = _band_from_output(out, n, nb)
    q = _q_from_output(out, np.asarray(taus), n, nb)
    # Q orthogonal
    np.testing.assert_allclose(q @ q.conj().T, np.eye(n), rtol=0,
                               atol=tol(dtype, n))
    np.testing.assert_allclose(q @ band @ q.conj().T, a, rtol=0,
                               atol=tol(dtype, n) * max(np.abs(a).max(), 1))


@pytest.mark.parametrize("band", [1, 2, 4])
def test_red2band_sub_block_band(dist_grid, band):
    """band_size < block size (the reference's getBandSize regime)."""
    n, nb, dtype = 14, 8, np.float64
    a = mu.random_hermitian(n, dtype, seed=band)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    out_m, _ = reduction_to_band(m, band)
    out = np.asarray(out_m.to_natural())
    band_mat = _band_from_output(out, n, band)
    got = np.linalg.eigvalsh(band_mat)
    np.testing.assert_allclose(got, np.linalg.eigvalsh(a), rtol=0,
                               atol=tol(dtype, n))


def test_extract_band(dist_grid):
    n, nb, dtype = 13, 4, np.float64
    a = mu.random_hermitian(n, dtype, seed=99)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    out_m, _ = reduction_to_band(m)
    out = np.asarray(out_m.to_natural())
    ab = np.asarray(extract_band(out_m, nb))
    assert ab.shape == (nb + 1, n)
    for i in range(nb + 1):
        np.testing.assert_allclose(ab[i, : n - i], np.diagonal(out, -i))
