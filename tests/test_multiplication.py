"""Multiplication family tests (reference: ``test/unit/multiplication/``).

GEMM/HEMM/TRMM against numpy references over every grid shape, all op
variants, sub-matrix (MatrixRef) ranges, and tile-boundary size sweeps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import (DistMatrix, MatrixRef, general_multiplication,
                      hermitian_multiplication, max_norm,
                      triangular_multiplication)
from dlaf_tpu.matrix import util as mu


def tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).type(0).real.dtype).eps
    return 50 * max(n, 1) * eps


def _op(t, x):
    return x if t == "N" else x.T if t == "T" else x.conj().T


# -- GEMM ---------------------------------------------------------------------

@pytest.mark.parametrize("m,n,k,nb", [(7, 5, 9, 4), (8, 8, 8, 4), (3, 2, 5, 4),
                                      (16, 12, 20, 4)])
def test_gemm_shapes(grid, m, n, k, nb):
    dtype = np.float64
    a = mu.random(m, k, dtype, 1)
    b = mu.random(k, n, dtype, 2)
    c = mu.random(m, n, dtype, 3)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
    mc = DistMatrix.from_natural(jnp.asarray(c), nb, grid)
    out = general_multiplication(1.5, "N", ma, "N", mb, 0.5, mc)
    want = 1.5 * a @ b + 0.5 * c
    np.testing.assert_allclose(np.asarray(out.to_natural()), want,
                               rtol=0, atol=tol(dtype, k))


@pytest.mark.parametrize("op_a", ["N", "T", "C"])
@pytest.mark.parametrize("op_b", ["N", "T", "C"])
def test_gemm_ops(dist_grid, op_a, op_b):
    dtype = np.complex128
    m, n, k, nb = 10, 6, 8, 4
    a = mu.random(*((m, k) if op_a == "N" else (k, m)), dtype, 4)
    b = mu.random(*((k, n) if op_b == "N" else (n, k)), dtype, 5)
    c = mu.random(m, n, dtype, 6)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    mc = DistMatrix.from_natural(jnp.asarray(c), nb, dist_grid)
    out = general_multiplication(2.0 - 1j, op_a, ma, op_b, mb, 1j, mc)
    want = (2.0 - 1j) * _op(op_a, a) @ _op(op_b, b) + 1j * c
    np.testing.assert_allclose(np.asarray(out.to_natural()), want,
                               rtol=0, atol=tol(dtype, k))


def test_gemm_subranges(dist_grid):
    """Tile-aligned sub-matrix multiply (the reference's MatrixRef gemm,
    used by the D&C merge, ``multiplication/general/impl.h:65``)."""
    dtype = np.float64
    nb = 4
    a = mu.random(16, 16, dtype, 7)
    c = mu.random(16, 16, dtype, 8)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mc = DistMatrix.from_natural(jnp.asarray(c), nb, dist_grid)
    ra = MatrixRef(ma, (4, 0), (8, 12))
    rb = MatrixRef(ma, (0, 4), (12, 8))
    rc = MatrixRef(mc, (8, 8), (8, 8))
    out = general_multiplication(1.0, "N", ra, "N", rb, -1.0, rc)
    want = c.copy()
    want[8:16, 8:16] = a[4:12, 0:12] @ a[0:12, 4:12] - c[8:16, 8:16]
    np.testing.assert_allclose(np.asarray(out.to_natural()), want,
                               rtol=0, atol=tol(dtype, 12))


# -- HEMM ---------------------------------------------------------------------

@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_hemm(grid, side, uplo):
    dtype = np.complex128
    n, w, nb = 11, 7, 4
    a = mu.random_hermitian(n, dtype, 9)
    # poison the non-referenced triangle
    dirty = a.copy()
    if uplo == "L":
        dirty += np.triu(mu.random(n, n, dtype, 10), 1)
    else:
        dirty += np.tril(mu.random(n, n, dtype, 10), -1)
    bshape = (n, w) if side == "L" else (w, n)
    b = mu.random(*bshape, dtype, 11)
    c = mu.random(*bshape, dtype, 12)
    ma = DistMatrix.from_natural(jnp.asarray(dirty), nb, grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
    mc = DistMatrix.from_natural(jnp.asarray(c), nb, grid)
    out = hermitian_multiplication(side, uplo, 0.5j, ma, mb, 2.0, mc)
    want = 0.5j * (a @ b if side == "L" else b @ a) + 2.0 * c
    np.testing.assert_allclose(np.asarray(out.to_natural()), want,
                               rtol=0, atol=tol(dtype, n))


# -- TRMM ---------------------------------------------------------------------

@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trmm_variants(dist_grid, side, uplo, trans, diag):
    dtype = np.complex128
    n, w, nb = 9, 6, 4
    a = mu.random(n, n, dtype, 13)
    bshape = (n, w) if side == "L" else (w, n)
    b = mu.random(*bshape, dtype, 14)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    out = triangular_multiplication(side, uplo, trans, diag, 1.5, ma, mb)
    t = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        np.fill_diagonal(t, 1.0)
    t = _op(trans, t)
    want = 1.5 * (t @ b if side == "L" else b @ t)
    np.testing.assert_allclose(np.asarray(out.to_natural()), want,
                               rtol=0, atol=tol(dtype, n))


def test_trmm_sizes(grid):
    for n, w, nb in [(0, 0, 4), (3, 2, 4), (4, 4, 4), (13, 5, 4)]:
        dtype = np.float64
        a = mu.random(n, n, dtype, n + 1)
        b = mu.random(n, w, dtype, n + 2)
        ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
        out = triangular_multiplication("L", "L", "N", "N", 1.0, ma, mb)
        want = np.tril(a) @ b
        got = np.asarray(out.to_natural())
        assert got.shape == want.shape
        if n:
            np.testing.assert_allclose(got, want, rtol=0, atol=tol(dtype, n))


# -- max_norm -----------------------------------------------------------------

def test_max_norm(grid):
    dtype = np.float64
    n, nb = 13, 4
    a = mu.random(n, n, dtype, 21)
    m = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    assert np.isclose(float(max_norm(m)), np.abs(a).max())
    assert np.isclose(float(max_norm(m, "L")), np.abs(np.tril(a)).max())
    assert np.isclose(float(max_norm(m, "U")), np.abs(np.triu(a)).max())


def test_max_norm_empty(grid):
    m = DistMatrix.from_natural(jnp.zeros((0, 0)), 4, grid)
    assert float(max_norm(m)) == 0.0
