"""Triangular solver tests (reference:
``test/unit/solver/test_triangular.cpp`` — all 8 Left/Right x Upper/Lower x
op variants, local + distributed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import DistMatrix, triangular_solver
from dlaf_tpu.matrix import util as mu


def tol(n):
    return 200 * max(n, 1) * np.finfo(np.float64).eps


def _op(t, x):
    return x if t == "N" else x.T if t == "T" else x.conj().T


@pytest.mark.parametrize("side", ["L", "R"])
@pytest.mark.parametrize("uplo", ["L", "U"])
@pytest.mark.parametrize("trans", ["N", "T", "C"])
@pytest.mark.parametrize("diag", ["N", "U"])
def test_trsm_variants(dist_grid, side, uplo, trans, diag):
    dtype = np.complex128
    n, w, nb = 13, 6, 4
    a = mu.random_lower_triangular(n, dtype, 1) if uplo == "L" else \
        mu.random_upper_triangular(n, dtype, 1)
    bshape = (n, w) if side == "L" else (w, n)
    b = mu.random(*bshape, dtype, 2)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, dist_grid)
    x = np.asarray(
        triangular_solver(side, uplo, trans, diag, 1.5, ma, mb).to_natural())
    t = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        np.fill_diagonal(t, 1.0)
    top = _op(trans, t)
    want = np.linalg.solve(top, 1.5 * b) if side == "L" else \
        (1.5 * b) @ np.linalg.inv(top)
    scale = max(np.abs(want).max(), 1)
    np.testing.assert_allclose(x, want, rtol=0, atol=tol(n) * scale * 10)


@pytest.mark.parametrize("n,w,nb", [(0, 0, 4), (3, 2, 4), (4, 4, 4),
                                    (16, 16, 4), (17, 5, 4), (21, 13, 8)])
def test_trsm_sizes(grid, n, w, nb):
    dtype = np.float64
    a = mu.random_lower_triangular(n, dtype, n + 1)
    b = mu.random(n, w, dtype, n + 2)
    ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
    x = np.asarray(
        triangular_solver("L", "L", "N", "N", 1.0, ma, mb).to_natural())
    assert x.shape == (n, w)
    if n and w:
        want = np.linalg.solve(np.tril(a), b)
        np.testing.assert_allclose(x, want, rtol=0,
                                   atol=tol(n) * max(np.abs(want).max(), 1))
