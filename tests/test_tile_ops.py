"""Tile-kernel tests against scipy/numpy references.

Mirrors the reference's ``test_blas_tile.cpp`` / ``test_lapack_tile.cpp``:
every tile op compared against the LAPACK-backed reference on random data,
per dtype, with per-dtype tolerances.
"""

import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu.matrix import util as mu
from dlaf_tpu.ops import tile

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def tol(dtype):
    return 200 * np.finfo(np.dtype(dtype).type(0).real.dtype).eps


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("opa,opb", [("N", "N"), ("T", "N"), ("C", "N"),
                                     ("N", "C"), ("T", "C")])
def test_gemm(dtype, opa, opb):
    m, n, k = 13, 7, 9
    a = mu.random(*((m, k) if opa == "N" else (k, m)), dtype, 1)
    b = mu.random(*((k, n) if opb == "N" else (n, k)), dtype, 2)
    c = mu.random(m, n, dtype, 3)
    got = np.asarray(tile.gemm(2.0, a, opa, b, opb, beta=0.5, c=c))

    def op(o, x):
        return {"N": x, "T": x.T, "C": x.conj().T}[o]

    want = 2.0 * op(opa, a) @ op(opb, b) + 0.5 * c
    np.testing.assert_allclose(got, want, rtol=tol(dtype), atol=tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_herk(dtype, uplo):
    n, k = 11, 6
    a = mu.random(n, k, dtype, 4)
    c = mu.random_hermitian(n, dtype, 5)
    got = np.asarray(tile.herk(1.5, a, "N", 0.5, c, uplo))
    want = 1.5 * a @ a.conj().T + 0.5 * c
    trimask = np.tril(np.ones((n, n), bool)) if uplo == "L" else \
        np.triu(np.ones((n, n), bool))
    np.testing.assert_allclose(got[trimask], want[trimask],
                               rtol=tol(dtype), atol=tol(dtype))
    np.testing.assert_allclose(got[~trimask], c[~trimask])


@pytest.mark.parametrize("dtype", DTYPES)
def test_her2k(dtype):
    n, k = 9, 5
    a = mu.random(n, k, dtype, 6)
    b = mu.random(n, k, dtype, 7)
    c = mu.random_hermitian(n, dtype, 8)
    got = np.asarray(tile.her2k(1.0, a, b, 0.5, c, "L"))
    want = a @ b.conj().T + b @ a.conj().T + 0.5 * c
    m = np.tril(np.ones((n, n), bool))
    np.testing.assert_allclose(got[m], want[m], rtol=tol(dtype),
                               atol=tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("side,uplo,trans,diag", [
    ("L", "L", "N", "N"), ("L", "L", "C", "N"), ("R", "L", "C", "N"),
    ("L", "U", "N", "U"), ("R", "U", "T", "N"), ("L", "U", "C", "N"),
    ("R", "L", "N", "U"), ("R", "U", "N", "N"),
])
def test_trsm_trmm(dtype, side, uplo, trans, diag):
    n = 8
    gen = mu.random_lower_triangular if uplo == "L" else \
        mu.random_upper_triangular
    a = gen(n, dtype, 9)
    b = mu.random(n, n, dtype, 10)

    def op(o, x):
        return {"N": x, "T": x.T, "C": x.conj().T}[o]

    t = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        t = t - np.diag(np.diag(t)) + np.eye(n, dtype=dtype)
    x = np.asarray(tile.trsm(side, uplo, trans, diag, 1.0, a, b))
    if side == "L":
        np.testing.assert_allclose(op(trans, t) @ x, b, rtol=0,
                                   atol=50 * tol(dtype))
    else:
        np.testing.assert_allclose(x @ op(trans, t), b, rtol=0,
                                   atol=50 * tol(dtype))
    y = np.asarray(tile.trmm(side, uplo, trans, diag, 1.0, a, b))
    want = op(trans, t) @ b if side == "L" else b @ op(trans, t)
    np.testing.assert_allclose(y, want, rtol=tol(dtype), atol=tol(dtype))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_potrf(dtype, uplo):
    n = 10
    a = mu.random_hermitian_positive_definite(n, dtype, 11)
    f = np.asarray(tile.potrf(a, uplo))
    if uplo == "L":
        f = np.tril(f)
        np.testing.assert_allclose(f @ f.conj().T, a, rtol=0,
                                   atol=n * tol(dtype) * np.abs(a).max())
    else:
        f = np.triu(f)
        np.testing.assert_allclose(f.conj().T @ f, a, rtol=0,
                                   atol=n * tol(dtype) * np.abs(a).max())


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_trtri_lauum(dtype, uplo):
    n = 9
    gen = mu.random_lower_triangular if uplo == "L" else \
        mu.random_upper_triangular
    a = gen(n, dtype, 12)
    t = np.tril(a) if uplo == "L" else np.triu(a)
    inv = np.asarray(tile.trtri(a, uplo))
    np.testing.assert_allclose(inv @ t, np.eye(n), rtol=0,
                               atol=100 * tol(dtype))
    lu = np.asarray(tile.lauum(a, uplo))
    want = t.conj().T @ t if uplo == "L" else t @ t.conj().T
    m = np.tril(np.ones((n, n), bool)) if uplo == "L" else \
        np.triu(np.ones((n, n), bool))
    np.testing.assert_allclose(lu[m], want[m], rtol=tol(dtype),
                               atol=tol(dtype))


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("uplo", ["L", "U"])
def test_hegst(dtype, uplo):
    n = 8
    a = mu.random_hermitian_positive_definite(n, dtype, 13)
    b = mu.random_hermitian_positive_definite(n, dtype, 14)
    bf = sla.cholesky(b, lower=(uplo == "L"))
    got = np.asarray(tile.hegst(1, uplo, a, bf))
    want = sla.lapack.dsygst(a.real, bf.real, itype=1,
                             lower=(uplo == "L"))[0] \
        if not np.iscomplexobj(a) else \
        sla.lapack.zhegst(a, bf, itype=1, lower=(uplo == "L"))[0]
    m = np.tril(np.ones((n, n), bool)) if uplo == "L" else \
        np.triu(np.ones((n, n), bool))
    np.testing.assert_allclose(got[m], want[m], rtol=0, atol=100 * tol(dtype))


def test_laset_lacpy_lange():
    out = np.asarray(tile.laset((4, 6), 2.0, 7.0, np.float64))
    assert (np.diag(out[:4, :4]) == 7.0).all()
    assert out[0, 1] == 2.0
    a = mu.random(5, 5, np.float64, 15)
    np.testing.assert_array_equal(np.asarray(tile.lacpy(a)), a)
    np.testing.assert_array_equal(np.asarray(tile.lacpy(a, "L")), np.tril(a))
    assert np.isclose(float(tile.lange("M", a)), np.abs(a).max())
    assert np.isclose(float(tile.lange("F", a)), np.linalg.norm(a))
    assert np.isclose(float(tile.lange("1", a)),
                      np.abs(a).sum(axis=0).max())
    assert np.isclose(float(tile.lange("I", a)),
                      np.abs(a).sum(axis=1).max())
