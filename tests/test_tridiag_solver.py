"""Tridiagonal D&C eigensolver tests (reference:
``test/unit/eigensolver/test_tridiag_solver_*.cpp``).

Residual-based (A V == V Lambda, V orthonormal) plus eigenvalue comparison
vs LAPACK, over sizes crossing leaf boundaries, hard deflation cases
(multiple eigenvalues, zero off-diagonals), and both leaf regimes.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu.algorithms.eigensolver.tridiag_solver import (
    tridiagonal_eigensolver)


def _check(d, e, leaf_size=4, tolf=600):
    n = len(d)
    lam, q = tridiagonal_eigensolver(np.asarray(d, np.float64),
                                     np.asarray(e, np.float64),
                                     leaf_size=leaf_size)
    lam, q = np.asarray(lam), np.asarray(q)
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    eps = np.finfo(np.float64).eps
    tol = tolf * max(n, 1) * eps * max(1.0, np.abs(t).max())
    # eigenvalues vs LAPACK
    want = np.linalg.eigvalsh(t)
    np.testing.assert_allclose(lam, want, rtol=0, atol=tol)
    # orthonormality
    np.testing.assert_allclose(q.T @ q, np.eye(n), rtol=0, atol=tol)
    # residual
    np.testing.assert_allclose(t @ q, q * lam[None, :], rtol=0, atol=tol)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 8, 9, 16, 21, 33])
def test_random_tridiag(n):
    rng = np.random.default_rng(n)
    d = rng.uniform(-1, 1, n)
    e = rng.uniform(-1, 1, max(n - 1, 0))
    _check(d, e)


def test_larger_leaf_and_problem():
    rng = np.random.default_rng(7)
    n = 64
    _check(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n - 1), leaf_size=16)


def test_zero_offdiagonals():
    """Exactly reducible problems: e has zeros (full deflation paths)."""
    rng = np.random.default_rng(11)
    n = 16
    d = rng.uniform(-1, 1, n)
    e = rng.uniform(-1, 1, n - 1)
    e[3] = 0.0
    e[7] = 0.0
    e[8] = 0.0
    _check(d, e)


def test_multiple_eigenvalues():
    """Clustered/multiple eigenvalues exercise the deflation rotations."""
    n = 20
    d = np.full(n, 2.0)
    e = np.full(n - 1, 1e-14)
    _check(d, e)
    # block-constant with tiny couplings
    d2 = np.concatenate([np.full(10, 1.0), np.full(10, 3.0)])
    e2 = np.full(n - 1, 1e-13)
    _check(d2, e2)


def test_wilkinson():
    """Wilkinson W21+ matrix: famously close eigenvalue pairs."""
    n = 21
    d = np.abs(np.arange(n) - (n - 1) // 2).astype(np.float64)
    e = np.ones(n - 1)
    _check(d, e, tolf=3000)


def test_identity_and_diag():
    _check(np.arange(8, dtype=np.float64), np.zeros(7))
    _check(np.ones(8), np.zeros(7))


def test_1_2_3_scale_invariance():
    d = np.array([1e8, -1e8, 1e-8])
    e = np.array([1e4, 1e-4])
    n = 3
    lam, q = map(np.asarray, tridiagonal_eigensolver(d, e, leaf_size=2))
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    want = np.linalg.eigvalsh(t)
    np.testing.assert_allclose(lam, want, rtol=1e-10, atol=1e-10 * 1e8)
    resid = np.abs(t @ q - q * lam[None, :]).max()
    assert resid < 1e-6, resid


def test_random_spectrum_deflation_rotation():
    """Regression: laed2 deflation must rotate the D values of close pairs
    (deflated eigenvalue c^2 d_li + s^2 d_j) — random tridiagonals with
    N(0, 0.5) couplings trigger extreme-angle rotations where skipping the
    update gives O(1)-wrong eigenvalues with perfectly orthogonal vectors."""
    import numpy as np

    from dlaf_tpu.algorithms.eigensolver.tridiag_solver import \
        tridiagonal_eigensolver
    rng = np.random.default_rng(0)
    for n, leaf in [(256, 64), (768, 64), (500, 48)]:
        d = jnp.asarray(rng.standard_normal(n), jnp.float32)
        e = jnp.asarray(rng.standard_normal(n - 1) * 0.5, jnp.float32)
        T = (np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) +
             np.diag(np.asarray(e), -1))
        lam, Q = tridiagonal_eigensolver(d, e, leaf_size=leaf, col_chunk=256)
        Qn = np.asarray(Q)
        lamn = np.asarray(lam)
        assert np.abs(T @ Qn - Qn * lamn[None, :]).max() < 2e-4
        assert np.abs(np.sort(lamn) - np.linalg.eigvalsh(T)).max() < 2e-4


def test_sequential_fori_group_path(monkeypatch):
    """Big same-size merge groups run as a fori_loop over offsets (one
    traced body per size, r4 program-size fix); force that path at a
    test-size threshold and compare against the batched result."""
    from dlaf_tpu.algorithms.eigensolver import tridiag_solver as ts

    rng = np.random.default_rng(23)
    n = 96
    d = rng.uniform(-1, 1, n)
    e = rng.uniform(-1, 1, n - 1)
    lam0, q0 = (np.asarray(a) for a in tridiagonal_eigensolver(
        np.asarray(d), np.asarray(e), leaf_size=8))
    monkeypatch.setattr(ts, "_BATCH_MAX_M", 8)   # 16/32/48-size groups -> fori
    ts._dc_small_jit.clear_cache()
    try:
        lam1, q1 = (np.asarray(a) for a in tridiagonal_eigensolver(
            np.asarray(d), np.asarray(e), leaf_size=8))
    finally:
        ts._dc_small_jit.clear_cache()
    np.testing.assert_allclose(lam1, lam0, rtol=0, atol=1e-13)
    t = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
    tol = 600 * n * np.finfo(np.float64).eps * max(1.0, np.abs(t).max())
    np.testing.assert_allclose(t @ q1, q1 * lam1[None, :], rtol=0, atol=tol)
    np.testing.assert_allclose(q1.T @ q1, np.eye(n), rtol=0, atol=tol)
