"""fp64 iterative-refinement paths (``algorithms/refine.py``).

The chip computes f32; these verify the dd-residual Newton correction
actually buys fp64-level backward error (reference d-type parity,
``include/dlaf/types.h:31-61``) — each test checks the REFINED result
is orders of magnitude better than the plain f32 one, not just small.
"""

import numpy as np
import pytest

from dlaf_tpu.algorithms.refine import (cholesky_refine,
                                        hermitian_eigensolver_refined,
                                        refine_eigenvalues)


def random_spd(n, seed, cond=1e4):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0.0, -np.log10(cond), n)
    return (q * d) @ q.T


@pytest.mark.parametrize("n,nb", [(96, 32), (130, 32)])
def test_cholesky_refine_reaches_fp64(n, nb):
    a = random_spd(n, seed=n)
    L, hist = cholesky_refine(a, nb, iters=2, return_history=True)
    # hist[0] = residual of the raw f32 factor; hist[-1] after refinement
    assert hist[0] > 1e-9, "f32 factor unexpectedly accurate"
    assert hist[-1] < 1e-12, f"refinement stalled: {hist}"
    assert hist[-1] < 1e-4 * hist[0]
    r = np.linalg.norm(a - L @ L.T) / np.linalg.norm(a)
    assert r < 1e-12
    assert np.allclose(L, np.tril(L))


def test_cholesky_refine_uplo_u():
    n = 64
    a = random_spd(n, seed=5)
    u = cholesky_refine(np.triu(a), 32, uplo="U", iters=1)
    r = np.linalg.norm(a - u.T @ u) / np.linalg.norm(a)
    assert r < 1e-11
    assert np.allclose(u, np.triu(u))


def test_refine_eigenvalues_quadratic_gain():
    n = 96
    a = random_spd(n, seed=3, cond=1e3)
    lam_ref = np.linalg.eigvalsh(a)
    lam32, v32 = np.linalg.eigh(a.astype(np.float32))
    err32 = np.abs(np.sort(lam32.astype(np.float64)) - lam_ref).max()
    lam = refine_eigenvalues(a, lam32, v32.astype(np.float32))
    err = np.abs(np.sort(lam) - lam_ref).max()
    assert err < 1e-2 * max(err32, 1e-300)
    assert err < 5e-11


def test_hermitian_eigensolver_refined_end_to_end():
    n, nb = 64, 16
    a = random_spd(n, seed=9, cond=1e3)
    lam, v = hermitian_eigensolver_refined(a, nb, band_size=4)
    lam_ref = np.linalg.eigvalsh(a)
    # the f32 pipeline's eigenvalues carry ~eps32*||A|| error; the
    # Rayleigh refinement must beat that by orders of magnitude
    assert np.abs(lam - lam_ref).max() < 1e-9
    assert np.all(np.diff(lam) >= -1e-12)
    # vectors stay f32-accurate
    r = np.linalg.norm(a @ v - v * lam[None, :]) / np.linalg.norm(a)
    assert r < 5e-5


def test_refine_rejects_complex():
    a = np.eye(4, dtype=np.complex128)
    with pytest.raises(ValueError):
        cholesky_refine(a, 2)
    with pytest.raises(ValueError):
        refine_eigenvalues(a, np.ones(4), np.eye(4, dtype=np.float32))


def test_refine_generalized_eigenvalues():
    from dlaf_tpu.algorithms.refine import refine_generalized_eigenvalues
    import scipy.linalg as sla
    n = 80
    a = random_spd(n, seed=21, cond=1e2)
    bm = random_spd(n, seed=22, cond=10.0) + np.eye(n)
    lam_ref = sla.eigh(a, bm, eigvals_only=True)
    lam32, v32 = sla.eigh(a.astype(np.float32).astype(np.float64),
                          bm.astype(np.float32).astype(np.float64))
    # f32-rounded inputs -> ~eps32-level eigenvalue error
    err32 = np.abs(lam32 - lam_ref).max()
    lam = refine_generalized_eigenvalues(a, bm, lam32,
                                         v32.astype(np.float32))
    err = np.abs(np.sort(lam) - lam_ref).max()
    assert err < 1e-2 * max(err32, 1e-300)
    assert err < 5e-11


def test_hermitian_eigensolver_refined_vectors_fp64():
    """refine_vectors=True (default) must return d-grade vectors:
    residual and orthogonality orders below the f32 pipeline's."""
    from dlaf_tpu.algorithms.refine import hermitian_eigensolver_refined
    n, nb = 96, 32
    a = random_spd(n, seed=11, cond=1e3)
    lam, v = hermitian_eigensolver_refined(a, nb, band_size=8)
    lam_ref = np.linalg.eigvalsh(a)
    assert np.abs(lam - lam_ref).max() < 1e-11
    r = np.linalg.norm(a @ v - v * lam[None, :]) / np.linalg.norm(a)
    orth = np.linalg.norm(v.T @ v - np.eye(n))
    assert r < 5e-11, f"vector residual not fp64-grade: {r}"
    assert orth < 5e-11, f"orthogonality not fp64-grade: {orth}"


def test_refine_eigenpairs_clustered_spectrum():
    """Clustered eigenvalues must not blow up the separation formula:
    orthonormality restored, residual still far below f32."""
    from dlaf_tpu.algorithms.refine import refine_eigenpairs
    rng = np.random.default_rng(7)
    n = 64
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.concatenate([np.full(8, 1.0), np.full(8, 1.0 + 3e-7),
                        np.linspace(2.0, 50.0, n - 16)])
    a = (q * d) @ q.T
    lam32, v32 = np.linalg.eigh(a.astype(np.float32))
    lam, v = refine_eigenpairs(a, lam32, v32.astype(np.float32))
    orth = np.linalg.norm(v.T @ v - np.eye(n))
    r = np.linalg.norm(a @ v - v * lam[None, :]) / np.linalg.norm(a)
    assert orth < 1e-10
    assert r < 1e-8        # in-cluster rotation is free; residual still tiny
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(a)).max() < 1e-10


def test_triangular_solve_refine():
    from dlaf_tpu.algorithms.refine import triangular_solve_refine
    rng = np.random.default_rng(31)
    n, m = 96, 40
    L = np.tril(rng.standard_normal((n, n))) + 4.0 * np.eye(n)
    B = rng.standard_normal((n, m))
    X, hist = triangular_solve_refine("L", "L", "N", "N", 2.0, L, B, 32,
                                      iters=2, return_history=True)
    assert hist[0] > 1e-9 and hist[-1] < 1e-12
    assert np.linalg.norm(L @ X - 2.0 * B) / np.linalg.norm(B) < 1e-11
    # right side, transposed, unit diagonal
    U = np.triu(rng.standard_normal((m, m))) + 3.0 * np.eye(m)
    Xr = triangular_solve_refine("R", "U", "T", "U", 1.0, U, B, 32,
                                 iters=2)
    Uu = np.triu(U, 1) + np.eye(m)
    assert np.linalg.norm(Xr @ Uu.T - B) / np.linalg.norm(B) < 1e-11


def test_triangular_inverse_refine():
    from dlaf_tpu.algorithms.refine import triangular_inverse_refine
    rng = np.random.default_rng(33)
    n = 80
    L = np.tril(rng.standard_normal((n, n))) + 4.0 * np.eye(n)
    X, hist = triangular_inverse_refine("L", "N", L, 32, iters=2,
                                        return_history=True)
    assert hist[0] > 1e-10 and hist[-1] < 1e-12
    assert np.linalg.norm(L @ X - np.eye(n)) < 1e-11
    assert np.allclose(X, np.tril(X))
    U = np.triu(rng.standard_normal((n, n))) + 4.0 * np.eye(n)
    Xu = triangular_inverse_refine("U", "N", U, 32, iters=2)
    assert np.linalg.norm(U @ Xu - np.eye(n)) < 1e-11


def test_cholesky_inverse_refine():
    from dlaf_tpu.algorithms.refine import cholesky_inverse_refine
    n = 96
    a = random_spd(n, seed=41, cond=1e3)
    L = np.linalg.cholesky(a)
    X, hist = cholesky_inverse_refine("L", L, 32, iters=2,
                                      return_history=True)
    assert hist[0] > 1e-9 and hist[-1] < 1e-11
    Xf = np.tril(X) + np.tril(X, -1).T
    assert np.linalg.norm(a @ Xf - np.eye(n)) < 1e-9
    # uplo=U: factor input is U with A = U^T U
    Xu = cholesky_inverse_refine("U", L.T.copy(), 32, iters=2)
    Xuf = np.triu(Xu) + np.triu(Xu, 1).T
    assert np.linalg.norm(a @ Xuf - np.eye(n)) < 1e-9


def test_generalized_to_standard_refine():
    from dlaf_tpu.algorithms.refine import generalized_to_standard_refine
    n = 96
    a = random_spd(n, seed=51, cond=1e3)
    bm = random_spd(n, seed=52, cond=10.0) + np.eye(n)
    L = np.linalg.cholesky(bm)
    C, hist = generalized_to_standard_refine("L", np.tril(a), L, 32,
                                             iters=2, return_history=True)
    assert hist[0] > 1e-10 and hist[-1] < 1e-12
    Cf = np.tril(C) + np.tril(C, -1).T
    Cref = np.linalg.solve(L, np.linalg.solve(L, a.T).T)
    assert np.linalg.norm(Cf - Cref) / np.linalg.norm(Cref) < 1e-11


def test_generalized_eigensolver_refined_end_to_end():
    import scipy.linalg as sla

    from dlaf_tpu.algorithms.refine import (
        hermitian_generalized_eigensolver_refined)
    n, nb = 96, 32
    a = random_spd(n, seed=61, cond=1e3)
    bm = random_spd(n, seed=62, cond=10.0) + np.eye(n)
    lam_ref = sla.eigh(a, bm, eigvals_only=True)
    lam, v = hermitian_generalized_eigensolver_refined(a, bm, nb,
                                                       band_size=8)
    assert np.abs(lam - lam_ref).max() < 1e-10
    r = np.linalg.norm(a @ v - (bm @ v) * lam[None, :]) / np.linalg.norm(a)
    borth = np.linalg.norm(v.T @ bm @ v - np.eye(n))
    assert r < 5e-10, f"pencil residual not fp64-grade: {r}"
    assert borth < 5e-10, f"B-orthogonality not fp64-grade: {borth}"
    # factorized variant: b holds the Cholesky factor
    lam2, v2 = hermitian_generalized_eigensolver_refined(
        a, np.linalg.cholesky(bm), nb, factorized=True, band_size=8)
    assert np.abs(lam2 - lam_ref).max() < 1e-10
