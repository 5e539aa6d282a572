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
