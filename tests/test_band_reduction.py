"""SBR stage-2 (band b1 -> band b2) block bulge chase
(``band_reduction.py``).

Validation strategy mirrors the scalar chase's: trajectory equality vs
the numpy reference at small sizes, reduction validity (bandwidth +
eigenvalues + back-transform residual) across edge-case shapes, and an
end-to-end HEEV run through the driver with SBR enabled.
"""

import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu.algorithms.eigensolver.band_reduction import (
    band_to_band, band_to_band_numpy, bt_band_to_band,
    bt_band_to_band_numpy, sbr_schedule, sbr_real_windows)


def random_banded_full(n, h, dtype, seed=0):
    """Full Hermitian matrix with lower bandwidth h (both triangles)."""
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * rng.standard_normal((n, n)).astype(A.real.dtype)
    A = (A + A.conj().T) / 2
    i, j = np.indices((n, n))
    A[np.abs(i - j) > h] = 0
    return np.ascontiguousarray(A)


def bandwidth(A, tol=0.0):
    n = A.shape[0]
    i, j = np.indices((n, n))
    nz = np.abs(A) > tol
    return int(np.max(np.where(nz, np.abs(i - j), 0)))


@pytest.mark.parametrize("n,h,g", [(48, 8, 4), (64, 16, 4), (65, 16, 8),
                                   (40, 12, 4), (33, 8, 2)])
def test_numpy_reference_reduces_and_preserves_spectrum(n, h, g):
    A = random_banded_full(n, h, np.float64, seed=n + h + g)
    lam0 = np.linalg.eigvalsh(A)
    Ared = A.copy()
    refl = band_to_band_numpy(Ared, h, g)
    assert bandwidth(Ared, 1e-11) <= g
    np.testing.assert_allclose(np.linalg.eigvalsh(Ared), lam0, atol=1e-10)
    # full reconstruction: A == Q Ared Q^H with Q = prod(refl) applied to I
    Q = bt_band_to_band_numpy(refl, np.eye(n), n)
    np.testing.assert_allclose(Q @ Ared @ Q.conj().T, A, atol=1e-10)


@pytest.mark.parametrize("n,h,g", [(48, 8, 4), (65, 16, 8), (33, 8, 2),
                                   (47, 16, 4)])
def test_scan_matches_numpy_trajectory(n, h, g):
    A = random_banded_full(n, h, np.float64, seed=3 * n + h + g)
    Aref = A.copy()
    band_to_band_numpy(Aref, h, g)
    Ared, res = band_to_band(A.copy(), n, h, g)
    np.testing.assert_allclose(np.asarray(Ared), Aref, atol=1e-10)


@pytest.mark.parametrize("n,h,g,dtype", [(64, 16, 4, np.float64),
                                         (65, 16, 8, np.float32),
                                         (50, 12, 4, np.float64)])
def test_scan_bt_roundtrip(n, h, g, dtype):
    """Q (from the scan's stream) diagonalization residual on A."""
    A = random_banded_full(n, h, dtype, seed=7)
    Ared, res = band_to_band(A.copy(), n, h, g)
    Ared = np.asarray(Ared)
    tol = 1e-4 if dtype == np.float32 else 1e-10
    assert bandwidth(Ared, tol / 10) <= g
    w, z = np.linalg.eigh(Ared)
    E = np.asarray(bt_band_to_band(res, np.asarray(z, dtype)))
    resid = np.linalg.norm(A @ E - E * w[None, :]) / np.linalg.norm(A)
    assert resid < 50 * tol
    # orthogonality preserved by the back-transform
    assert np.abs(E.conj().T @ E - np.eye(n)).max() < 50 * tol


def test_segmented_stream_matches(monkeypatch):
    """Forcing tiny segments must not change the trajectory or BT."""
    n, h, g = 64, 16, 4
    A = random_banded_full(n, h, np.float64, seed=9)
    Ared1, res1 = band_to_band(A.copy(), n, h, g)
    E1 = np.asarray(bt_band_to_band(res1, np.eye(n)))
    monkeypatch.setenv("DLAF_SBR_SEG_BYTES",
                       str(2 * sbr_schedule(n, h, g)[1] * h * g * 8))
    Ared2, res2 = band_to_band(A.copy(), n, h, g)
    assert len(res2.segs) >= 3
    np.testing.assert_allclose(np.asarray(Ared2), np.asarray(Ared1),
                               atol=0)
    E2 = np.asarray(bt_band_to_band(res2, np.eye(n)))
    np.testing.assert_allclose(E2, E1, atol=0)


def test_schedule_and_real_windows():
    n, h, g = 65, 16, 8
    starts, tmax = sbr_schedule(n, h, g)
    assert starts[0] == 0 and np.all(np.diff(starts) == g)
    idx, js = sbr_real_windows(n, h, g)
    assert len(idx) == len(js)
    # every real window starts inside the matrix
    assert np.all(js < n)
    # chronological flat indices are strictly increasing
    assert np.all(np.diff(idx) > 0)


def test_degenerate_sizes():
    # n <= g+1: no sweeps at all
    for (n, h, g) in [(4, 8, 4), (5, 8, 4), (1, 4, 2)]:
        A = random_banded_full(n, min(h, n - 1) if n > 1 else 0,
                               np.float64, seed=1)
        Ared, res = band_to_band(A.copy(), n, h, g)
        np.testing.assert_allclose(np.asarray(Ared), A, atol=0)
        assert res.segs == []


@pytest.mark.parametrize("algo", ["hh", "wavefront"])
def test_eigensolver_end_to_end_sbr(algo):
    """Full HEEV through the driver with the two-stage (SBR) reduction."""
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    tp = get_tune_parameters()
    old = (tp.eigensolver_sbr_band, tp.band_to_tridiag_algo)
    set_tune_parameters(eigensolver_sbr_band=16, band_to_tridiag_algo=algo)
    try:
        n = 96
        a = mu.random_hermitian(n, np.float64, seed=5)
        m = DistMatrix.from_natural(jnp.asarray(a), (32, 32))
        lam, v = hermitian_eigensolver(m, "L", band_size=4)
    finally:
        set_tune_parameters(eigensolver_sbr_band=old[0],
                            band_to_tridiag_algo=old[1])
    lam = np.asarray(lam)
    vn = np.asarray(v.to_natural())
    resid = np.linalg.norm(a @ vn - vn * lam[None, :]) / np.linalg.norm(a)
    assert resid < 1e-12
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(a)).max() < 1e-10


def test_eigensolver_sbr_partial_spectrum():
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters
    from dlaf_tpu.matrix import util as mu

    tp = get_tune_parameters()
    old = tp.eigensolver_sbr_band
    set_tune_parameters(eigensolver_sbr_band=16)
    try:
        n, k = 80, 13
        a = mu.random_hermitian(n, np.float64, seed=6)
        m = DistMatrix.from_natural(jnp.asarray(a), (32, 32))
        lam, v = hermitian_eigensolver(m, "L", band_size=4,
                                       eigenvalues_index_end=k)
    finally:
        set_tune_parameters(eigensolver_sbr_band=old)
    lam = np.asarray(lam)
    vn = np.asarray(v.to_natural())
    assert lam.shape == (k,) and vn.shape == (n, k)
    resid = np.linalg.norm(a @ vn - vn * lam[None, :])
    assert resid / np.linalg.norm(a) < 1e-12
    np.testing.assert_allclose(lam, np.linalg.eigvalsh(a)[:k], atol=1e-10)


def test_unpadded_return_matches_band_extraction():
    """unpad=False returns the padded workspace; band extraction from it
    must equal the unpadded path (the driver's lean route)."""
    from dlaf_tpu.algorithms.eigensolver.band_reduction import (
        extract_band_dense)
    n, h, g = 64, 16, 4
    A = random_banded_full(n, h, np.float64, seed=21)
    Ared, res1 = band_to_band(A.copy(), n, h, g)
    Ap, res2 = band_to_band(A.copy(), n, h, g, unpad=False)
    assert Ap.shape[0] == n + 2 * h + g
    np.testing.assert_allclose(np.asarray(Ap)[:n, :n], np.asarray(Ared),
                               atol=0)
    ab1 = np.asarray(extract_band_dense(np.asarray(Ared), g))
    ab2 = np.asarray(extract_band_dense(Ap, g, n=n))
    np.testing.assert_allclose(ab2, ab1, atol=0)


def test_driver_lean_dense_route():
    """SBR on a 1x1 grid takes the strip-first lean dense build
    (pack-then-build ordering); residual must match the normal route."""
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import set_tune_parameters

    n = 96
    h = mu.random_hermitian(n, np.float64, seed=5)
    m = DistMatrix.from_natural(jnp.asarray(h), 16)
    set_tune_parameters(eigensolver_sbr_band=32)
    try:
        lam, v = hermitian_eigensolver(m, band_size=8, leaf_size=16)
    finally:
        set_tune_parameters(eigensolver_sbr_band=0)
    vn = np.asarray(v.to_natural())
    lam = np.asarray(lam)
    r = np.linalg.norm(h @ vn - vn * lam[None, :]) / np.linalg.norm(h)
    assert r < 1e-10
    np.testing.assert_allclose(np.sort(lam), np.linalg.eigvalsh(h),
                               atol=1e-10)
