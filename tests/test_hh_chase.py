"""Householder band->tridiag chase + compact-WY back-transform.

Mirrors the reference's test strategy for ``band_to_tridiagonal`` /
``bt_band_to_tridiagonal`` (``test/unit/eigensolver/test_band_to_tridiag.cpp``,
``test_bt_band_to_tridiag.cpp``): residual-based checks over size sweeps
crossing band-boundary edge cases, all four dtypes.
"""

import numpy as np
import pytest
from scipy.linalg import eigh_tridiagonal

from dlaf_tpu.algorithms.eigensolver.bt_hh import (bt_hh_apply,
                                                   bt_hh_window_schedule)
from dlaf_tpu.algorithms.eigensolver.hh_chase import (hh_band_to_tridiagonal,
                                                      hh_chase_numpy,
                                                      hh_schedule,
                                                      sweep_reflector_counts)
from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters


def band_full(n, b, dtype, seed=0):
    rng = np.random.default_rng(seed)
    cplx = np.issubdtype(np.dtype(dtype), np.complexfloating)
    A = rng.standard_normal((n, n)) + (
        1j * rng.standard_normal((n, n)) if cplx else 0)
    A = (A + A.conj().T) / 2
    mask = np.abs(np.subtract.outer(np.arange(n), np.arange(n))) <= b
    A = np.where(mask, A, 0).astype(dtype)
    ab = np.zeros((b + 1, n), dtype)
    for i in range(b + 1):
        ab[i, : n - i] = np.diag(A, -i)
    return A, ab


def tol_of(dtype):
    return 5e-4 if np.dtype(dtype).itemsize <= 8 and \
        np.finfo(np.zeros((), dtype).real.dtype).eps > 1e-10 else 1e-11


@pytest.mark.parametrize("n,b", [(12, 3), (17, 5), (40, 7), (9, 8), (5, 2),
                                 (33, 32), (64, 8), (3, 2)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64,
                                   np.complex64, np.complex128])
def test_chase_eigenvalues(n, b, dtype):
    A, ab = band_full(n, b, dtype)
    res = hh_band_to_tridiagonal(ab.copy(), b)
    ew = eigh_tridiagonal(res.d, res.e)[0] if n > 1 else res.d
    ew_ref = np.linalg.eigvalsh(A)
    scale = max(1.0, np.abs(ew_ref).max())
    assert np.abs(ew - ew_ref).max() / scale < tol_of(dtype)


@pytest.mark.parametrize("n,b", [(30, 4), (57, 5), (100, 16), (33, 32)])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_native_matches_numpy_semantics(n, b, dtype):
    """Native kernel and numpy fallback must produce identical streams in
    f64 (same larfg branch choices)."""
    from dlaf_tpu.algorithms.eigensolver.hh_chase import _hh_chase_native
    _, ab = band_full(n, b, dtype)
    ab2a = np.zeros((2 * b + 1, n), dtype)
    ab2a[: b + 1] = ab
    ab2b = ab2a.copy()
    Vn = _hh_chase_native(ab2a, n, b)
    if Vn is None:
        pytest.skip("native kernel unavailable")
    Vp = hh_chase_numpy(ab2b, n, b)
    assert np.abs(Vn - Vp).max() < 1e-10
    assert np.abs(ab2a - ab2b).max() < 1e-10


@pytest.mark.parametrize("g", [4, 16, 7, 64])
@pytest.mark.parametrize("n,b", [(30, 4), (57, 5), (33, 32), (40, 2)])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_bt_reconstruction(g, n, b, dtype):
    """Q from the grouped compact-WY back-transform satisfies
    A = Q T Q^H with Q unitary (any group size)."""
    old = get_tune_parameters().bt_group_size
    set_tune_parameters(bt_group_size=g)
    try:
        A, ab = band_full(n, b, dtype)
        res = hh_band_to_tridiagonal(ab.copy(), b)
        Q = np.asarray(bt_hh_apply(res, np.eye(n)))
        T = np.diag(res.d) + np.diag(res.e, 1) + np.diag(res.e, -1)
        assert np.abs(Q @ T.astype(Q.dtype) @ Q.conj().T - A).max() < 1e-11
        assert np.abs(Q @ Q.conj().T - np.eye(n)).max() < 1e-12
    finally:
        set_tune_parameters(bt_group_size=old)


def test_bt_vector_and_band1():
    """1-D E round-trips; band == 1 input is already tridiagonal."""
    A, ab = band_full(20, 3, np.float64)
    res = hh_band_to_tridiagonal(ab.copy(), 3)
    x = np.random.default_rng(1).standard_normal(20)
    out = np.asarray(bt_hh_apply(res, x))
    assert out.shape == (20,)
    # band 1: no reflectors, complex phases still applied
    A1, ab1 = band_full(10, 1, np.complex128)
    res1 = hh_band_to_tridiagonal(ab1.copy(), 1)
    assert res1.V.shape[0] == 0
    assert np.all(res1.e >= 0)
    Q = np.asarray(bt_hh_apply(res1, np.eye(10)))
    T = np.diag(res1.d) + np.diag(res1.e, 1) + np.diag(res1.e, -1)
    assert np.abs(Q @ T.astype(Q.dtype) @ Q.conj().T - A1).max() < 1e-12


def test_schedule_consistency():
    for n, b in [(30, 4), (5, 2), (3, 2), (2, 2), (100, 16)]:
        cnt = sweep_reflector_counts(n, b)
        off, R = hh_schedule(n, b)
        assert R == cnt.sum()
        widx, r0 = bt_hh_window_schedule(n, b, 8)
        if R:
            used = widx[widx >= 0]
            # every reflector applied exactly once
            assert sorted(used.tolist()) == list(range(R))
            assert np.all(r0 >= 1)


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex128])
def test_eigensolver_hh_path(dtype):
    """Full HEEV through the hh chase (residual check)."""
    import jax.numpy as jnp

    from dlaf_tpu import hermitian_eigensolver
    from dlaf_tpu.matrix.matrix import DistMatrix

    n, nb = 65, 16
    rng = np.random.default_rng(3)
    cplx = np.issubdtype(np.dtype(dtype), np.complexfloating)
    A = rng.standard_normal((n, n)) + (
        1j * rng.standard_normal((n, n)) if cplx else 0)
    A = ((A + A.conj().T) / 2).astype(dtype)
    mat = DistMatrix.from_natural(jnp.asarray(A), (nb, nb), None)
    old = get_tune_parameters().band_to_tridiag_algo
    set_tune_parameters(band_to_tridiag_algo="hh")
    try:
        lam, v = hermitian_eigensolver(mat, "L", band_size=8)
    finally:
        set_tune_parameters(band_to_tridiag_algo=old)
    lam = np.asarray(lam)
    vn = np.asarray(v.to_natural())
    resid = np.linalg.norm(A @ vn - vn * lam[None, :]) / np.linalg.norm(A)
    tol = 5e-5 if np.finfo(np.zeros((), dtype).real.dtype).eps > 1e-10 \
        else 1e-12
    assert resid < tol
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(A)).max() < \
        np.abs(lam).max() * tol * 10 + tol


@pytest.mark.parametrize("n,b", [(300, 8), (64, 8)])
def test_device_stream_matches_host(n, b):
    """The chunk-streamed chase (native _p kernel + overlapped device_put)
    must produce the identical reflector stream and tridiagonal."""
    _, ab = band_full(n, b, np.float32, seed=3)
    ref = hh_band_to_tridiagonal(ab.copy(), b)
    res = hh_band_to_tridiagonal(ab.copy(), b, device_stream=True)
    assert np.array_equal(np.asarray(res.V), np.asarray(ref.V))
    assert np.array_equal(res.d, ref.d)
    assert np.array_equal(res.e, ref.e)


@pytest.mark.parametrize("n,b", [(300, 8), (64, 8)])
def test_async_upload_matches_host(n, b):
    """async_upload returns before the upload drains (V pending) and the
    resolved stream is identical to the synchronous one."""
    _, ab = band_full(n, b, np.float32, seed=3)
    ref = hh_band_to_tridiagonal(ab.copy(), b)
    res = hh_band_to_tridiagonal(ab.copy(), b, device_stream=True,
                                 async_upload=True)
    # d/e are final at return even while the upload may still drain
    assert np.array_equal(res.d, ref.d)
    assert np.array_equal(res.e, ref.e)
    assert res.v_resolve is not None and res.V is None
    res.resolve_V()
    assert res.v_resolve is None
    assert np.array_equal(np.asarray(res.V), np.asarray(ref.V))
    res.resolve_V()                     # idempotent
