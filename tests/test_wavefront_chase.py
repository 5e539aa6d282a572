"""On-device wavefront bulge chase (``wavefront_chase.py``).

Validation mirrors the host-chase strategy (``test_hh_chase.py``):
trajectory equality vs ``hh_chase_numpy`` at sizes small enough that
fp-reassociation divergence has not amplified, and reduction *validity*
(eigenvalues + back-transform residual) at larger sizes — the two
implementations reduce in a different fp order, so exact trajectory
comparison is only meaningful while the low-order bits have not been
amplified through successive reflectors (see hh_chase docstring).
"""

import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu.algorithms.eigensolver.bt_hh import bt_hh_apply
from dlaf_tpu.algorithms.eigensolver.hh_chase import (hh_chase_numpy,
                                                      hh_schedule)
from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
    _hankel, _hankel_pre, _larfg_batched, _shear_sum,
    wavefront_band_to_tridiagonal)


def random_band(n, b, dtype, seed=0):
    rng = np.random.default_rng(seed)
    ab = rng.standard_normal((b + 1, n)).astype(dtype)
    for j in range(n):
        over = j + b + 1 - n
        if over > 0:
            ab[b + 1 - over:, j] = 0
    return ab


def band_to_full(ab, n, b, dtype):
    A = np.zeros((n, n), dtype)
    for i in range(min(b, n - 1) + 1):
        A += np.diagflat(ab[i, : n - i], -i)
        if i:
            A += np.diagflat(ab[i, : n - i], i)
    return A


def test_hankel_and_shear():
    rng = np.random.default_rng(1)
    b, M = 8, 19
    u = rng.standard_normal((3, b))
    H = np.asarray(_hankel(u, M, b))
    for c in range(b):
        for i in range(M):
            want = u[:, c + i] if c + i < b else 0.0
            np.testing.assert_allclose(H[:, c, i], want)
    pre = 5
    H2 = np.asarray(_hankel_pre(u, pre, M, b))
    for c in range(b):
        for i in range(M):
            k = c + i - pre
            want = u[:, k] if 0 <= k < b else 0.0
            np.testing.assert_allclose(H2[:, c, i], want)
    K = 17
    Y = rng.standard_normal((2, b, K))
    cs = np.asarray(_shear_sum(Y, b, K + b + 1))
    for j in range(K + b):
        want = sum(Y[:, c, j - c] for c in range(b) if 0 <= j - c < K)
        np.testing.assert_allclose(cs[:, j], want, atol=1e-12)


def test_larfg_batched_matches_lapack_convention():
    from dlaf_tpu.algorithms.eigensolver.hh_chase import _larfg
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 9))
    x[3, 1:] = 0.0                       # zero-tail -> tau = 0 identity
    x[4, :] = 0.0
    v, tau, beta = (np.asarray(a) for a in _larfg_batched(x))
    for k in range(5):
        vr, tr, br = _larfg(x[k].copy())
        np.testing.assert_allclose(v[k], vr, atol=1e-13)
        np.testing.assert_allclose(tau[k], tr, atol=1e-13)
        np.testing.assert_allclose(beta[k], br, atol=1e-13)
    assert tau[3] == 0 and tau[4] == 0


@pytest.mark.parametrize("n,b", [(30, 4), (64, 8), (65, 8), (257, 8),
                                 (40, 16)])
def test_matches_host_trajectory_small(n, b):
    ab = random_band(n, b, np.float64, seed=n + b)
    ab2 = np.zeros((2 * b + 1, n), np.float64)
    ab2[: b + 1] = ab
    Vref = hh_chase_numpy(ab2, n, b)
    res = wavefront_band_to_tridiagonal(ab, b)
    np.testing.assert_allclose(np.asarray(res.resolve_V()), Vref,
                               atol=5e-11)
    np.testing.assert_allclose(res.d, ab2[0], atol=5e-11)
    np.testing.assert_allclose(res.e, ab2[1, : n - 1], atol=5e-11)


@pytest.mark.parametrize("n,b,dtype", [(300, 16, np.float32),
                                       (300, 16, np.float64),
                                       (130, 8, np.float64),
                                       (100, 32, np.float32)])
def test_valid_reduction_and_bt(n, b, dtype):
    """Eigenvalues preserved; BT of tridiag eigenvectors diagonalizes A."""
    ab = random_band(n, b, dtype, seed=7)
    A = band_to_full(ab, n, b, dtype)
    res = wavefront_band_to_tridiagonal(ab, b)
    lam_t = sla.eigvalsh_tridiagonal(res.d, res.e)
    lam_a = np.linalg.eigvalsh(A)
    scale = max(np.abs(lam_a).max(), 1)
    tol = 1e-5 if dtype == np.float32 else 1e-12
    assert np.abs(lam_t - lam_a).max() / scale < 20 * tol
    w, z = sla.eigh_tridiagonal(res.d, res.e)
    E = np.asarray(bt_hh_apply(res, np.asarray(z, dtype)))
    resid = np.linalg.norm(A @ E - E * w[None, :]) / np.linalg.norm(A)
    assert resid < 100 * tol


def test_v_stream_layout_matches_schedule():
    n, b = 64, 8
    ab = random_band(n, b, np.float64, seed=3)
    res = wavefront_band_to_tridiagonal(ab, b)
    off, R = hh_schedule(n, b)
    assert res.resolve_V().shape == (R, b)
    # every in-schedule reflector has v[0] implied 1: stored row is
    # [tau, v1, ...]; a tau==0 row must be all zero (identity reflector)
    V = np.asarray(res.V)
    zero_tau = V[:, 0] == 0
    assert np.all(V[zero_tau] == 0)


def test_raw_window_stream_matches_compacted():
    """bt_hh_window_stream's composed raw gather == gather from the
    compacted sweep-major stream."""
    from dlaf_tpu.algorithms.eigensolver.bt_hh import bt_hh_window_stream

    n, b = 70, 8
    ab = random_band(n, b, np.float64, seed=9)
    res1 = wavefront_band_to_tridiagonal(ab, b)
    sw_raw = np.asarray(bt_hh_window_stream(res1, g=4))
    res2 = wavefront_band_to_tridiagonal(ab, b)
    res2.resolve_V()
    sw_compact = np.asarray(bt_hh_window_stream(res2, g=4))
    np.testing.assert_allclose(sw_raw, sw_compact, atol=0)


def test_segmented_scan_matches_single_segment(monkeypatch):
    """Forcing tiny segments (the n=32768 >2^32 crash mitigation) must
    reproduce the single-segment trajectory exactly, through both the
    compacting resolve_V and the raw->window gather."""
    from dlaf_tpu.algorithms.eigensolver.bt_hh import bt_hh_window_stream

    n, b = 257, 8
    ab = random_band(n, b, np.float64, seed=11)
    res_one = wavefront_band_to_tridiagonal(ab, b)
    V_one = np.asarray(res_one.resolve_V())
    d1, e1 = res_one.d, res_one.e

    # per-iteration emission = 3*W*b*8 bytes; cap at ~40 iterations
    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        _wavefront_width)
    W = _wavefront_width(n, b)
    monkeypatch.setenv("DLAF_WAVEFRONT_SEG_BYTES", str(40 * 3 * W * b * 8))
    res = wavefront_band_to_tridiagonal(ab, b)
    assert isinstance(res.V_raw, list) and len(res.V_raw) >= 4
    np.testing.assert_allclose(res.d, d1, atol=0)
    np.testing.assert_allclose(res.e, e1, atol=0)
    np.testing.assert_allclose(np.asarray(res.resolve_V()), V_one, atol=0)

    res2 = wavefront_band_to_tridiagonal(ab, b)
    sw_seg = np.asarray(bt_hh_window_stream(res2, g=4))
    monkeypatch.delenv("DLAF_WAVEFRONT_SEG_BYTES")
    res3 = wavefront_band_to_tridiagonal(ab, b)
    sw_one = np.asarray(bt_hh_window_stream(res3, g=4))
    np.testing.assert_allclose(sw_seg, sw_one, atol=0)


def test_eigensolver_end_to_end_wavefront():
    """Full HEEV through the driver with DLAF_B2T_ALGO=wavefront."""
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    old = get_tune_parameters().band_to_tridiag_algo
    set_tune_parameters(band_to_tridiag_algo="wavefront")
    try:
        n = 96
        a = mu.random_hermitian(n, np.float64, seed=5)
        m = DistMatrix.from_natural(jnp.asarray(a), (32, 32))
        lam, v = hermitian_eigensolver(m, "L", band_size=8)
    finally:
        set_tune_parameters(band_to_tridiag_algo=old)
    lam = np.asarray(lam)
    vn = np.asarray(v.to_natural())
    resid = np.linalg.norm(a @ vn - vn * lam[None, :]) / np.linalg.norm(a)
    assert resid < 1e-12
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(a)).max() < 1e-10


def test_tiny_and_degenerate():
    for n, b in [(1, 4), (2, 4), (3, 2), (5, 2)]:
        ab = random_band(n, b, np.float64, seed=1) if n > 0 else None
        res = wavefront_band_to_tridiagonal(ab, b)
        A = band_to_full(ab, n, b, np.float64)
        lam_t = (sla.eigvalsh_tridiagonal(res.d, res.e) if n > 1
                 else res.d)
        np.testing.assert_allclose(np.sort(lam_t),
                                   np.linalg.eigvalsh(A), atol=1e-12)
