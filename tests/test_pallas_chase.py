"""Pallas on-device bulge chase (``pallas_chase.py``).

Same validation ladder as the other chase implementations: staircase
layout round trips, trajectory equality vs ``hh_chase_numpy``, raw
window stream parity, and end-to-end HEEV through the driver.  On CPU
the kernel runs in interpret mode (the TPU path compiles the same
program through Mosaic).
"""

import numpy as np
import pytest
import scipy.linalg as sla

from dlaf_tpu.algorithms.eigensolver.hh_chase import (hh_chase_numpy,
                                                      hh_schedule)
from dlaf_tpu.algorithms.eigensolver.pallas_chase import (
    build_t, pallas_band_to_tridiagonal, t_diagonals)

from test_wavefront_chase import band_to_full, random_band


def test_staircase_layout_roundtrip():
    import jax.numpy as jnp
    n, b = 53, 8
    ab = random_band(n, b, np.float64, seed=2)
    T = np.asarray(build_t(jnp.asarray(ab), n, b))
    # every lower-band entry lands at T[r, j - (r//b - 2)*b]
    for j in range(n):
        for dd in range(min(b, n - 1 - j) + 1):
            r = j + dd
            c = j - (r // b - 2) * b
            assert T[r, c] == ab[dd, j], (r, c)
    d, e = t_diagonals(jnp.asarray(T), n=n, b=b)
    np.testing.assert_allclose(np.asarray(d), ab[0], atol=0)
    np.testing.assert_allclose(np.asarray(e), ab[1, : n - 1], atol=0)


@pytest.mark.parametrize("n,b", [(30, 4), (64, 8), (65, 8), (257, 8),
                                 (40, 16)])
def test_matches_host_trajectory(n, b):
    ab = random_band(n, b, np.float64, seed=n + b)
    ab2 = np.zeros((2 * b + 1, n), np.float64)
    ab2[: b + 1] = ab
    Vref = hh_chase_numpy(ab2, n, b)
    res = pallas_band_to_tridiagonal(ab, b)
    np.testing.assert_allclose(res.d, ab2[0], atol=5e-11)
    np.testing.assert_allclose(res.e, ab2[1, : n - 1], atol=5e-11)
    np.testing.assert_allclose(np.asarray(res.resolve_V()), Vref,
                               atol=5e-11)


def test_segmented_matches(monkeypatch):
    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        _wavefront_width)
    n, b = 257, 8
    ab = random_band(n, b, np.float64, seed=11)
    res1 = pallas_band_to_tridiagonal(ab, b)
    V1 = np.asarray(res1.resolve_V())
    W = _wavefront_width(n, b)
    monkeypatch.setenv("DLAF_WAVEFRONT_SEG_BYTES", str(40 * 3 * W * b * 8))
    res2 = pallas_band_to_tridiagonal(ab, b)
    assert len(res2.V_raw) >= 4
    np.testing.assert_allclose(res2.d, res1.d, atol=0)
    np.testing.assert_allclose(np.asarray(res2.resolve_V()), V1, atol=0)


def test_raw_window_stream_matches_compacted():
    from dlaf_tpu.algorithms.eigensolver.bt_hh import bt_hh_window_stream
    n, b = 70, 8
    ab = random_band(n, b, np.float64, seed=9)
    res1 = pallas_band_to_tridiagonal(ab, b)
    sw_raw = np.asarray(bt_hh_window_stream(res1, g=4))
    res2 = pallas_band_to_tridiagonal(ab, b)
    res2.resolve_V()
    sw_compact = np.asarray(bt_hh_window_stream(res2, g=4))
    np.testing.assert_allclose(sw_raw, sw_compact, atol=0)


def test_valid_reduction_f32():
    n, b = 300, 16
    ab = random_band(n, b, np.float32, seed=7)
    A = band_to_full(ab, n, b, np.float32)
    res = pallas_band_to_tridiagonal(ab, b)
    lam_t = sla.eigvalsh_tridiagonal(res.d, res.e)
    lam_a = np.linalg.eigvalsh(A)
    scale = max(np.abs(lam_a).max(), 1)
    assert np.abs(lam_t - lam_a).max() / scale < 2e-4


def test_eigensolver_end_to_end_pallas():
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters

    old = get_tune_parameters().band_to_tridiag_algo
    set_tune_parameters(band_to_tridiag_algo="pallas")
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
        ab = random_band(n, b, np.float64, seed=1)
        res = pallas_band_to_tridiagonal(ab, b)
        A = band_to_full(ab, n, b, np.float64)
        lam_t = (sla.eigvalsh_tridiagonal(res.d, res.e) if n > 1
                 else res.d)
        np.testing.assert_allclose(np.sort(lam_t),
                                   np.linalg.eigvalsh(A), atol=1e-12)
