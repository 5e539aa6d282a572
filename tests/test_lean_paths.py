"""Memory-lean eigensolver paths (round-2 n=32768 enablers).

Covers the staged D&C big-merge pipeline, the lean in-place merge update,
packed reflector panels for BT-R2B, and row-padded eigenvector carriage —
each validated against the default paths bit-for-bit (fp64) or at
residual level (f32 end-to-end).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dlaf_tpu.algorithms.eigensolver.tridiag_solver import \
    tridiagonal_eigensolver
from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters


@pytest.fixture
def restore_tune():
    tp = get_tune_parameters()
    saved = {k: getattr(tp, k) for k in
             ("dc_stage_bytes", "dc_lean_bytes", "dc_lean_rowblock",
              "r2b_chunk_bytes")}
    yield
    set_tune_parameters(**saved)


def _tridiag(n, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.standard_normal(n), jnp.float64)
    e = jnp.asarray(rng.standard_normal(n - 1) * 0.7, jnp.float64)
    return d, e


@pytest.mark.parametrize("n", [97, 384])
def test_staged_and_lean_match_monolithic(n, restore_tune):
    d, e = _tridiag(n)
    set_tune_parameters(dc_stage_bytes=0, dc_lean_bytes=0)
    lam0, Q0 = tridiagonal_eigensolver(d, e, leaf_size=32)
    set_tune_parameters(dc_stage_bytes=8192, dc_lean_bytes=0)
    lam1, Q1 = tridiagonal_eigensolver(d, e, leaf_size=32)
    set_tune_parameters(dc_stage_bytes=8192, dc_lean_bytes=8192,
                        dc_lean_rowblock=64)
    lam2, Q2 = tridiagonal_eigensolver(d, e, leaf_size=32)
    assert np.allclose(np.asarray(lam0), np.asarray(lam1), atol=1e-12)
    assert np.allclose(np.asarray(lam0), np.asarray(lam2), atol=1e-12)
    T = (np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1)
         + np.diag(np.asarray(e), -1))
    for Q, lam in ((Q1, lam1), (Q2, lam2)):
        Qn, lamn = np.asarray(Q), np.asarray(lam)
        assert np.abs(T @ Qn - Qn * lamn[None, :]).max() < 1e-11
        assert np.abs(Qn.T @ Qn - np.eye(n)).max() < 1e-11


def test_row_pad_rides_through(restore_tune):
    n, pad = 300, 13
    d, e = _tridiag(n, seed=3)
    set_tune_parameters(dc_stage_bytes=8192, dc_lean_bytes=8192,
                        dc_lean_rowblock=64)
    lam, Q = tridiagonal_eigensolver(d, e, leaf_size=32, row_pad=pad)
    Qn = np.asarray(Q)
    assert Qn.shape == (n + pad, n)
    assert np.abs(Qn[n:]).max() == 0
    lam0, Q0 = tridiagonal_eigensolver(d, e, leaf_size=32)
    assert np.allclose(np.asarray(lam0), np.asarray(lam), atol=1e-12)
    assert np.allclose(np.asarray(Q0), Qn[:n], atol=1e-12)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_packed_panels_match_unpacked(dtype, restore_tune):
    from dlaf_tpu.algorithms.eigensolver.bt_reduction_to_band import (
        bt_reduction_to_band, pack_hh_panels)
    from dlaf_tpu.algorithms.eigensolver.reduction_to_band import \
        reduction_to_band
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.matrix.matrix import DistMatrix

    n, nb, band = 300, 64, 32
    a0 = mu.random_hermitian(n, dtype, seed=3)
    hh, taus = reduction_to_band(
        DistMatrix.from_natural(jnp.asarray(a0), nb), band)
    rng = np.random.default_rng(0)
    E0 = rng.standard_normal((n, n - 7))
    if np.iscomplexobj(a0):
        E0 = E0.astype(dtype)
    ref = np.asarray(bt_reduction_to_band(band, jnp.asarray(E0, dtype),
                                          hh, taus))
    pk = pack_hh_panels(hh, band, donate=False)
    # padded input: extra zero rows are preserved untouched
    Ep = np.vstack([E0, np.zeros((19, E0.shape[1]))]).astype(dtype)
    out = np.asarray(bt_reduction_to_band(band, jnp.asarray(Ep), pk, taus))
    assert np.abs(ref - out[:n]).max() < 1e-12
    assert np.abs(out[n:]).max() == 0


def test_heev_all_lean_settings(restore_tune):
    from dlaf_tpu import hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.matrix.matrix import DistMatrix

    set_tune_parameters(r2b_chunk_bytes=1024, dc_stage_bytes=8192,
                        dc_lean_bytes=8192, dc_lean_rowblock=64)
    n = 300
    h = mu.random_hermitian(n, np.float32, seed=5)
    mh = DistMatrix.from_natural(jnp.asarray(h), 64)
    lam, v = hermitian_eigensolver(mh, "L", band_size=32, donate_input=True)
    vn = np.asarray(v.to_natural())
    lam = np.asarray(lam)
    resid = np.linalg.norm(h @ vn - vn * lam[None, :]) / np.linalg.norm(h)
    orth = np.abs(vn.T @ vn - np.eye(n)).max()
    assert resid < 2e-5 and orth < 3e-4
