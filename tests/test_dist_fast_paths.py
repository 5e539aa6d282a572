"""Multi-device fast paths: the wavefront chase and the two-stage (SBR)
reduction must run on a >1-device mesh (VERDICT r4 #5) — the serial
scan stages execute replicated (zero-collective, single-chip wall),
while every O(n^3) stage stays distributed.  The reference distributes
the chase via SweepWorkerDist (band_to_tridiag/mc.h:569); the
multi-process analogue here is hh_chase_mp."""

import jax
import numpy as np
import pytest

from dlaf_tpu import DistMatrix, Grid, hermitian_eigensolver
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters


def _check(h, lam, v):
    lam = np.asarray(lam)
    vn = np.asarray(v.to_natural())
    n = h.shape[0]
    r = np.linalg.norm(h @ vn - vn * lam[None, :]) / np.linalg.norm(h)
    orth = np.abs(vn.T @ vn - np.eye(n)).max()
    assert r < 5e-5, f"residual {r}"
    assert orth < 5e-4, f"orthogonality {orth}"
    assert np.abs(lam - np.linalg.eigvalsh(h)).max() < 1e-3


@pytest.mark.parametrize("grid_shape", [(2, 4), (2, 2)])
def test_wavefront_chase_on_mesh(grid_shape):
    n, nb, band = 96, 16, 8
    grid = Grid(grid_shape)
    h = mu.random_hermitian(n, np.float32, seed=3)
    mh = DistMatrix.from_natural(jax.numpy.asarray(h), nb, grid)
    old = get_tune_parameters().band_to_tridiag_algo
    set_tune_parameters(band_to_tridiag_algo="wavefront")
    try:
        lam, v = hermitian_eigensolver(mh, band_size=band, leaf_size=16)
    finally:
        set_tune_parameters(band_to_tridiag_algo=old)
    _check(h, lam, v)


def test_sbr_on_mesh():
    n, nb = 128, 16
    grid = Grid((2, 4))
    h = mu.random_hermitian(n, np.float32, seed=5)
    mh = DistMatrix.from_natural(jax.numpy.asarray(h), nb, grid)
    old = get_tune_parameters().eigensolver_sbr_band
    set_tune_parameters(eigensolver_sbr_band=16)
    try:
        lam, v = hermitian_eigensolver(mh, band_size=8, leaf_size=16)
    finally:
        set_tune_parameters(eigensolver_sbr_band=old)
    _check(h, lam, v)


def test_sbr_plus_wavefront_on_mesh():
    n, nb = 128, 16
    grid = Grid((2, 4))
    h = mu.random_hermitian(n, np.float32, seed=7)
    mh = DistMatrix.from_natural(jax.numpy.asarray(h), nb, grid)
    old_sbr = get_tune_parameters().eigensolver_sbr_band
    old_algo = get_tune_parameters().band_to_tridiag_algo
    set_tune_parameters(eigensolver_sbr_band=16,
                        band_to_tridiag_algo="wavefront")
    try:
        lam, v = hermitian_eigensolver(mh, band_size=8, leaf_size=16)
    finally:
        set_tune_parameters(eigensolver_sbr_band=old_sbr,
                            band_to_tridiag_algo=old_algo)
    _check(h, lam, v)
