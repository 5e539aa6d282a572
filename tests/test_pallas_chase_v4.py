"""Batched-slot Pallas chase (``pallas_chase_v4.py``).

Trajectory equality vs the host chase (exact at f64), raw stream
parity, and the driver route.  CPU runs in interpret mode; TPU
compiles the same program through Mosaic.
"""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.hh_chase import hh_chase_numpy
from dlaf_tpu.algorithms.eigensolver.pallas_chase_v4 import (
    pallas_band_to_tridiagonal_v4)

from test_wavefront_chase import random_band


@pytest.mark.parametrize("n,b", [(30, 4), (64, 8), (65, 8), (257, 8),
                                 (40, 16)])
def test_matches_host_trajectory(n, b):
    ab = random_band(n, b, np.float64, seed=n + b)
    ab2 = np.zeros((2 * b + 1, n), np.float64)
    ab2[: b + 1] = ab
    Vref = hh_chase_numpy(ab2, n, b)
    res = pallas_band_to_tridiagonal_v4(ab, b)
    np.testing.assert_allclose(res.d, ab2[0], atol=5e-11)
    np.testing.assert_allclose(res.e, ab2[1, : n - 1], atol=5e-11)
    np.testing.assert_allclose(np.asarray(res.resolve_V()), Vref,
                               atol=5e-11)


def test_driver_route(monkeypatch):
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import set_tune_parameters

    n, nb = 96, 16
    h = mu.random_hermitian(n, np.float32, seed=3)
    m = DistMatrix.from_natural(jnp.asarray(h), nb)
    set_tune_parameters(band_to_tridiag_algo="pallas4")
    try:
        lam, v = hermitian_eigensolver(m, band_size=8, leaf_size=16)
    finally:
        set_tune_parameters(band_to_tridiag_algo="auto")
    vn = np.asarray(v.to_natural())
    lam = np.asarray(lam)
    r = np.linalg.norm(h @ vn - vn * lam[None, :]) / np.linalg.norm(h)
    assert r < 5e-5
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(h)).max() < 1e-3
