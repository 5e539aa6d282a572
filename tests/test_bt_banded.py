"""Banded (MXU) vs direct wave back-transform equivalence."""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.band_to_tridiag import (
    band_to_tridiagonal)
from dlaf_tpu.algorithms.eigensolver.bt_band_to_tridiag import (
    bt_band_to_tridiagonal)
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.tune import set_tune_parameters


def _res(n, b, dtype, seed):
    a = mu.random_hermitian(n, dtype, seed)
    ab = np.zeros((b + 1, n), dtype)
    for i in range(b + 1):
        ab[i, : n - i] = np.diagonal(a, -i)
    full = np.zeros((n, n), dtype)
    for i in range(b + 1):
        full += np.diagflat(ab[i, : n - i], -i)
        if i:
            full += np.diagflat(ab[i, : n - i].conj(), i)
    return full, band_to_tridiagonal(ab, b)


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("n,b,s", [(32, 4, 4), (48, 8, 8), (40, 4, 8),
                                   (33, 3, 4)])
def test_banded_matches_direct(n, b, s, dtype):
    full, res = _res(n, b, dtype, seed=n + b + s)
    e = mu.random(n, max(n, s), dtype, 7)
    set_tune_parameters(bt_group_size=10 ** 9)   # force direct
    direct = np.asarray(bt_band_to_tridiagonal(res, e))
    set_tune_parameters(bt_group_size=s)         # force banded
    banded = np.asarray(bt_band_to_tridiagonal(res, e))
    set_tune_parameters(bt_group_size=64)
    np.testing.assert_allclose(banded, direct, rtol=0, atol=1e-12)


@pytest.mark.parametrize("s", [4, 8])
def test_banded_is_correct_transform(s):
    """Q2 from the banded path satisfies Band == Q2 T Q2^H."""
    n, b = 36, 4
    full, res = _res(n, b, np.float64, seed=3)
    set_tune_parameters(bt_group_size=s)
    try:
        q2 = np.asarray(bt_band_to_tridiagonal(res, np.eye(n)))
    finally:
        set_tune_parameters(bt_group_size=64)
    t = np.diag(res.d) + np.diag(res.e, 1) + np.diag(res.e, -1)
    np.testing.assert_allclose(q2 @ q2.T, np.eye(n), rtol=0, atol=1e-12)
    np.testing.assert_allclose(q2 @ t @ q2.T, full, rtol=0,
                               atol=1e-11 * max(1, np.abs(full).max()))
