"""Native C++ chase kernel vs numpy reference (bit-comparable streams)."""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.band_to_tridiag import (
    band_to_tridiagonal, chase_values, rotation_schedule)
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.ops import native


def _band_storage(n, b, dtype, seed):
    a = mu.random_hermitian(n, dtype, seed)
    ab2 = np.zeros((b + 2, n), dtype)
    for i in range(b + 1):
        ab2[i, : n - i] = np.diagonal(a, -i)
    return ab2


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native toolchain unavailable")
@pytest.mark.parametrize("dtype", [np.float64, np.complex128, np.float32])
@pytest.mark.parametrize("n,b", [(16, 4), (13, 3), (9, 5)])
def test_native_matches_numpy(n, b, dtype, monkeypatch):
    ab_native = _band_storage(n, b, dtype, seed=n + b)
    ab_numpy = ab_native.copy()

    cs_n, ss_n = chase_values(ab_native, n, b)  # native path (lib loaded)

    # force the numpy path
    monkeypatch.setattr(
        "dlaf_tpu.algorithms.eigensolver.band_to_tridiag._chase_native",
        lambda *a: None)
    cs_p, ss_p = chase_values(ab_numpy, n, b)

    # the numpy fallback promotes intermediates to f64; f32 streams drift
    rtol = 5e-3 if dtype == np.float32 else 1e-13
    np.testing.assert_allclose(cs_n, cs_p, rtol=rtol, atol=rtol)
    np.testing.assert_allclose(ss_n, ss_p, rtol=rtol, atol=rtol)
    np.testing.assert_allclose(ab_native, ab_numpy, rtol=rtol, atol=rtol)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="native toolchain unavailable")
def test_native_end_to_end():
    n, b = 24, 4
    a = mu.random_hermitian(n, np.float64, 3)
    ab = np.zeros((b + 1, n))
    for i in range(b + 1):
        ab[i, : n - i] = np.diagonal(a, -i)
    full = np.zeros((n, n))
    for i in range(b + 1):
        full += np.diagflat(ab[i, : n - i], -i)
        if i:
            full += np.diagflat(ab[i, : n - i], i)
    res = band_to_tridiagonal(ab, b)
    t = np.diag(res.d) + np.diag(res.e, 1) + np.diag(res.e, -1)
    np.testing.assert_allclose(np.linalg.eigvalsh(t),
                               np.linalg.eigvalsh(full), atol=1e-12)
