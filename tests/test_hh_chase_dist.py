"""Region-distributed HH chase vs the single-region oracle.

Mirrors the reference's distributed band_to_tridiag tests
(``test/unit/eigensolver/test_band_to_tridiag.cpp``, distributed cases):
the region pipeline must produce the identical tridiagonal and
reflector stream — the chase is deterministic, so equality is exact.
"""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.hh_chase import hh_band_to_tridiagonal
from dlaf_tpu.algorithms.eigensolver.hh_chase_dist import (
    balanced_boundaries, hh_band_to_tridiagonal_dist, max_group_size)


def _rand_band(n, b, dtype, seed):
    rng = np.random.default_rng(seed)
    ab = rng.standard_normal((b + 1, n))
    if np.issubdtype(dtype, np.complexfloating):
        ab = ab + 1j * rng.standard_normal((b + 1, n))
    return ab.astype(dtype)


@pytest.mark.parametrize("n,b,nparts,group", [
    (37, 4, 3, 5), (64, 8, 4, 16), (129, 8, 5, 8),
    (120, 16, 3, None), (50, 4, 8, 1), (40, 4, 2, None), (200, 8, 6, 4),
])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_region_chase_matches_oracle(n, b, nparts, group, dtype):
    ab = _rand_band(n, b, dtype, seed=n + b)
    # force_numpy: the region chase is numpy arithmetic; native rounding
    # differences amplify through the chase and break exact equality
    ref = hh_band_to_tridiagonal(ab.copy(), b, force_numpy=True)
    out = hh_band_to_tridiagonal_dist(ab.copy(), b, nparts=nparts,
                                      group_size=group)
    np.testing.assert_allclose(out.d, ref.d, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.e, ref.e, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.V, ref.V, rtol=0, atol=1e-12)
    if ref.phases is not None:
        np.testing.assert_allclose(out.phases, ref.phases, rtol=0,
                                   atol=1e-12)


def test_balanced_boundaries_properties():
    cuts = balanced_boundaries(1024, 16, 7)
    assert cuts[0] == 0 and cuts[-1] == 1024
    assert np.all(np.diff(cuts) > 0)
    assert np.all(cuts[1:-1] % 16 == 0)
    # work ~ c^2/2 per region balanced within ~2x
    w = np.diff(cuts ** 2)
    assert w.max() / max(w.min(), 1) < 3.0
    # group clamp: every region at least G*b wide
    G = max_group_size(cuts, 16)
    assert np.diff(cuts).min() >= G * 16


def test_region_chase_in_eigensolver_chain():
    """d/e/V from the region chase drive the same back-transform."""
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.bt_hh import bt_hh_apply

    n, b = 96, 8
    rng = np.random.default_rng(3)
    full = rng.standard_normal((n, n))
    full = (full + full.T) / 2
    # lower-banded storage of the banded part
    ab = np.zeros((b + 1, n))
    for i in range(b + 1):
        ab[i, : n - i] = np.diag(full, -i)
    band = np.zeros_like(full)
    for i in range(b + 1):
        band += np.diag(np.diag(full, -i), -i)
        if i:
            band += np.diag(np.diag(full, -i), i)

    res = hh_band_to_tridiagonal_dist(ab.copy(), b, nparts=3)
    T = (np.diag(res.d) + np.diag(res.e, -1) + np.diag(res.e, 1))
    lam_t = np.linalg.eigvalsh(T)
    lam_b = np.linalg.eigvalsh(band)
    np.testing.assert_allclose(lam_t, lam_b, atol=1e-8 * n)

    # back-transform consistency: Band @ (Q z) == (Q z) diag(lam)
    w, z = np.linalg.eigh(T)
    e = np.asarray(bt_hh_apply(res, jnp.asarray(z)))
    resid = np.linalg.norm(band @ e - e * w[None, :]) / np.linalg.norm(band)
    assert resid < 1e-6
