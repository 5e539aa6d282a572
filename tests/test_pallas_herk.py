"""Pallas triangle-aware HERK (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu.ops.pallas.herk import herk_lower_pallas


@pytest.mark.parametrize("m,k,tm,tk", [(512, 256, 128, 128),
                                       (384, 128, 128, 128)])
def test_herk_lower(m, k, tm, tk):
    rng = np.random.default_rng(m + k)
    c = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    out = np.asarray(herk_lower_pallas(c, x, tile_m=tm, tile_k=tk,
                                       interpret=True))
    want = np.asarray(c) - np.asarray(x) @ np.asarray(x).T
    # only lower tiles are specified (LAPACK herk contract)
    tril = np.tril_indices(m)
    scale = np.abs(want).max()
    np.testing.assert_allclose(out[tril] / scale, want[tril] / scale,
                               rtol=0, atol=1e-5)
