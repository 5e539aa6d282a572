"""Split-bf16 f32 matmul (ops/splitmm): accuracy + tile.dot dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu.ops.splitmm import dot_f32x6, split3_bf16
from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters


@pytest.fixture()
def force_split():
    old = get_tune_parameters().f32_split_matmul
    set_tune_parameters(f32_split_matmul="on")
    yield
    set_tune_parameters(f32_split_matmul=old)


def test_split3_reconstructs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32)
                    * 10.0 ** rng.integers(-20, 20, (64, 64)))
    hi, mid, lo = split3_bf16(x)
    rec = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
           + lo.astype(jnp.float32))
    err = jnp.abs(rec - x) / jnp.maximum(jnp.abs(x), 1e-30)
    assert float(err.max()) < 2 ** -22        # ~24 mantissa bits kept


def test_dot_f32x6_accuracy():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((257, 130)).astype(np.float32)
    b = rng.standard_normal((130, 190)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)
    out = np.asarray(jax.jit(dot_f32x6)(jnp.asarray(a), jnp.asarray(b)))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    # within f32-matmul-grade error (same term set as XLA highest)
    assert err < 5e-7, err


def test_tile_dot_dispatch(force_split):
    from dlaf_tpu.ops import tile
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((65, 33)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((33, 48)).astype(np.float32))
    out = tile.dot(a, b)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    assert np.abs(np.asarray(out) - ref).max() < 1e-4
    # non-f32 dtypes stay on the plain path (fp64 exactness on CPU)
    a8 = jnp.asarray(np.eye(8))
    assert a8.dtype == jnp.float64 or a8.dtype == jnp.float32
    out64 = tile.dot(a8, a8)
    assert np.allclose(np.asarray(out64), np.eye(8))
