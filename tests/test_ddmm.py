"""Double-f32 (extended precision) matrix products (``ops/ddmm.py``) —
the opt-in fp64-capability path for a backend with no native f64."""

import numpy as np
import pytest

from dlaf_tpu.ops.ddmm import (DD, dd_add, dd_from_f64, dd_residual_gemm,
                               dd_to_f64, ddgemm, ozaki_encode)


def test_pair_encoding_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(1000) * np.exp(rng.uniform(-8, 8, 1000))
    d = dd_from_f64(a)
    back = dd_to_f64(d)
    # pair carries ~48 mantissa bits
    assert np.max(np.abs(back - a) / np.abs(a)) < 2e-14


@pytest.mark.parametrize("n", [64, 256])
def test_ddgemm_beats_f32_by_orders(n):
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    exact = a @ b                                 # f64 reference
    scale = np.abs(exact).max()

    f32 = np.asarray(
        np.asarray(a, np.float32) @ np.asarray(b, np.float32), np.float64)
    err_f32 = np.abs(f32 - exact).max() / scale

    dd = ddgemm(a, b)
    err_dd = np.abs(dd_to_f64(dd) - exact).max() / scale

    assert err_dd < 1e-11                          # ~double-word accuracy
    assert err_dd < err_f32 / 1e3                  # orders below plain f32


def test_dd_add_and_residual():
    rng = np.random.default_rng(2)
    n = 128
    a = rng.standard_normal((n, n))
    x = np.linalg.solve(a, np.eye(n))              # accurate-ish inverse
    bmat = np.eye(n)
    r_exact = bmat - a @ x
    r = dd_residual_gemm(a, x, bmat)
    got = dd_to_f64(r)
    # the residual is ~1e-13-level; plain f32 gemm cannot see it at all
    assert np.abs(got - r_exact).max() < 1e-10
    s = dd_add(DD(*dd_from_f64(np.ones(4))), DD(*dd_from_f64(1e-12 *
                                                             np.ones(4))))
    np.testing.assert_allclose(dd_to_f64(s), 1.0 + 1e-12, rtol=1e-15)


def test_ozaki_encode_is_error_free():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 96)) * np.exp(rng.uniform(-4, 4, (64, 96)))
    enc = ozaki_encode(a, 1)
    back = np.sum(np.asarray(enc.slices, np.float64), axis=0)
    assert np.abs(back - a).max() / np.abs(a).max() < 1e-14
