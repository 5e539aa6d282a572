"""Emulated double-precision matrix products for the TPU (Ozaki scheme).

The chip has no native fp64 (the reference's d/z types run natively on
its CPU/GPU backends, ``include/dlaf/types.h:31-61``); JAX silently
computes f64 arrays in f32 here.  This module provides the opt-in
double-word path SURVEY §7 calls for, using the Ozaki error-free
splitting (the scheme behind fp64-emulation-on-tensor-core libraries):

* each f64 operand is split HOST-side into ``S`` f32 slices whose
  values are integer multiples of a per-row (per-col for B) power of
  two with at most ``beta`` significant bits, where
  ``2*beta + ceil(log2 k) <= 24`` — so every slice-pair GEMM
  accumulates EXACTLY in f32 (no rounding anywhere on the device);
* the exact partial products are combined elementwise in double-f32
  arithmetic (Knuth two-sum), giving ~2^-48 relative accuracy — true
  fp64 working precision for well-scaled data.

Cost: ``O(S^2 / 2)`` f32 gemms per product (S ~ 6-9 depending on the
contraction depth), all MXU work.  Intended for residual-critical
steps (iterative refinement, accuracy checks) rather than whole
factorizations.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax


class DD(NamedTuple):
    """Unevaluated double-f32 pair (value = hi + lo)."""
    hi: jnp.ndarray
    lo: jnp.ndarray


class OzakiOperand(NamedTuple):
    """Error-free slice decomposition of an f64 matrix: value =
    sum_i slices[i] with exactly-accumulating slice products."""
    slices: jnp.ndarray          # [S, m, n] f32
    axis: int                    # contraction axis used for scaling


def dd_from_f64(a) -> DD:
    """Host f64 array -> double-f32 pair (exact to ~2^-48)."""
    hi = np.asarray(a, np.float32)
    lo = np.asarray(np.asarray(a, np.float64) - hi.astype(np.float64),
                    np.float32)
    return DD(jnp.asarray(hi), jnp.asarray(lo))


def dd_to_f64(a: DD):
    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def dd_add(a: DD, b: DD) -> DD:
    s, e = _two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    s2, e2 = _two_sum(s, e)
    return DD(s2, e2)


def dd_neg(a: DD) -> DD:
    return DD(-a.hi, -a.lo)


def slice_bits(k: int) -> int:
    """Significand bits per slice so slice-product sums over the
    contraction depth ``k`` are exact in f32."""
    return max((24 - math.ceil(math.log2(max(k, 2)))) // 2, 1)


def ozaki_encode(a, contract_axis: int, target_bits: int = 52,
                 max_slices: int = 12) -> OzakiOperand:
    """Host-side error-free slicing of an f64 matrix.

    Slice ``i`` holds the next ``beta`` significant bits of the
    remainder, rounded to a per-row (along the contraction axis) power
    of two so each slice is an integer multiple of that scale —
    products of two such slices summed ``k`` times stay below 2^24 and
    accumulate exactly in f32.
    """
    x = np.array(a, np.float64, copy=True)
    k = x.shape[contract_axis]
    beta = slice_bits(k)
    S = min(int(math.ceil(target_bits / beta)) + 1, max_slices)
    out = []
    for _ in range(S):
        mu = np.max(np.abs(x), axis=contract_axis, keepdims=True)
        if not np.any(mu):
            break
        e = np.where(mu > 0, np.ceil(np.log2(np.where(mu > 0, mu, 1.0))),
                     0.0)
        u = np.exp2(e - beta)                    # slice grid
        hi = np.round(x / u) * u                 # exact in f64
        out.append(np.asarray(hi, np.float32))
        x -= hi
    if not out:
        out = [np.zeros_like(x, dtype=np.float32)]
    return OzakiOperand(jnp.asarray(np.stack(out)), contract_axis)


def ozaki_gemm(a: OzakiOperand, b: OzakiOperand, keep_bits: int = 52
               ) -> DD:
    """C = A @ B from slice decompositions; every partial gemm is exact,
    the combination is elementwise double-f32."""
    sa = a.slices.shape[0]
    sb = b.slices.shape[0]
    k = a.slices.shape[2]
    beta = slice_bits(k)
    smax = int(math.ceil(keep_bits / beta)) + 1

    hi = None
    parts = []
    for i in range(sa):
        for j in range(sb):
            if i + j >= smax:
                continue
            parts.append(jnp.matmul(a.slices[i], b.slices[j],
                                    precision=lax.Precision.HIGHEST))
    # combine largest-first with compensated accumulation
    acc = DD(parts[0], jnp.zeros_like(parts[0]))
    for p in parts[1:]:
        acc = dd_add(acc, DD(p, jnp.zeros_like(p)))
    return acc


def ddgemm(a, b, target_bits: int = 52) -> DD:
    """C = A @ B at ~fp64 working precision from host f64 inputs."""
    ao = ozaki_encode(a, 1, target_bits)
    bo = ozaki_encode(b, 0, target_bits)
    return ozaki_gemm(ao, bo, target_bits)


def dd_residual_gemm(a, x, bmat) -> DD:
    """R = B - A X at ~fp64 precision — the iterative-refinement
    residual whose plain-f32 version loses all signal once X is
    accurate to f32."""
    ax = ddgemm(a, x)
    return dd_add(dd_from_f64(bmat), dd_neg(ax))
