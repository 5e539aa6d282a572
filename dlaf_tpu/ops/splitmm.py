"""f32 matmul via explicit 3-way bfloat16 split (6-product emulation).

XLA's ``precision=highest`` f32 matmul on TPU is itself a bf16x6
emulation (the v5e MXU has no native f32 path), but its measured rate
collapses at mid contraction depths: ~31 TF at k >= 4096 falling to
~16-19 TF at k = 1024-2048 on the v5e, while the native-bf16 matmul rate
stays ~160-244 TF.  Emitting the six bf16 products as ordinary XLA dots
(operands pre-split once, f32 accumulation) keeps the MXU on its native
path, so the effective f32 rate holds near 197/6 ~ 33 TF at every depth
that matters for blocked factorizations.  This is the TPU analogue of the
reference letting cuBLAS pick its fastest gemm algorithm per shape
(``tile/gemm`` -> cublasGemmEx); here the "algorithm" is the
decomposition itself.

Precision: identical term set to XLA's F32 'highest' (BF16_BF16_F32_X6):
with x = hi + mid + lo (round-to-nearest at each stage),
``hi*hi + hi*mid + mid*hi + hi*lo + lo*hi + mid*mid``, each product a
native bf16 MXU pass accumulated in f32.  The dropped terms are O(2^-48)
relative — below f32 roundoff.

Used by :func:`dlaf_tpu.ops.tile.dot` when the tune parameter
``f32_split_matmul`` is enabled (auto: on for f32 'highest' on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def split3_bf16(x):
    """Split f32 ``x`` into three bf16 terms with x ~ hi + mid + lo."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def dot_f32x6(a, b, dimension_numbers=None):
    """``a @ b`` (f32) via six native-bf16 MXU products, f32 accumulation.

    ``dimension_numbers`` as for :func:`lax.dot_general`; default is the
    last-axis/first-axis matmul contraction.
    """
    if dimension_numbers is None:
        dimension_numbers = (((a.ndim - 1,), (0,)), ((), ()))

    ah, am, al = split3_bf16(a)
    bh, bm, bl = split3_bf16(b)

    def d(x, y):
        return lax.dot_general(x, y, dimension_numbers,
                               preferred_element_type=jnp.float32)

    # order: smallest terms first so the big hi*hi lands last (helps
    # accumulation error slightly; all adds are f32 either way)
    acc = d(am, bm)
    acc = acc + d(al, bh)
    acc = acc + d(ah, bl)
    acc = acc + d(am, bh)
    acc = acc + d(ah, bm)
    acc = acc + d(ah, bh)
    return acc
