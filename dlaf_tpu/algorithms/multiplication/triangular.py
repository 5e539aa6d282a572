"""Distributed triangular matrix multiplication (TRMM).

Equivalent of the reference's ``triangular_multiplication``
(``multiplication/triangular.h:48,127``, impl
``multiplication/triangular/impl.h``), all side/uplo/op/diag variants.
Partitioner-style: mask the triangle in natural order, let XLA schedule the
distributed matmul.  (A triangle-aware split that skips the zero half is a
planned optimization; the reference's tiled loop gets this for free, we trade
<=2x redundant MXU flops for zero hand-written communication.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...matrix.ref import as_ref
from ...ops import tile
from ..internal import natural_of_ref, same_grid, store_into_ref


@partial(jax.jit, static_argnames=("side", "uplo", "trans", "diag"))
def triangular_multiplication(side: str, uplo: str, trans: str, diag: str,
                              alpha, a, b) -> DistMatrix:
    """b = alpha op(tri(a)) b (side=L) or alpha b op(tri(a)) (side=R)."""
    if side not in ("L", "R") or uplo not in ("L", "U") or \
            trans not in ("N", "T", "C") or diag not in ("N", "U"):
        raise ValueError("invalid side/uplo/trans/diag")
    a, b = as_ref(a), as_ref(b)
    same_grid(a.parent, b.parent)
    if a.size[0] != a.size[1]:
        raise ValueError("A must be square")
    k = a.size[0]
    if (side == "L" and b.size[0] != k) or (side == "R" and b.size[1] != k):
        raise ValueError("size mismatch")

    na = tile.op(trans, tile._tri(natural_of_ref(a), uplo, diag))
    nbv = natural_of_ref(b)
    prod = tile.dot(na, nbv) if side == "L" else tile.dot(nbv, na)
    return store_into_ref(b, jnp.asarray(alpha, nbv.dtype) * prod)
