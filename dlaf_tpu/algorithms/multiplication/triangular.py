"""Distributed triangular matrix multiplication (TRMM).

Equivalent of the reference's ``triangular_multiplication``
(``multiplication/triangular.h:48,127``, impl
``multiplication/triangular/impl.h``), all side/uplo/op/diag variants.
Partitioner-style: mask the triangle in natural order and multiply through
the cache-oblivious triangle-aware recursion
(``factorization/recursive.py::rtrmm_left/right``) — the zero half of the
triangle costs nothing, matching the reference's tiled-loop flop count
(~m n k/2); XLA SPMD schedules the distributed gemms.
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

    from ...tune import get_tune_parameters
    from ..factorization.recursive import rtrmm_left, rtrmm_right

    base = get_tune_parameters().potrf_base_size
    na = tile.op(trans, tile._tri(natural_of_ref(a), uplo, diag))
    uplo_eff = uplo if trans == "N" else ("U" if uplo == "L" else "L")
    nbv = natural_of_ref(b)
    if side == "L":
        prod = rtrmm_left(na, nbv, uplo_eff, base)
    else:
        prod = rtrmm_right(nbv, na, uplo_eff, base)
    return store_into_ref(b, jnp.asarray(alpha, nbv.dtype) * prod)
