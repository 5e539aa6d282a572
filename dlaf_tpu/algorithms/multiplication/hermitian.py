"""Distributed Hermitian matrix multiplication (HEMM).

Equivalent of the reference's ``hermitian_multiplication``
(``multiplication/hermitian.h:29``, impl ``multiplication/hermitian/impl.h``).
The reference implements only the Left/Lower case (``hermitian.h:46``); all
four side/uplo combinations are supported here.  Partitioner-style: the full
Hermitian operand is materialised from its stored triangle in natural order
and XLA schedules the distributed matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...matrix.ref import as_ref
from ...ops import tile
from ..internal import natural_of_ref, same_grid, store_into_ref


@partial(jax.jit, static_argnames=("side", "uplo"))
def hermitian_multiplication(side: str, uplo: str, alpha, a, b,
                             beta, c) -> DistMatrix:
    """c = alpha A b + beta c (side=L) or alpha b A + beta c (side=R),
    with A Hermitian stored in its ``uplo`` triangle."""
    if side not in ("L", "R") or uplo not in ("L", "U"):
        raise ValueError("invalid side/uplo")
    a, b, c = as_ref(a), as_ref(b), as_ref(c)
    same_grid(a.parent, b.parent, c.parent)
    if a.size[0] != a.size[1]:
        raise ValueError("A must be square")

    full = tile.hermitian_full(natural_of_ref(a), uplo)
    nb = natural_of_ref(b)
    nc = natural_of_ref(c)
    prod = tile.dot(full, nb) if side == "L" else tile.dot(nb, full)
    out = jnp.asarray(alpha, nc.dtype) * prod \
        + jnp.asarray(beta, nc.dtype) * nc
    return store_into_ref(c, out)
