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


def _hemm_rec(na, nb, uplo: str, depth: int):
    """Triangle-aware ``A @ B`` with A Hermitian stored in ``uplo``.

    Halving recursion: the off-diagonal block of A is a full rectangle
    used twice (once adjoint), the diagonal blocks recurse — only
    ~2^-depth of the flops are wasted on materialized mirrors at the
    leaves, vs 2x for the dense hermitian_full form (the reference
    updates one triangle's tiles only, ``multiplication/hermitian/
    impl.h``).  Same pruning idea as ``cholesky._trailing_update``.
    """
    n = na.shape[0]
    if depth <= 0 or n < 2:
        return tile.dot(tile.hermitian_full(na, uplo), nb)
    h = n // 2
    a11, a22 = na[:h, :h], na[h:, h:]
    b1, b2 = nb[:h], nb[h:]
    c1 = _hemm_rec(a11, b1, uplo, depth - 1)
    c2 = _hemm_rec(a22, b2, uplo, depth - 1)
    if uplo == "L":
        a21 = na[h:, :h]
        c1 = c1 + tile.dot(tile.adj(a21), b2)
        c2 = c2 + tile.dot(a21, b1)
    else:
        a12 = na[:h, h:]
        c1 = c1 + tile.dot(a12, b2)
        c2 = c2 + tile.dot(tile.adj(a12), b1)
    return jnp.concatenate([c1, c2], axis=0)


def hermitian_multiplication(side: str, uplo: str, alpha, a, b,
                             beta, c) -> DistMatrix:
    """c = alpha A b + beta c (side=L) or alpha b A + beta c (side=R),
    with A Hermitian stored in its ``uplo`` triangle."""
    from ...tune import get_tune_parameters
    depth = int(get_tune_parameters().herk_split_depth)
    return _hemm_jit(side, uplo, alpha, a, b, beta, c, depth)


@partial(jax.jit, static_argnames=("side", "uplo", "depth"))
def _hemm_jit(side: str, uplo: str, alpha, a, b, beta, c,
              depth: int) -> DistMatrix:
    if side not in ("L", "R") or uplo not in ("L", "U"):
        raise ValueError("invalid side/uplo")
    a, b, c = as_ref(a), as_ref(b), as_ref(c)
    same_grid(a.parent, b.parent, c.parent)
    if a.size[0] != a.size[1]:
        raise ValueError("A must be square")

    na = natural_of_ref(a)
    nb = natural_of_ref(b)
    nc = natural_of_ref(c)
    if side == "L":
        prod = _hemm_rec(na, nb, uplo, depth)
    else:
        # B A = (A B^H)^H for Hermitian A
        prod = tile.adj(_hemm_rec(na, tile.adj(nb), uplo, depth))
    out = jnp.asarray(alpha, nc.dtype) * prod \
        + jnp.asarray(beta, nc.dtype) * nc
    return store_into_ref(c, out)
