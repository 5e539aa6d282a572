"""Distributed triangular matrix inversion (TRTRI).

Equivalent of the reference's ``triangular_inverse`` (``inverse/triangular.h``,
impl ``inverse/triangular/impl.h``: tiled trtri with trsm/gemm updates).
TPU-native formulation: the cache-oblivious triangle-aware recursion
``inv([[L11, 0], [L21, L22]]) = [[I11, 0], [-I22 L21 I11, I22]]``
(``factorization/recursive.py::rtrtri_lower``) on natural-order arrays —
~n^3/3 multiplies, matching the reference's flop model; the SPMD
partitioner distributes the gemms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_padded, store_natural
from ..solver.triangular import triangular_solver


@partial(jax.jit, static_argnames=("uplo", "diag"))
def triangular_inverse(uplo: str, diag: str, a: DistMatrix) -> DistMatrix:
    """In-place-style inverse of the ``uplo`` triangle of ``a``.

    Returns a new DistMatrix whose ``uplo`` triangle holds tri(a)^-1; the
    opposite strict triangle is zeroed (the reference leaves it untouched;
    value-semantics makes zeroing the cleaner contract).
    """
    if uplo not in ("L", "U") or diag not in ("N", "U"):
        raise ValueError("invalid uplo/diag")
    if a.size[0] != a.size[1]:
        raise ValueError("A must be square")

    from ...tune import get_tune_parameters
    from ..factorization.recursive import rtrtri_lower
    from ..internal import natural_exact, store_natural_exact

    base = get_tune_parameters().potrf_base_size
    nat = natural_exact(a)
    if uplo == "L":
        ln = jnp.tril(nat)
        if diag == "U":
            ln = ln - jnp.diag(jnp.diag(ln)) + jnp.eye(ln.shape[0],
                                                       dtype=ln.dtype)
        inv = rtrtri_lower(ln, base)
    else:
        un = jnp.tril(tile.adj(nat))            # U^H is lower
        if diag == "U":
            un = un - jnp.diag(jnp.diag(un)) + jnp.eye(un.shape[0],
                                                       dtype=un.dtype)
        inv = tile.adj(rtrtri_lower(un, base))  # inv(U) = inv(U^H)^H
    inv = tile._tri(inv, uplo, diag)
    return store_natural_exact(a, inv)
