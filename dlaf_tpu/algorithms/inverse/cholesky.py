"""Matrix inverse from a Cholesky factor (POTRI) and full Cholesky inverse.

Equivalent of the reference's ``inverse_from_cholesky_factor``
(``inverse/cholesky.h``, impl ``inverse/cholesky/impl.h``: lauum-style tiled
assembly of L^-H L^-1 via trmm/herk/lauum tiles).  TPU-native: invert the
triangle with the distributed TRTRI, then one distributed Hermitian product
(the lauum step) scheduled by the XLA partitioner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_exact, store_natural_exact
from .triangular import triangular_inverse


@partial(jax.jit, static_argnames=("uplo",))
def inverse_from_cholesky_factor(uplo: str, a: DistMatrix) -> DistMatrix:
    """Given the Cholesky factor in ``a``'s ``uplo`` triangle, return A^-1.

    uplo=L: A = L L^H, returns A^-1 = L^-H L^-1 in the lower triangle.
    uplo=U: A = U^H U, returns A^-1 = U^-1 U^-H in the upper triangle.
    The opposite strict triangle of the result is the Hermitian mirror
    (harmless strengthening of the reference's one-triangle contract).
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    tinv = triangular_inverse(uplo, "N", a)
    nat = natural_exact(tinv)
    t = tile._tri(nat, uplo, "N")
    inv = tile.dot(tile.adj(t), t) if uplo == "L" else \
        tile.dot(t, tile.adj(t))
    return store_natural_exact(a, inv)


@partial(jax.jit, static_argnames=("uplo",))
def cholesky_inverse(uplo: str, a: DistMatrix) -> DistMatrix:
    """Full A^-1 of an HPD matrix: factorize then invert (potrf + potri)."""
    from ..factorization.cholesky import cholesky_factorization
    return inverse_from_cholesky_factor(uplo,
                                        cholesky_factorization(a, uplo))
