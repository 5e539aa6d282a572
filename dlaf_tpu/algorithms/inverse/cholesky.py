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
from ...tune import get_tune_parameters
from ..factorization.recursive import _half, rtrmm_right
from ..internal import natural_exact, store_natural_exact
from .triangular import triangular_inverse


def rlauum_lower(l, base: int):
    """``L^H L`` for lower-triangular ``L`` (true zeros above), full
    Hermitian output — the lauum step with triangle-aware flops
    (~n^3/4 multiplies vs n^3 dense):
    ``[[L11^H L11 + L21^H L21, L21^H L22], [., L22^H L22]]``."""
    m = l.shape[0]
    if m <= base:
        t = jnp.tril(l)
        return tile.dot(tile.adj(t), t)
    h = _half(m)
    l11, l21, l22 = l[:h, :h], l[h:, :h], l[h:, h:]
    c11 = rlauum_lower(l11, base) + tile.dot(tile.adj(l21), l21)
    c12 = rtrmm_right(tile.adj(l21), l22, "L", base)
    c22 = rlauum_lower(l22, base)
    top = jnp.concatenate([c11, c12], axis=1)
    bot = jnp.concatenate([tile.adj(c12), c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


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
    base = get_tune_parameters().potrf_base_size
    tinv = triangular_inverse(uplo, "N", a)
    nat = natural_exact(tinv)
    if uplo == "L":
        inv = rlauum_lower(jnp.tril(nat), base)
    else:
        # U^-1 U^-H = L^H L with L = (U^-1)^H lower
        inv = rlauum_lower(jnp.tril(tile.adj(nat)), base)
    return store_natural_exact(a, inv)


@partial(jax.jit, static_argnames=("uplo",))
def cholesky_inverse(uplo: str, a: DistMatrix) -> DistMatrix:
    """Full A^-1 of an HPD matrix: factorize then invert (potrf + potri)."""
    from ..factorization.cholesky import cholesky_factorization
    return inverse_from_cholesky_factor(uplo,
                                        cholesky_factorization(a, uplo))
