"""Generalized-to-standard eigenproblem reduction (HEGST).

Equivalent of the reference's ``generalized_to_standard``
(``eigensolver/gen_to_std.h``, impl ``eigensolver/gen_to_std/impl.h``: tiled
two-sided hegst with per-k diag hegst + trsm/hemm/her2k updates and panel
broadcasts).  TPU-native: a cache-oblivious recursion over natural-order
arrays (partitioner-style distribution — XLA SPMD places the collectives):

  C = inv(L) A inv(L)^H,  A = [[A11, *], [A21, A22]] Hermitian:
    C11 = hegst(A11, L11)
    Y   = A21 inv(L11)^H                  (triangle-aware trmm)
    C21 = inv(L22) (Y - L21 C11)
    W   = Y - (1/2) L21 C11
    C22 = hegst(A22 - W L21^H - L21 W^H, L22)   (her2k on the triangle)

Multiply count n^3/2 + O(n^2 base) — reference hegst parity (round-1's two
full triangular solves were n^3; round-2's trtri-based trmms were 0.56 n^3;
the recursive trsms have no trtri tax).  Only the lower triangle of the
result is computed; itype 1 (the reference's only supported itype as well
for the generalized eigensolver driver).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ...tune import get_tune_parameters
from ..factorization.recursive import (_half, rtrsm_left_lower,
                                       rtrsm_right_adj_lower)
from ..internal import natural_exact, store_natural_exact


def rher2k_lower(c, x, y, base: int):
    """``c - x y^H - y x^H`` updating only the lower triangle."""
    m = c.shape[0]
    if m <= base:
        return c - tile.dot(x, tile.adj(y)) - tile.dot(y, tile.adj(x))
    h = _half(m)
    c11 = rher2k_lower(c[:h, :h], x[:h], y[:h], base)
    c21 = (c[h:, :h] - tile.dot(x[h:], tile.adj(y[:h]))
           - tile.dot(y[h:], tile.adj(x[:h])))
    c22 = rher2k_lower(c[h:, h:], x[h:], y[h:], base)
    top = jnp.concatenate([c11, c[:h, h:]], axis=1)
    bot = jnp.concatenate([c21, c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def rhegst_lower(a, l, base: int):
    """``inv(L) A inv(L)^H`` with ``A`` Hermitian given by its lower
    triangle (upper ignored); only the lower triangle of the result is
    significant."""
    m = a.shape[0]
    if m <= base:
        af = tile.hermitian_full(a, "L")
        w = jax.lax.linalg.triangular_solve(l, af, left_side=True,
                                            lower=True)
        return jax.lax.linalg.triangular_solve(l, w, left_side=False,
                                               lower=True, transpose_a=True,
                                               conjugate_a=True)
    h = _half(m)
    a11, a21, a22 = a[:h, :h], a[h:, :h], a[h:, h:]
    l11, l21, l22 = l[:h, :h], l[h:, :h], l[h:, h:]

    c11 = rhegst_lower(a11, l11, base)
    c11f = tile.hermitian_full(c11, "L")
    y = rtrsm_right_adj_lower(a21, l11, base)
    g = tile.dot(l21, c11f)
    c21 = rtrsm_left_lower(l22, y - g, base)
    w = y - 0.5 * g
    inner = rher2k_lower(a22, w, l21, base)
    c22 = rhegst_lower(inner, l22, base)

    top = jnp.concatenate([c11, a[:h, h:]], axis=1)
    bot = jnp.concatenate([c21, c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("uplo",))
def generalized_to_standard(uplo: str, a: DistMatrix,
                            b: DistMatrix) -> DistMatrix:
    """Reduce A x = lambda B x to standard form given B's Cholesky factor.

    ``a``: Hermitian, stored in the ``uplo`` triangle.  ``b``: the Cholesky
    factor of B in the same triangle (L for uplo=L, U for uplo=U).  Returns
    the standard-form Hermitian matrix in the ``uplo`` triangle:
    uplo=L: inv(L) A inv(L)^H;  uplo=U: inv(U)^H A inv(U).
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    if a.size != b.size or a.size[0] != a.size[1]:
        raise ValueError("A, B must be square and same size")

    base = get_tune_parameters().potrf_base_size
    if uplo == "L":
        an = natural_exact(a)
        ln = jnp.tril(natural_exact(b))
        out = rhegst_lower(an, ln, base)
        out = jnp.where(tile._row_ge_col(*out.shape), out,
                        tile.adj(out))          # full Hermitian output
        return store_natural_exact(a, out)
    # uplo=U: inv(U)^H A inv(U) = adj of the L case on adjoints
    an = tile.adj(natural_exact(a))             # lower-stored Hermitian
    ln = jnp.tril(tile.adj(natural_exact(b)))   # U^H is lower
    out = rhegst_lower(an, ln, base)
    out = jnp.where(tile._row_ge_col(*out.shape), out, tile.adj(out))
    return store_natural_exact(a, tile.adj(out))
