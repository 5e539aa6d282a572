"""Tile-level BLAS/LAPACK kernels.

TPU-native equivalent of the reference's tile-op layer
(``include/dlaf/blas/tile.h:46-373`` — gemm/hemm/herk/her2k/trmm/trsm — and
``include/dlaf/lapack/tile.h`` — potrf/hegst/lauum/trtri/lange/lacpy/laset):
where the reference dispatches a ``Tile`` to blaspp or cuBLAS per task, these
functions are traced into the surrounding XLA program, so "one tile op" fuses
with its neighbours and runs on the MXU.  Dense ops use ``lax.dot_general``;
structured solves use XLA's ``triangular_solve``/``cholesky`` HLOs (blocked
internally by XLA for TPU); hot paths get Pallas overrides in ``ops/pallas``.

All ops are eager value-to-value (functional): ``c = gemm(a, b, c=c)`` instead
of the reference's in-place sender form.  Complex is supported via jnp dtypes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..tune import get_tune_parameters


def _precision():
    return get_tune_parameters().matmul_precision


def adj(x):
    """Conjugate transpose (Hermitian adjoint) of the last two dims."""
    return jnp.conjugate(jnp.swapaxes(x, -1, -2))


def op(trans: str, x):
    """Apply a blas-style op: 'N' | 'T' | 'C'."""
    if trans == "N":
        return x
    if trans == "T":
        return jnp.swapaxes(x, -1, -2)
    if trans == "C":
        return adj(x)
    raise ValueError(f"invalid op {trans!r}")


def _use_split6(a, b) -> bool:
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        return False
    if a.ndim != 2 or b.ndim != 2:
        return False
    p = get_tune_parameters()
    if p.matmul_precision != "highest":
        return False
    # measured end-to-end regression on v5e POTRF (see tune.py): explicit
    # splitting is opt-in only
    return p.f32_split_matmul == "on"


def dot(a, b):
    """MXU matmul at the tuned precision (f32 default: HIGHEST).

    With ``f32_split_matmul="on"``, f32 'highest' takes the explicit
    split-bf16 path (:mod:`..ops.splitmm`) — same 6-product term set;
    opt-in only (see tune.py for the measured end-to-end tradeoff).
    """
    if _use_split6(a, b):
        from .splitmm import dot_f32x6
        return dot_f32x6(a, b)
    return jnp.matmul(a, b, precision=_precision())


# -- BLAS level 3 ------------------------------------------------------------

def gemm(alpha, a, op_a, b, op_b, beta=0.0, c=None):
    """c = alpha * op_a(a) @ op_b(b) + beta * c  (``blas/tile.h:gemm``)."""
    r = alpha * dot(op(op_a, a), op(op_b, b))
    if c is not None and beta != 0.0:
        r = r + beta * c
    return r.astype(a.dtype)


def herk(alpha, a, op_a, beta, c, uplo="L"):
    """c = alpha op(a) op(a)^H + beta c, referencing only one triangle.

    Tile-level ``herk`` (``blas/tile.h``): the other triangle of ``c`` is
    passed through unchanged, like BLAS.
    """
    aa = op(op_a, a)
    upd = alpha * dot(aa, adj(aa)) + beta * c
    return _triangle_update(c, upd, uplo)


def her2k(alpha, a, b, beta, c, uplo="L"):
    """c = alpha a b^H + conj(alpha) b a^H + beta c (one triangle)."""
    upd = alpha * dot(a, adj(b))
    upd = upd + jnp.conjugate(jnp.asarray(alpha, c.dtype)) * dot(b, adj(a))
    upd = upd + beta * c
    return _triangle_update(c, upd, uplo)


def hemm(alpha, a, b, beta=0.0, c=None, side="L", uplo="L"):
    """c = alpha A b + beta c with A Hermitian stored in one triangle."""
    full = hermitian_full(a, uplo)
    if side == "L":
        r = alpha * dot(full, b)
    else:
        r = alpha * dot(b, full)
    if c is not None and beta != 0.0:
        r = r + beta * c
    return r


def trmm(side, uplo, trans, diag, alpha, a, b):
    """b = alpha op(tri(a)) b (side=L) or alpha b op(tri(a)) (side=R)."""
    t = _tri(a, uplo, diag)
    t = op(trans, t)
    if side == "L":
        return alpha * dot(t, b)
    return alpha * dot(b, t)


def trsm(side, uplo, trans, diag, alpha, a, b):
    """Solve op(tri(a)) X = alpha b (side=L) or X op(tri(a)) = alpha b."""
    lower = uplo == "L"
    return alpha * lax.linalg.triangular_solve(
        a, b,
        left_side=(side == "L"),
        lower=lower,
        transpose_a=(trans in ("T", "C")),
        conjugate_a=(trans == "C"),
        unit_diagonal=(diag == "U"),
    )


# -- LAPACK-style ------------------------------------------------------------

def potrf(a, uplo="L"):
    """Cholesky of one (assumed valid) tile; lower or upper factor.

    Only the ``uplo`` triangle is referenced (LAPACK semantics —
    ``symmetrize_input=False`` matters: the other triangle may hold garbage).
    """
    if uplo == "L":
        return lax.linalg.cholesky(a, symmetrize_input=False)
    return adj(lax.linalg.cholesky(adj(a), symmetrize_input=False))


def trtri(a, uplo="L", diag="N"):
    """Inverse of a triangular tile: solve tri(a) X = I."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    inv = lax.linalg.triangular_solve(
        a, eye, left_side=True, lower=(uplo == "L"),
        unit_diagonal=(diag == "U"))
    return _tri(inv, uplo, diag)


def lauum(a, uplo="L"):
    """L^H L (uplo=L) or U U^H (uplo=U) of a triangular tile, one triangle."""
    t = _tri(a, uplo, "N")
    if uplo == "L":
        r = dot(adj(t), t)
    else:
        r = dot(t, adj(t))
    return _triangle_update(a, r, uplo)


def hegst(itype, uplo, a, b):
    """Tile-level generalized-to-standard reduction (``lapack/tile.h:hegst``).

    itype=1, uplo=L: A <- inv(L) A inv(L)^H with B = L (lower Cholesky).
    """
    if itype != 1:
        raise NotImplementedError("only itype=1")
    full = hermitian_full(a, uplo)
    if uplo == "L":
        x = lax.linalg.triangular_solve(b, full, left_side=True, lower=True)
        x = lax.linalg.triangular_solve(b, x, left_side=False, lower=True,
                                        transpose_a=True, conjugate_a=True)
    else:
        x = lax.linalg.triangular_solve(b, full, left_side=False, lower=False)
        x = lax.linalg.triangular_solve(b, x, left_side=True, lower=False,
                                        transpose_a=True, conjugate_a=True)
    return _triangle_update(a, x, uplo)


def laset(shape, alpha, beta, dtype, uplo="G"):
    """Set off-diagonal to alpha, diagonal to beta (``lapack/tile.h:laset``)."""
    m, n = shape
    out = jnp.full((m, n), alpha, dtype=dtype)
    k = min(m, n)
    out = out.at[jnp.arange(k), jnp.arange(k)].set(jnp.asarray(beta, dtype))
    if uplo == "L":
        return jnp.where(_row_ge_col(m, n), out, jnp.zeros((), dtype))
    if uplo == "U":
        return jnp.where(_row_ge_col(m, n), jnp.zeros((), dtype), out)
    return out


def lacpy(a, uplo="G"):
    """Copy a tile (one triangle or general)."""
    if uplo == "G":
        return a
    return _tri(a, uplo, "N")


def lange(norm, a):
    """Tile norm: 'M' max-abs, 'F' Frobenius, '1' col-sum, 'I' row-sum."""
    if norm == "M":
        return jnp.max(jnp.abs(a)) if a.size else jnp.zeros((), a.real.dtype)
    if norm == "F":
        return jnp.sqrt(jnp.sum(jnp.abs(a) ** 2))
    if norm == "1":
        return jnp.max(jnp.sum(jnp.abs(a), axis=0))
    if norm == "I":
        return jnp.max(jnp.sum(jnp.abs(a), axis=1))
    raise ValueError(f"invalid norm {norm!r}")


# -- helpers ------------------------------------------------------------------

def _row_ge_col(m, n):
    r = lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return r >= c


def _tri(a, uplo, diag):
    """Triangle of a tile, optionally with implicit unit diagonal."""
    t = jnp.tril(a) if uplo == "L" else jnp.triu(a)
    if diag == "U":
        n = min(a.shape[-2], a.shape[-1])
        idx = jnp.arange(n)
        t = t.at[..., idx, idx].set(jnp.ones((), a.dtype))
    return t


def _triangle_update(c, upd, uplo):
    """Write ``upd`` into ``c``'s ``uplo`` triangle, keep the other."""
    m, n = c.shape[-2], c.shape[-1]
    mask = _row_ge_col(m, n)
    if uplo == "U":
        mask = ~mask | jnp.eye(m, n, dtype=bool)
    else:
        mask = mask
    return jnp.where(mask, upd, c)


def hermitian_full(a, uplo="L"):
    """Materialize the full Hermitian matrix from one stored triangle."""
    if uplo == "L":
        t = jnp.tril(a)
        return t + adj(jnp.tril(a, -1))
    t = jnp.triu(a)
    return t + adj(jnp.triu(a, 1))
