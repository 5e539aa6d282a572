"""Mixed-precision fp64 results on an f32-only chip (iterative refinement).

Reference parity: the reference's d/z types are first-class on its CPU
and GPU backends (``include/dlaf/types.h:31-61``); this TPU has no
native fp64 (f64 arrays silently compute as f32).  This module composes
the f32 factorizations with the Ozaki error-free residual products
(``ops/ddmm.py``, ~2^-48 working precision) to return HOST f64 results
with ~fp64 backward error:

* :func:`cholesky_refine` — factor in f32 on the MXU, then
  Newton-correct the factor: with ``E = A - L L^T`` evaluated at dd
  precision, the correction ``dL = L * Phi(L^-1 E L^-T)``
  (``Phi`` = strict lower + half diagonal) reduces the factorization
  residual quadratically; one step reaches ~1e-13 relative backward
  error for moderately conditioned A (vs ~1e-7 for the plain f32
  factor).  All O(n^3) work (solves, trmm) stays on the chip in f32 —
  the corrections are O(eps32) relative to the factor, so f32 relative
  accuracy on them is O(eps32^2) absolute, i.e. below the dd floor.
* :func:`refine_eigenvalues` — dd-accurate Rayleigh quotients of f32
  eigenvectors: ``lambda_i = v_i^T A v_i / v_i^T v_i`` with ``A V``
  computed by ``ddgemm``.  A Rayleigh quotient's eigenvalue error is
  quadratic in the eigenvector residual, so f32 vectors (residual
  ~eps32) give ~eps32^2-accurate eigenvalues.

Real (s/d) only: the Ozaki slicing is real; complex (c/z) inputs go
through the pair-of-reals embedding first (``complex_embed.py``), whose
standard-eigenproblem path composes with :func:`refine_eigenvalues`
directly.  Cost: one dd residual = O(S^2/2) ~ 20-40 f32 gemms — this is
the opt-in accuracy path the reference's native-f64 backends do not
need, priced for residual-critical steps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..matrix.matrix import DistMatrix
from ..ops.ddmm import dd_residual_gemm, ddgemm
from .factorization.cholesky import cholesky_factorization
from .multiplication.triangular import triangular_multiplication
from .solver.triangular import triangular_solver


def _full_sym(a: np.ndarray, uplo: str) -> np.ndarray:
    if uplo == "L":
        return np.tril(a) + np.tril(a, -1).T
    return np.triu(a) + np.triu(a, 1).T


def cholesky_refine(a, block_size, uplo: str = "L", *,
                    grid=None, iters: int = 1,
                    return_history: bool = False):
    """fp64-accurate Cholesky factor of a host f64 SPD matrix.

    Returns the host ``[n, n]`` float64 lower (``uplo='L'``) or upper
    factor; with ``return_history=True`` also the list of dd-measured
    ``||A - L L^T||_F / ||A||_F`` after the f32 factor and after each
    refinement step (free: the residual is computed anyway).

    Equivalent capability to the reference's ``cholesky_factorization``
    d-type ETI (``src/factorization/cholesky/mc.cpp``), realized as
    f32-factor + Newton correction instead of native f64 arithmetic.
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    if np.iscomplexobj(a):
        raise ValueError("cholesky_refine is real-only (z goes through "
                         "the embedding path)")
    a = np.asarray(a, np.float64)
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError("matrix must be square")
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    afull = _full_sym(a, uplo)
    if uplo == "U":              # refine the lower factor of A^T = A
        pass                     # afull is symmetric; work on L throughout

    mat = DistMatrix.from_natural(jnp.asarray(afull, jnp.float32),
                                  block_size, grid, diag_pad=1.0)
    Lm = cholesky_factorization(mat, "L")
    del mat
    L32 = np.tril(np.asarray(Lm.to_natural(), np.float32)[:n, :n])
    del Lm
    L64 = L32.astype(np.float64)
    Lm32 = DistMatrix.from_natural(jnp.asarray(L32), block_size, grid,
                                   diag_pad=1.0)

    anorm = np.linalg.norm(afull)
    hist = []
    for _ in range(max(iters, 0) + (1 if return_history else 0)):
        # E = A - L64 L64^T at dd precision (the only step where f32
        # arithmetic would erase the signal)
        E = dd_residual_gemm(L64, L64.T, afull)
        Ef = (np.asarray(E.hi, np.float64)
              + np.asarray(E.lo, np.float64))[:n, :n]
        hist.append(float(np.linalg.norm(Ef) / max(anorm, 1e-300)))
        if len(hist) > iters:
            break
        # F = L^-1 E L^-T on the chip (f32 suffices: relative accuracy
        # on an O(eps32)-sized correction)
        Em = DistMatrix.from_natural(
            jnp.asarray(Ef.astype(np.float32)), block_size, grid)
        F1 = triangular_solver("L", "L", "N", "N", 1.0, Lm32, Em)
        F2 = triangular_solver("R", "L", "T", "N", 1.0, Lm32, F1)
        Fn = np.asarray(F2.to_natural(), np.float64)[:n, :n]
        del Em, F1, F2
        phi = np.tril(Fn, -1) + np.diag(np.diag(Fn) / 2)
        Pm = DistMatrix.from_natural(jnp.asarray(phi.astype(np.float32)),
                                     block_size, grid)
        dLm = triangular_multiplication("L", "L", "N", "N", 1.0, Lm32, Pm)
        L64 = L64 + np.asarray(dLm.to_natural(), np.float64)[:n, :n]
        L64 = np.tril(L64)
        del Pm, dLm
    out = L64 if uplo == "L" else L64.T.copy()
    if return_history:
        return out, hist
    return out


def refine_eigenvalues(a, lam32, v) -> np.ndarray:
    """fp64-accurate eigenvalues from f32 eigenpairs (host f64 A).

    ``v`` may be a DistMatrix or a host array of f32 eigenvectors; the
    returned eigenvalues are the dd-precision Rayleigh quotients,
    ordered like ``lam32``.  ``lam32`` is only used for its length/
    dtype bookkeeping (callers may pass fewer columns than n).
    """
    if np.iscomplexobj(a):
        raise ValueError("refine_eigenvalues is real-only (c/z goes "
                         "through the embedding path)")
    a = np.asarray(a, np.float64)
    if isinstance(v, DistMatrix):
        v = np.asarray(v.to_natural())
    v = np.asarray(v)
    n_ev = v.shape[1]
    av = ddgemm(a, v.astype(np.float64))
    avf = np.asarray(av.hi, np.float64) + np.asarray(av.lo, np.float64)
    v64 = v.astype(np.float64)
    num = np.einsum("ri,ri->i", v64, avf)
    den = np.einsum("ri,ri->i", v64, v64)
    lam = num / np.where(den == 0, 1.0, den)
    return lam[:len(np.asarray(lam32))] if n_ev >= len(
        np.asarray(lam32)) else lam


def refine_generalized_eigenvalues(a, bmat, lam32, v) -> np.ndarray:
    """fp64-accurate generalized eigenvalues ``A x = lambda B x`` from
    f32 eigenpairs: dd Rayleigh quotients in the B metric,
    ``lambda_i = v_i^T A v_i / v_i^T B v_i`` (quadratic error in the
    pencil residual, like the standard case)."""
    if np.iscomplexobj(a) or np.iscomplexobj(bmat):
        raise ValueError("real-only (c/z goes through the embedding)")
    a = np.asarray(a, np.float64)
    bmat = np.asarray(bmat, np.float64)
    if isinstance(v, DistMatrix):
        v = np.asarray(v.to_natural())
    v64 = np.asarray(v, np.float64)
    av = ddgemm(a, v64)
    bv = ddgemm(bmat, v64)
    avf = np.asarray(av.hi, np.float64) + np.asarray(av.lo, np.float64)
    bvf = np.asarray(bv.hi, np.float64) + np.asarray(bv.lo, np.float64)
    num = np.einsum("ri,ri->i", v64, avf)
    den = np.einsum("ri,ri->i", v64, bvf)
    lam = num / np.where(den == 0, 1.0, den)
    return lam[:len(np.asarray(lam32))]


def hermitian_eigensolver_refined(
        a, block_size, uplo: str = "L", *, grid=None,
        eigenvalues_index_end: Optional[int] = None,
        **kw) -> Tuple[np.ndarray, np.ndarray]:
    """f32 HEEV on the chip + dd Rayleigh-quotient eigenvalue
    refinement: host f64 in, (f64 eigenvalues, f32 eigenvectors) out.

    The d-type analogue of the reference's
    ``hermitian_eigensolver<Backend, Device, double>`` for eigenvalue
    accuracy (eigenvector accuracy stays f32 — refining vectors needs
    inverse iteration per cluster, out of scope).
    """
    from .eigensolver.eigensolver import hermitian_eigensolver
    a = np.asarray(a, np.float64)
    if uplo == "U":
        afull = _full_sym(a, "U")
    else:
        afull = _full_sym(a, "L")
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    mat = DistMatrix.from_natural(jnp.asarray(afull, jnp.float32),
                                  block_size, grid)
    lam32, vm = hermitian_eigensolver(
        mat, "L", eigenvalues_index_end=eigenvalues_index_end,
        donate_input=True, **kw)
    v = np.asarray(vm.to_natural())
    lam = refine_eigenvalues(afull, np.asarray(lam32), v)
    # Rayleigh quotients of individually-accurate vectors can break the
    # sort by less than the refinement gain; restore monotonicity
    order = np.argsort(lam, kind="stable")
    return lam[order], v[:, order]
