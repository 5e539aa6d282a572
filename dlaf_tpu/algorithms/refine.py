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
* :func:`refine_eigenpairs` — one Ogita-Aishima correction step (dd
  Gram + Rayleigh matrices, first-order eigenvector update through the
  spectral-separation formula): fp64-grade eigenVECTORS too, the
  d-type ``syevd`` vector parity the Rayleigh-quotient path lacks.
* :func:`triangular_solve_refine` / :func:`triangular_inverse_refine` /
  :func:`cholesky_inverse_refine` / :func:`generalized_to_standard_refine`
  — classic iterative refinement (f32 chip solve + dd residual +
  f32 correction solve) for the remaining d-typed dense drivers
  (TRSM / TRTRI / POTRI / HEGST).

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


def _as_dist(x, block_size, grid, **kw):
    return DistMatrix.from_natural(jnp.asarray(np.asarray(x, np.float32)),
                                   block_size, grid, **kw)


def triangular_solve_refine(side: str, uplo: str, trans: str, diag: str,
                            alpha, a, b, block_size, *,
                            grid=None, iters: int = 1,
                            return_history: bool = False):
    """fp64-accurate triangular solve (d-typed TRSM parity).

    ``op(A) X = alpha B`` (side='L') or ``X op(A) = alpha B``
    (side='R') with host f64 triangular ``a`` and rhs ``b``; the f32
    distributed solve runs on the chip, the residual is evaluated at dd
    precision (``ops/ddmm.py``) and each correction is another f32
    solve — classic iterative refinement, quadratically convergent for
    ``cond(A) << 1/eps32``.  Reference d-type ETI:
    ``src/solver/triangular/mc.cpp``.
    """
    if side not in ("L", "R") or uplo not in ("L", "U"):
        raise ValueError("invalid side/uplo")
    if trans not in ("N", "T", "C") or diag not in ("N", "U"):
        raise ValueError("invalid trans/diag")
    if np.iscomplexobj(a) or np.iscomplexobj(b):
        raise ValueError("real-only (z goes through the embedding path)")
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    tri = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        np.fill_diagonal(tri, 1.0)
    opa = tri.T if trans in ("T", "C") else tri
    rhs = float(alpha) * b

    am = _as_dist(tri, block_size, grid, diag_pad=1.0)
    bm = _as_dist(b, block_size, grid)
    x32 = triangular_solver(side, uplo, trans, diag, float(alpha), am, bm)
    n, m = b.shape
    X = np.asarray(x32.to_natural(), np.float64)[:n, :m]
    del bm, x32

    bnorm = np.linalg.norm(rhs)
    hist = []
    for _ in range(max(iters, 0) + (1 if return_history else 0)):
        R = (dd_residual_gemm(opa, X, rhs) if side == "L"
             else dd_residual_gemm(X, opa, rhs))
        Rf = (np.asarray(R.hi, np.float64)
              + np.asarray(R.lo, np.float64))[:n, :m]
        hist.append(float(np.linalg.norm(Rf) / max(bnorm, 1e-300)))
        if len(hist) > iters:
            break
        rm = _as_dist(Rf, block_size, grid)
        dx = triangular_solver(side, uplo, trans, diag, 1.0, am, rm)
        X = X + np.asarray(dx.to_natural(), np.float64)[:n, :m]
        del rm, dx
    if return_history:
        return X, hist
    return X


def triangular_inverse_refine(uplo: str, diag: str, a, block_size, *,
                              grid=None, iters: int = 1,
                              return_history: bool = False):
    """fp64-accurate triangular inverse (d-typed TRTRI parity).

    f32 ``triangular_inverse`` on the chip + Newton steps
    ``X += X (I - A X)`` with the residual at dd precision.  Reference:
    ``src/inverse/triangular/mc.cpp``.
    """
    if uplo not in ("L", "U") or diag not in ("N", "U"):
        raise ValueError("invalid uplo/diag")
    if np.iscomplexobj(a):
        raise ValueError("real-only (z goes through the embedding path)")
    from .inverse.triangular import triangular_inverse
    a = np.asarray(a, np.float64)
    n = a.shape[0]
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    tri = np.tril(a) if uplo == "L" else np.triu(a)
    if diag == "U":
        np.fill_diagonal(tri, 1.0)

    am = _as_dist(tri, block_size, grid, diag_pad=1.0)
    xm = triangular_inverse(uplo, diag, am)
    X = np.asarray(xm.to_natural(), np.float64)[:n, :n]
    X = np.tril(X) if uplo == "L" else np.triu(X)
    del am, xm

    eye = np.eye(n)
    hist = []
    for _ in range(max(iters, 0) + (1 if return_history else 0)):
        R = dd_residual_gemm(tri, X, eye)
        Rf = (np.asarray(R.hi, np.float64)
              + np.asarray(R.lo, np.float64))[:n, :n]
        hist.append(float(np.linalg.norm(Rf) / np.sqrt(n)))
        if len(hist) > iters:
            break
        # dX = X R: O(eps32) correction, f32 relative accuracy suffices
        dX = np.asarray(
            jnp.matmul(jnp.asarray(X, jnp.float32),
                       jnp.asarray(Rf, jnp.float32),
                       precision="highest"), np.float64)
        X = X + (np.tril(dX) if uplo == "L" else np.triu(dX))
    if diag == "U":
        np.fill_diagonal(X, 1.0)
    if return_history:
        return X, hist
    return X


def cholesky_inverse_refine(uplo: str, factor, block_size, *,
                            grid=None, iters: int = 1,
                            return_history: bool = False):
    """fp64-accurate SPD inverse from a Cholesky factor (d-typed POTRI
    parity, factor-input semantics like ``dlaf_c/inverse/cholesky.h``).

    f32 ``inverse_from_cholesky_factor`` on the chip + symmetric Newton
    steps ``X += X (I - A X)`` where ``A X = L (L^T X)`` is evaluated at
    dd precision (two Ozaki products), so no explicit A is formed at
    f64 beyond the factor the caller supplied.
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    if np.iscomplexobj(factor):
        raise ValueError("real-only (z goes through the embedding path)")
    from .inverse.cholesky import inverse_from_cholesky_factor
    f = np.asarray(factor, np.float64)
    n = f.shape[0]
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    L = np.tril(f) if uplo == "L" else np.triu(f).T    # A = L L^T both ways

    fm = _as_dist(np.tril(f) if uplo == "L" else np.triu(f),
                  block_size, grid, diag_pad=1.0)
    xm = inverse_from_cholesky_factor(uplo, fm)
    Xt = np.asarray(xm.to_natural(), np.float64)[:n, :n]
    X = _full_sym(Xt, uplo)
    del fm, xm

    eye = np.eye(n)
    hist = []
    for _ in range(max(iters, 0) + (1 if return_history else 0)):
        W = ddgemm(L.T, X)
        Wf = (np.asarray(W.hi, np.float64)
              + np.asarray(W.lo, np.float64))[:n, :n]
        R = dd_residual_gemm(L, Wf, eye)
        Rf = (np.asarray(R.hi, np.float64)
              + np.asarray(R.lo, np.float64))[:n, :n]
        hist.append(float(np.linalg.norm(Rf) / np.sqrt(n)))
        if len(hist) > iters:
            break
        dX = np.asarray(
            jnp.matmul(jnp.asarray(X, jnp.float32),
                       jnp.asarray(Rf, jnp.float32),
                       precision="highest"), np.float64)
        X = X + (dX + dX.T) / 2
    out = np.tril(X) if uplo == "L" else np.triu(X)
    if return_history:
        return out, hist
    return out


def generalized_to_standard_refine(uplo: str, a, factor, block_size, *,
                                   grid=None, iters: int = 1,
                                   return_history: bool = False):
    """fp64-accurate HEGST (itype=1): ``C = L^-1 A L^-T`` given host f64
    ``a`` (Hermitian, ``uplo`` triangle) and B's Cholesky ``factor``.

    f32 ``generalized_to_standard`` on the chip; refinement evaluates
    ``E = A - L C L^T`` at dd precision and corrects with two f32
    triangular solves ``dC = L^-1 E L^-T``.  Reference d-type ETI:
    ``src/eigensolver/gen_to_std/mc.cpp``.
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    if np.iscomplexobj(a) or np.iscomplexobj(factor):
        raise ValueError("real-only (z goes through the embedding path)")
    from .eigensolver.gen_to_std import generalized_to_standard
    a = np.asarray(a, np.float64)
    f = np.asarray(factor, np.float64)
    n = a.shape[0]
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    afull = _full_sym(a, uplo)
    L = np.tril(f) if uplo == "L" else np.triu(f).T    # A = L L^T both ways

    am = _as_dist(np.tril(afull) if uplo == "L" else np.triu(afull),
                  block_size, grid, diag_pad=1.0)
    fm = _as_dist(np.tril(f) if uplo == "L" else np.triu(f),
                  block_size, grid, diag_pad=1.0)
    cm = generalized_to_standard(uplo, am, fm)
    Ct = np.asarray(cm.to_natural(), np.float64)[:n, :n]
    C = _full_sym(Ct, uplo)
    del am, cm

    Lm32 = _as_dist(L, block_size, grid, diag_pad=1.0)
    anorm = np.linalg.norm(afull)
    hist = []
    for _ in range(max(iters, 0) + (1 if return_history else 0)):
        W = ddgemm(C, L.T)
        Wf = (np.asarray(W.hi, np.float64)
              + np.asarray(W.lo, np.float64))[:n, :n]
        E = dd_residual_gemm(L, Wf, afull)
        Ef = (np.asarray(E.hi, np.float64)
              + np.asarray(E.lo, np.float64))[:n, :n]
        hist.append(float(np.linalg.norm(Ef) / max(anorm, 1e-300)))
        if len(hist) > iters:
            break
        Em = _as_dist(Ef, block_size, grid)
        F1 = triangular_solver("L", "L", "N", "N", 1.0, Lm32, Em)
        F2 = triangular_solver("R", "L", "T", "N", 1.0, Lm32, F1)
        dC = np.asarray(F2.to_natural(), np.float64)[:n, :n]
        C = C + (dC + dC.T) / 2
        del Em, F1, F2
    out = np.tril(C) if uplo == "L" else np.triu(C)
    if return_history:
        return out, hist
    return out


def refine_eigenpairs(a, lam32, v, *, bmat=None,
                      sep_rtol: float = 1e-5, iters: int = 2
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Ogita-Aishima refinement steps: fp64-grade eigenVECTORS (and
    values) from f32 eigenpairs of a real symmetric ``a`` — or of the
    pencil ``(a, bmat)`` in the B inner product when ``bmat`` is given.
    Convergence is quadratic; ``iters=2`` (default) takes the ~1e-4
    worst-case error of the f32 pipeline to ~1e-12.

    With dd-accurate ``R = V^T A V`` and ``S = V^T (B) V`` (Ozaki
    products on the chip), the first-order correction ``V' = V(I + T)``
    uses ``T_ii = E_ii/2``, ``T_ij = (R_ij + lam_j E_ij)/(lam_j -
    lam_i)`` where ``E = I - S`` — the classic spectral-perturbation
    formula; convergence is quadratic, so one step takes eps32-accurate
    vectors to ~eps32^2 residual and orthogonality.  Eigenvalue pairs
    closer than ``sep_rtol * max|lam|`` are treated as a cluster
    (``T_ij = E_ij/2``): orthonormality is restored exactly and any
    rotation inside a tight cluster is a valid eigenbasis.

    Returns host f64 ``(lam, V)``.  Reference parity: d-typed ``syevd``
    eigenvectors (``src/eigensolver/eigensolver/mc.cpp``).
    """
    if np.iscomplexobj(a):
        raise ValueError("real-only (c/z goes through the embedding)")
    a = np.asarray(a, np.float64)
    if isinstance(v, DistMatrix):
        v = np.asarray(v.to_natural())
    V = np.asarray(v, np.float64)
    n, m = V.shape
    b64 = None if bmat is None else np.asarray(bmat, np.float64)

    lam = np.asarray(lam32, np.float64)[:m]
    for _ in range(max(iters, 1)):
        av = ddgemm(a, V)
        AVf = np.asarray(av.hi, np.float64) + np.asarray(av.lo, np.float64)
        r = ddgemm(V.T, AVf)
        Rf = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        if b64 is not None:
            bv = ddgemm(b64, V)
            BVf = (np.asarray(bv.hi, np.float64)
                   + np.asarray(bv.lo, np.float64))
            s = ddgemm(V.T, BVf)
        else:
            s = ddgemm(V.T, V)
        Sf = np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64)

        dS = np.diag(Sf)
        lam = np.diag(Rf) / np.where(dS == 0, 1.0, dS)
        E = np.eye(m) - Sf
        sep = lam[None, :] - lam[:, None]
        thresh = sep_rtol * max(float(np.abs(lam).max()), 1e-300)
        far = np.abs(sep) > thresh
        T = np.where(far, (Rf - lam[None, :] * Sf)
                     / np.where(far, sep, 1.0), E / 2)
        np.fill_diagonal(T, np.diag(E) / 2)
        # dV = V T: the correction is small relative to V, so f32
        # relative accuracy on the product suffices; accumulate in f64
        dV = np.asarray(
            jnp.matmul(jnp.asarray(V, jnp.float32),
                       jnp.asarray(T, jnp.float32),
                       precision="highest"), np.float64)
        V = V + dV
        # block variant for clusters: the separation formula leaves
        # in-cluster mixing (and O(width) value error) untouched;
        # diagonalize each cluster's small Rayleigh block exactly
        srt = np.argsort(lam, kind="stable")
        brk = np.nonzero(np.diff(lam[srt]) > thresh)[0] + 1
        for grp in np.split(srt, brk):
            if len(grp) < 2:
                continue
            # the dV step already restored in-cluster orthonormality
            # (T = E/2 there), turning the cluster's Rayleigh block
            # into P R P with P = I + E_c/2 ~ S_c^-1/2; diagonalizing
            # THAT with a plain (orthogonal) eigh preserves the
            # orthonormality the correction just bought
            Rc = Rf[np.ix_(grp, grp)]
            Pc = np.eye(len(grp)) + (np.eye(len(grp))
                                     - Sf[np.ix_(grp, grp)]) / 2
            Mc = Pc @ Rc @ Pc
            wc, Wc = np.linalg.eigh((Mc + Mc.T) / 2)
            lam[grp] = wc
            V[:, grp] = V[:, grp] @ Wc
    order = np.argsort(lam, kind="stable")
    return lam[order], V[:, order]


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
        refine_vectors: bool = True,
        **kw) -> Tuple[np.ndarray, np.ndarray]:
    """f32 HEEV on the chip + dd refinement: host f64 in, f64
    eigenpairs out — the d-type analogue of the reference's
    ``hermitian_eigensolver<Backend, Device, double>``.

    ``refine_vectors=True`` (default) runs one Ogita-Aishima step
    (:func:`refine_eigenpairs`): fp64-grade eigenVECTORS as well as
    values.  ``refine_vectors=False`` keeps the cheaper dd
    Rayleigh-quotient path (f64 values, f32-grade vectors).
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
    if refine_vectors and v.shape[1] == v.shape[0]:
        # the OA step needs the FULL basis (a partial basis cannot
        # correct out-of-span error components); partial spectra keep
        # Rayleigh-refined values + f32 vectors
        return refine_eigenpairs(afull, np.asarray(lam32), v)
    lam = refine_eigenvalues(afull, np.asarray(lam32), v)
    # Rayleigh quotients of individually-accurate vectors can break the
    # sort by less than the refinement gain; restore monotonicity
    order = np.argsort(lam, kind="stable")
    return lam[order], v[:, order]


def hermitian_generalized_eigensolver_refined(
        a, b, block_size, uplo: str = "L", *, grid=None,
        factorized: bool = False,
        eigenvalues_index_end: Optional[int] = None,
        refine_vectors: bool = True,
        **kw) -> Tuple[np.ndarray, np.ndarray]:
    """f32 generalized HEGV on the chip + dd refinement in the B metric
    (d-type ``sygvd`` parity): host f64 ``(a, b)`` in, f64 eigenpairs
    out, eigenvectors B-orthonormal.  ``factorized=True`` means ``b``
    already holds B's Cholesky factor (reference ``_factorized``
    entry, ``gen_eigensolver/impl.h:81-104``)."""
    from .eigensolver.eigensolver import hermitian_generalized_eigensolver
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    afull = _full_sym(a, uplo)
    if factorized:
        f = np.tril(b) if uplo == "L" else np.triu(b).T
        bfull = f @ f.T
    else:
        bfull = _full_sym(b, uplo)
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    ma = DistMatrix.from_natural(jnp.asarray(afull, jnp.float32),
                                 block_size, grid)
    mb = DistMatrix.from_natural(
        jnp.asarray(np.asarray(b, np.float32)
                    if factorized else bfull.astype(np.float32)),
        block_size, grid)
    lam32, vm = hermitian_generalized_eigensolver(
        ma, mb, uplo, factorized=factorized,
        eigenvalues_index_end=eigenvalues_index_end, **kw)
    v = np.asarray(vm.to_natural())
    if refine_vectors and v.shape[1] == v.shape[0]:
        # full basis required (see hermitian_eigensolver_refined)
        return refine_eigenpairs(afull, np.asarray(lam32), v, bmat=bfull)
    lam = refine_generalized_eigenvalues(afull, bfull, np.asarray(lam32), v)
    order = np.argsort(lam, kind="stable")
    return lam[order], v[:, order]
