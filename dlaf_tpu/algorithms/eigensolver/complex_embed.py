"""Complex Hermitian eigenproblems on real-only backends (pair of reals).

The axon TPU plugin cannot ``device_put`` complex64 at all and the TPU
has no complex ``geqrf`` lowering, so c64/z128 cannot run the native
complex pipeline on the chip.  The reference runs c/z first-class
everywhere (4-type ETI, e.g. ``src/eigensolver/reduction_to_band/
gpu.cpp``); this module restores that capability TPU-natively via the
standard real embedding:

    A = X + iY  (X = X^T, Y = -Y^T)   ->   M = [[X, -Y], [Y, X]]

``M`` is real symmetric ``2n x 2n`` with each eigenvalue of ``A``
doubled; an M-eigenvector ``v = [p; q]`` maps to the A-eigenvector
``u = p + iq`` (``M v = lam v  =>  A u = lam u``).  The whole real
pipeline (reduction, chase, D&C, back-transforms) runs unchanged on
``M`` — 2x the flops of a native complex solve, but at full MXU rate
and with zero complex lowerings.

Extraction is cluster-robust: XLA's eigh returns arbitrary real bases
inside each doubled eigenspace, so eigenvectors are recovered per
near-degenerate CLUSTER by complex-orthonormalizing the images
``V[:n] + i V[n:]`` (QR) and keeping the cluster's complex dimension.

Encoding happens at the host boundary (numpy), since the platform
cannot transfer complex buffers at all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def embed_hermitian(a: np.ndarray) -> np.ndarray:
    """Complex Hermitian [n, n] -> real symmetric [2n, 2n] block
    embedding ``[[X, -Y], [Y, X]]`` (host-side; the device never sees a
    complex buffer)."""
    a = np.asarray(a)
    X = np.ascontiguousarray(a.real)
    Y = np.ascontiguousarray(a.imag)
    return np.block([[X, -Y], [Y, X]])


def embed_hermitian_interleaved(a: np.ndarray) -> np.ndarray:
    """Complex [n, n] -> real [2n, 2n] INTERLEAVED embedding: entry
    ``a_ij = x + iy`` becomes the 2x2 block ``[[x, -y], [y, x]]`` at
    rows/cols ``(2i, 2i+1) x (2j, 2j+1)``.

    Same ring homomorphism as :func:`embed_hermitian` (similar by the
    perfect-shuffle permutation) but TRIANGULARITY-PRESERVING: a lower
    (upper) triangular complex matrix with REAL diagonal — every
    Cholesky factor — maps to a real lower (upper) triangular matrix.
    Hence ``interleave(L)`` IS the Cholesky factor of
    ``interleave(B)``: the factorized generalized eigensolver
    (``gen_eigensolver/impl.h:81-104``) can reuse a user-supplied
    complex factor on the accelerator without reassembling B.
    """
    a = np.asarray(a)
    n = a.shape[0]
    rdt = np.zeros((), a.dtype).real.dtype
    M = np.empty((2 * n, 2 * n), rdt)
    M[0::2, 0::2] = a.real
    M[1::2, 1::2] = a.real
    M[0::2, 1::2] = -a.imag
    M[1::2, 0::2] = a.imag
    return M


def deinterleave_rows(v2: np.ndarray) -> np.ndarray:
    """Row layout of the interleaved embedding -> the block layout
    ``[p; q]`` that :func:`extract_eigenpairs` expects."""
    v2 = np.asarray(v2)
    return np.concatenate([v2[0::2], v2[1::2]], axis=0)


def extract_eigenpairs(lam2: np.ndarray, v2: np.ndarray, n: int,
                       n_ev: Optional[int] = None,
                       cluster_tol: Optional[float] = None,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(doubled spectrum [2n] ascending, real vectors [2n, >=2*n_ev])
    -> (lam [n_ev], complex vectors [n, n_ev]).

    Every A-eigenvalue appears twice in ``lam2``; within each
    near-degenerate cluster of size 2d the complex eigenspace has
    dimension d, recovered by complex QR of the real vectors' images.
    """
    lam2 = np.asarray(lam2)
    v2 = np.asarray(v2)
    m = lam2.shape[0]
    if m != 2 * n:
        raise ValueError("embedded spectrum must have 2n entries")
    n_ev = n if n_ev is None else int(n_ev)
    cdtype = np.complex64 if v2.dtype == np.float32 else np.complex128
    if cluster_tol is None:
        finite = lam2[np.isfinite(lam2)]     # callers pad tails with inf
        scale = max(float(np.abs(finite).max()) if finite.size else 0.0,
                    1.0)
        cluster_tol = 64 * np.finfo(v2.dtype).eps * scale

    lam = np.empty(n, lam2.dtype)
    U = np.empty((n, n), cdtype)
    out = 0
    i = 0
    while i < m and out < n_ev:
        j = i + 1
        while j < m and lam2[j] - lam2[i] <= cluster_tol:
            j += 1
        d2 = j - i
        # a cluster holds an even number of embedded copies; an odd
        # count can only arise from tol-splitting — widen by one
        if d2 % 2 == 1 and j < m:
            j += 1
            d2 += 1
        d = d2 // 2
        W = v2[:n, i:j] + 1j * v2[n:2 * n, i:j]        # [n, 2d] images
        # complex orthonormal basis of the rank-d image space
        q, r = np.linalg.qr(W.astype(cdtype))
        # column-pivot-free QR can place rank outside the leading d when
        # images are degenerate; select the d columns with the largest
        # |r_kk| (for d2 = 2 this is just "the nonzero one")
        diag = np.abs(np.diag(r))
        keep = np.sort(np.argsort(-diag)[:d])
        take = min(d, n_ev - out)
        U[:, out:out + take] = q[:, keep[:take]]
        lam[out:out + take] = lam2[i:i + 2 * take:2]
        out += take
        i = j
    if out < n_ev:
        raise RuntimeError(
            f"extracted {out} of {n_ev} eigenpairs (cluster pairing "
            f"failed — spectrum not doubled?)")
    # Global complex re-orthonormalization: eigh mixes REAL vectors of
    # near-degenerate eigenvalues by ~eps*||A||/gap, and per-cluster
    # extraction turns that into a complex orthogonality defect of the
    # same size (measured 1e-2 at n = 4096 f32).  One QR restores
    # machine orthogonality while moving each column by O(defect), which
    # perturbs the residual by only O(defect * gap) = O(eps * ||A||).
    q, _ = np.linalg.qr(U[:, :n_ev])
    return lam[:n_ev], q


def needs_real_embedding(dtype) -> bool:
    """True when this backend cannot run the native complex pipeline
    (complex dtype on a non-CPU backend: no complex device_put /
    geqrf)."""
    import jax
    return (np.issubdtype(np.dtype(dtype), np.complexfloating)
            and jax.default_backend() not in ("cpu",))
