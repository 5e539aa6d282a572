"""Symmetric tridiagonal eigensolver — divide & conquer, TPU-native.

Equivalent of the reference's ``tridiagonal_eigensolver``
(``eigensolver/tridiag_solver.h``; impl ``tridiag_solver/impl.h:200-277``
local, ``merge.h:1079``; deflation ``rot.h``; secular solve = multi-threaded
LAPACK ``laed4`` calls).  The reference keeps the scalar stages on the host
and distributes the eigenvector gemms; this build vectorizes the scalar
stages themselves so the whole solver is one XLA program:

* Cuppen splits are a static binary tree over the (static) problem size;
  rank-1 diagonal corrections for every split are applied upfront;
* leaves are solved by dense ``eigh`` on small blocks (the reference calls
  LAPACK ``stedc`` per leaf tile, ``impl.h:103-110``);
* deflation (``laed2``) is a ``lax.scan`` over the merged spectrum carrying
  Givens-rotated columns and masks — static shapes, traced deflation count;
* the secular equation (``laed4``) is solved for ALL roots simultaneously:
  bracketed safeguarded Newton, vectorized over roots, fixed iteration count
  — the reference parallelizes this over CPU threads
  (``tridiag_rank1_num_threads``), here it is one [m, m] VPU kernel;
* eigenvectors use the Gu-Eisenstat stabilized z (``laed3``) and assemble
  with an MXU gemm per merge.

Real symmetric only (complex Hermitian inputs are reduced to real tridiagonal
by the band stage's phase transform).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops import tile


def _split_tree(n: int, leaf: int):
    """Static list of split points; returns (leaves, merges bottom-up)."""
    leaves = []
    merges = []

    def rec(i0, i2):
        if i2 - i0 <= leaf:
            leaves.append((i0, i2))
            return
        mid = i0 + (i2 - i0 + 1) // 2
        rec(i0, mid)
        rec(mid, i2)
        merges.append((i0, mid, i2))

    rec(0, n)
    # merges listed deepest-first because children append before parents
    return leaves, merges


def _secular_solve(delta, zsq, rho, K, iters=90):
    """All roots of ``1 + rho * sum_i zsq_i / (delta_i - lam) = 0``.

    ``delta``: [m] poles, slots < K active ascending (zsq may be 0 on any
    slot).  Returns ``(lam, dmat)`` with ``dmat[i, j] = delta_i - lam_j``
    computed in shifted (cancellation-free) form.  LAPACK ``laed4``
    equivalent, vectorized over all roots.
    """
    m = delta.shape[0]
    dt = delta.dtype
    j = jnp.arange(m)
    active = j < K
    zmask = zsq > 0

    S = jnp.sum(zsq)
    dnext = jnp.concatenate([delta[1:], delta[-1:]])
    ub_last = jnp.take(delta, jnp.maximum(K - 1, 0)) + rho * S
    dj1 = jnp.where(j == (K - 1), ub_last, dnext)
    dj = delta

    def f(lam):
        diff = delta[:, None] - lam[None, :]
        safe = jnp.where(zmask[:, None], diff, jnp.ones((), dt))
        return 1 + rho * jnp.sum(
            jnp.where(zmask[:, None], zsq[:, None] / safe, 0), axis=0)

    mid = 0.5 * (dj + dj1)
    use_left = f(mid) > 0          # root in (dj, mid): shift origin to dj
    origin = jnp.where(use_left, dj, dj1)
    lo = jnp.where(use_left, jnp.zeros((), dt), mid - dj1)
    hi = jnp.where(use_left, mid - dj, jnp.zeros((), dt))

    diffs0 = delta[:, None] - origin[None, :]
    sgn = jnp.where(use_left, jnp.ones((), dt), -jnp.ones((), dt))

    def midpoint(lo, hi):
        """Arithmetic bisection away from the pole, geometric near it.

        Roots can sit at |mu| ~ rho*z_i^2, many orders below the bracket
        width; log-space halving preserves *relative* accuracy there (LAPACK
        laed4 gets this via its rational initial guess).
        """
        a = jnp.minimum(jnp.abs(lo), jnp.abs(hi))
        bb = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
        bb = jnp.where(bb > 0, bb, jnp.ones((), dt))
        # a == 0: descend two decades per step; else true log bisection
        geo = jnp.sqrt(jnp.maximum(a, bb * jnp.asarray(1e-4, dt)) * bb)
        mid_abs = jnp.where(a > 0.01 * bb, 0.5 * (a + bb), geo)
        return sgn * mid_abs

    def body(t, carry):
        mu, lo, hi = carry
        denom = diffs0 - mu[None, :]
        safe = jnp.where(zmask[:, None], denom, jnp.ones((), dt))
        terms = jnp.where(zmask[:, None], zsq[:, None] / safe, 0)
        g = 1 + rho * jnp.sum(terms, axis=0)
        gp = rho * jnp.sum(terms / safe, axis=0)
        hi = jnp.where(g > 0, mu, hi)
        lo = jnp.where(g > 0, lo, mu)
        newton = mu - g / jnp.where(gp > 0, gp, jnp.ones((), dt))
        ok = (newton > lo) & (newton < hi) & jnp.isfinite(newton)
        mu = jnp.where(ok, newton, midpoint(lo, hi))
        return mu, lo, hi

    mu0 = midpoint(lo, hi)
    mu, _, _ = lax.fori_loop(0, iters, body, (mu0, lo, hi))

    lam = jnp.where(active, origin + mu, delta)
    dmat = jnp.where(active[None, :], diffs0 - mu[None, :],
                     delta[:, None] - delta[None, :])
    return lam, dmat


def _deflate(D, z, Q, rho, eps):
    """laed2-style deflation scan.  Returns (flags, z, Q) post-rotation."""
    m = D.shape[0]
    dt = D.dtype
    zmax = jnp.max(jnp.abs(z))
    dmax = jnp.max(jnp.abs(D))
    tol = 8 * eps * jnp.maximum(dmax, zmax)

    def body(carry, j):
        z, Q, flags, last = carry
        zj = jnp.take(z, j)
        dj = jnp.take(D, j)
        small = rho * jnp.abs(zj) <= tol
        has_last = last >= 0
        li = jnp.maximum(last, 0)
        zlast = jnp.take(z, li)
        dlast = jnp.take(D, li)
        r = jnp.hypot(zlast, zj)
        rs = jnp.where(r > 0, r, jnp.ones((), dt))
        c = jnp.where(r > 0, zj / rs, jnp.ones((), dt))
        s = jnp.where(r > 0, zlast / rs, jnp.zeros((), dt))
        close = has_last & (jnp.abs((dj - dlast) * c * s) <= tol)
        do_rot = (~small) & close

        c_eff = jnp.where(do_rot, c, jnp.ones((), dt))
        s_eff = jnp.where(do_rot, s, jnp.zeros((), dt))
        qlast = jnp.take(Q, li, axis=1)
        qj = jnp.take(Q, j, axis=1)
        Q = Q.at[:, li].set(c_eff * qlast - s_eff * qj)
        Q = Q.at[:, j].set(s_eff * qlast + c_eff * qj)

        z = z.at[li].set(jnp.where(do_rot, jnp.zeros((), dt), zlast))
        z = z.at[j].set(jnp.where(small, jnp.zeros((), dt),
                                  jnp.where(do_rot, r, zj)))
        flags = flags.at[li].set(jnp.where(do_rot, 1, jnp.take(flags, li)))
        flags = flags.at[j].set(jnp.where(small, 1, 0))
        last = jnp.where(small, last, j)
        return (z, Q, flags, last), None

    flags0 = jnp.zeros((m,), jnp.int32)
    (z, Q, flags, _), _ = lax.scan(body, (z, Q, flags0, jnp.int32(-1)),
                                   jnp.arange(m, dtype=jnp.int32))
    return flags, z, Q


def _merge(D, Q, z, rho, eps):
    """One Cuppen merge: eigensystem of diag(D) + rho * z z^T (rho != 0).

    ``D``: [m] (each half ascending), ``Q``: [m, m] block-diagonal
    eigenvectors, ``z``: [m].  Returns (lam ascending, Q_new).
    """
    m = D.shape[0]
    dt = D.dtype

    # normalize z so LAPACK tolerance heuristics apply
    znorm2 = jnp.sum(z * z)
    znorm = jnp.sqrt(znorm2)
    zsafe = jnp.where(znorm > 0, znorm, jnp.ones((), dt))
    z = z / zsafe
    rho = rho * znorm2

    perm0 = jnp.argsort(D, stable=True)
    D = jnp.take(D, perm0)
    z = jnp.take(z, perm0)
    Q = jnp.take(Q, perm0, axis=1)

    flags, z, Q = _deflate(D, z, Q, rho, eps)

    perm1 = jnp.argsort(flags, stable=True)
    Da = jnp.take(D, perm1)
    za = jnp.take(z, perm1)
    Qa = jnp.take(Q, perm1, axis=1)
    K = m - jnp.sum(flags)

    lam, dmat = _secular_solve(Da, za * za, rho, K)

    # Gu-Eisenstat stabilized z (laed3): zhat_i^2 =
    #   prod_j (lam_j - delta_i) / prod_{j != i} (delta_j - delta_i)
    jidx = jnp.arange(m)
    activej = (jidx < K)[None, :]
    activei = (jidx < K)[:, None]
    lamd = -dmat                                  # lam_j - delta_i
    tiny = jnp.asarray(np.finfo(np.dtype(dt)).tiny, dt)
    lognum = jnp.sum(jnp.where(activej, jnp.log(jnp.abs(lamd) + tiny), 0),
                     axis=1)
    ddm = Da[None, :] - Da[:, None]               # delta_j - delta_i
    offdiag = jidx[None, :] != jidx[:, None]
    logden = jnp.sum(jnp.where(activej & offdiag,
                               jnp.log(jnp.abs(ddm) + tiny), 0), axis=1)
    zhat = jnp.sign(za) * jnp.exp(0.5 * (lognum - logden))
    zhat = jnp.where(jidx < K, zhat, jnp.zeros((), dt))

    # eigenvector matrix U[i, j] = zhat_i / dmat[i, j], columns normalized
    dsafe = jnp.where(jnp.abs(dmat) > 0, dmat, jnp.ones((), dt))
    U = jnp.where(activei & activej, zhat[:, None] / dsafe, 0)
    norms = jnp.sqrt(jnp.sum(U * U, axis=0))
    U = U / jnp.where(norms > 0, norms, jnp.ones((), dt))[None, :]
    U = jnp.where(activej, U, jnp.eye(m, dtype=dt))   # deflated cols = e_j

    Qn = tile.dot(Qa, U)
    perm2 = jnp.argsort(lam, stable=True)
    return jnp.take(lam, perm2), jnp.take(Qn, perm2, axis=1)


@partial(jax.jit, static_argnames=("leaf_size",))
def tridiagonal_eigensolver(d, e, leaf_size: int = 32
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full eigensystem of the real symmetric tridiagonal (d, e).

    Returns ``(eigenvalues ascending [n], eigenvectors [n, n])`` with
    column j the eigenvector of eigenvalue j.
    """
    d = jnp.asarray(d)
    e = jnp.asarray(e)
    n = d.shape[0]
    dt = d.dtype
    eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
    if n == 0:
        return d, jnp.zeros((0, 0), dt)
    if n == 1:
        return d, jnp.ones((1, 1), dt)

    leaves, merges = _split_tree(n, leaf_size)

    # upfront rank-1 diagonal corrections at every split point
    dc = d
    for (_, i1, _) in merges:
        r = jnp.abs(e[i1 - 1])
        dc = dc.at[i1 - 1].add(-r).at[i1].add(-r)

    lam = jnp.zeros((n,), dt)
    Q = jnp.zeros((n, n), dt)

    def leaf_block(i0, ls):
        block = jnp.diag(dc[i0:i0 + ls])
        if ls > 1:
            eb = e[i0:i0 + ls - 1]
            block = block + jnp.diag(eb, 1) + jnp.diag(eb, -1)
        return block

    # batch equal-size leaves into one vmapped eigh (the reference solves
    # leaves as independent stedc tasks; here one batched MXU/QR kernel)
    by_size = {}
    for (i0, i2) in leaves:
        by_size.setdefault(i2 - i0, []).append(i0)
    for ls, starts in by_size.items():
        blocks = jnp.stack([leaf_block(i0, ls) for i0 in starts])
        w, v = jnp.linalg.eigh(blocks)
        for t, i0 in enumerate(starts):
            lam = lam.at[i0:i0 + ls].set(w[t])
            Q = Q.at[i0:i0 + ls, i0:i0 + ls].set(v[t])

    for (i0, i1, i2) in merges:
        m = i2 - i0
        Dm = lam[i0:i2]
        Qm = Q[i0:i2, i0:i2]
        em = e[i1 - 1]
        sgn = jnp.where(em < 0, -jnp.ones((), dt), jnp.ones((), dt))
        rho = jnp.abs(em)
        # z = [last row of Q1, sign * first row of Q2]
        z = jnp.concatenate([Qm[i1 - 1 - i0, : i1 - i0],
                             sgn * Qm[i1 - i0, i1 - i0:]])
        lam_m, Qn = _merge(Dm, Qm, z, rho, eps)
        lam = lam.at[i0:i2].set(lam_m)
        Q = Q.at[i0:i2, i0:i2].set(Qn)

    return lam, Q
