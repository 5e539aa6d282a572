"""Symmetric tridiagonal eigensolver — divide & conquer, TPU-native.

Equivalent of the reference's ``tridiagonal_eigensolver``
(``eigensolver/tridiag_solver.h``; impl ``tridiag_solver/impl.h:200-277``
local, ``merge.h:1079`` local / ``merge.h:1810`` distributed; deflation
``rot.h``; secular solve = multi-threaded LAPACK ``laed4`` calls).  The
reference keeps the scalar stages on the host and distributes the
eigenvector gemms; this build vectorizes the scalar stages so the whole
solver is one XLA program:

* Cuppen splits are a static binary tree over the (static) problem size;
  rank-1 diagonal corrections for every split are applied upfront;
* leaves are solved by dense ``eigh`` on small blocks (the reference calls
  LAPACK ``stedc`` per leaf tile, ``impl.h:103-110``);
* deflation (``laed2``) is a ``lax.scan`` over the merged spectrum on the
  O(m) vectors only, emitting a Givens-rotation sequence that is applied to
  Q in a second scan — static shapes, traced deflation count;
* the secular equation (``laed4``) is solved for all roots in column chunks
  (bracketed safeguarded Newton, vectorized over roots);
* the eigenvector update streams the rank-1-update matrix U in column
  chunks computed on the fly from O(m) vectors — **no [m, m] intermediate
  besides Q itself** — and folds every column permutation (pre-sort,
  deflation sort, final sort) into the chunk indexing, so the whole merge
  makes exactly two passes over Q: the rotation scan and the chunked MXU
  gemm ``Qn[:, c] = Q @ u_chunk``.  This is the memory shape that lets the
  top merge of n = 32768 fit (2 x n^2 live instead of >= 4 x), and —
  because all Q updates touch full columns of row-contiguous data — lets a
  row-sharded Q distribute the merge with zero collectives outside the
  gemm, the analogue of the reference's distributed merge
  (``merge.h:1810``: deflation on replicated vectors + distributed
  ``general_multiplication`` on MatrixRef ranges).

Real symmetric only (complex Hermitian inputs are reduced to real
tridiagonal by the band stage's phase transform).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops import tile


#: merges up to this size run as ONE vmapped batch per (size, split)
#: group; bigger groups run as a sequential fori_loop over offsets (same
#: single traced body, none of the batch's x|group| transient memory)
_BATCH_MAX_M = 4096


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


def _secular_block(delta, zsq, rho, K, jblk, dt, iters=90):
    """laed4 for the root block ``jblk`` (global active indices ``< K``).

    Roots of ``1 + rho * sum_i zsq_i / (delta_i - lam) = 0``; returns
    ``(origin[mc], mu[mc])`` with ``lam = origin + mu`` computed in shifted
    (cancellation-free) form.  Vectorized over the block's roots.
    """
    m = delta.shape[0]
    zmask = zsq > 0
    active = jblk < K

    S = jnp.sum(zsq)
    dnext = jnp.concatenate([delta[1:], delta[-1:]])
    ub_last = jnp.take(delta, jnp.maximum(K - 1, 0)) + rho * S
    dj = jnp.take(delta, jnp.minimum(jblk, m - 1))
    dj1 = jnp.where(jblk == (K - 1), ub_last,
                    jnp.take(dnext, jnp.minimum(jblk, m - 1)))

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
        width; log-space halving preserves *relative* accuracy there
        (LAPACK laed4 gets this via its rational initial guess).
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

    dfall = jnp.take(delta, jnp.minimum(jblk, m - 1))
    origin = jnp.where(active, origin, dfall)
    mu = jnp.where(active, mu, jnp.zeros((), dt))
    return origin, mu


def _deflate_vectors(D, z, rho, eps):
    """laed2-style deflation scan on the O(m) vectors.

    Returns ``(flags, z_new, D_new, (li, jj, c, s))``: the Givens sequence
    to apply to Q's columns (index pairs in the *sorted* space), identity
    steps have c = 1, s = 0.  Rotated pairs also rotate their D values
    (LAPACK ``laed2``: the deflated eigenvalue is ``c^2 d_li + s^2 d_j``,
    the surviving pole ``s^2 d_li + c^2 d_j`` — an O(1) correction when
    c or s is extreme; ascending order of the active poles is preserved
    because the new pole value lies between ``d_li`` and ``d_j``).
    """
    m = D.shape[0]
    dt = D.dtype
    zmax = jnp.max(jnp.abs(z))
    dmax = jnp.max(jnp.abs(D))
    tol = 8 * eps * jnp.maximum(dmax, zmax)

    def body(carry, j):
        z, D, flags, last = carry
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

        z = z.at[li].set(jnp.where(do_rot, jnp.zeros((), dt), zlast))
        z = z.at[j].set(jnp.where(small, jnp.zeros((), dt),
                                  jnp.where(do_rot, r, zj)))
        d_defl = c_eff * c_eff * dlast + s_eff * s_eff * dj
        d_keep = s_eff * s_eff * dlast + c_eff * c_eff * dj
        D = D.at[li].set(jnp.where(do_rot, d_defl, dlast))
        D = D.at[j].set(jnp.where(do_rot, d_keep, dj))
        flags = flags.at[li].set(jnp.where(do_rot, 1, jnp.take(flags, li)))
        flags = flags.at[j].set(jnp.where(small, 1, 0))
        last = jnp.where(small, last, j)
        return (z, D, flags, last), (li, j, c_eff, s_eff)

    flags0 = jnp.zeros((m,), jnp.int32)
    (z, D, flags, _), rots = lax.scan(
        body, (z, D, flags0, jnp.int32(-1)), jnp.arange(m, dtype=jnp.int32))
    return flags, z, D, rots


def _apply_rotations(Q, li, jj, c, s, constrain=lambda x: x):
    """Apply the Givens sequence to Q's columns.

    Per-step ``jnp.take`` / ``.at[].set`` lower to gather/scatter, which
    execute at ~1.7 ms PER ROTATION on the v5e (13.7 s for one m=8192
    merge — it was >95% of the D&C wall time).  Row-wise
    ``dynamic_(update_)slice`` on the transposed matrix runs the same
    sequence at ~7 us/step (~200x); the two transposes are one
    bandwidth pass each.  Under a row-sharded Q the transpose makes the
    sharded axis the minor one and every step stays collective-free.
    """
    R = jnp.swapaxes(constrain(Q), 0, 1)
    R = _rotate_rows(R, li, jj, c, s)
    return constrain(jnp.swapaxes(R, 0, 1))


def _rotate_rows(R, li, jj, c, s):
    """The rotation scan itself, acting on rows of the transposed matrix."""
    w = R.shape[1]

    def body(R, rot):
        i, jx, cc, ss = rot
        rl = lax.dynamic_slice(R, (i, 0), (1, w))
        rj = lax.dynamic_slice(R, (jx, 0), (1, w))
        R = lax.dynamic_update_slice(R, cc * rl - ss * rj, (i, 0))
        R = lax.dynamic_update_slice(R, ss * rl + cc * rj, (jx, 0))
        return R, None

    R, _ = lax.scan(body, R, (li, jj, c, s))
    return R


class _MergeInfo(NamedTuple):
    """O(m) outputs of :func:`_merge_analysis` consumed by the Q stages."""
    lam: jnp.ndarray          # merged spectrum, ascending
    rli: jnp.ndarray          # Givens sequence in original-Q column space
    rjj: jnp.ndarray
    rc: jnp.ndarray
    rs: jnp.ndarray
    perm2: jnp.ndarray        # final column order (a-space)
    origin: jnp.ndarray       # secular roots: origin + mu (shifted repr.)
    mu: jnp.ndarray
    Da: jnp.ndarray           # deflation-ordered poles
    zhat: jnp.ndarray         # Gu-Eisenstat stabilized z
    K: jnp.ndarray            # nondeflated count
    inv_p01: jnp.ndarray      # original-Q column -> a-space row


def _merge_analysis(D, z, rho, eps, col_chunk: int = 2048) -> _MergeInfo:
    """Deflation + secular + stabilized-z analysis: everything O(m)."""
    m = D.shape[0]
    dt = D.dtype

    # normalize z so LAPACK tolerance heuristics apply
    znorm2 = jnp.sum(z * z)
    znorm = jnp.sqrt(znorm2)
    zsafe = jnp.where(znorm > 0, znorm, jnp.ones((), dt))
    z = z / zsafe
    rho = rho * znorm2

    perm0 = jnp.argsort(D, stable=True)                  # sorted space
    Ds = jnp.take(D, perm0)
    zs = jnp.take(z, perm0)

    flags, zs, Ds, (rli, rjj, rc, rs) = _deflate_vectors(Ds, zs, rho, eps)

    perm1 = jnp.argsort(flags, stable=True)              # "a"-space:
    Da = jnp.take(Ds, perm1)                             # nondeflated first
    za = jnp.take(zs, perm1)
    K = m - jnp.sum(flags)
    p01 = jnp.take(perm0, perm1)                         # a-col -> Q-col

    mc = min(col_chunk, m)
    nchunks = -(-m // mc)
    jidx = jnp.arange(m)

    # secular roots, chunked over root blocks (shifted representation)
    def sec_chunk(i, acc):
        origin, mu = acc
        c0 = jnp.minimum(i * mc, m - mc)
        jblk = c0 + jidx[:mc]
        ob, mb = _secular_block(Da, za * za, rho, K, jblk, dt)
        return (lax.dynamic_update_slice(origin, ob, (c0,)),
                lax.dynamic_update_slice(mu, mb, (c0,)))

    origin, mu = lax.fori_loop(
        0, nchunks, sec_chunk, (jnp.zeros((m,), dt), jnp.zeros((m,), dt)))
    lam_a = jnp.where(jidx < K, origin + mu, Da)

    # Gu-Eisenstat stabilized z (laed3):
    #   zhat_i^2 = prod_{j<K} (lam_j - delta_i) / prod_{j<K, j!=i} ...
    # accumulated in log space over column chunks
    tiny = jnp.asarray(np.finfo(np.dtype(dt)).tiny, dt)

    def log_chunk(i, acc):
        lognum, logden = acc
        c0 = jnp.minimum(i * mc, m - mc)
        jblk = c0 + jidx[:mc]
        activej = (jblk < K)[None, :]
        ob = jnp.take(origin, jblk)
        mb = jnp.take(mu, jblk)
        lamd = (ob[None, :] - Da[:, None]) + mb[None, :]   # lam_j - delta_i
        num = jnp.sum(jnp.where(activej, jnp.log(jnp.abs(lamd) + tiny), 0),
                      axis=1)
        ddm = jnp.take(Da, jblk)[None, :] - Da[:, None]    # delta_j - delta_i
        offd = jblk[None, :] != jidx[:, None]
        den = jnp.sum(jnp.where(activej & offd,
                                jnp.log(jnp.abs(ddm) + tiny), 0), axis=1)
        return lognum + num, logden + den

    lognum, logden = lax.fori_loop(
        0, nchunks, log_chunk, (jnp.zeros((m,), dt), jnp.zeros((m,), dt)))
    zhat = jnp.sign(za) * jnp.exp(0.5 * (lognum - logden))
    zhat = jnp.where(jidx < K, zhat, jnp.zeros((), dt))

    # final ascending order of the merged spectrum
    perm2 = jnp.argsort(lam_a, stable=True)
    lam = jnp.take(lam_a, perm2)

    inv_p01 = jnp.zeros((m,), p01.dtype).at[p01].set(jidx.astype(p01.dtype))
    return _MergeInfo(lam, jnp.take(perm0, rli), jnp.take(perm0, rjj),
                      rc, rs, perm2, origin, mu, Da, zhat, K, inv_p01)


def _u_chunk(info: _MergeInfo, cols):
    """U_exp[:, cols]: [m, mc] with rows in original-Q column order."""
    dt = info.Da.dtype
    m = info.Da.shape[0]
    jidx = jnp.arange(m)
    p = jnp.take(info.perm2, cols)                 # a-space column
    act = p < info.K
    ob = jnp.take(info.origin, p)
    mb = jnp.take(info.mu, p)
    dmat = (info.Da[:, None] - ob[None, :]) - mb[None, :]  # delta_i - lam_p
    dsafe = jnp.where(jnp.abs(dmat) > 0, dmat, jnp.ones((), dt))
    U = jnp.where(act[None, :] & (jidx < info.K)[:, None],
                  info.zhat[:, None] / dsafe, 0)
    norms = jnp.sqrt(jnp.sum(U * U, axis=0))
    U = U / jnp.where(norms > 0, norms, jnp.ones((), dt))[None, :]
    # deflated columns are basis vectors e_p (a-space)
    U = jnp.where(act[None, :], U,
                  (jidx[:, None] == p[None, :]).astype(dt))
    # expand rows a-space -> original Q columns
    return jnp.take(U, jnp.take(info.inv_p01, jidx), axis=0)


def _merge_gemm(Q, info: _MergeInfo, col_chunk: int,
                constrain=lambda x: x):
    """Streamed eigenvector update: one MXU gemm per final-column chunk."""
    m = info.Da.shape[0]
    dt = Q.dtype
    mc = min(col_chunk, m)
    nchunks = -(-m // mc)
    jidx = jnp.arange(m)
    rows = Q.shape[0]
    Qn = constrain(jnp.zeros((rows, m), dt))

    def gemm_chunk(i, Qn):
        c0 = jnp.minimum(i * mc, m - mc)
        cols = c0 + jidx[:mc]
        Uc = _u_chunk(info, cols)
        blk = tile.dot(Q, Uc)
        return constrain(lax.dynamic_update_slice(Qn, blk, (0, c0)))

    return lax.fori_loop(0, nchunks, gemm_chunk, Qn)


def _merge(D, Q, z, rho, eps, col_chunk: int = 2048,
           constrain=lambda x: x):
    """One Cuppen merge: eigensystem of diag(D) + rho * z z^T.

    ``D``: [m] (each half ascending), ``Q``: [rows, m] block-diagonal
    eigenvectors (rows may exceed m and may be sharded), ``z``: [m].
    Returns (lam ascending, Q_new).
    """
    info = _merge_analysis(D, z, rho, eps, col_chunk)
    Q = _apply_rotations(Q, info.rli, info.rjj, info.rc, info.rs, constrain)
    Qn = _merge_gemm(Q, info, col_chunk, constrain)
    return info.lam, Qn


def tridiagonal_eigensolver(d, e, leaf_size: int = 32,
                            col_chunk: int = 2048,
                            q_sharding=None,
                            row_pad: int = 0,
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full eigensystem of the real symmetric tridiagonal (d, e).

    Returns ``(eigenvalues ascending [n], eigenvectors [n, n])`` with
    column j the eigenvector of eigenvalue j.

    ``q_sharding``: optional ``NamedSharding`` for the eigenvector matrix —
    row sharding (``P(('p','q'), None)``) memory-distributes the merges:
    every per-merge Q operation (column rotations, chunked U gemm) touches
    full columns, so a row-sharded Q runs them without collectives (the
    O(m) deflation/secular work is replicated, exactly like the reference's
    distributed merge keeps its vectors rank-replicated, ``merge.h:1810``).

    Merges whose Q block exceeds ``tune.dc_stage_bytes`` run as separate
    jits that *donate* the eigenvector matrix: inside one monolithic jit
    the top-of-tree merges pin ~4 full matrices at once (measured 15.5 GB
    at n = 32768 f32); staged with donation the peak is ~2 matrices +
    chunk temps.
    """
    d = jnp.asarray(d)
    e = jnp.asarray(e)
    n = d.shape[0]
    dt = d.dtype
    if n == 0:
        return d, jnp.zeros((0, 0), dt)
    if n == 1:
        return d, jnp.ones((1, 1), dt)

    from ...tune import get_tune_parameters
    stage_bytes = get_tune_parameters().dc_stage_bytes
    itemsize = np.dtype(dt).itemsize
    _, merges = _split_tree(n, leaf_size)
    big = [mg for mg in merges
           if stage_bytes and
           (mg[2] - mg[0]) ** 2 * itemsize > stage_bytes]
    big.sort(key=lambda mg: mg[2] - mg[0])
    big_m = (big[0][2] - big[0][0]) if big else n + 1

    lam, Q = _dc_small_jit(d, e, leaf_size=leaf_size, col_chunk=col_chunk,
                           q_sharding=q_sharding, max_m=big_m - 1,
                           row_pad=row_pad)
    for (i0, i1, i2) in big:
        lam, Q = _dc_big_merge(lam, Q, e, (i0, i1, i2), n,
                               col_chunk, q_sharding)
    return lam, Q


def _transposed_sharding(q_sharding):
    if q_sharding is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec
    spec = list(q_sharding.spec) + [None, None]
    return NamedSharding(q_sharding.mesh, PartitionSpec(spec[1], spec[0]))


def _dc_big_merge(lam, Q, e, merge, n, col_chunk, q_sharding):
    """One staged big merge as a pipeline of donated jits.

    Peak per stage is ~2 full Q blocks (input aliased/donated + output),
    vs ~4 when the transpose -> rotate -> transpose -> gemm chain lives
    inside one jit (copy insertion cannot prove the intermediate
    transposes dead across the value chain).

    The merge offset ``i0`` is a RUNTIME scalar, so all same-size merges
    of the tree share one set of compiled stage programs (the per-merge
    keying compiled — and server-side loaded — a separate ~MB-scale
    program per 16384-merge; program load is the dominant non-exec cost
    of the D&C stage on the tunneled chip).
    """
    i0, i1, i2 = merge
    m = i2 - i0
    full = (i0, i2) == (0, n)
    from ...tune import get_tune_parameters
    lean_bytes = get_tune_parameters().dc_lean_bytes
    lean = bool(lean_bytes) and \
        m * m * np.dtype(Q.dtype).itemsize > lean_bytes
    jits = _dc_stage_jits(n, m, i1 - i0, full, col_chunk, q_sharding, lean)
    i0j = jnp.int32(i0)
    info = jits["analysis"](lam, Q, e, i0j)
    if lean:
        # single donated in-place stage: rotations + U gemm over row
        # blocks (peak ~1 full matrix + block transients vs ~2.5 for the
        # transpose-staged pipeline below)
        if full:
            return info.lam, jits["lean"](Q, info)
        Qm = jits["slice"](Q, i0j)
        Qm = jits["lean"](Qm, info)
        return jits["writeback"](lam, Q, info.lam, Qm, i0j)
    Qm = Q if full else jits["slice"](Q, i0j)
    RT = jits["rotate"](Qm, info)       # donates Qm; transposed result
    del Qm
    if full:
        del Q
    Qrot = jits["untranspose"](RT)      # donates RT
    del RT
    Qn = jits["gemm"](Qrot, info)
    del Qrot
    if full:
        return info.lam, Qn
    return jits["writeback"](lam, Q, info.lam, Qn, i0j)


_dc_stage_cache: dict = {}


def _dc_stage_jits(n, m, m1, full, col_chunk, q_sharding, lean=False):
    from ...tune import get_tune_parameters
    lean_rb = int(get_tune_parameters().dc_lean_rowblock)
    key = (n, m, m1, full, col_chunk, q_sharding, lean, lean_rb)
    jits = _dc_stage_cache.get(key)
    if jits is not None:
        return jits
    t_sharding = _transposed_sharding(q_sharding)

    def constrain(x, sh=q_sharding):
        if sh is None:
            return x
        return lax.with_sharding_constraint(x, sh)

    def analysis(lam, Q, e, i0):
        dt = Q.dtype
        eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
        Dm = lax.dynamic_slice(lam, (i0,), (m,))
        em = lax.dynamic_slice(e, (i0 + m1 - 1,), (1,))[0]
        sgn = jnp.where(em < 0, -jnp.ones((), dt), jnp.ones((), dt))
        rho = jnp.abs(em)
        r1 = lax.dynamic_slice(Q, (i0 + m1 - 1, i0), (1, m1))[0]
        r2 = lax.dynamic_slice(Q, (i0 + m1, i0 + m1), (1, m - m1))[0]
        z = jnp.concatenate([r1, sgn * r2])
        return _merge_analysis(Dm, z, rho, eps, col_chunk)

    def slice_(Q, i0):
        return constrain(lax.dynamic_slice(Q, (i0, i0), (m, m)))

    def rotate(Qm, info):
        R = jnp.swapaxes(constrain(Qm), 0, 1)
        R = constrain(R, t_sharding)
        return constrain(_rotate_rows(R, info.rli, info.rjj,
                                      info.rc, info.rs), t_sharding)

    def untranspose(RT):
        return constrain(jnp.swapaxes(RT, 0, 1))

    def gemm(Qrot, info):
        return _merge_gemm(Qrot, info, col_chunk, constrain)

    def lean_update(Q, info):
        """Rotations + U gemm, in place over row blocks (donates Q).

        Qn's rows depend only on Q's same rows (the merge acts on
        columns), so each row block is read, column-rotated via the
        transposed scan, multiplied by the analytic U (rebuilt per block
        and column chunk), and written back — the fori carry stays in
        the donated buffer, so peak memory is one full matrix plus
        O(block) transients.
        """
        rows = Q.shape[0]
        mm = info.Da.shape[0]
        dt = Q.dtype
        mc = min(col_chunk, mm)
        ncc = -(-mm // mc)
        jidx = jnp.arange(mm)
        rb = min(lean_rb, rows)

        def block(r0, Q, h):
            # static r0/h: the blocks unroll as a top-level DUS chain
            # (a post-fori tail write costs a full protective carry copy)
            Rb = lax.slice(Q, (r0, 0), (r0 + h, mm))
            RbT = jnp.swapaxes(Rb, 0, 1)
            RbT = _rotate_rows(RbT, info.rli, info.rjj, info.rc, info.rs)
            Rb = jnp.swapaxes(RbT, 0, 1)

            def cchunk(i, Out):
                c0 = jnp.minimum(i * mc, mm - mc)
                Uc = _u_chunk(info, c0 + jidx[:mc])
                return lax.dynamic_update_slice(
                    Out, tile.dot(Rb, Uc), (jnp.int32(0),
                                            jnp.asarray(c0, jnp.int32)))

            Out = lax.fori_loop(0, ncc, cchunk, jnp.zeros((h, mm), dt))
            return lax.dynamic_update_slice(Q, Out, (r0, 0))

        r0 = 0
        while r0 < rows:
            h = min(rb, rows - r0)
            Q = block(r0, Q, h)
            r0 += h
        return constrain(Q)

    def writeback(lam, Q, lam_m, Qn, i0):
        lam = lax.dynamic_update_slice(lam, lam_m, (i0,))
        return lam, constrain(lax.dynamic_update_slice(Q, Qn, (i0, i0)))

    jits = {
        "analysis": jax.jit(analysis),
        "slice": jax.jit(slice_),
        "rotate": jax.jit(rotate, donate_argnums=(0,)),
        "untranspose": jax.jit(untranspose, donate_argnums=(0,)),
        "gemm": jax.jit(gemm),
        "lean": jax.jit(lean_update, donate_argnums=(0,)),
        "writeback": jax.jit(writeback, donate_argnums=(1,)),
    }
    _dc_stage_cache[key] = jits
    return jits


@partial(jax.jit, static_argnames=("leaf_size", "col_chunk", "q_sharding",
                                   "max_m", "row_pad"))
def _dc_small_jit(d, e, leaf_size: int = 32, col_chunk: int = 2048,
                  q_sharding=None, max_m: int | None = None,
                  row_pad: int = 0,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Leaves + all merges of size <= max_m in one jit.

    Rank-one diagonal corrections for ALL split points (including staged
    big merges) are applied here, once, up front.  ``row_pad`` extra zero
    rows below the eigenvector matrix ride through every merge for free
    (zero rows stay zero under column operations) and save the BT-B2T
    consumer a padded copy.
    """
    n = d.shape[0]
    dt = d.dtype
    eps = jnp.asarray(np.finfo(np.dtype(dt)).eps, dt)
    if max_m is None:
        max_m = n

    def constrain(Q):
        if q_sharding is None:
            return Q
        return lax.with_sharding_constraint(Q, q_sharding)

    leaves, merges = _split_tree(n, leaf_size)
    merges = [mg for mg in merges if mg[2] - mg[0] <= max_m]
    all_merges = _split_tree(n, leaf_size)[1]

    # upfront rank-1 diagonal corrections at every split point (including
    # the staged big merges executed outside this jit)
    dc = d
    for (_, i1, _) in all_merges:
        r = jnp.abs(e[i1 - 1])
        dc = dc.at[i1 - 1].add(-r).at[i1].add(-r)

    lam = jnp.zeros((n,), dt)
    Q = constrain(jnp.zeros((n + row_pad, n), dt))

    # batch equal-size leaves into one vmapped eigh (the reference solves
    # leaves as independent stedc tasks; here one batched MXU/QR kernel);
    # placement is one fori_loop of dynamic-update slices per size bucket
    # (unrolled per-leaf updates cost n/leaf_size compiled ops at scale)
    by_size = {}
    for (i0, i2) in leaves:
        by_size.setdefault(i2 - i0, []).append(i0)
    for ls, starts in by_size.items():
        starts_arr = jnp.asarray(np.asarray(starts, np.int32))
        if ls > 1:
            idx = starts_arr[:, None] + jnp.arange(ls)[None, :]
            dcb = jnp.take(dc, idx)                      # [B, ls]
            eb = jnp.take(e, idx[:, :-1])                # [B, ls-1]
            blocks = jax.vmap(
                lambda d_, e_: jnp.diag(d_) + jnp.diag(e_, 1)
                + jnp.diag(e_, -1))(dcb, eb)
        else:
            blocks = jnp.take(dc, starts_arr)[:, None, None]
        w, v = jnp.linalg.eigh(blocks)

        def place(t, st):
            lam, Q = st
            i0 = starts_arr[t]
            lam = lax.dynamic_update_slice(lam, w[t], (i0,))
            # dynamic_update_slice, not scatter: GSPMD mis-compiles
            # .at[].set on sharded axes (see CLAUDE.md)
            Q = lax.dynamic_update_slice(Q, v[t], (i0, i0))
            return lam, Q

        lam, Q = lax.fori_loop(0, len(starts), place, (lam, Q))
    Q = constrain(Q)

    # group merges by (size, split) — equal-shape merges are disjoint and
    # can run as ONE vmapped (batched) merge; processing groups in
    # increasing size is a valid topological order of the D&C tree.  This
    # keeps the program at O(log n) merge bodies instead of O(n/leaf)
    # (255 separate traces at n = 16384) and batches the small-merge MXU
    # work.  Large merges (the memory-critical top of the tree) stay
    # sequential so the q_sharding constraints apply to them.
    groups = {}
    for (i0, i1, i2) in merges:
        groups.setdefault((i2 - i0, i1 - i0), []).append((i0, i1, i2))

    batch_max_m = _BATCH_MAX_M
    for key in sorted(groups, key=lambda k: k[0]):
        m, m1 = key
        group = groups[key]
        if len(group) == 1:
            (i0, i1, i2) = group[0]
            full = (i0, i2) == (0, n)
            Dm = lam[i0:i2]
            # the root merge IS the whole matrix: slicing it out (and
            # writing it back) would cost two extra n^2 buffers right
            # at the memory peak of the tree
            Qm = Q if full else constrain(
                lax.dynamic_slice(Q, (i0, i0), (m, m)))
            em = e[i1 - 1]
            sgn = jnp.where(em < 0, -jnp.ones((), dt),
                            jnp.ones((), dt))
            rho = jnp.abs(em)
            # z = [last row of Q1, sign * first row of Q2]
            z = jnp.concatenate([Qm[i1 - 1 - i0, : i1 - i0],
                                 sgn * Qm[i1 - i0, i1 - i0:]])
            lam_m, Qn = _merge(Dm, Qm, z, rho, eps,
                               col_chunk=col_chunk,
                               constrain=constrain)
            if full:
                lam, Q = lam_m, constrain(Qn)
            else:
                lam = lam.at[i0:i2].set(lam_m)
                Q = constrain(lax.dynamic_update_slice(Q, Qn, (i0, i0)))
            continue
        if m > batch_max_m:
            # big same-size merges: sequential fori_loop with the offset
            # as a loop value — ONE traced merge body per size, not one
            # per merge (the per-offset unrolling was the bulk of the
            # 53 MB n=32768 program whose server-side load dominated the
            # D&C stage's non-exec wall time), and none of the batched
            # path's x|group| transient memory at the tree's peak
            starts = jnp.asarray(np.asarray([g[0] for g in group],
                                            np.int32))

            def seq_merge(t, st, starts=starts, m=m, m1=m1):
                lam, Q = st
                i0 = starts[t]
                Dm = lax.dynamic_slice(lam, (i0,), (m,))
                Qm = constrain(lax.dynamic_slice(Q, (i0, i0), (m, m)))
                em = lax.dynamic_slice(e, (i0 + m1 - 1,), (1,))[0]
                sgn = jnp.where(em < 0, -jnp.ones((), dt),
                                jnp.ones((), dt))
                rho = jnp.abs(em)
                z = jnp.concatenate([Qm[m1 - 1, :m1], sgn * Qm[m1, m1:]])
                lam_m, Qn = _merge(Dm, Qm, z, rho, eps,
                                   col_chunk=col_chunk)
                lam = lax.dynamic_update_slice(lam, lam_m, (i0,))
                Q = constrain(lax.dynamic_update_slice(Q, Qn, (i0, i0)))
                return lam, Q

            lam, Q = lax.fori_loop(0, len(group), seq_merge, (lam, Q))
            continue

        starts = jnp.asarray(np.asarray([g[0] for g in group], np.int32))
        eidx = jnp.asarray(np.asarray([g[1] - 1 for g in group], np.int32))
        Dm = jax.vmap(
            lambda s: lax.dynamic_slice(lam, (s,), (m,)))(starts)
        Qm = jax.vmap(
            lambda s: lax.dynamic_slice(Q, (s, s), (m, m)))(starts)
        em = jnp.take(e, eidx)
        sgn = jnp.where(em < 0, -jnp.ones((), dt), jnp.ones((), dt))
        rho = jnp.abs(em)
        z = jnp.concatenate([Qm[:, m1 - 1, :m1],
                             sgn[:, None] * Qm[:, m1, m1:]], axis=1)
        lam_b, Qn_b = jax.vmap(
            lambda D_, Q_, z_, r_: _merge(D_, Q_, z_, r_, eps,
                                          col_chunk=col_chunk))(
            Dm, Qm, z, rho)

        def put(t, st, starts=starts, lam_b=lam_b, Qn_b=Qn_b):
            lam, Q = st
            s = starts[t]
            lam = lax.dynamic_update_slice(lam, lam_b[t], (s,))
            Q = lax.dynamic_update_slice(Q, Qn_b[t], (s, s))
            return lam, Q

        lam, Q = lax.fori_loop(0, len(group), put, (lam, Q))
        Q = constrain(Q)

    return lam, Q
