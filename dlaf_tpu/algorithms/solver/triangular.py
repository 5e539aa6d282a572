"""Distributed triangular solve (TRSM), all side/uplo/op/diag variants.

TPU-native re-design of the reference's ``solver/triangular/impl.h`` (all 8
Left/Right x Upper/Lower x N/T/C variants, local + distributed,
``solver/triangular.h:31+``).  Left variants run natively as forward/backward
block substitution:

* per block-row ``k``: broadcast the diagonal tile, solve the ``B_k`` row
  strip on its owner grid-row, broadcast it down columns;
* the A panel reaches the update ranks either directly (column strips travel
  along grid rows with row-sets already aligned) or through one natural-order
  masked all-reduce (row strips must cross the diagonal — the analogue of the
  reference's transposed panel broadcast);
* the trailing update is one rank-local matmul per step on the contiguous
  local row suffix/prefix.

Right variants run natively too (``_trsm_right_kernel``/``_dispatch_right``):
a mirrored k-loop of column-strip solves with the update gemm on the local
column suffix/prefix — no global transposes (measured 1.10x the Left time at
n=4096 on the 2x4 mesh, vs 2x full redistributions for the old adjoint
reduction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ...parallel.comm import LocalComm, make_comm
from ...parallel.spmd import (gather_my_cols, gather_my_rows,
                              global_row_index, scatter_cols_to_natural,
                              scatter_rows_to_natural)


def _cdiv(a, b):
    return -(-a // b)


def _trsm_left_kernel(a, b, uplo, trans, diag, dist_a, dist_b, comm):
    """Solve op(tri(A)) X = B in place of ``b`` (already alpha-scaled)."""
    m = dist_a.size[0]
    nb = dist_a.block_size[0]
    mt = dist_a.nr_tiles[0]
    PP, QQ = comm.P, comm.Q
    lmt_a, lnt_a = dist_a.local_nr_tiles
    lmt_b, _ = dist_b.local_nr_tiles
    dtype = b.dtype
    eye = jnp.eye(nb, dtype=dtype)
    bw = b.shape[1]

    forward = (uplo == "L") == (trans == "N")
    order = range(mt) if forward else range(mt - 1, -1, -1)

    for k in order:
        pk, qk = k % PP, k % QQ
        lk, lq = k // PP, k // QQ

        # diagonal tile (pad-safe)
        dslice = lax.slice(a, (lk * nb, lq * nb),
                           ((lk + 1) * nb, (lq + 1) * nb))
        akk = comm.bcast_from(
            jnp.where(comm.is_rank(pk, qk), dslice, jnp.zeros_like(dslice)),
            pk, qk)
        ev = (k * nb + jnp.arange(nb)) < m
        akk = jnp.where(ev[:, None] & ev[None, :], akk, eye)

        # B_k row strip: solve on owner grid-row, broadcast down columns
        bslice = lax.slice(b, (lk * nb, 0), ((lk + 1) * nb, bw))
        xk = tile.trsm("L", uplo, trans, diag, 1.0, akk, bslice)
        xk = jnp.where(ev[:, None], xk, jnp.zeros_like(xk))
        b = b.at[lk * nb:(lk + 1) * nb, :].set(
            jnp.where(comm.in_row(pk) & ev[:, None], xk, bslice))
        xk = comm.bcast_rows_from(
            jnp.where(comm.in_row(pk), xk, jnp.zeros_like(xk)), pk)

        # update range of B rows (conservative static local tile range)
        if forward:
            r0, r1 = (k + 1) // PP, lmt_b
            glo, ghi = (k + 1) * nb, m
        else:
            r0, r1 = 0, min(lmt_b, _cdiv(k, PP))
            glo, ghi = 0, k * nb
        if r0 >= r1:
            continue
        rows = (r1 - r0) * nb
        grow = global_row_index(lmt_a, nb, PP, comm.p, r0)[: rows]
        rmask = (grow >= glo) & (grow < ghi)

        if trans == "N":
            # column strip A[range, k]: rows already aligned with B's rows
            pslice = lax.slice(a, (r0 * nb, lq * nb),
                               (r1 * nb, (lq + 1) * nb))
            apan = comm.bcast_cols_from(
                jnp.where(comm.in_col(qk), pslice, jnp.zeros_like(pslice)),
                qk)
            mpan = jnp.where(rmask, apan, jnp.zeros_like(apan))
        else:
            # row strip A[k, range]: must cross the diagonal -> natural-order
            # masked all-reduce, then each rank gathers its B-row set
            if forward:  # A upper, op(A) lower: cols k+1..  (suffix)
                c0, c1 = (k + 1) // QQ, lnt_a
            else:  # A lower, op(A) upper: cols 0..k-1 (prefix)
                c0, c1 = 0, min(lnt_a, _cdiv(k, QQ))
            if c0 >= c1:
                continue
            # full local suffix [c0, lnt_a); tiles beyond c1 are zeroed by
            # the global-column mask (scatter_cols_to_natural needs panels
            # that extend to the last local tile)
            sslice = lax.slice(a, (lk * nb, c0 * nb),
                               ((lk + 1) * nb, lnt_a * nb))
            sslice = jnp.where(comm.in_row(pk), sslice,
                               jnp.zeros_like(sslice))
            gcol = global_row_index(lnt_a, nb, QQ, comm.q, c0).T
            smask = (gcol >= glo) & (gcol < ghi) & ev[:, None]
            sslice = jnp.where(smask, sslice, jnp.zeros_like(sslice))
            nat = scatter_cols_to_natural(sslice, lnt_a, nb, QQ, comm.q, c0)
            nat = comm.sum_all(nat[:, glo:ghi])
            # pad natural cols to B's row-index space, gather my rows
            zpre = jnp.zeros((nb, glo), dtype)
            natf = jnp.concatenate([zpre, nat], axis=1)
            need = PP * lmt_b * nb
            if natf.shape[1] < need:
                natf = jnp.concatenate(
                    [natf, jnp.zeros((nb, need - natf.shape[1]), dtype)],
                    axis=1)
            else:
                natf = natf[:, :need]
            mine = gather_my_cols(natf, lmt_b, nb, PP, comm.p, r0)
            mpan = mine.T if trans == "T" else tile.adj(mine)
            mpan = jnp.where(rmask, mpan[: rows], jnp.zeros((), dtype))

        bpart = lax.slice(b, (r0 * nb, 0), (r1 * nb, bw))
        b = b.at[r0 * nb:r1 * nb, :].set(bpart - tile.dot(mpan, xk))

    return b


def _trsm_right_kernel(a, b, uplo, trans, diag, dist_a, dist_b, comm):
    """Solve X op(tri(A)) = B in place of ``b`` (already alpha-scaled).

    Mirror of :func:`_trsm_left_kernel` with rows <-> columns (grid axes
    p <-> q): block-column substitution over A's tile columns; the
    ``trans != N`` panel crosses the diagonal through one natural-order
    masked all-reduce (the transposed-panel broadcast analogue).
    """
    n = dist_a.size[0]
    nb = dist_a.block_size[0]
    mt = dist_a.nr_tiles[0]
    PP, QQ = comm.P, comm.Q
    lmt_a, lnt_a = dist_a.local_nr_tiles
    _, lnt_b = dist_b.local_nr_tiles
    dtype = b.dtype
    eye = jnp.eye(nb, dtype=dtype)
    bh = b.shape[0]

    forward = (uplo == "U") == (trans == "N")
    order = range(mt) if forward else range(mt - 1, -1, -1)

    for k in order:
        pk, qk = k % PP, k % QQ
        lk, lq = k // PP, k // QQ

        dslice = lax.slice(a, (lk * nb, lq * nb),
                           ((lk + 1) * nb, (lq + 1) * nb))
        akk = comm.bcast_from(
            jnp.where(comm.is_rank(pk, qk), dslice, jnp.zeros_like(dslice)),
            pk, qk)
        ev = (k * nb + jnp.arange(nb)) < n
        akk = jnp.where(ev[:, None] & ev[None, :], akk, eye)

        # B_k column strip: solve on owner grid-col, broadcast along rows
        bslice = lax.slice(b, (0, lq * nb), (bh, (lq + 1) * nb))
        xk = tile.trsm("R", uplo, trans, diag, 1.0, akk, bslice)
        xk = jnp.where(ev[None, :], xk, jnp.zeros_like(xk))
        b = b.at[:, lq * nb:(lq + 1) * nb].set(
            jnp.where(comm.in_col(qk) & ev[None, :], xk, bslice))
        xk = comm.bcast_cols_from(
            jnp.where(comm.in_col(qk), xk, jnp.zeros_like(xk)), qk)

        if forward:
            c0, c1 = (k + 1) // QQ, lnt_b
            glo, ghi = (k + 1) * nb, n
        else:
            c0, c1 = 0, min(lnt_b, _cdiv(k, QQ))
            glo, ghi = 0, k * nb
        if c0 >= c1:
            continue
        cols = (c1 - c0) * nb
        gcol = global_row_index(lnt_a, nb, QQ, comm.q, c0)[: cols].T
        cmask = (gcol >= glo) & (gcol < ghi)            # [1, cols]

        if trans == "N":
            # row strip A[k, range]: columns already aligned with B's cols
            pslice = lax.slice(a, (lk * nb, c0 * nb),
                               ((lk + 1) * nb, c1 * nb))
            apan = comm.bcast_rows_from(
                jnp.where(comm.in_row(pk), pslice, jnp.zeros_like(pslice)),
                pk)
            mpan = jnp.where(cmask & ev[:, None], apan,
                             jnp.zeros_like(apan))
        else:
            # column strip A[range, k]: crosses the diagonal
            if forward:
                r0 = (k + 1) // PP
            else:
                r0 = 0
            if r0 >= lmt_a:
                continue
            sslice = lax.slice(a, (r0 * nb, lq * nb),
                               (lmt_a * nb, (lq + 1) * nb))
            sslice = jnp.where(comm.in_col(qk), sslice,
                               jnp.zeros_like(sslice))
            grow = global_row_index(lmt_a, nb, PP, comm.p, r0)
            smask = (grow >= glo) & (grow < ghi) & ev[None, :]
            sslice = jnp.where(smask, sslice, jnp.zeros_like(sslice))
            nat = scatter_rows_to_natural(sslice, lmt_a, nb, PP, comm.p, r0)
            nat = comm.sum_all(nat[glo:ghi])             # [ghi-glo, nb]
            zpre = jnp.zeros((glo, nb), dtype)
            natf = jnp.concatenate([zpre, nat], axis=0)
            need = QQ * lnt_b * nb
            if natf.shape[0] < need:
                natf = jnp.concatenate(
                    [natf, jnp.zeros((need - natf.shape[0], nb), dtype)],
                    axis=0)
            else:
                natf = natf[:need]
            mine = gather_my_rows(natf, lnt_b, nb, QQ, comm.q, c0)
            mpan = mine.T if trans == "T" else tile.adj(mine)
            mpan = jnp.where(cmask, mpan[:, : cols], jnp.zeros((), dtype))

        bpart = lax.slice(b, (0, c0 * nb), (bh, c1 * nb))
        b = b.at[:, c0 * nb:c1 * nb].set(bpart - tile.dot(xk, mpan))

    return b


def _dispatch_left(a_mat, b_mat, uplo, trans, diag, alpha):
    bdata = b_mat.data * jnp.asarray(alpha, b_mat.dtype)
    if a_mat.grid is None:
        # single-device fast path: the XLA triangular_solve HLO beats the
        # unrolled k-loop on one chip
        from ..internal import natural_exact, store_natural_exact
        na = natural_exact(a_mat)
        nb_ = natural_exact(b_mat.with_data(bdata))
        out = lax.linalg.triangular_solve(
            na, nb_, left_side=True, lower=(uplo == "L"),
            transpose_a=(trans in ("T", "C")), conjugate_a=(trans == "C"),
            unit_diagonal=(diag == "U"))
        return store_natural_exact(b_mat, out)
    grid = a_mat.grid
    fn = jax.shard_map(
        lambda ad, bd: _trsm_left_kernel(ad, bd, uplo, trans, diag,
                                         a_mat.dist, b_mat.dist,
                                         make_comm(grid)),
        mesh=grid.mesh, in_specs=(P("p", "q"), P("p", "q")),
        out_specs=P("p", "q"))
    return b_mat.with_data(fn(a_mat.data, bdata))


@partial(jax.jit, static_argnames=("side", "uplo", "trans", "diag"))
def triangular_solver(side: str, uplo: str, trans: str, diag: str,
                      alpha, a: DistMatrix, b: DistMatrix) -> DistMatrix:
    """Solve op(tri(A)) X = alpha B (Left) or X op(tri(A)) = alpha B (Right).

    Equivalent of ``dlaf::triangular_solver`` (``solver/triangular.h``);
    returns X as a new DistMatrix with B's distribution.
    """
    if side not in ("L", "R") or uplo not in ("L", "U") or \
            trans not in ("N", "T", "C") or diag not in ("N", "U"):
        raise ValueError("invalid side/uplo/trans/diag")
    if a.size[0] != a.size[1]:
        raise ValueError("A must be square")
    if a.block_size[0] != a.block_size[1]:
        raise ValueError("A must have square blocks")
    k = a.size[0]
    if side == "L" and b.size[0] != k:
        raise ValueError("size mismatch")
    if side == "R" and b.size[1] != k:
        raise ValueError("size mismatch")

    if side == "L":
        return _dispatch_left(a, b, uplo, trans, diag, alpha)
    return _dispatch_right(a, b, uplo, trans, diag, alpha)


def _dispatch_right(a_mat, b_mat, uplo, trans, diag, alpha):
    """Native Right k-loop (reference ``solver/triangular/impl.h`` Right
    variants) — no global adjoints, unlike the round-1 reduction-to-Left."""
    bdata = b_mat.data * jnp.asarray(alpha, b_mat.dtype)
    if a_mat.grid is None:
        from ..internal import natural_exact, store_natural_exact
        na = natural_exact(a_mat)
        nb_ = natural_exact(b_mat.with_data(bdata))
        out = lax.linalg.triangular_solve(
            na, nb_, left_side=False, lower=(uplo == "L"),
            transpose_a=(trans in ("T", "C")), conjugate_a=(trans == "C"),
            unit_diagonal=(diag == "U"))
        return store_natural_exact(b_mat, out)
    grid = a_mat.grid
    fn = jax.shard_map(
        lambda ad, bd: _trsm_right_kernel(ad, bd, uplo, trans, diag,
                                          a_mat.dist, b_mat.dist,
                                          make_comm(grid)),
        mesh=grid.mesh, in_specs=(P("p", "q"), P("p", "q")),
        out_specs=P("p", "q"))
    return b_mat.with_data(fn(a_mat.data, bdata))
