"""Distributed tiled Cholesky factorization (POTRF).

TPU-native re-design of the reference's right-looking tiled Cholesky
(``factorization/cholesky/impl.h:151-189`` local, ``:192-313`` distributed):

* the reference's sequential scheduling loop that wires a sender graph per
  tile becomes a Python loop *unrolled at trace time* into one XLA program —
  XLA's async collectives + latency-hiding scheduler provide the
  communication/computation overlap that pika's task graph and the
  ``RoundRobin`` lookahead panels (``impl.h:218-221``) provide there;
* ``potrf`` of the diagonal tile is broadcast to the full grid and factored
  redundantly on every rank (nb^3/3 redundant flops buy one fewer collective
  hop than the reference's col-broadcast at ``impl.h:247-251``);
* the panel trsm (``impl.h:254-262``) runs on column-owner ranks as one fused
  ``[rows x nb]`` triangular solve;
* the row + transposed-column panel broadcast (``broadcast_panel.h:107``) is a
  single masked all-reduce of the panel in natural row order (see
  ``parallel/spmd.py``), after which each rank slices out both its row-set and
  its column-set;
* the trailing update (herk diag + gemm off-diag tiles, ``impl.h:273-299``)
  is ONE rank-local matmul over the contiguous local trailing block — the
  block-cyclic layout makes the trailing region a contiguous suffix of the
  local matrix, so no per-tile loop is needed.

Works on padded matrices: rows/cols beyond ``m`` are masked out of panels, so
pad content never contaminates results.
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
from ...parallel.spmd import (gather_my_rows, global_row_index,
                              scatter_rows_to_natural)


def _cholesky_lower_kernel(a, dist, comm):
    """Rank-local lower-Cholesky body; ``a`` is the local storage block."""
    m, n = dist.size
    mb, nb = dist.block_size
    from ...utils.asserts import dlaf_assert
    dlaf_assert(mb == nb, "cholesky requires square blocks", mb=mb, nb=nb)
    PP, QQ = comm.P, comm.Q
    lmt, lnt = dist.local_nr_tiles
    nrtile = dist.nr_tiles[0]
    dtype = a.dtype
    eye = jnp.eye(nb, dtype=dtype)
    tril_mask = tile._row_ge_col(nb, nb)
    from ...tune import get_tune_parameters
    depth = get_tune_parameters().herk_split_depth

    for k in range(nrtile):
        pk, qk = k % PP, k % QQ
        lk, lq = k // PP, k // QQ

        # -- diagonal tile: bcast to all, factor redundantly ------------------
        dslice = lax.slice(a, (lk * nb, lq * nb),
                           ((lk + 1) * nb, (lq + 1) * nb))
        dtile = comm.bcast_from(
            jnp.where(comm.is_rank(pk, qk), dslice, jnp.zeros_like(dslice)),
            pk, qk)
        ev = (k * nb + jnp.arange(nb)) < m
        vmask = ev[:, None] & ev[None, :]
        lkk = tile.potrf(jnp.where(vmask, dtile, eye), uplo="L")
        wd = tril_mask & vmask & comm.is_rank(pk, qk)
        a = a.at[lk * nb:(lk + 1) * nb, lq * nb:(lq + 1) * nb].set(
            jnp.where(wd, lkk, dslice))

        # -- panel solve + broadcast + trailing update ------------------------
        r0 = (k + 1) // PP  # conservative local start of trailing rows
        c0 = (k + 1) // QQ
        if r0 >= lmt:
            continue

        pslice = lax.slice(a, (r0 * nb, lq * nb), (lmt * nb, (lq + 1) * nb))
        pan = tile.trsm("R", "L", "C", "N", 1.0, lkk, pslice)
        grow = global_row_index(lmt, nb, PP, comm.p, r0)  # [rows, 1]
        gcol = k * nb + jnp.arange(nb)[None, :]
        pmask = (grow >= (k + 1) * nb) & (grow < m) & (gcol < n)
        pan = jnp.where(pmask, pan, jnp.zeros_like(pan))
        a = a.at[r0 * nb:, lq * nb:(lq + 1) * nb].set(
            jnp.where(pmask & comm.in_col(qk), pan, pslice))

        if c0 >= lnt:
            continue

        # natural-order panel all-reduce == row bcast + transposed col bcast
        contrib = jnp.where(comm.in_col(qk), pan, jnp.zeros_like(pan))
        nat = scatter_rows_to_natural(contrib, lmt, nb, PP, comm.p, r0)
        w = comm.sum_all(nat[(k + 1) * nb:])

        zhead = jnp.zeros(((k + 1) * nb, nb), dtype=dtype)
        wnat = jnp.concatenate([zhead, w], axis=0)  # [PP*lmt*nb, nb]
        wrow = gather_my_rows(wnat, lmt, nb, PP, comm.p, r0)
        ncols = QQ * lnt * nb
        if wnat.shape[0] < ncols:
            wnat_c = jnp.concatenate(
                [wnat, jnp.zeros((ncols - wnat.shape[0], nb), dtype)], axis=0)
        else:
            wnat_c = wnat[:ncols]
        wcol = gather_my_rows(wnat_c, lnt, nb, QQ, comm.q, c0)

        trail = lax.slice(a, (r0 * nb, c0 * nb), (lmt * nb, lnt * nb))
        trail = _trailing_update(trail, wrow, wcol, r0, c0, nb, PP, QQ,
                                 depth)
        a = a.at[r0 * nb:, c0 * nb:].set(trail)

    return a


def _trailing_update(tr, wr, wc, rt0, ct0, nb, PP, QQ, depth):
    """Triangle-aware trailing update ``tr - wr wc^H`` on the local block.

    The reference updates herk-diag/gemm-offdiag tiles of the lower
    triangle only (``cholesky/impl.h:273-299``); the dense local-rectangle
    form costs 2x the flops.  This recursion prunes sub-blocks whose every
    tile is strictly above the global diagonal, using *rank-uniform* global
    tile bounds (local tile r on grid-row p is global ``r*P + p`` — bounds
    over all p keep the SPMD program identical on every rank).  Pruned
    regions keep their (insignificant, upper-triangle) content.  Depth from
    ``tune.herk_split_depth``; wasted flops ~ 2^-depth of the rectangle.
    """
    nr = tr.shape[0] // nb
    nc = tr.shape[1] // nb
    if nr == 0 or nc == 0:
        return tr
    # strictly-upper on every rank: max global row < min global col
    if (rt0 + nr - 1) * PP + (PP - 1) < ct0 * QQ:
        return tr
    if depth <= 0 or (nr <= 1 and nc <= 1):
        return tr - tile.dot(wr, tile.adj(wc))
    if nc >= nr:
        h = nc // 2
        left = _trailing_update(tr[:, : h * nb], wr, wc[: h * nb],
                                rt0, ct0, nb, PP, QQ, depth - 1)
        right = _trailing_update(tr[:, h * nb:], wr, wc[h * nb:],
                                 rt0, ct0 + h, nb, PP, QQ, depth - 1)
        return jnp.concatenate([left, right], axis=1)
    h = nr // 2
    top = _trailing_update(tr[: h * nb], wr[: h * nb], wc,
                           rt0, ct0, nb, PP, QQ, depth - 1)
    bot = _trailing_update(tr[h * nb:], wr[h * nb:], wc,
                           rt0 + h, ct0, nb, PP, QQ, depth - 1)
    return jnp.concatenate([top, bot], axis=0)


@partial(jax.jit, static_argnames=("uplo",))
def cholesky_factorization(mat: DistMatrix, uplo: str = "L") -> DistMatrix:
    """Cholesky factorization of a Hermitian positive-definite matrix.

    Equivalent of ``dlaf::cholesky_factorization<B>`` (local and
    ``CommunicatorGrid`` overloads, ``factorization/cholesky.h``): returns a
    new :class:`DistMatrix` whose ``uplo`` triangle holds the factor; like
    LAPACK, the opposite triangle is not referenced on input (and is not
    preserved on output — unlike LAPACK the strict other triangle may be
    overwritten by trailing updates).
    """
    if uplo not in ("L", "U"):
        raise ValueError(f"invalid uplo {uplo!r}")
    if mat.size[0] != mat.size[1]:
        raise ValueError("cholesky requires a square matrix")

    if uplo == "U":
        from ..auxiliary.transpose import adjoint
        return adjoint(cholesky_factorization(adjoint(mat), "L"))

    from ...tune import get_tune_parameters
    from ..internal import natural_exact, store_natural_exact
    from .recursive import lpotrf_lower

    if mat.grid is None:
        # single-device fast path: recursive gemm-formulated factorization
        # (see factorization/recursive.py) instead of the unrolled k-loop
        l_nat = lpotrf_lower(natural_exact(mat))
        return store_natural_exact(mat, l_nat)

    if get_tune_parameters().cholesky_distributed_algo == "partitioner":
        # alternative distributed schedule: the blocked recursion in natural
        # order with sharding constraints — XLA SPMD distributes the gemms
        # (SUMMA-style) instead of the hand-placed k-loop collectives
        l_nat = lpotrf_lower(natural_exact(mat))
        return store_natural_exact(mat, l_nat)

    from ...utils.asserts import dlaf_assert
    dlaf_assert(mat.dist.src_rank == (0, 0),
                "the k-loop driver assumes src_rank (0, 0)",
                src_rank=mat.dist.src_rank)
    grid = mat.grid
    fn = jax.shard_map(
        lambda d: _cholesky_lower_kernel(d, mat.dist, make_comm(grid)),
        mesh=grid.mesh, in_specs=P("p", "q"), out_specs=P("p", "q"))
    return mat.with_data(fn(mat.data))
