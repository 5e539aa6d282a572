"""SPMD helpers used inside algorithm kernels (rank-local array algebra).

These replace the reference's ``Panel`` workspace + ``broadcast_panel``
machinery (``include/dlaf/matrix/panel.h``, ``communication/broadcast_panel.h:
45,107-189``): where DLAF broadcasts a column panel tile-by-tile along rows
and re-broadcasts its transpose down columns, here a panel is assembled into
*natural* (global) row order with zeros off-rank and summed over the grid —
one fused XLA all-reduce per panel — after which every rank slices out both
its row-set and its column-set view (the "transposed panel" comes for free).

All functions operate on rank-local arrays inside ``shard_map`` (or on plain
arrays with ``p = 0, P = 1`` for the local backend).  ``p`` may be a traced
``axis_index``; every shape is static.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _i32(*vals):
    return tuple(jnp.asarray(v, jnp.int32) for v in vals)


def global_row_index(lmt: int, nb: int, P: int, p, start_lt: int = 0):
    """Global element-row index of each local row (column vector).

    Local tile ``l`` (l >= start_lt) on grid-row ``p`` is global tile
    ``l * P + p``; element ``e`` within it is global row
    ``(l * P + p) * nb + e``.  Returns shape ``[(lmt - start_lt) * nb, 1]``.
    """
    nt = lmt - start_lt
    lt = start_lt + lax.broadcasted_iota(jnp.int32, (nt, nb), 0)
    e = lax.broadcasted_iota(jnp.int32, (nt, nb), 1)
    return ((lt * P + p) * nb + e).reshape(nt * nb, 1)


def scatter_rows_to_natural(pan, lmt: int, nb: int, P: int, p,
                            start_lt: int = 0):
    """Embed local panel rows into natural global row order (zeros off-rank).

    ``pan``: ``[(lmt - start_lt) * nb, w]`` covering local tiles
    ``[start_lt, lmt)``.  Returns ``[P * lmt * nb, w]`` with ``pan``'s tile
    rows placed at their global positions; summing this over the grid axis
    materialises the full panel everywhere (the broadcast-panel analogue).
    """
    w = pan.shape[1]
    nt = lmt - start_lt
    buf = jnp.zeros((P, lmt, nb, w), dtype=pan.dtype)
    buf = lax.dynamic_update_slice(
        buf, pan.reshape(1, nt, nb, w), _i32(p, start_lt, 0, 0))
    return buf.transpose(1, 0, 2, 3).reshape(P * lmt * nb, w)


def gather_my_rows(nat, lmt: int, nb: int, P: int, p, start_lt: int = 0):
    """Extract this rank's block-cyclic rows from a natural-order panel.

    ``nat``: ``[P * lmt * nb, w]`` in natural global row order.  Returns
    ``[(lmt - start_lt) * nb, w]`` — the rows of local tiles
    ``[start_lt, lmt)``.
    """
    w = nat.shape[1]
    x = nat.reshape(lmt, P, nb, w)
    x = lax.dynamic_slice(x, _i32(0, p, 0, 0), (lmt, 1, nb, w))
    x = x.reshape(lmt * nb, w)
    return x[start_lt * nb:]


def scatter_cols_to_natural(pan, lnt: int, nb: int, Q: int, q,
                            start_lt: int = 0):
    """Column version of :func:`scatter_rows_to_natural` (row panels)."""
    return scatter_rows_to_natural(pan.T, lnt, nb, Q, q, start_lt).T


def gather_my_cols(nat, lnt: int, nb: int, Q: int, q, start_lt: int = 0):
    """Column version of :func:`gather_my_rows`."""
    return gather_my_rows(nat.T, lnt, nb, Q, q, start_lt).T
