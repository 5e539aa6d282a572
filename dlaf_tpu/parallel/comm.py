"""Rank-local communication contexts used inside algorithm kernels.

TPU-native replacement for the reference's async collective schedulers
(``include/dlaf/communication/kernels/*.h``: ``scheduleAllReduce``,
``schedule_bcast_send/recv`` etc.) and the blocking ``comm::sync::*`` helpers.
Algorithms are written once against this small interface; the distributed
implementation maps onto XLA collectives inside ``shard_map`` (ICI-resident
``psum``/``all_gather``/``ppermute``), the local implementation is the
identity, which is how one algorithm source serves both the ``Matrix``-local
and ``CommunicatorGrid`` overloads the reference duplicates.

Broadcasts are expressed as masked ``psum`` (zero everywhere but the root,
then all-reduce): XLA/ICI has no native one-to-many primitive, and an
all-reduce of a panel rides the same rings a broadcast would.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .grid import COL_AXIS, ROW_AXIS


class LocalComm:
    """Single-rank context: P = Q = 1, all collectives are the identity."""

    P = 1
    Q = 1
    p = 0
    q = 0

    def sum_p(self, x):
        return x

    def sum_q(self, x):
        return x

    def sum_all(self, x):
        return x

    def max_all(self, x):
        return x

    def bcast_from(self, x, root_p, root_q):
        return x

    def bcast_rows_from(self, x, root_p):
        return x

    def bcast_cols_from(self, x, root_q):
        return x

    def is_rank(self, p0, q0):
        return True

    def in_row(self, p0):
        return True

    def in_col(self, q0):
        return True

    def shift_p(self, x, shift: int = 1, cyclic: bool = False):
        """P = 1: a cyclic shift is the identity; an open shift by a
        nonzero amount has no sender, so the result is zeros."""
        if cyclic or shift == 0:
            return x
        return jnp.zeros_like(x)

    def shift_q(self, x, shift: int = 1, cyclic: bool = False):
        return self.shift_p(x, shift, cyclic)


class MeshComm:
    """SPMD context: must be used inside ``shard_map`` over a Grid's mesh."""

    def __init__(self, P: int, Q: int):
        self.P = P
        self.Q = Q
        self.p = lax.axis_index(ROW_AXIS)
        self.q = lax.axis_index(COL_AXIS)

    def sum_p(self, x):
        """All-reduce down grid columns (the reference's col communicator)."""
        return lax.psum(x, ROW_AXIS)

    def sum_q(self, x):
        """All-reduce along grid rows (the reference's row communicator)."""
        return lax.psum(x, COL_AXIS)

    def sum_all(self, x):
        return lax.psum(x, (ROW_AXIS, COL_AXIS))

    def max_all(self, x):
        return lax.pmax(x, (ROW_AXIS, COL_AXIS))

    def _mask(self, x, cond):
        return jnp.where(cond, x, jnp.zeros_like(x))

    def bcast_from(self, x, root_p, root_q):
        """Broadcast ``x`` from rank (root_p, root_q) to the full grid."""
        return self.sum_all(self._mask(x, self.is_rank(root_p, root_q)))

    def bcast_rows_from(self, x, root_p):
        """Broadcast from grid-row ``root_p`` down each grid column."""
        return self.sum_p(self._mask(x, self.in_row(root_p)))

    def bcast_cols_from(self, x, root_q):
        """Broadcast from grid-col ``root_q`` along each grid row."""
        return self.sum_q(self._mask(x, self.in_col(root_q)))

    def is_rank(self, p0, q0):
        return jnp.logical_and(self.p == p0, self.q == q0)

    def in_row(self, p0):
        return self.p == p0

    def in_col(self, q0):
        return self.q == q0

    # -- P2P neighbor exchange (the reference's tile send/recv,
    #    ``communication/kernels/p2p.h:29,45``; here a ring ``ppermute``
    #    over a mesh axis — the ICI-native point-to-point primitive) ------
    @staticmethod
    def _ring_pairs(n: int, shift: int, cyclic: bool):
        pairs = [(i, (i + shift) % n) for i in range(n)]
        if not cyclic:
            pairs = [(a, b) for a, b in pairs if 0 <= a + shift < n]
        return pairs

    def shift_p(self, x, shift: int = 1, cyclic: bool = False):
        """Rank (p, q) receives ``x`` from rank ((p - shift) mod P, q).

        ``cyclic=False`` drops the wrap-around links: ranks with no sender
        receive zeros (the shape of a pipeline/chase neighbor exchange);
        ``cyclic=True`` is the full ring (block-cyclic rotations).
        Negative ``shift`` reverses direction.
        """
        return lax.ppermute(x, ROW_AXIS,
                            self._ring_pairs(self.P, shift, cyclic))

    def shift_q(self, x, shift: int = 1, cyclic: bool = False):
        """Rank (p, q) receives ``x`` from rank (p, (q - shift) mod Q)."""
        return lax.ppermute(x, COL_AXIS,
                            self._ring_pairs(self.Q, shift, cyclic))


def make_comm(grid) -> LocalComm | MeshComm:
    if grid is None:
        return LocalComm()
    return MeshComm(grid.nrows, grid.ncols)
