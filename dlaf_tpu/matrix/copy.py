"""Matrix copy / redistribution.

Equivalent of the reference's ``matrix/copy.h`` (whole-matrix async copy) and
the ``miniapp_redistribution`` capability (copying between different
block sizes / grids).  In this framework a redistribution is a storage-order
permutation: natural order is the invariant middle ground, and XLA lowers the
sharded reshape/transpose pair to the minimal all-to-all.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..parallel.grid import Grid
from .distribution import Distribution
from .layout import natural_to_storage, pad_natural, storage_to_natural
from .matrix import DistMatrix


def copy(src: DistMatrix) -> DistMatrix:
    """Value copy (the reference's ``copy(src, dst)``; value semantics make
    this a buffer copy XLA may elide)."""
    return src.with_data(src.data + 0)


def redistribute(src: DistMatrix, block_size=None,
                 grid: Optional[Grid] = None, *,
                 keep_grid: bool = False) -> DistMatrix:
    """Redistribute to a new block size and/or grid.

    ``grid=None`` targets the local backend unless ``keep_grid`` is set.
    """
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    if block_size is None:
        block_size = src.dist.block_size
    if grid is None and keep_grid:
        grid = src.grid
    gs = (1, 1) if grid is None else grid.shape
    new_dist = Distribution(src.dist.size, tuple(block_size), gs)

    m, n = src.size
    nat = storage_to_natural(src.data, src.dist)[:m, :n]
    padded = pad_natural(nat, new_dist)
    data = natural_to_storage(padded, new_dist)
    if grid is not None:
        if isinstance(data, jax.core.Tracer):
            data = jax.lax.with_sharding_constraint(data, grid.sharding())
        else:
            data = jax.device_put(data, grid.sharding())
    return DistMatrix(data, new_dist, grid)
