"""Distributed matrix container.

TPU-native re-design of the reference's ``Matrix<T, D>``
(``include/dlaf/matrix/matrix.h:61``): the reference is a collection of tiles
each behind an async read/write pipeline; here a :class:`DistMatrix` is one
immutable ``jax.Array`` in block-cyclic *storage order* (see
``distribution.py``) sharded over a :class:`~dlaf_tpu.parallel.grid.Grid`.
Per-tile pipelines and ``wait_local_tiles`` are subsumed by XLA value
semantics: every algorithm returns a new ``DistMatrix`` and XLA schedules /
aliases buffers (donation gives in-place updates).

``DistMatrix`` is a pytree (data = leaf, distribution/grid = static aux), so
algorithms can be ``jax.jit``-ed directly over it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.grid import Grid
from .distribution import Distribution
from .layout import (natural_to_storage, pad_natural, storage_to_natural,
                     unpad_natural)


@jax.tree_util.register_pytree_node_class
class DistMatrix:
    """An ``m x n`` matrix, block-cyclic over a grid (or process-local)."""

    def __init__(self, data, dist: Distribution, grid: Optional[Grid] = None):
        self.data = data
        self.dist = dist
        self.grid = grid
        if grid is not None and grid.shape != dist.grid_size:
            raise ValueError(
                f"grid shape {grid.shape} != distribution grid "
                f"{dist.grid_size}")
        from ..utils.asserts import assert_moderate
        shape = getattr(data, "shape", None)
        assert_moderate(shape is None or tuple(shape) == dist.padded_size,
                        "storage shape != padded distribution size",
                        shape=shape, padded=dist.padded_size)

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.dist, self.grid)

    @classmethod
    def tree_unflatten(cls, aux, children):
        dist, grid = aux
        return cls(children[0], dist, grid)

    # -- properties -----------------------------------------------------------
    @property
    def size(self):
        return self.dist.size

    @property
    def block_size(self):
        return self.dist.block_size

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def shape(self):
        return self.dist.size

    def __repr__(self):
        g = "local" if self.grid is None else repr(self.grid)
        return (f"DistMatrix(size={self.dist.size}, "
                f"block={self.dist.block_size}, {g}, dtype={self.dtype})")

    # -- constructors -----------------------------------------------------------
    @classmethod
    def from_natural(cls, arr, block_size, grid: Optional[Grid] = None,
                     *, diag_pad=None, src_rank=(0, 0)) -> "DistMatrix":
        """Distribute a natural (row-major global) array.

        ``diag_pad=1.0`` keeps padded diagonals factorizable (SPD inputs).
        ``src_rank`` is the rank owning the top-left block (ScaLAPACK
        isrc/jsrc); the partitioner-style algorithms are src-agnostic, the
        shard_map k-loop drivers require (0, 0).
        """
        arr = jnp.asarray(arr)
        if isinstance(block_size, int):
            block_size = (block_size, block_size)
        gs = (1, 1) if grid is None else grid.shape
        dist = Distribution(tuple(arr.shape), tuple(block_size), gs,
                            tuple(src_rank))
        padded = pad_natural(arr, dist, diag_fill=diag_pad)
        data = natural_to_storage(padded, dist)
        if grid is not None:
            data = jax.device_put(data, grid.sharding())
        return cls(data, dist, grid)

    @classmethod
    def zeros(cls, size, block_size, grid: Optional[Grid] = None,
              dtype=jnp.float32) -> "DistMatrix":
        if isinstance(block_size, int):
            block_size = (block_size, block_size)
        gs = (1, 1) if grid is None else grid.shape
        dist = Distribution(tuple(size), tuple(block_size), gs)
        data = jnp.zeros(dist.padded_size, dtype=dtype)
        if grid is not None:
            data = jax.device_put(data, grid.sharding())
        return cls(data, dist, grid)

    # -- conversions -----------------------------------------------------------
    def to_natural(self):
        """Gather to a natural ``[m, n]`` array (host-friendly; tests/IO)."""
        return unpad_natural(storage_to_natural(self.data, self.dist),
                             self.dist)

    def with_data(self, data) -> "DistMatrix":
        return DistMatrix(data, self.dist, self.grid)

    def astype(self, dtype) -> "DistMatrix":
        return self.with_data(self.data.astype(dtype))
