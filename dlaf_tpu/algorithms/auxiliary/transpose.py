"""Distributed transpose / adjoint.

The reference has no standalone transpose algorithm (transposition happens
inside panel broadcasts, ``broadcast_panel.h:107``); here an explicit global
adjoint is useful to derive Upper-triangle variants from Lower-native kernels.
Implemented as global (non-shard_map) ops: storage -> natural -> adjoint ->
storage; XLA inserts the minimal redistribution collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...matrix.distribution import Distribution
from ...matrix.layout import natural_to_storage, storage_to_natural
from ...matrix.matrix import DistMatrix


def adjoint(mat: DistMatrix) -> DistMatrix:
    """Conjugate transpose of a distributed matrix (same grid)."""
    m, n = mat.size
    mb, nb = mat.block_size
    nat = storage_to_natural(mat.data, mat.dist)[: m, : n]
    adjn = jnp.conjugate(nat.T)
    new_dist = Distribution((n, m), (nb, mb), mat.dist.grid_size)
    Mp, Np = new_dist.padded_size
    padded = jnp.zeros((Mp, Np), dtype=mat.dtype).at[:n, :m].set(adjn)
    data = natural_to_storage(padded, new_dist)
    if mat.grid is not None:
        data = jax.lax.with_sharding_constraint(data, mat.grid.sharding())
    return DistMatrix(data, new_dist, mat.grid)


def transpose(mat: DistMatrix) -> DistMatrix:
    """Plain (non-conjugated) transpose."""
    out = adjoint(mat)
    return out.with_data(jnp.conjugate(out.data))
