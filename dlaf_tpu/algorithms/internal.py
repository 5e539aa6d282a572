"""Shared helpers for natural-order (partitioner-scheduled) algorithms.

Two execution styles coexist in this framework, mirroring the two kinds of
algorithm in the reference:

* *driver style* (cholesky, trsm, the eigensolver stages): an explicitly
  unrolled k-loop inside ``shard_map`` with hand-placed collectives — the
  analogue of the reference's sender-graph drivers;
* *partitioner style* (gemm/hemm/trmm/norms): the computation is one big
  matmul/reduction, so the TPU-native design hands XLA's SPMD partitioner the
  natural-order array with sharding constraints and lets it emit the
  SUMMA-style collective schedule (the reference hand-writes these loops in
  ``multiplication/*/impl.h`` because MPI cannot do this for it).

These helpers implement the partitioner style: move a block-cyclic storage
array to natural order (a tile permutation XLA lowers to all-to-alls), apply
the dense op, and move back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..matrix.layout import natural_to_storage, storage_to_natural
from ..matrix.matrix import DistMatrix
from ..matrix.ref import MatrixRef, as_ref


def natural_padded(mat: DistMatrix):
    """Storage -> natural padded array, sharding-constrained on the grid."""
    nat = storage_to_natural(mat.data, mat.dist)
    if mat.grid is not None:
        nat = jax.lax.with_sharding_constraint(nat, mat.grid.sharding())
    return nat


def natural_exact(mat: DistMatrix):
    """Natural-order array of exactly ``mat.size`` (pad cropped)."""
    m, n = mat.size
    return natural_padded(mat)[:m, :n]


def store_natural_exact(mat: DistMatrix, nat) -> DistMatrix:
    """Store an exactly ``mat.size`` natural array (zero-padded)."""
    Mp, Np = mat.dist.padded_size
    if tuple(nat.shape) == (Mp, Np):
        # no padding: skip the zero buffer + copy (a full extra n^2
        # allocation — the difference between fitting and OOM at n=32768)
        return store_natural(mat, nat)
    padded = jnp.zeros((Mp, Np), dtype=nat.dtype)
    padded = jax.lax.dynamic_update_slice(padded, nat, (0, 0))
    return store_natural(mat, padded)


def natural_of_ref(ref: MatrixRef):
    """Natural-order array of exactly ``ref.size`` (unpadded slice)."""
    nat = natural_padded(ref.parent)
    i, j = ref.origin
    m, n = ref.size
    return nat[i:i + m, j:j + n]


def store_natural(mat: DistMatrix, nat_padded) -> DistMatrix:
    """Natural padded array -> new DistMatrix with ``mat``'s distribution."""
    data = natural_to_storage(nat_padded, mat.dist)
    if mat.grid is not None:
        data = jax.lax.with_sharding_constraint(data, mat.grid.sharding())
    return mat.with_data(data)


def store_into_ref(ref: MatrixRef, nat_block) -> DistMatrix:
    """Write a natural-order block into the ref's window of its parent.

    Returns the *parent* as a new DistMatrix (functional update).
    """
    nat = natural_padded(ref.parent)
    i, j = ref.origin
    nat = jax.lax.dynamic_update_slice(
        nat, nat_block.astype(nat.dtype), (i, j))
    return store_natural(ref.parent, nat)


def same_grid(*mats):
    gs = [m.grid if isinstance(m, DistMatrix) else as_ref(m).grid
          for m in mats]
    first = gs[0]
    for g in gs[1:]:
        if (first is None) != (g is None) or \
                (first is not None and first.shape != g.shape):
            raise ValueError("matrices must share the same process grid")
    return first
