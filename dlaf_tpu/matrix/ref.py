"""Tile-aligned sub-matrix views.

TPU-native equivalent of the reference's ``MatrixRef``
(``include/dlaf/matrix/matrix_ref.h:39,182`` with ``SubDistributionSpec`` at
``distribution.h:64``): a rectangular, tile-aligned window into a parent
:class:`~dlaf_tpu.matrix.matrix.DistMatrix`.  Algorithms that in the reference
take a ``MatrixRef`` (general_multiplication, the eigensolver's
partial-spectrum back-transforms) take a :class:`MatrixRef` here; the view is
resolved to static natural-order slices at trace time, so XLA sees ordinary
static-shape programs.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

from .matrix import DistMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MatrixRef:
    """View of ``parent`` starting at element ``origin`` with ``size``.

    ``origin`` must be tile-aligned (the reference requires the same:
    sub-distributions keep tile boundaries).  ``size`` may be any shape that
    fits inside the parent.
    """

    parent: DistMatrix
    origin: Tuple[int, int]
    size: Tuple[int, int]

    def tree_flatten(self):
        return (self.parent,), (self.origin, self.size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    def __post_init__(self):
        mb, nb = self.parent.block_size
        i, j = self.origin
        m, n = self.size
        if i % mb or j % nb:
            raise ValueError(f"origin {self.origin} not tile-aligned "
                             f"to block {self.parent.block_size}")
        if i < 0 or j < 0 or m < 0 or n < 0 or \
                i + m > self.parent.size[0] or j + n > self.parent.size[1]:
            raise ValueError(
                f"ref {self.origin}+{self.size} exceeds parent "
                f"{self.parent.size}")

    @property
    def block_size(self):
        return self.parent.block_size

    @property
    def dtype(self):
        return self.parent.dtype

    @property
    def grid(self):
        return self.parent.grid


def as_ref(x) -> MatrixRef:
    """Lift a DistMatrix to a whole-matrix ref; pass refs through."""
    if isinstance(x, MatrixRef):
        return x
    return MatrixRef(x, (0, 0), x.size)
