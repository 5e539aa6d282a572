"""Strong-typed 2D index/size types.

Re-design of the reference's ``include/dlaf/common/index2d.h:1-460``: the
reference tags ``Index2D`` with a phantom type so global-element, global-tile,
local-tile and tile-element indices cannot be mixed.  Python equivalents are
distinct NamedTuple subclasses; they interoperate with plain tuples but carry
their meaning in the type name.
"""

from __future__ import annotations

from typing import NamedTuple


class _Index2D(NamedTuple):
    row: int
    col: int

    def is_valid(self) -> bool:
        return self.row >= 0 and self.col >= 0

    def is_in(self, size: "_Index2D | tuple[int, int]") -> bool:
        return 0 <= self.row < size[0] and 0 <= self.col < size[1]

    def transposed(self):
        return type(self)(self.col, self.row)


class GlobalElementIndex(_Index2D):
    """Index of an element in the global matrix."""


class GlobalTileIndex(_Index2D):
    """Index of a tile in the global tile grid."""


class LocalTileIndex(_Index2D):
    """Index of a tile in one rank's local tile grid."""


class TileElementIndex(_Index2D):
    """Index of an element within a tile."""


class GlobalElementSize(_Index2D):
    pass


class TileElementSize(_Index2D):
    pass


class LocalTileSize(_Index2D):
    pass


class GlobalTileSize(_Index2D):
    pass


def compute_linear_index(index: _Index2D, ld_row: int) -> int:
    """Column-major linear index (reference ``index2d.h`` helper)."""
    return index.row + index.col * ld_row


def iterate_range2d(begin, end=None):
    """Iterate row-major over a 2D range of indices.

    Mirrors ``common/range2d.h``'s ``iterate_range2d``: with one argument it
    iterates ``[0, size)``; with two, ``[begin, end)``.
    """
    if end is None:
        begin, end = _Index2D(0, 0), begin
    for i in range(begin[0], end[0]):
        for j in range(begin[1], end[1]):
            yield GlobalTileIndex(i, j)
