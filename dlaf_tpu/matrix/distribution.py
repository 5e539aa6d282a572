"""2D block-cyclic distribution and its index-conversion algebra.

TPU-native re-design of the reference's ``include/dlaf/matrix/distribution.h``
(ctor family at ``distribution.h:120-180``, conversion algebra documented at
``distribution.h:86-113``, free-function forms in ``util_distribution.h``) and
of the normative spec ``misc/matrix_distribution.md``.

Mapping (square-ish blocks, ``src_rank`` offset supported):

* global element ``g`` lives in global tile ``g // mb`` at tile element
  ``g % mb`` (per coordinate);
* global tile ``t`` is owned by rank ``(t + src) % P``;
* on its owner, global tile ``t`` is local tile ``t // P``;
* local tile ``l`` on rank ``r`` is global tile ``l * P + (r - src) % P``.

TPU-native storage convention (this is where the design diverges from the
reference, which stores per-rank tiles in pika-managed memory):  a distributed
matrix is ONE ``jax.Array`` of shape ``[mt_pad * mb, nt_pad * nb]`` whose tile
rows are stored in *cyclic-permuted* ("storage") order — storage tile row
``s = p * lmt + l`` holds global tile row ``t = l * P + p``.  Under
``NamedSharding(mesh, P('p', 'q'))`` each mesh rank then owns exactly its
block-cyclic tiles, and inside ``shard_map`` every rank sees a dense local
``[lmt * mb, lnt * nb]`` matrix whose local tile ``l`` is global tile
``l * P + p`` — identical to the reference's local tile layout.  ``mt_pad`` is
``mt`` rounded up to a multiple of ``P`` so the local shape is rank-invariant
(SPMD requires static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from ..utils.index import (GlobalElementIndex, GlobalTileIndex,
                           LocalTileIndex, TileElementIndex)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class Distribution:
    """Block-cyclic distribution of an ``m x n`` matrix over a ``P x Q`` grid.

    ``block_size`` is the distribution *block* (ownership + storage unit).
    Like the reference (``distribution.h:120-201``) the class also supports

    * an element-wise ``offset`` of the top-left block (normalized on
      construction: whole blocks fold into ``src_rank``, so
      ``0 <= offset < block_size`` always holds afterwards);
    * ``tiles_per_block``: logical tiles subdividing blocks (reference
      tile != block); ownership stays block-wise, the ``*_fine`` methods
      convert between elements and the finer tile grid; and
    * :meth:`retiled` / :meth:`sub_distribution` derived distributions
      (reference ``matrix.h:186 retiled_sub_pipeline``,
      ``Distribution(dist, spec)`` sub-distribution ctor).
    """

    size: Tuple[int, int]
    block_size: Tuple[int, int]
    grid_size: Tuple[int, int] = (1, 1)
    src_rank: Tuple[int, int] = (0, 0)
    offset: Tuple[int, int] = (0, 0)
    tiles_per_block: Tuple[int, int] = (1, 1)

    def __post_init__(self):
        m, n = self.size
        mb, nb = self.block_size
        P, Q = self.grid_size
        if m < 0 or n < 0:
            raise ValueError(f"invalid size {self.size}")
        if mb <= 0 or nb <= 0:
            raise ValueError(f"invalid block_size {self.block_size}")
        if P <= 0 or Q <= 0:
            raise ValueError(f"invalid grid_size {self.grid_size}")
        if not (0 <= self.src_rank[0] < P and 0 <= self.src_rank[1] < Q):
            raise ValueError(f"invalid src_rank {self.src_rank}")
        tr, tc = self.tiles_per_block
        if tr <= 0 or tc <= 0 or mb % tr or nb % tc:
            raise ValueError(
                f"tiles_per_block {self.tiles_per_block} must divide "
                f"block_size {self.block_size}")
        if any(o < 0 for o in self.offset):
            raise ValueError(f"invalid offset {self.offset}")
        # normalize: whole blocks of offset fold into the source rank
        if self.offset[0] >= mb or self.offset[1] >= nb:
            oi, oj = self.offset
            sp, sq = self.src_rank
            object.__setattr__(self, "src_rank",
                               ((sp + oi // mb) % P, (sq + oj // nb) % Q))
            object.__setattr__(self, "offset", (oi % mb, oj % nb))

    # -- tile counts -------------------------------------------------------
    @property
    def nr_tiles(self) -> Tuple[int, int]:
        """Global block-grid size (mt, nt); block 0 contains element 0
        (partial by ``offset``)."""
        m, n = self.size
        mb, nb = self.block_size
        oi, oj = self.offset
        return (_cdiv(oi + m, mb) if m else 0,
                _cdiv(oj + n, nb) if n else 0)

    @property
    def padded_nr_tiles(self) -> Tuple[int, int]:
        """Tile counts rounded up so every rank holds the same tile count."""
        mt, nt = self.nr_tiles
        P, Q = self.grid_size
        return _cdiv(max(mt, 1), P) * P, _cdiv(max(nt, 1), Q) * Q

    @property
    def local_nr_tiles(self) -> Tuple[int, int]:
        """Per-rank (padded, rank-invariant) local tile counts (lmt, lnt)."""
        mtp, ntp = self.padded_nr_tiles
        P, Q = self.grid_size
        return mtp // P, ntp // Q

    @property
    def padded_size(self) -> Tuple[int, int]:
        mtp, ntp = self.padded_nr_tiles
        return mtp * self.block_size[0], ntp * self.block_size[1]

    @property
    def local_size(self) -> Tuple[int, int]:
        lmt, lnt = self.local_nr_tiles
        return lmt * self.block_size[0], lnt * self.block_size[1]

    # -- element <-> tile --------------------------------------------------
    def global_tile_from_global_element(self, ge) -> GlobalTileIndex:
        return GlobalTileIndex(
            (ge[0] + self.offset[0]) // self.block_size[0],
            (ge[1] + self.offset[1]) // self.block_size[1])

    def tile_element_from_global_element(self, ge) -> TileElementIndex:
        return TileElementIndex(
            (ge[0] + self.offset[0]) % self.block_size[0],
            (ge[1] + self.offset[1]) % self.block_size[1])

    def global_element_from_global_tile_and_tile_element(
            self, gt, te) -> GlobalElementIndex:
        return GlobalElementIndex(
            gt[0] * self.block_size[0] + te[0] - self.offset[0],
            gt[1] * self.block_size[1] + te[1] - self.offset[1])

    # -- ownership ---------------------------------------------------------
    def rank_global_tile(self, gt) -> Tuple[int, int]:
        """Owner rank (p, q) of global tile ``gt`` (``util_distribution.h``)."""
        P, Q = self.grid_size
        return ((gt[0] + self.src_rank[0]) % P,
                (gt[1] + self.src_rank[1]) % Q)

    def rank_global_element(self, ge) -> Tuple[int, int]:
        return self.rank_global_tile(self.global_tile_from_global_element(ge))

    # -- global tile <-> local tile ----------------------------------------
    def local_tile_from_global_tile(self, gt) -> LocalTileIndex:
        """Local tile index of ``gt`` on its owner rank."""
        P, Q = self.grid_size
        return LocalTileIndex(gt[0] // P, gt[1] // Q)

    def global_tile_from_local_tile(self, lt, rank) -> GlobalTileIndex:
        P, Q = self.grid_size
        sp, sq = self.src_rank
        return GlobalTileIndex(lt[0] * P + (rank[0] - sp) % P,
                               lt[1] * Q + (rank[1] - sq) % Q)

    def next_local_tile_from_global_tile(self, gt, rank) -> LocalTileIndex:
        """Smallest local tile with global index >= ``gt`` on ``rank``.

        Reference: the ``nextLocalTileFromGlobalTile`` family used by every
        trailing-matrix loop (``distribution.h:86-113``).
        """
        P, Q = self.grid_size
        sp, sq = self.src_rank

        def nxt(g, r, s, n):
            c = (r - s) % n  # cyclic coordinate of this rank
            return _cdiv(g - c, n)

        return LocalTileIndex(max(0, nxt(gt[0], rank[0], sp, P)),
                              max(0, nxt(gt[1], rank[1], sq, Q)))

    def min_next_local_tile(self, gt) -> LocalTileIndex:
        """Min over ranks of :meth:`next_local_tile_from_global_tile`.

        This is the conservative static slice start used by SPMD kernels: the
        local trailing region for global tiles >= ``gt`` starts at or after
        this local index on *every* rank (at most one tile earlier than the
        rank's true start; kernels mask the remainder).
        """
        P, Q = self.grid_size
        return LocalTileIndex(gt[0] // P, gt[1] // Q)

    # -- storage (cyclic-permuted) order ------------------------------------
    def storage_tile_from_global_tile(self, gt) -> Tuple[int, int]:
        """Position of a global tile in the single-array storage order."""
        lmt, lnt = self.local_nr_tiles
        p, q = self.rank_global_tile(gt)
        lt = self.local_tile_from_global_tile(gt)
        return p * lmt + lt[0], q * lnt + lt[1]

    def global_tile_from_storage_tile(self, st) -> GlobalTileIndex:
        lmt, lnt = self.local_nr_tiles
        P, Q = self.grid_size
        sp, sq = self.src_rank
        p, l0 = divmod(st[0], lmt)
        q, l1 = divmod(st[1], lnt)
        return GlobalTileIndex(l0 * P + (p - sp) % P, l1 * Q + (q - sq) % Q)

    # -- local element counts (true, not padded) ----------------------------
    def local_element_count(self, rank) -> Tuple[int, int]:
        """True number of locally stored elements (ScaLAPACK ``numroc``,
        generalized to a partial first block via ``offset``)."""

        def numroc(n, nb, off, r, s, nproc):
            if n == 0:
                return 0
            T = _cdiv(off + n, nb)            # blocks spanned
            c = (r - s) % nproc
            if c >= T:
                return 0
            nt_own = (T - c + nproc - 1) // nproc
            cnt = nt_own * nb
            if c == 0:
                cnt -= off                    # partial first block
            if (T - 1) % nproc == c:
                cnt -= T * nb - off - n       # partial last block
            return cnt

        return (numroc(self.size[0], self.block_size[0], self.offset[0],
                       rank[0], self.src_rank[0], self.grid_size[0]),
                numroc(self.size[1], self.block_size[1], self.offset[1],
                       rank[1], self.src_rank[1], self.grid_size[1]))

    # -- logical (fine) tiles subdividing blocks ----------------------------
    @property
    def tile_size(self) -> Tuple[int, int]:
        """Size of the logical tile (block_size / tiles_per_block)."""
        return (self.block_size[0] // self.tiles_per_block[0],
                self.block_size[1] // self.tiles_per_block[1])

    @property
    def nr_fine_tiles(self) -> Tuple[int, int]:
        """Global logical-tile grid size; tile 0 contains element (0, 0)."""
        m, n = self.size
        ts = self.tile_size
        return (_cdiv(self.offset[0] % ts[0] + m, ts[0]) if m else 0,
                _cdiv(self.offset[1] % ts[1] + n, ts[1]) if n else 0)

    def fine_tile_from_global_element(self, ge) -> GlobalTileIndex:
        ts = self.tile_size
        return GlobalTileIndex(
            (ge[0] + self.offset[0] % ts[0]) // ts[0],
            (ge[1] + self.offset[1] % ts[1]) // ts[1])

    def tile_element_from_global_element_fine(self, ge) -> TileElementIndex:
        ts = self.tile_size
        return TileElementIndex((ge[0] + self.offset[0]) % ts[0],
                                (ge[1] + self.offset[1]) % ts[1])

    def global_element_from_fine_tile_and_tile_element(
            self, ft, te) -> GlobalElementIndex:
        ts = self.tile_size
        return GlobalElementIndex(
            ft[0] * ts[0] + te[0] - self.offset[0] % ts[0],
            ft[1] * ts[1] + te[1] - self.offset[1] % ts[1])

    def global_tile_from_fine_tile(self, ft) -> GlobalTileIndex:
        """Owning *block* of a logical tile."""
        ts = self.tile_size
        skip = (self.offset[0] // ts[0], self.offset[1] // ts[1])
        return GlobalTileIndex(
            (ft[0] + skip[0]) // self.tiles_per_block[0],
            (ft[1] + skip[1]) // self.tiles_per_block[1])

    def rank_fine_tile(self, ft) -> Tuple[int, int]:
        return self.rank_global_tile(self.global_tile_from_fine_tile(ft))

    # -- derived: retiling and sub-distributions ----------------------------
    def retiled(self, tiles_per_block) -> "Distribution":
        """Same matrix/ownership, finer logical tiles (the reference's
        ``retiled_sub_pipeline(tiles_per_block)``, ``matrix.h:186``)."""
        if isinstance(tiles_per_block, int):
            tiles_per_block = (tiles_per_block, tiles_per_block)
        return dataclasses.replace(self,
                                   tiles_per_block=tuple(tiles_per_block))

    def sub_distribution(self, origin, size) -> "Distribution":
        """Distribution of the sub-matrix at ``origin`` of ``size``
        (reference sub-distribution ctor + helpers,
        ``distribution.h:54-64``): element (i, j) of the result lives on
        the same rank, block and in-block position as element
        (origin + (i, j)) of ``self``."""
        oi, oj = origin
        m, n = size
        if oi < 0 or oj < 0 or m < 0 or n < 0 or \
                oi + m > self.size[0] or oj + n > self.size[1]:
            raise ValueError(f"sub-distribution {origin}+{size} out of "
                             f"range {self.size}")
        return Distribution(
            (m, n), self.block_size, self.grid_size, self.src_rank,
            (self.offset[0] + oi, self.offset[1] + oj),
            self.tiles_per_block)

    # -- derived distributions ----------------------------------------------
    def transposed(self) -> "Distribution":
        return Distribution((self.size[1], self.size[0]),
                            (self.block_size[1], self.block_size[0]),
                            (self.grid_size[1], self.grid_size[0]),
                            (self.src_rank[1], self.src_rank[0]),
                            (self.offset[1], self.offset[0]),
                            (self.tiles_per_block[1],
                             self.tiles_per_block[0]))

    def with_size(self, size) -> "Distribution":
        return dataclasses.replace(self, size=tuple(size))
