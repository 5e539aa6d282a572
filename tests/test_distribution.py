"""Distribution index-algebra tests.

Mirrors the reference's exhaustive ``test/unit/matrix/test_distribution.cpp``:
round-trip every conversion over a sweep of sizes, block sizes, grids and
source ranks, including empty matrices and non-divisible sizes.
"""

import pytest

from dlaf_tpu.matrix.distribution import Distribution

CASES = [
    # (size, block, grid, src)
    ((0, 0), (4, 4), (2, 3), (0, 0)),
    ((1, 1), (4, 4), (2, 3), (0, 0)),
    ((3, 3), (4, 4), (1, 1), (0, 0)),
    ((13, 7), (4, 3), (2, 3), (0, 0)),
    ((13, 7), (4, 3), (2, 3), (1, 2)),
    ((32, 32), (8, 8), (4, 2), (0, 0)),
    ((33, 31), (8, 8), (4, 2), (3, 1)),
    ((100, 60), (16, 8), (3, 3), (0, 0)),
]


@pytest.mark.parametrize("size,block,grid,src", CASES)
def test_tile_element_roundtrip(size, block, grid, src):
    d = Distribution(size, block, grid, src)
    m, n = size
    for i in range(0, m, max(1, m // 7)):
        for j in range(0, n, max(1, n // 7)):
            gt = d.global_tile_from_global_element((i, j))
            te = d.tile_element_from_global_element((i, j))
            back = d.global_element_from_global_tile_and_tile_element(gt, te)
            assert tuple(back) == (i, j)


@pytest.mark.parametrize("size,block,grid,src", CASES)
def test_ownership_and_local_roundtrip(size, block, grid, src):
    d = Distribution(size, block, grid, src)
    mt, nt = d.nr_tiles
    assert mt == -(-size[0] // block[0]) and nt == -(-size[1] // block[1])
    for ti in range(mt):
        for tj in range(nt):
            rank = d.rank_global_tile((ti, tj))
            assert 0 <= rank[0] < grid[0] and 0 <= rank[1] < grid[1]
            lt = d.local_tile_from_global_tile((ti, tj))
            back = d.global_tile_from_local_tile(lt, rank)
            assert tuple(back) == (ti, tj)


@pytest.mark.parametrize("size,block,grid,src", CASES)
def test_next_local_tile(size, block, grid, src):
    d = Distribution(size, block, grid, src)
    mt, nt = d.nr_tiles
    P, Q = grid
    for ti in range(mt + 1):
        for p in range(P):
            nl = d.next_local_tile_from_global_tile((ti, 0), (p, 0)).row
            # brute force: first local tile whose global index >= ti
            expected = 0
            g = lambda l: l * P + (p - src[0]) % P  # noqa: E731
            while g(expected) < ti:
                expected += 1
            assert nl == expected
            # conservative min bound never exceeds the true start
            assert d.min_next_local_tile((ti, 0)).row <= nl


@pytest.mark.parametrize("size,block,grid,src", CASES)
def test_local_element_count_sums_to_global(size, block, grid, src):
    d = Distribution(size, block, grid, src)
    P, Q = grid
    rows = sum(d.local_element_count((p, 0))[0] for p in range(P))
    cols = sum(d.local_element_count((0, q))[1] for q in range(Q))
    assert rows == size[0]
    assert cols == size[1]


@pytest.mark.parametrize("size,block,grid,src", CASES)
def test_storage_order_bijection(size, block, grid, src):
    d = Distribution(size, block, grid, src)
    mtp, ntp = d.padded_nr_tiles
    seen = set()
    for ti in range(mtp):
        for tj in range(ntp):
            st = d.storage_tile_from_global_tile((ti, tj))
            assert 0 <= st[0] < mtp and 0 <= st[1] < ntp
            assert st not in seen
            seen.add(st)
            assert tuple(d.global_tile_from_storage_tile(st)) == (ti, tj)
    assert len(seen) == mtp * ntp


def test_padding_invariants():
    d = Distribution((33, 31), (8, 8), (4, 2))
    assert d.nr_tiles == (5, 4)
    assert d.padded_nr_tiles == (8, 4)
    assert d.local_nr_tiles == (2, 2)
    assert d.padded_size == (64, 32)
    assert d.local_size == (16, 16)


def test_invalid_args():
    with pytest.raises(ValueError):
        Distribution((-1, 2), (4, 4))
    with pytest.raises(ValueError):
        Distribution((4, 4), (0, 4))
    with pytest.raises(ValueError):
        Distribution((4, 4), (4, 4), (2, 2), (2, 0))


def test_transposed():
    d = Distribution((13, 7), (4, 3), (2, 3), (1, 2))
    t = d.transposed()
    assert t.size == (7, 13) and t.block_size == (3, 4)
    assert t.grid_size == (3, 2) and t.src_rank == (2, 1)


# -- offsets, fine tiles, retiling, sub-distributions (reference
#    test_distribution.cpp offset/tile cases) --------------------------------

def _dist_cases():
    import itertools
    for (m, mb, P, s, off) in itertools.product(
            [0, 1, 13, 64, 100], [4, 8], [1, 3], [0, 2], [0, 1, 5, 9]):
        if s >= P:
            continue
        yield m, mb, P, s, off


def test_offset_normalization_and_roundtrip():
    from dlaf_tpu.matrix.distribution import Distribution
    for m, mb, P, s, off in _dist_cases():
        d = Distribution((m, m), (mb, mb), (P, P), (s, s), (off, off))
        # normalized: offset within one block, whole blocks moved to src
        assert 0 <= d.offset[0] < mb
        assert d.src_rank[0] == (s + off // mb) % P
        for g in range(m):
            gt = d.global_tile_from_global_element((g, g))
            te = d.tile_element_from_global_element((g, g))
            back = d.global_element_from_global_tile_and_tile_element(gt, te)
            assert back == (g, g)
            assert 0 <= te[0] < mb
            assert 0 <= gt[0] < d.nr_tiles[0]
        # element counts sum to the matrix size across ranks
        tot = sum(d.local_element_count((r, 0))[0] for r in range(P))
        assert tot == m, (m, mb, P, s, off, tot)


def test_fine_tiles_and_retiled():
    from dlaf_tpu.matrix.distribution import Distribution
    for m, mb, P, s, off in _dist_cases():
        for tpb in (1, 2, 4):
            d = Distribution((m, m), (mb, mb), (P, P), (s, s),
                             (off, off)).retiled(tpb)
            ts = d.tile_size
            assert ts[0] * tpb == mb
            for g in range(m):
                ft = d.fine_tile_from_global_element((g, g))
                te = d.tile_element_from_global_element_fine((g, g))
                back = d.global_element_from_fine_tile_and_tile_element(
                    ft, te)
                assert back == (g, g)
                assert 0 <= te[0] < ts[0]
                assert 0 <= ft[0] < d.nr_fine_tiles[0]
                # fine-tile ownership == element's block ownership
                assert d.rank_fine_tile(ft) == d.rank_global_element((g, g))


def test_sub_distribution_consistency():
    from dlaf_tpu.matrix.distribution import Distribution
    d = Distribution((100, 90), (8, 8), (3, 2), (1, 0), (3, 5))
    for (oi, oj, m, n) in [(0, 0, 100, 90), (7, 11, 20, 30),
                           (13, 2, 0, 5), (99, 89, 1, 1)]:
        sub = d.sub_distribution((oi, oj), (m, n))
        assert sub.size == (m, n)
        for (i, j) in [(0, 0), (m - 1, n - 1), (m // 2, n // 3)]:
            if i < 0 or j < 0 or m == 0 or n == 0:
                continue
            gp = (oi + i, oj + j)
            assert sub.rank_global_element((i, j)) == \
                d.rank_global_element(gp)
            assert sub.tile_element_from_global_element((i, j)) == \
                d.tile_element_from_global_element(gp)


def test_sub_distribution_bounds():
    import pytest

    from dlaf_tpu.matrix.distribution import Distribution
    d = Distribution((10, 10), (4, 4))
    with pytest.raises(ValueError):
        d.sub_distribution((8, 0), (3, 1))
    with pytest.raises(ValueError):
        d.sub_distribution((-1, 0), (1, 1))


def test_tiles_per_block_validation():
    import pytest

    from dlaf_tpu.matrix.distribution import Distribution
    with pytest.raises(ValueError):
        Distribution((10, 10), (8, 8), tiles_per_block=(3, 1))
