"""DistMatrix / layout tests (reference: ``test_matrix.cpp``, layout parts).

Checks the natural <-> storage bijection, that the sharded storage really
gives each mesh rank its block-cyclic tiles, and from_natural/to_natural
round-trips across grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import DistMatrix, Grid
from dlaf_tpu.matrix.distribution import Distribution
from dlaf_tpu.matrix.layout import (natural_to_storage, pad_natural,
                                    storage_to_natural)


@pytest.mark.parametrize("size,block,gshape", [
    ((13, 7), (4, 3), (2, 4)),
    ((32, 32), (8, 8), (4, 2)),
    ((9, 9), (4, 4), (2, 2)),
    ((5, 40), (8, 8), (1, 8)),
])
def test_storage_roundtrip(size, block, gshape):
    d = Distribution(size, block, gshape)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(size))
    p = pad_natural(a, d)
    s = natural_to_storage(p, d)
    back = storage_to_natural(s, d)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(p))


def test_storage_matches_distribution_algebra():
    """Tile (i,j) of the natural matrix lands at its storage_tile position."""
    d = Distribution((24, 18), (4, 3), (3, 2))
    mt, nt = d.nr_tiles
    mb, nb = d.block_size
    a = np.zeros(d.size)
    for i in range(mt):
        for j in range(nt):
            a[i * mb:(i + 1) * mb, j * nb:(j + 1) * nb] = i * nt + j
    s = np.asarray(natural_to_storage(pad_natural(jnp.asarray(a), d), d))
    for i in range(mt):
        for j in range(nt):
            si, sj = d.storage_tile_from_global_tile((i, j))
            blk = s[si * mb:(si + 1) * mb, sj * nb:(sj + 1) * nb]
            assert (blk == i * nt + j).all()


def test_sharded_ownership(dist_grid):
    """Each device's shard holds exactly its block-cyclic tiles."""
    g = dist_grid
    P, Q = g.shape
    d = Distribution((16, 16), (2, 2), (P, Q))
    mt, nt = d.nr_tiles
    a = np.zeros((16, 16))
    for i in range(mt):
        for j in range(nt):
            a[i * 2:(i + 1) * 2, j * 2:(j + 1) * 2] = i * 100 + j
    m = DistMatrix.from_natural(jnp.asarray(a), (2, 2), g)
    lmt, lnt = d.local_nr_tiles
    for shard in m.data.addressable_shards:
        # mesh position of this device
        idx = np.argwhere(np.asarray(g.mesh.devices) ==
                          np.asarray(shard.device)).ravel()
        p, q = int(idx[0]), int(idx[1])
        local = np.asarray(shard.data)
        for li in range(lmt):
            for lj in range(lnt):
                gi, gj = li * P + p, lj * Q + q
                blk = local[li * 2:(li + 1) * 2, lj * 2:(lj + 1) * 2]
                if gi < mt and gj < nt:
                    assert (blk == gi * 100 + gj).all()


def test_from_to_natural_roundtrip(grid):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((19, 11))
    m = DistMatrix.from_natural(jnp.asarray(a), (4, 4), grid)
    np.testing.assert_array_equal(np.asarray(m.to_natural()), a)


def test_empty_matrix(grid):
    m = DistMatrix.from_natural(jnp.zeros((0, 0)), 4, grid)
    assert m.to_natural().shape == (0, 0)


def test_diag_pad():
    d = Distribution((5, 5), (4, 4), (2, 2))
    a = jnp.zeros((5, 5))
    p = pad_natural(a, d, diag_fill=1.0)
    dd = np.asarray(jnp.diagonal(p))
    assert (dd[:5] == 0).all() and (dd[5:] == 1).all()


def test_pytree_jit():
    m = DistMatrix.from_natural(jnp.eye(8), 4)
    out = jax.jit(lambda x: x.with_data(x.data * 2))(m)
    assert isinstance(out, DistMatrix)
    np.testing.assert_array_equal(np.asarray(out.to_natural()),
                                  2 * np.eye(8))


def test_col_major_layout():
    """ScaLAPACK local layout offsets (reference col_major_layout.h)."""
    from dlaf_tpu.matrix.distribution import Distribution
    from dlaf_tpu.matrix.layout import ColMajorLayout

    d = Distribution((100, 90), (8, 8), (3, 2), (0, 0))
    for rank in [(0, 0), (2, 1), (1, 0)]:
        lay = ColMajorLayout(d, rank)
        lm, ln = lay.local_size
        assert lay.min_mem_size() == (0 if lm * ln == 0 else
                                      lay.lld * (ln - 1) + lm)
        # offsets are within the buffer and column-major consistent
        import numpy as np
        mb = 8
        for lt in [(0, 0), (1, 0), (0, 1), (2, 3)]:
            r, c = lay.local_tile_origin(lt)
            if r >= lm or c >= ln:
                continue
            assert lay.tile_offset(lt) == r + c * lay.lld
            th, tw = lay.tile_size_of(lt)
            assert 0 < th <= mb and 0 < tw <= mb
            assert r + th <= lm and c + tw <= ln
    # padded lld
    lay = ColMajorLayout(d, (0, 0), lld=128)
    assert lay.tile_offset((0, 1)) == 8 * 128
    import pytest
    with pytest.raises(ValueError):
        ColMajorLayout(d, (0, 0), lld=1)
