"""Snapshot IO + redistribution tests (reference:
``test_matrix_hdf5.cpp`` — write on one grid, read on another — and the
redistribution miniapp)."""

import pytest
import jax.numpy as jnp
import numpy as np

from dlaf_tpu import DistMatrix, Grid
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.matrix.copy import redistribute
from dlaf_tpu.matrix.io import load_matrix, save_matrix


def test_save_load_roundtrip(tmp_path, grid):
    a = mu.random(13, 9, np.float64, 1)
    m = DistMatrix.from_natural(jnp.asarray(a), 4, grid)
    p = str(tmp_path / "snap")
    save_matrix(p, m)
    back = load_matrix(p)
    np.testing.assert_array_equal(np.asarray(back.to_natural()), a)
    assert back.block_size == (4, 4)


def test_load_on_other_grid(tmp_path):
    """Written on P ranks, read on Q ranks with another block size
    (the reference's P-write/Q-read property, ``matrix/hdf5.h``)."""
    a = mu.random(17, 17, np.complex128, 2)
    m = DistMatrix.from_natural(jnp.asarray(a), 4, Grid((2, 4)))
    p = str(tmp_path / "snap2")
    save_matrix(p, m)
    back = load_matrix(p, block_size=8, grid=Grid((4, 2)))
    np.testing.assert_array_equal(np.asarray(back.to_natural()), a)
    assert back.block_size == (8, 8)
    assert back.grid.shape == (4, 2)


def test_redistribute(grid):
    a = mu.random(19, 11, np.float64, 3)
    m = DistMatrix.from_natural(jnp.asarray(a), 4, grid)
    r = redistribute(m, 8, Grid((2, 2)))
    np.testing.assert_array_equal(np.asarray(r.to_natural()), a)
    back = redistribute(r, 4, grid, keep_grid=False)
    np.testing.assert_array_equal(np.asarray(back.to_natural()), a)


def test_debug_dump_flags(tmp_path, monkeypatch):
    from dlaf_tpu.matrix.io import debug_dump
    from dlaf_tpu.tune import set_tune_parameters
    a = DistMatrix.from_natural(jnp.eye(4), 2)
    set_tune_parameters(debug_dump_eigensolver=False)
    debug_dump("eigensolver", a, "x")  # no-op
    set_tune_parameters(debug_dump_eigensolver=True,
                        debug_dump_dir=str(tmp_path))
    debug_dump("eigensolver", a, "x")
    set_tune_parameters(debug_dump_eigensolver=False)
    assert (tmp_path / "eigensolver_x.npz").exists()


def test_hdf5_roundtrip(tmp_path):
    """HDF5 snapshot round trip with block-size change on load
    (reference ``matrix/hdf5.h`` P-write/Q-read)."""
    import jax.numpy as jnp
    import numpy as np

    from dlaf_tpu.matrix.io import load_matrix, save_matrix
    from dlaf_tpu.matrix.matrix import DistMatrix
    rng = np.random.default_rng(2)
    a = rng.standard_normal((37, 29)).astype(np.float32)
    mat = DistMatrix.from_natural(jnp.asarray(a), (8, 8))
    path = str(tmp_path / "snap.h5")
    save_matrix(path, mat)
    back = load_matrix(path)
    assert back.block_size == (8, 8)
    assert np.array_equal(np.asarray(back.to_natural()), a)
    finer = load_matrix(path, block_size=(4, 4))
    assert np.array_equal(np.asarray(finer.to_natural()), a)


@pytest.mark.parametrize("ext", [".h5", ".npz"])
def test_sharded_rank_files_roundtrip(tmp_path, ext):
    """Per-rank (non-gathering) snapshot files: each process writes only
    its addressable storage-order shards (reference hdf5.h:160-260
    independent-access analogue); load reassembles onto any grid."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dlaf_tpu.matrix.io import load_matrix, save_matrix
    from dlaf_tpu.matrix.matrix import DistMatrix
    from dlaf_tpu.parallel.grid import Grid

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(5)
    a = rng.standard_normal((45, 33)).astype(np.float32)
    grid = Grid((2, 4))
    mat = DistMatrix.from_natural(jnp.asarray(a), (8, 8), grid)
    path = str(tmp_path / ("snap" + ext))
    save_matrix(path, mat, sharded=True)
    assert not (tmp_path / ("snap" + ext)).exists()   # no gathered file
    rank0 = str(tmp_path / ("snap.r0of1" + ext))
    import os
    assert os.path.exists(rank0)
    back = load_matrix(path)                          # replicated
    assert np.array_equal(np.asarray(back.to_natural()), a)
    # re-load onto a different grid and block size
    other = load_matrix(path, block_size=(4, 4), grid=Grid((4, 2)))
    assert np.array_equal(np.asarray(other.to_natural()), a)
