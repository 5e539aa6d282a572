"""Distributed-matrix snapshots (save / load / redistribute-on-load).

Equivalent of the reference's HDF5 matrix I/O (``matrix/hdf5.h:160-260``:
``FileHDF5`` independent-access read/write of whole distributed matrices,
used by the debug-dump tune flags and ``miniapp_eigensolver --input-file``).
Snapshots are ``.h5`` datasets when the path ends in ``.h5``/``.hdf5``
(h5py; dataset layout ``/data`` + block-size attribute, interoperable with
reference-style dumps) or ``.npz`` otherwise; like the reference, a matrix
written with one grid/block size can be read back onto any other
(redistribution happens on load).  Debug dumps are gated by the same kind
of tune flags (``tune.py: debug_dump_*``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..parallel.grid import Grid
from ..tune import get_tune_parameters
from .matrix import DistMatrix


def _is_h5(path: str) -> bool:
    return path.endswith((".h5", ".hdf5"))


def save_matrix(path: str, mat: DistMatrix) -> None:
    """Write a snapshot (gathers to natural order on host)."""
    nat = np.asarray(mat.to_natural())
    grid = (0, 0) if mat.grid is None else mat.grid.shape
    if _is_h5(path):
        import h5py
        with h5py.File(path, "w") as f:
            ds = f.create_dataset("data", data=nat)
            ds.attrs["block_size"] = np.asarray(mat.block_size, np.int64)
            ds.attrs["grid_shape"] = np.asarray(grid, np.int64)
        return
    np.savez(path,
             data=nat,
             block_size=np.asarray(mat.block_size, np.int64),
             grid_shape=np.asarray(grid, np.int64),
             version=np.asarray([1], np.int64))


def load_matrix(path: str, block_size=None,
                grid: Optional[Grid] = None) -> DistMatrix:
    """Read a snapshot; block size / grid may differ from the writer's."""
    if _is_h5(path):
        import h5py
        with h5py.File(path, "r") as f:
            ds = f["data"]
            nat = np.asarray(ds)
            saved_block = tuple(
                int(x) for x in ds.attrs.get("block_size", (128, 128)))
    else:
        if not path.endswith(".npz") and not os.path.exists(path):
            path = path + ".npz"
        with np.load(path) as f:
            nat = f["data"]
            saved_block = tuple(int(x) for x in f["block_size"])
    if block_size is None:
        block_size = saved_block
    return DistMatrix.from_natural(jnp.asarray(nat), block_size, grid)


def debug_dump(tag: str, mat: DistMatrix, stage: str) -> None:
    """Dump gated by tune flags — the analogue of the reference's
    ``dump_cholesky_{data,factorization}`` etc. (``tune.h`` HDF5 flags,
    used at ``factorization/cholesky/impl.h:196-207,306-312``)."""
    p = get_tune_parameters()
    flag = getattr(p, f"debug_dump_{tag}", False)
    if not flag:
        return
    os.makedirs(p.debug_dump_dir, exist_ok=True)
    save_matrix(os.path.join(p.debug_dump_dir, f"{tag}_{stage}"), mat)
