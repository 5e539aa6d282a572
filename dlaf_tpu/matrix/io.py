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


def _rank_path(path: str, pid: int, nproc: int) -> str:
    for ext in (".h5", ".hdf5", ".npz"):
        if path.endswith(ext):
            return path[: -len(ext)] + f".r{pid}of{nproc}" + ext
    return path + f".r{pid}of{nproc}"


def save_matrix(path: str, mat: DistMatrix, *, sharded=None) -> None:
    """Write a snapshot.

    Single process: one file with the natural-order matrix (gather).
    Multi-process (or ``sharded=True``): INDEPENDENT per-rank files —
    each process writes only its addressable storage-order shards
    (O(n^2 / P) host memory, no cross-process gather), the analogue of
    the reference's HDF5 independent-access writes
    (``matrix/hdf5.h:160-260``).  ``load_matrix`` reassembles either
    form onto any block size / grid.
    """
    import jax
    if sharded is None:
        sharded = jax.process_count() > 1 and mat.grid is not None
    if sharded:
        _save_matrix_sharded(path, mat)
        return
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


def _dist_meta(mat: DistMatrix) -> dict:
    d = mat.dist
    return {"size": d.size, "block_size": d.block_size,
            "grid_size": d.grid_size, "src_rank": d.src_rank,
            "padded": d.padded_size}


def _save_matrix_sharded(path: str, mat: DistMatrix) -> None:
    import jax
    pid, nproc = jax.process_index(), jax.process_count()
    shards = [s for s in mat.data.addressable_shards if s.replica_id == 0]
    meta = _dist_meta(mat)
    rp = _rank_path(path, pid, nproc)
    if _is_h5(rp):
        import h5py
        with h5py.File(rp, "w") as f:
            for key, val in meta.items():
                f.attrs[key] = np.asarray(val, np.int64)
            f.attrs["nproc"] = nproc
            for k, s in enumerate(shards):
                ds = f.create_dataset(f"shard_{k}", data=np.asarray(s.data))
                r, c = s.index
                ds.attrs["origin"] = np.asarray(
                    [r.start or 0, c.start or 0], np.int64)
        return
    arrays = {"nproc": np.asarray([nproc], np.int64)}
    for key, val in meta.items():
        arrays[key] = np.asarray(val, np.int64)
    for k, s in enumerate(shards):
        r, c = s.index
        arrays[f"shard_{k}"] = np.asarray(s.data)
        arrays[f"origin_{k}"] = np.asarray([r.start or 0, c.start or 0],
                                           np.int64)
    np.savez(rp, **arrays)


def load_matrix(path: str, block_size=None,
                grid: Optional[Grid] = None) -> DistMatrix:
    """Read a snapshot; block size / grid may differ from the writer's.
    Per-rank sharded snapshots are reassembled transparently."""
    if not os.path.exists(path) and not os.path.exists(path + ".npz"):
        nat, saved_block = _load_sharded(path)
        if nat is not None:
            if block_size is None:
                block_size = saved_block
            return DistMatrix.from_natural(jnp.asarray(nat), block_size,
                                           grid)
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


def _load_sharded(path: str):
    """Reassemble per-rank shard files -> (natural array, block_size);
    (None, None) when no rank-0 file exists."""
    import glob

    from .distribution import Distribution
    from .layout import storage_to_natural, unpad_natural

    cands = glob.glob(_rank_path(path, 0, 1).replace("r0of1", "r0of*"))
    if not cands:
        return None, None
    first = sorted(cands)[0]

    def read(rp):
        out = []
        if _is_h5(rp):
            import h5py
            with h5py.File(rp, "r") as f:
                meta = {k: tuple(int(x) for x in np.atleast_1d(f.attrs[k]))
                        for k in ("size", "block_size", "grid_size",
                                  "src_rank", "padded")}
                nproc = int(f.attrs["nproc"])
                for k in sorted(x for x in f.keys()
                                if x.startswith("shard_")):
                    out.append((tuple(int(x) for x in f[k].attrs["origin"]),
                                np.asarray(f[k])))
        else:
            with np.load(rp) as f:
                meta = {k: tuple(int(x) for x in np.atleast_1d(f[k]))
                        for k in ("size", "block_size", "grid_size",
                                  "src_rank", "padded")}
                nproc = int(f["nproc"][0])
                k = 0
                while f"shard_{k}" in f:
                    out.append((tuple(int(x) for x in f[f"origin_{k}"]),
                                f[f"shard_{k}"]))
                    k += 1
        return meta, nproc, out

    meta, nproc, shards = read(first)
    storage = np.zeros(meta["padded"],
                       shards[0][1].dtype if shards else np.float32)
    for pid in range(nproc):
        rp = _rank_path(path, pid, nproc)
        _, _, out = (meta, nproc, shards) if pid == 0 else read(rp)
        for (r0, c0), blk in out:
            storage[r0:r0 + blk.shape[0], c0:c0 + blk.shape[1]] = blk
    dist = Distribution(meta["size"], meta["block_size"],
                        meta["grid_size"], meta["src_rank"])
    nat = np.asarray(unpad_natural(
        storage_to_natural(jnp.asarray(storage), dist), dist))
    return nat, meta["block_size"]


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
