"""Multi-process (multi-host) execution plumbing.

Equivalent of the reference's MPI bootstrap: every reference distributed
test runs as a real multi-rank job (``cmake/DLAF_AddTest.cmake:107-120``);
the TPU-native analogue is JAX multi-controller: each process calls
:func:`initialize_multiprocess` (wrapping ``jax.distributed.initialize``),
after which ``jax.devices()`` is the *global* device list and a
:class:`~dlaf_tpu.parallel.grid.Grid` built from it spans all hosts —
every algorithm then runs SPMD across processes with XLA collectives over
ICI/DCN (CPU testing: gloo).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from .grid import Grid


def initialize_multiprocess(coordinator_address: str, num_processes: int,
                            process_id: int, **kw) -> None:
    """Join the multi-controller runtime (call once, before device use).

    The reference requires ``MPI_THREAD_MULTIPLE`` at init
    (``src/init.cpp:389-398``); here the equivalent contract is that this
    runs before any JAX computation creates the backend.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_grid(shape: Optional[Tuple[int, int]] = None) -> Grid:
    """A grid over the *global* device list (all processes).

    Without ``shape``, picks the squarest P x Q covering every device.
    """
    devs = jax.devices()
    n = len(devs)
    if shape is None:
        p = int(np.floor(np.sqrt(n)))
        while n % p:
            p -= 1
        shape = (p, n // p)
    return Grid(shape, devices=devs)


def barrier(name: str = "dlaf_barrier") -> None:
    """Cross-process synchronization point (the reference's
    ``comm::sync::basic::barrier``); no-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def gather_natural(mat) -> np.ndarray:
    """Natural-order numpy array of a DistMatrix, valid on every process.

    Multi-process arrays are only partially addressable per process; this
    is the cross-process analogue of the test helper ``allGather``
    (reference ``dlaf_test/matrix/util_matrix.h``).
    """
    from jax.experimental import multihost_utils
    nat = mat.to_natural()
    if jax.process_count() == 1:
        return np.asarray(nat)
    return np.asarray(multihost_utils.process_allgather(nat, tiled=True))
