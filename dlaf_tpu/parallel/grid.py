"""Process grid over a JAX device mesh.

TPU-native replacement for the reference's ``CommunicatorGrid``
(``include/dlaf/communication/communicator_grid.h:37-158``): where the
reference builds row/col/full MPI communicators plus N round-robin
``CommunicatorPipeline``s, here a grid is a 2D ``jax.sharding.Mesh`` with axis
names ``('p', 'q')``.  Communicator pipelines (MPI-call ordering) are subsumed
by XLA program order; overlap of independent collective chains is XLA's async
collective scheduler's job, not ours.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "p"  # grid-row coordinate (varies down a column of ranks)
COL_AXIS = "q"  # grid-column coordinate (varies along a row of ranks)


class Grid:
    """A ``P x Q`` logical grid over JAX devices.

    ``Grid(shape)`` builds a mesh over ``jax.devices()``; pass ``devices`` or
    an existing ``mesh`` for control.  Equivalent of constructing a
    ``CommunicatorGrid`` from ``MPI_COMM_WORLD`` in the reference miniapps.
    """

    def __init__(self, shape=None, *, mesh: Mesh | None = None, devices=None):
        if mesh is not None:
            if tuple(mesh.axis_names) != (ROW_AXIS, COL_AXIS):
                raise ValueError(
                    f"mesh must have axis names {(ROW_AXIS, COL_AXIS)}")
            self.mesh = mesh
        else:
            if shape is None:
                raise ValueError("either shape or mesh is required")
            if devices is None:
                devices = jax.devices()
            p, q = shape
            if p * q > len(devices):
                raise ValueError(
                    f"grid {shape} needs {p * q} devices, have {len(devices)}")
            dev = np.asarray(devices[: p * q]).reshape(p, q)
            self.mesh = Mesh(dev, (ROW_AXIS, COL_AXIS))

    @property
    def shape(self):
        return (self.mesh.shape[ROW_AXIS], self.mesh.shape[COL_AXIS])

    @property
    def nrows(self) -> int:
        return self.mesh.shape[ROW_AXIS]

    @property
    def ncols(self) -> int:
        return self.mesh.shape[COL_AXIS]

    def sharding(self) -> NamedSharding:
        """Sharding of a storage-order distributed matrix over this grid."""
        return NamedSharding(self.mesh, P(ROW_AXIS, COL_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def __eq__(self, other):
        return isinstance(other, Grid) and self.mesh == other.mesh

    def __hash__(self):
        return hash(self.mesh)

    def __repr__(self):
        return f"Grid({self.nrows}x{self.ncols})"
