"""dlaf_tpu — TPU-native distributed dense linear algebra.

A from-scratch JAX/XLA framework with the capabilities of eth-cscs/DLA-Future
(reference layer map in /root/repo/SURVEY.md): 2D block-cyclic matrices over a
device mesh, distributed Cholesky factorization/inversion, triangular
solve/multiply/inverse, Hermitian/general multiplication, and the full
symmetric/Hermitian (generalized) eigensolver, with local (single-device)
variants, a miniapp benchmark harness, and residual-based test suites.

Where the reference composes pika sender graphs over MPI + cuBLAS, this
framework unrolls algorithm drivers into single XLA programs over
``shard_map`` meshes: collectives ride ICI, tile kernels ride the MXU, and
XLA's async scheduler supplies the communication/computation overlap.
"""

from .matrix.distribution import Distribution
from .matrix.matrix import DistMatrix
from .parallel.grid import Grid
from .tune import get_tune_parameters, set_tune_parameters
from .types import total_ops

from .algorithms.factorization.cholesky import cholesky_factorization
from .algorithms.auxiliary.transpose import adjoint, transpose

__version__ = "0.1.0"

__all__ = [
    "Distribution",
    "DistMatrix",
    "Grid",
    "get_tune_parameters",
    "set_tune_parameters",
    "total_ops",
    "cholesky_factorization",
    "adjoint",
    "transpose",
]
