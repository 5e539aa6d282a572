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

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the unrolled algorithm drivers are
# compile-heavy (geqrf/eigh lowerings, bucketed loops); caching makes every
# run after the first start in seconds.  Opt out with DLAF_COMPILE_CACHE=0.
if _os.environ.get("DLAF_COMPILE_CACHE", "1") not in ("0", "OFF", "off"):
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("DLAF_COMPILE_CACHE_DIR",
                            _os.path.expanduser("~/.cache/dlaf_tpu_xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass

from .matrix.distribution import Distribution
from .matrix.matrix import DistMatrix
from .matrix.ref import MatrixRef
from .parallel.grid import Grid
from .tune import get_tune_parameters, set_tune_parameters
from .types import total_ops

from .algorithms.factorization.cholesky import cholesky_factorization
from .algorithms.solver.triangular import triangular_solver
from .algorithms.multiplication.general import general_multiplication
from .algorithms.multiplication.hermitian import hermitian_multiplication
from .algorithms.multiplication.triangular import triangular_multiplication
from .algorithms.inverse.triangular import triangular_inverse
from .algorithms.inverse.cholesky import (cholesky_inverse,
                                          inverse_from_cholesky_factor)
from .algorithms.auxiliary.norm import max_norm
from .algorithms.auxiliary.transpose import adjoint, transpose
from .algorithms.eigensolver.gen_to_std import generalized_to_standard
from .algorithms.eigensolver.reduction_to_band import reduction_to_band
from .algorithms.eigensolver.tridiag_solver import tridiagonal_eigensolver
from .algorithms.eigensolver.eigensolver import (
    hermitian_eigensolver, hermitian_eigensolver_host,
    hermitian_generalized_eigensolver,
    hermitian_generalized_eigensolver_host)
from .algorithms.refine import (cholesky_refine,
                                hermitian_eigensolver_refined,
                                refine_eigenvalues,
                                refine_generalized_eigenvalues)

__version__ = "0.1.0"

__all__ = [
    "Distribution",
    "DistMatrix",
    "MatrixRef",
    "Grid",
    "get_tune_parameters",
    "set_tune_parameters",
    "total_ops",
    "cholesky_factorization",
    "triangular_solver",
    "general_multiplication",
    "hermitian_multiplication",
    "triangular_multiplication",
    "triangular_inverse",
    "cholesky_inverse",
    "inverse_from_cholesky_factor",
    "max_norm",
    "adjoint",
    "transpose",
    "generalized_to_standard",
    "reduction_to_band",
    "tridiagonal_eigensolver",
    "hermitian_eigensolver",
    "hermitian_eigensolver_host",
    "hermitian_generalized_eigensolver",
    "hermitian_generalized_eigensolver_host",
    "cholesky_refine",
    "hermitian_eigensolver_refined",
    "refine_eigenvalues",
    "refine_generalized_eigenvalues",
]
