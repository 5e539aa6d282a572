"""Generalized-to-standard eigenproblem reduction (HEGST).

Equivalent of the reference's ``generalized_to_standard``
(``eigensolver/gen_to_std.h``, impl ``eigensolver/gen_to_std/impl.h``: tiled
two-sided hegst with per-k diag hegst + trsm/hemm/her2k updates and panel
broadcasts).  TPU-native: the whole two-sided transform
``A <- inv(L) A inv(L)^H`` (itype 1, uplo L; B = L L^H already factored) is
two distributed triangular solves through the existing driver — XLA overlaps
the panel communication exactly where the reference hand-pipelines it.
Full-matrix flops (n^3) vs the reference's symmetric-aware n^3/2 is the known
round-1 trade; the MXU rectangle is cheaper than the halved-but-fragmented
update.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_exact, store_natural_exact
from ..solver.triangular import triangular_solver


@partial(jax.jit, static_argnames=("uplo",))
def generalized_to_standard(uplo: str, a: DistMatrix,
                            b: DistMatrix) -> DistMatrix:
    """Reduce A x = lambda B x to standard form given B's Cholesky factor.

    ``a``: Hermitian, stored in the ``uplo`` triangle.  ``b``: the Cholesky
    factor of B in the same triangle (L for uplo=L, U for uplo=U).  Returns
    the standard-form Hermitian matrix in the ``uplo`` triangle:
    uplo=L: inv(L) A inv(L)^H;  uplo=U: inv(U)^H A inv(U).
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    if a.size != b.size or a.size[0] != a.size[1]:
        raise ValueError("A, B must be square and same size")

    # materialize the full Hermitian A (pad region stays zero)
    full = store_natural_exact(a, tile.hermitian_full(natural_exact(a), uplo))
    if uplo == "L":
        x = triangular_solver("L", "L", "N", "N", 1.0, b, full)
        out = triangular_solver("R", "L", "C", "N", 1.0, b, x)
    else:
        x = triangular_solver("L", "U", "C", "N", 1.0, b, full)
        out = triangular_solver("R", "U", "N", "N", 1.0, b, x)
    return out
