"""Distributed general matrix multiplication (GEMM) on sub-matrix ranges.

Equivalent of the reference's ``general_multiplication``
(``multiplication/general.h:62,95``; impl ``multiplication/general/impl.h:35``
local, ``:65-153`` distributed).  The reference hand-writes a k-loop with
column/row panel broadcasts because MPI gives it nothing better; the
TPU-native design hands the natural-order operands to XLA's SPMD partitioner,
which emits the SUMMA collective schedule itself.  Unlike the reference
(NoTrans x NoTrans only, ``multiplication/general/api.h``), all op
combinations are supported; like the reference, operands may be tile-aligned
sub-matrix views (:class:`~dlaf_tpu.matrix.ref.MatrixRef`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...matrix.ref import MatrixRef, as_ref
from ...ops import tile
from ..internal import natural_of_ref, same_grid, store_into_ref


@partial(jax.jit, static_argnames=("op_a", "op_b"))
def general_multiplication(alpha, op_a: str, a, op_b: str, b,
                           beta, c) -> DistMatrix:
    """c = alpha op_a(a) @ op_b(b) + beta c; returns c's parent updated.

    ``a``/``b``/``c`` are DistMatrix or MatrixRef.  Result is returned as the
    (possibly ref-parent) DistMatrix holding the updated ``c`` window.
    """
    a, b, c = as_ref(a), as_ref(b), as_ref(c)
    same_grid(a.parent, b.parent, c.parent)
    am = a.size if op_a == "N" else a.size[::-1]
    bm = b.size if op_b == "N" else b.size[::-1]
    if am[1] != bm[0] or c.size != (am[0], bm[1]):
        raise ValueError(f"gemm shape mismatch {a.size}/{b.size}/{c.size}")

    na = tile.op(op_a, natural_of_ref(a))
    nb = tile.op(op_b, natural_of_ref(b))
    nc = natural_of_ref(c)
    out = jnp.asarray(alpha, nc.dtype) * tile.dot(na, nb) \
        + jnp.asarray(beta, nc.dtype) * nc
    return store_into_ref(c, out)
