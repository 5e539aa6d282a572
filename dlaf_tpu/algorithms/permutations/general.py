"""Distributed row/column permutations.

Equivalent of the reference's ``permute<B, D, T, Coord>``
(``permutations/general.h:50+``, impl ``permutations/general/impl.h`` + the
batched gather GPU kernel ``perms.cu``): applies an index permutation to a
tile-aligned sub-range of rows or columns.  On TPU a permutation is one
gather in natural order — XLA emits the batched gather (and the collective
when sharded) that the reference hand-writes.  Used by the D&C merge for
eigenvector reordering (there via ``jnp.take`` directly); this is the public
free-function form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...matrix.ref import as_ref
from ..internal import natural_of_ref, store_into_ref


@partial(jax.jit, static_argnames=("coord",))
def permute(perms, mat_in, mat_out, coord: str = "Col") -> DistMatrix:
    """Permute rows ('Row') or columns ('Col') of ``mat_in`` into
    ``mat_out``'s window: ``out[..., i] = in[..., perms[i]]``.

    ``mat_in``/``mat_out`` are DistMatrix or MatrixRef with equal sizes;
    returns ``mat_out``'s parent updated.
    """
    if coord not in ("Row", "Col"):
        raise ValueError("coord must be 'Row' or 'Col'")
    rin, rout = as_ref(mat_in), as_ref(mat_out)
    if rin.size != rout.size:
        raise ValueError("in/out sizes must match")
    perms = jnp.asarray(perms)
    nat = natural_of_ref(rin)
    axis = 0 if coord == "Row" else 1
    if perms.shape[0] != rin.size[axis]:
        raise ValueError("permutation length mismatch")
    out = jnp.take(nat, perms, axis=axis)
    return store_into_ref(rout, out)
