"""Distributed matrix norms.

Equivalent of the reference's ``max_norm`` (``auxiliary/norm.h:36``, impl
``auxiliary/norm/mc.h``: per-tile lange('M') + reduce to rank 0).  Here the
reduction is a single XLA-partitioned max over the referenced triangle; the
result is replicated on every rank (the reference delivers it to one rank —
replication is the natural SPMD contract).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_padded


@partial(jax.jit, static_argnames=("uplo",))
def max_norm(a: DistMatrix, uplo: str = "G"):
    """max |a_ij| over the ``uplo`` part ('G' general, 'L'/'U' triangle)."""
    if uplo not in ("G", "L", "U"):
        raise ValueError("invalid uplo")
    m, n = a.size
    nat = natural_padded(a)
    absn = jnp.abs(nat)
    rows = jnp.arange(nat.shape[0])[:, None]
    cols = jnp.arange(nat.shape[1])[None, :]
    mask = (rows < m) & (cols < n)
    if uplo == "L":
        mask &= rows >= cols
    elif uplo == "U":
        mask &= rows <= cols
    absn = jnp.where(mask, absn, jnp.zeros_like(absn))
    if a.size[0] == 0 or a.size[1] == 0:
        return jnp.zeros((), absn.dtype)
    return jnp.max(absn)
