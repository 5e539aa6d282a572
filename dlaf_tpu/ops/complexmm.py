"""Pair-of-reals complex matrix products (for real-only backends).

The axon TPU plugin cannot transfer complex buffers and several complex
lowerings are missing, so complex arrays cross the host boundary as
``(re, im)`` REAL pairs and products run as real MXU gemms:

* ``cgemm_pair``: 4-gemm product (or the 3-gemm Gauss/Karatsuba form,
  one fewer MXU pass at the cost of two extra adds and slightly worse
  rounding);
* ``cherk_pair``: Hermitian rank-k update ``C = A A^H`` exploiting
  ``re(C) = Ar Ar^T + Ai Ai^T`` (symmetric) and
  ``im(C) = Ai Ar^T - Ar Ai^T`` (antisymmetric).

This is the SURVEY §7 "complex via pair-of-reals where XLA lacks
support" mechanism in its standalone form; the eigensolver uses the
equivalent block embedding (``algorithms/eigensolver/complex_embed``),
which IS these identities applied once at the matrix level.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import tile


def cgemm_pair(ar, ai, br, bi, algo: str = "gauss"):
    """(ar + i ai) @ (br + i bi) -> (cr, ci) via real gemms.

    ``algo``: "4mul" (plain, 4 gemms) or "gauss" (the standard 3M form:
    t1 = Ar Br, t2 = Ai Bi, t3 = (Ar + Ai)(Br + Bi);
    cr = t1 - t2, ci = t3 - t1 - t2).
    """
    if algo == "4mul":
        cr = tile.dot(ar, br) - tile.dot(ai, bi)
        ci = tile.dot(ar, bi) + tile.dot(ai, br)
        return cr, ci
    if algo != "gauss":
        raise ValueError(f"unknown algo {algo!r}")
    t1 = tile.dot(ar, br)
    t2 = tile.dot(ai, bi)
    t3 = tile.dot(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def cherk_pair(ar, ai):
    """(ar + i ai) @ (ar + i ai)^H -> (cr, ci): re symmetric, im
    antisymmetric, 4 real gemms (2 symmetric)."""
    cr = tile.dot(ar, ar.T) + tile.dot(ai, ai.T)
    x = tile.dot(ai, ar.T)
    ci = x - x.T
    return cr, ci


def pair_to_complex(cr, ci, dtype=None):
    """Host-side decode helper (tests / boundaries)."""
    import numpy as np
    out = np.asarray(cr) + 1j * np.asarray(ci)
    return out.astype(dtype) if dtype is not None else out
