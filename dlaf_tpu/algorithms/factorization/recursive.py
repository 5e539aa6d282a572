"""Recursive (cache-oblivious) Cholesky for the single-device fast path.

The reference's local backend tiles POTRF over pika tasks calling LAPACK
(``factorization/cholesky/impl.h:151-189``); the TPU-native equivalent of
"let the BLAS do the work" is to express the factorization as a recursion
over MXU-sized gemms and let XLA fuse/schedule:

* ``A = [[A11,  *], [A21, A22]]`` -> ``L11 = rpotrf(A11)``,
  ``L21 = A21 (L11^-1)^H`` (inversion-based trsm: XLA's triangular_solve HLO
  reaches ~half the matmul roofline, an explicit recursive ``trtri`` turns
  the solve into pure gemms), ``L22 = rpotrf(A22 - L21 L21^H)``;
* the trailing ``herk`` recurses on triangles so only ~``2 base/n`` of the
  rectangle flops are wasted on diagonal blocks (the reference's tiled loop
  gets the triangle for free; the MXU prefers few big gemms);
* base case: the XLA ``cholesky`` HLO on a ``base x base`` block.

Only the lower triangle of inputs/outputs is significant (upper parts may
hold garbage, exactly LAPACK's contract).  Assembly uses ``concatenate``
(GSPMD-safe), never scatter.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ...ops import tile
from ...tune import get_tune_parameters


def _half(m: int, align: int = 256) -> int:
    """Split point: ~m/2 rounded up to MXU-friendly alignment."""
    h = (m + 1) // 2
    if m > align:
        h = -(-h // align) * align
    return min(h, m - 1) if m > 1 else 1


def rtrmm_right(x, t, uplo: str, base: int):
    """``x @ t`` with ``t`` triangular (true zeros in the other triangle),
    recursing so the zero half costs nothing — the reference's tiled trmm
    gets this for free; on the MXU it halves the gemm flops."""
    m = t.shape[0]
    if m <= base or x.shape[0] == 0:
        return tile.dot(x, t)
    h = _half(m)
    if uplo == "U":
        y1 = rtrmm_right(x[:, :h], t[:h, :h], "U", base)
        y2 = tile.dot(x[:, :h], t[:h, h:]) + \
            rtrmm_right(x[:, h:], t[h:, h:], "U", base)
    else:
        y1 = rtrmm_right(x[:, :h], t[:h, :h], "L", base) + \
            tile.dot(x[:, h:], t[h:, :h])
        y2 = rtrmm_right(x[:, h:], t[h:, h:], "L", base)
    return jnp.concatenate([y1, y2], axis=1)


def rtrmm_left(t, x, uplo: str, base: int):
    """``t @ x`` with ``t`` triangular (true zeros), triangle-aware."""
    m = t.shape[0]
    if m <= base or x.shape[1] == 0:
        return tile.dot(t, x)
    h = _half(m)
    if uplo == "L":
        y1 = rtrmm_left(t[:h, :h], x[:h], "L", base)
        y2 = tile.dot(t[h:, :h], x[:h]) + \
            rtrmm_left(t[h:, h:], x[h:], "L", base)
    else:
        y1 = rtrmm_left(t[:h, :h], x[:h], "U", base) + \
            tile.dot(t[:h, h:], x[h:])
        y2 = rtrmm_left(t[h:, h:], x[h:], "U", base)
    return jnp.concatenate([y1, y2], axis=0)


def rtrtri_lower(l, base: int):
    """Inverse of a lower-triangular matrix via recursive (triangle-aware)
    gemms: inv([[L11, 0], [L21, L22]]) = [[I11, 0], [-I22 L21 I11, I22]]."""
    m = l.shape[0]
    if m <= base:
        eye = jnp.eye(m, dtype=l.dtype)
        return lax.linalg.triangular_solve(l, eye, left_side=True,
                                           lower=True)
    h = _half(m)
    i11 = rtrtri_lower(l[:h, :h], base)
    i22 = rtrtri_lower(l[h:, h:], base)
    i21 = -rtrmm_left(i22, rtrmm_right(l[h:, :h], i11, "L", base), "L", base)
    top = jnp.concatenate([i11, jnp.zeros((h, m - h), l.dtype)], axis=1)
    bot = jnp.concatenate([i21, i22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def rtrsm_left_lower(l, b, base: int):
    """Solve ``L X = B`` (``L`` lower-triangular) by gemm-dominated
    recursion; only ``base x base`` leaves hit the triangular_solve HLO.
    Exactly ``m^2 ncols / 2`` multiplies — no trtri tax."""
    m = l.shape[0]
    if m <= base or b.shape[1] == 0:
        return lax.linalg.triangular_solve(l, b, left_side=True, lower=True)
    h = _half(m)
    x1 = rtrsm_left_lower(l[:h, :h], b[:h], base)
    x2 = rtrsm_left_lower(l[h:, h:],
                          b[h:] - tile.dot(l[h:, :h], x1), base)
    return jnp.concatenate([x1, x2], axis=0)


def rtrsm_right_adj_lower(b, l, base: int):
    """Solve ``X L^H = B`` (``L`` lower-triangular, so ``L^H`` upper)."""
    m = l.shape[0]
    if m <= base or b.shape[0] == 0:
        return lax.linalg.triangular_solve(l, b, left_side=False, lower=True,
                                           transpose_a=True, conjugate_a=True)
    h = _half(m)
    x1 = rtrsm_right_adj_lower(b[:, :h], l[:h, :h], base)
    x2 = rtrsm_right_adj_lower(
        b[:, h:] - tile.dot(x1, tile.adj(l[h:, :h])), l[h:, h:], base)
    return jnp.concatenate([x1, x2], axis=1)


def rherk_lower(c, x, base: int):
    """c - x x^H, updating only the lower triangle (upper left untouched)."""
    m = c.shape[0]
    if m <= base:
        return c - tile.dot(x, tile.adj(x))
    h = _half(m)
    c11 = rherk_lower(c[:h, :h], x[:h], base)
    c21 = c[h:, :h] - tile.dot(x[h:], tile.adj(x[:h]))
    c22 = rherk_lower(c[h:, h:], x[h:], base)
    top = jnp.concatenate([c11, c[:h, h:]], axis=1)
    bot = jnp.concatenate([c21, c22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def rpotrf_lower(a, base: int | None = None):
    """Lower Cholesky factor of ``a`` (upper triangle of ``a`` ignored;
    upper triangle of the result is zero)."""
    if base is None:
        base = get_tune_parameters().potrf_base_size
    m = a.shape[0]
    if m == 0:
        return a
    if m <= base:
        return lax.linalg.cholesky(a, symmetrize_input=False)
    h = _half(m)
    l11 = rpotrf_lower(a[:h, :h], base)
    li11 = rtrtri_lower(l11, base)
    l21 = rtrmm_right(a[h:, :h], tile.adj(li11), "U", base)
    c22 = rherk_lower(a[h:, h:], l21, base)
    l22 = rpotrf_lower(c22, base)
    top = jnp.concatenate([l11, jnp.zeros((h, m - h), a.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _factor_strip(s, base: int):
    """Factor a tall strip ``s = [[S11], [S21]]`` (S11 square ``w x w``):
    returns ``[[L11], [S21 L11^-H]]`` via binary recursion over columns.

    Each node does ONE wide right-update gemm (every trailing flop exactly
    once, widths from w/2 down); trtri/trmm only at the base block, so the
    triangular tax is O(m w base).  This is the single-tensor-core shape of
    the reference's tiled left-looking dataflow.
    """
    m, w = s.shape
    dtype = s.dtype
    if w <= base or w <= 128:
        head = lax.linalg.cholesky(s[:w], symmetrize_input=False)
        if m > w:
            hinv = rtrtri_lower(head, base)
            tail = rtrmm_right(s[w:], tile.adj(hinv), "U", base)
            return jnp.concatenate([head, tail], axis=0)
        return head
    h = _half(w)
    left = _factor_strip(s[:, :h], base)                 # [m, h]
    right = s[h:, h:] - tile.dot(left[h:, :], tile.adj(left[h:w, :]))
    rfac = _factor_strip(right, base)                    # [m-h, w-h]
    rcol = jnp.concatenate([jnp.zeros((h, w - h), dtype), rfac], axis=0)
    return jnp.concatenate([left, rcol], axis=1)


def lpotrf_lower(a, panel: int | None = None, base: int | None = None):
    """Blocked lower Cholesky — the single-device fast path.

    Outer left-looking panels (ONE deep/wide MXU gemm each) + binary column
    recursion inside each panel strip (:func:`_factor_strip`): ~n^3/6
    multiplies total; small-base XLA cholesky + explicit trtri/trmm leaves.

    The factor accumulates *in place* over the input carry via
    dynamic-update slices: the not-yet-factored trailing region still
    holds the input values (left-looking never re-reads updated columns),
    so XLA aliases the dead carry and peak memory is ~1 n^2 values plus
    panel-sized temps — what lets n = 32768 fit on a single chip.  The
    strict upper triangle of the result holds the *input's* values
    (LAPACK garbage contract; every consumer re-trils).
    """
    p = get_tune_parameters()
    if base is None:
        base = p.potrf_base_size
    if panel is None:
        panel = p.potrf_panel_size
    n = a.shape[0]
    if n == 0:
        return a
    if n <= panel:
        return _factor_strip(a, base)

    L = a
    for k in range(0, n, panel):
        w = min(panel, n - k)
        strip = lax.dynamic_slice(L, (k, k), (n - k, w))
        if k:
            left = lax.dynamic_slice(L, (k, 0), (n - k, k))   # L[k:, :k]
            strip = strip - tile.dot(left, tile.adj(left[:w]))
        col = _factor_strip(strip, base)
        L = lax.dynamic_update_slice(L, col, (k, k))
    return L
