"""Successive band reduction stage 2: band ``b1`` -> band ``b2`` (SBR).

TPU-native two-stage reduction: ``reduction_to_band`` with a WIDE band
``b1`` keeps the trailing-update contractions at ``k = 2 b1`` where the
MXU runs at 45-67 TF/s (vs ~20 TF at the chase band's ``k = 256``), and
this module shrinks ``b1 -> b2`` with *block* Householder bulge chasing
— the dense-window generalization of the scalar chase in
``hh_chase.py`` (reflector width ``g = b2`` instead of 1, window height
``h = b1``), every operation an MXU gemm.

The reference reaches the same goal with one-stage reduction plus its
band knobs (``/root/reference/include/dlaf/eigensolver/
reduction_to_band/impl.h:820+``, ``include/dlaf/tune.h:114-163``); its
trailing-update structure is the k = 2b compact-WY this build already
uses.  SBR is the standard fix when the one-stage band is too narrow
for the hardware's efficient contraction depth (Bischof-Lang-Sun).

Algorithm (sweep over column groups ``c = 0, g, 2g, ...``):

* QR the subdiagonal block ``A[c+g : c+g+h, c : c+g]`` — its R leaves
  columns ``[c, c+g)`` at bandwidth exactly ``g`` (column ``c+k``'s
  last nonzero lands at row ``c+g+k``);
* the two-sided application of that block reflector to rows/cols
  ``[j, j+h)`` spills a bulge into ``B = A[j+h : j+2h, j : j+h)``;
  QR of ``B[:, :g]`` restores those columns to bandwidth ``h`` and
  becomes the next window's reflector — repeat down the band.  Later
  sweeps never touch a finished sweep's columns: col ``c+k``'s final
  nonzeros end at row ``c+g+k < c+2g``, the next sweep's first window
  row (the block-wise interleaving invariant of bulge chasing).

Back-transform: ``A_orig = Q_1 Q_2 ... Q_K A_band2 Q_K^H ... Q_1^H``
with chronological block reflectors ``Q_t``, so eigenvectors transform
as ``E <- Q_1 (Q_2 (... (Q_K E)))`` — reverse-chronological compact-WY
window gemms (three MXU gemms per window at contraction depth ``h``).

Memory: the reflector stream is ``~n^2`` values; it is produced (and
consumed) in SEGMENTS so no single stacked buffer approaches 2^32
bytes — the hard-won lesson from the wavefront chase's n = 32768
worker crashes (see ``wavefront_chase._wavefront_scan_seg``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops import tile
from .reduction_to_band import _panel_qr, t_factor


def sbr_schedule(n: int, h: int, g: int):
    """Static sweep table: returns ``(sweep_starts, tmax)``.

    Sweep ``k`` (start ``c = starts[k]``) reduces columns ``[c, c+g)``
    and runs windows ``t = 0 .. tmax-1`` at rows ``j = c + g + t*h``;
    windows past the matrix edge are zero-block no-ops.
    """
    if n <= g + 1 or h <= g:
        return np.zeros(0, np.int64), 0
    starts = np.arange(0, n - g - 1, g, dtype=np.int64)
    tmax = int(-(-(n - g) // h))
    return starts, tmax


def sbr_real_windows(n: int, h: int, g: int):
    """Host-side list of the real (non-padding) windows, chronological:
    returns ``(flat_idx, j)`` with ``flat_idx = k * tmax + t`` indexing
    the stacked reflector stream and ``j`` the window's first row."""
    starts, tmax = sbr_schedule(n, h, g)
    ks, ts, js = [], [], []
    for k, c in enumerate(starts):
        j0 = c + g
        tw = max(int(-(-(n - j0) // h)), 0)
        for t in range(tw):
            ks.append(k)
            ts.append(t)
            js.append(j0 + t * h)
    idx = np.asarray(ks, np.int64) * tmax + np.asarray(ts, np.int64)
    return idx.astype(np.int64), np.asarray(js, np.int32)


def sbr_stage2_ops(n: int, h: int, g: int) -> float:
    """Honest flop model (mul+add) of the stage-2 block chase: per real
    window one two-sided compact-WY on [h, h] (~8 h^2 g) plus the bulge
    right-apply/QR/left-apply on [h, h] (~6 h^2 g + O(h g^2)); the
    miniapp/bench rate lines divide by this, not by the one-stage
    reduction model."""
    nw = len(sbr_real_windows(n, h, g)[0])
    return float(nw) * (14.0 * h * h * g + 8.0 * h * g * g)


def band_to_band_numpy(A: np.ndarray, h: int, g: int):
    """Reference/fallback block chase on a FULL Hermitian matrix (lower
    bandwidth <= h assumed), in place; returns the chronological
    reflector list ``[(j, V [l, g], taus [g])]`` — the correctness
    anchor for the scan version (same role as ``hh_chase_numpy``).
    """
    import scipy.linalg as sla

    n = A.shape[0]
    out = []

    def qr_block(P):
        """LAPACK-convention (V unit-lower trapezoid, taus, R);
        tau == 0 columns of V are zeroed (t_factor convention)."""
        m, w = P.shape
        (qr_, tau_), _ = sla.qr(P, mode="raw")
        k = min(m, w)
        R = np.triu(qr_)
        V = np.tril(qr_, -1)[:, :k]
        V[np.arange(k), np.arange(k)] = 1.0
        Vf = np.zeros((m, w), P.dtype)
        Vf[:, :k] = V
        tf = np.zeros((w,), P.dtype)
        tf[:k] = tau_
        Vf[:, tf == 0] = 0
        return Vf, tf, R

    def tmat(V, taus):
        tsafe = np.where(taus == 0, 1.0, taus)
        tinv = np.triu(V.conj().T @ V, 1) + np.diag(1.0 / tsafe)
        return np.linalg.solve(tinv, np.eye(V.shape[1], dtype=V.dtype))

    starts, _ = sbr_schedule(n, h, g)
    for c in starts:
        j = c + g
        l = min(h, n - j)
        if l < 1:
            continue
        V, taus, R = qr_block(A[j:j + l, c:c + g].copy())
        A[j:j + l, c:c + g] = R
        A[c:c + g, j:j + l] = R.conj().T
        while True:
            l = min(h, n - j)
            out.append((j, V, taus))
            T = tmat(V, taus)
            D = A[j:j + l, j:j + l]
            W = D @ (V @ T)
            X = W - V @ ((T.conj().T @ (V.conj().T @ W)) / 2)
            D = D - X @ V.conj().T - V @ X.conj().T
            A[j:j + l, j:j + l] = D
            m = min(h, n - j - l)
            if m <= 0:
                break
            B = A[j + l:j + l + m, j:j + l]
            B = B - (B @ V) @ T @ V.conj().T
            if m > 1:
                V2, taus2, R2 = qr_block(B[:, :g].copy())
                B[:, :g] = R2
                T2 = tmat(V2, taus2)
                B[:, g:] = B[:, g:] - V2 @ (T2.conj().T
                                            @ (V2.conj().T @ B[:, g:]))
            A[j + l:j + l + m, j:j + l] = B
            A[j:j + l, j + l:j + l + m] = B.conj().T
            if m <= 1:
                break
            V, taus = V2, taus2
            j += l
    return out


def bt_band_to_band_numpy(reflectors, E, n: int):
    """Reference back-transform: apply the chronological reflector list
    in reverse to E's rows."""
    E = np.array(E, copy=True)
    for (j, V, taus) in reversed(reflectors):
        tsafe = np.where(taus == 0, 1.0, taus)
        tinv = np.triu(V.conj().T @ V, 1) + np.diag(1.0 / tsafe)
        T = np.linalg.solve(tinv, np.eye(V.shape[1], dtype=V.dtype))
        l = V.shape[0]
        Ew = E[j:j + l]
        E[j:j + l] = Ew - V @ (T @ (V.conj().T @ Ew))
    return E


@dataclasses.dataclass
class SBRResult:
    """Stage-2 reflector stream (segmented, real windows only).

    ``segs``: list of ``(V [nw_k, h, g], taus [nw_k, g], js [nw_k])``
    — chronological windows across and within segments; window ``w``
    acts on rows ``[js[w], js[w] + h)``.  Total stream ~n^2/2 values
    (each segment's stacked sweep output is gathered to its real
    windows right after the segment runs, dropping the tmax padding).
    """

    segs: list
    n: int
    h: int
    g: int


def _sbr_seg_sweeps(n: int, h: int, g: int, itemsize: int) -> int:
    """Sweeps per segment so one segment's stacked V stays ~<= 1 GiB."""
    import os
    cap = int(os.environ.get("DLAF_SBR_SEG_BYTES", 1 << 30))
    _, tmax = sbr_schedule(n, h, g)
    per_sweep = max(tmax * h * g * itemsize, 1)
    return max(1, cap // per_sweep)


@partial(jax.jit, static_argnames=("n", "h", "g", "nsw"),
         donate_argnums=(0,))
def _sbr_scan_seg(Ap, starts_seg, n: int, h: int, g: int, nsw: int):
    """``nsw`` sweeps of the stage-2 reduction on the zero-padded dense
    workspace ``Ap [n + 2h + g, n + 2h + g]``.

    Steps past the matrix edge operate on zero blocks: geqrf of zeros
    gives tau = 0, so every update vanishes identically and no masking
    is needed.  Returns ``(Ap, V [nsw, tmax, h, g], taus [nsw, tmax,
    g])``.
    """
    dt = Ap.dtype
    _, tmax = sbr_schedule(n, h, g)

    def sweep(Ap, c):
        j0 = c + g
        zero = jnp.zeros((), c.dtype)
        P = lax.dynamic_slice(Ap, (j0, c), (h, g))
        R, V, taus = _panel_qr(P)
        Ap = lax.dynamic_update_slice(Ap, R, (j0, c))
        Ap = lax.dynamic_update_slice(Ap, tile.adj(R), (c, j0))

        def step(t, carry):
            Ap, V, taus, Vs, Ts = carry
            t = jnp.asarray(t, c.dtype)
            j = j0 + t * h
            Vs = lax.dynamic_update_slice(Vs, V[None], (t, zero, zero))
            Ts = lax.dynamic_update_slice(Ts, taus[None], (t, zero))
            T = t_factor(V, taus)
            VT = tile.dot(V, T)
            D = lax.dynamic_slice(Ap, (j, j), (h, h))
            W = tile.dot(D, VT)
            S = tile.dot(tile.adj(VT), W)
            X = W - 0.5 * tile.dot(V, S)
            # fused hermitian rank-2g update (one k = 2g gemm)
            D = D - tile.dot(jnp.concatenate([X, V], axis=1),
                             jnp.concatenate([tile.adj(V), tile.adj(X)],
                                             axis=0))
            Ap = lax.dynamic_update_slice(Ap, D, (j, j))

            B = lax.dynamic_slice(Ap, (j + h, j), (h, h))
            B = B - tile.dot(tile.dot(tile.dot(B, V), T), tile.adj(V))
            R2, V2, taus2 = _panel_qr(lax.slice(B, (0, 0), (h, g)))
            T2 = t_factor(V2, taus2)
            Brest = lax.slice(B, (0, g), (h, h))
            Brest = Brest - tile.dot(
                V2, tile.dot(tile.adj(T2), tile.dot(tile.adj(V2), Brest)))
            B = jnp.concatenate([R2, Brest], axis=1)
            Ap = lax.dynamic_update_slice(Ap, B, (j + h, j))
            Ap = lax.dynamic_update_slice(Ap, tile.adj(B), (j, j + h))
            return Ap, V2, taus2, Vs, Ts

        Vs0 = jnp.zeros((tmax, h, g), dt)
        Ts0 = jnp.zeros((tmax, g), dt)
        Ap, _, _, Vs, Ts = lax.fori_loop(
            0, tmax, step, (Ap, V, taus, Vs0, Ts0))
        return Ap, (Vs, Ts)

    Ap, (Vs, Ts) = lax.scan(sweep, Ap, starts_seg)
    return Ap, Vs, Ts


def band_to_band(Adense, n: int, h: int, g: int, unpad: bool = True):
    """Stage-2 reduction: dense Hermitian ``Adense [n, n]`` (both
    triangles stored, lower bandwidth <= h) -> bandwidth ``g``.

    ``Adense`` may also arrive PREPADDED at ``[n + 2h + g, n + 2h + g]``
    (from ``band_dense_from_reduction(..., pad=2*h+g)``), skipping the
    separate pad jit whose donation cannot alias.

    Returns ``(Ared [n, n] dense, SBRResult)``; donates ``Adense``.
    ``unpad=False`` returns the PADDED ``[n+2h+g, n+2h+g]`` workspace
    instead (pad region = chased-off bulge garbage): the final unpad
    slice cannot alias its input (shape change) and would hold padded +
    dense concurrently (8.9 GB at n = 32768) — band extraction reads
    the top-left ``n x n`` band straight from the padded array.
    """
    dt = Adense.dtype
    starts, tmax = sbr_schedule(n, h, g)
    Adense = jnp.asarray(Adense)
    if Adense.shape[0] == n + 2 * h + g:
        Ap = Adense
    else:
        Ap = _sbr_pad(Adense, pad=2 * h + g)
    if len(starts) == 0:
        return (Ap if not unpad else _sbr_unpad(Ap, n=n),
                SBRResult([], n, h, g))
    nsw = min(_sbr_seg_sweeps(n, h, g, np.dtype(dt).itemsize),
              len(starts))
    idx_all, js_all = sbr_real_windows(n, h, g)
    segs = []
    for s0 in range(0, len(starts), nsw):
        seg = starts[s0:s0 + nsw].astype(np.int32)
        Ap, Vs, Ts = _sbr_scan_seg(Ap, jnp.asarray(seg),
                                   n=n, h=h, g=g, nsw=len(seg))
        # compact to real windows now (donates the stacked [ns, tmax]
        # sweep output, dropping its zero padding: stream total stays
        # ~n^2/2 instead of n^2)
        lo, hi = s0 * tmax, (s0 + len(seg)) * tmax
        sel = (idx_all >= lo) & (idx_all < hi)
        loc = jnp.asarray((idx_all[sel] - lo).astype(np.int32))
        Vw = _seg_window_gather(Vs, loc)
        tw = _seg_window_gather(Ts, loc)
        segs.append((Vw, tw, js_all[sel].copy()))
    return (Ap if not unpad else _sbr_unpad(Ap, n=n),
            SBRResult(segs, n, h, g))


@partial(jax.jit, static_argnames=("h", "ld", "n"))
def _band_strip_from_storage(data, h: int, ld: int, n: int):
    """Lower band strip ``ab[d, j] = A[j+d, j]`` read straight off a
    SINGLE-DEVICE storage buffer (storage order == natural order on a
    1x1 grid, ``matrix/layout.py:80``).  One [h+1, n] gather — no n^2
    temp, unlike ``extract_band``'s per-diagonal loop (which also
    unrolls h+1 = 1025 ops at the SBR band)."""
    del ld  # row padding is cropped by the [:n, :n] view
    j = lax.broadcasted_iota(jnp.int32, (n, h + 1), 0)
    d = lax.broadcasted_iota(jnp.int32, (n, h + 1), 1)
    idx = jnp.minimum(j + d, n - 1)
    # take_along_axis on the transposed view fuses the permutation into
    # the gather: AOT at 32k h=1024 -> 0.27 GB temps (a flat-index
    # jnp.take formulation forced a full 4.13 GB copy of data)
    vals = jnp.take_along_axis(data[:n, :n].T, idx, axis=1)   # [n, h+1]
    ok = (j + d) < n
    return jnp.where(ok, vals, jnp.zeros((), data.dtype)).T


@partial(jax.jit, static_argnames=("n", "h", "pad"), donate_argnums=())
def band_dense_from_band_strip(ab, n: int, h: int, pad: int):
    """Padded dense band workspace ``[n+pad, n+pad]`` (both triangles)
    from the ``[h+1, n]`` lower strip, built by a chunked-row gather
    scan.  Peak = output + the strip + ~0.3 GB of chunk temps — vs
    ``band_dense_from_reduction``'s mat_hh + output (9.2 GB at 32k,
    the ONLY pipeline stage above the 8.6 GB input-build floor)."""
    dt = ab.dtype
    Np = n + pad
    out = jnp.zeros((Np, Np), dt)
    flat = ab.reshape(-1)                       # lin = d * n + j
    R = min(2048, n)
    nch = -(-n // R)

    def body(c, out):
        r0 = jnp.minimum(c * R, n - R)          # overlap-safe (values
        i = r0 + lax.broadcasted_iota(jnp.int32, (R, Np), 0)
        j = lax.broadcasted_iota(jnp.int32, (R, Np), 1)
        d = jnp.abs(i - j)
        ok = (d <= h) & (j < n)
        lin = jnp.where(ok, d * n + jnp.minimum(i, j), 0)
        vals = jnp.take(flat, lin.reshape(-1),
                        unique_indices=False).reshape(R, Np)
        vals = jnp.where(ok, vals, jnp.zeros((), dt))
        return lax.dynamic_update_slice(out, vals, (r0, 0))

    return lax.fori_loop(0, nch, body, out)


@partial(jax.jit, static_argnames=("band", "pad"))
def band_dense_from_reduction(mat_hh, band: int, pad: int = 0):
    """``reduction_to_band`` output (DistMatrix) -> dense band matrix.

    Masks off the reflectors stored strictly below the band AND the
    stale upper far strip (the reduction never rewrites the upper
    mirror of annihilated blocks beyond the band — those entries are
    pre-annihilation garbage, not zeros).  One jit from storage order:
    materializing the natural matrix separately would hold a third n^2
    buffer at the peak (12.9 GB instead of 8.6 at n = 32768).

    ``pad > 0`` emits the stage-2 workspace shape ``[n+pad, n+pad]``
    directly (zeros beyond n), fusing what ``_sbr_pad`` would otherwise
    do as a separate jit whose donation cannot alias — at n = 32768
    that separate pad holds dense + padded-dense (8.9 GB) ON TOP of
    the packed reflectors; the fused form peaks at mat_hh + output."""
    from ..internal import natural_exact
    nat = natural_exact(mat_hh)
    n = nat.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    masked = jnp.where(jnp.abs(i - j) <= band, nat,
                       jnp.zeros((), nat.dtype))
    if pad:
        out = jnp.zeros((n + pad, n + pad), nat.dtype)
        return lax.dynamic_update_slice(out, masked, (0, 0))
    return masked


@partial(jax.jit, static_argnames=("band_size", "n"))
def extract_band_dense(A, band_size: int, n: int | None = None):
    """Dense [>=n, >=n] -> lower-banded storage ``ab[i, j] = A[j+i, j]``
    (same contract as ``reduction_to_band.extract_band``).  ``n`` reads
    the band of the top-left ``n x n`` block only (the SBR padded
    workspace carries chased-off bulge garbage beyond ``n``)."""
    if n is None:
        n = A.shape[0]
    ab = jnp.zeros((band_size + 1, n), A.dtype)
    for i in range(min(band_size, max(n - 1, 0)) + 1):
        d = jnp.diagonal(A, offset=-i)[: n - i]
        ab = ab.at[i, : n - i].set(d)
    return ab


@partial(jax.jit, static_argnames=("pad",), donate_argnums=(0,))
def _sbr_pad(A, pad: int):
    n = A.shape[0]
    Ap = jnp.zeros((n + pad, n + pad), A.dtype)
    return lax.dynamic_update_slice(Ap, A, (0, 0))


@partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _sbr_unpad(Ap, n: int):
    return lax.slice(Ap, (0, 0), (n, n))


def _bt_window_scan_impl(E, V, taus, js, h: int, g: int):
    """Reverse-chronological window applications (sequential scan;
    window row ranges of DIFFERENT sweeps overlap, so windows cannot be
    batched across sweeps — but each update is 3 MXU gemms at
    contraction depth h, big enough to saturate the chip)."""
    nc = E.shape[1]
    dt = E.dtype
    iota = jnp.arange(g)
    triu1 = (iota[:, None] < iota[None, :]).astype(dt)

    def body(E, xs):
        Vw, tw, j = xs
        tau_safe = jnp.where(tw == 0, jnp.ones_like(tw), tw)
        tinv = tile.dot(tile.adj(Vw), Vw) * triu1 \
            + jnp.diag(1.0 / tau_safe)
        Ew = lax.dynamic_slice(E, (j, jnp.zeros((), j.dtype)), (h, nc))
        Y = tile.dot(tile.adj(Vw), Ew)
        Z = lax.linalg.triangular_solve(tinv, Y, left_side=True,
                                        lower=False)
        Ew = Ew - tile.dot(Vw, Z)
        E = lax.dynamic_update_slice(E, Ew, (j, jnp.zeros((), j.dtype)))
        return E, None

    E, _ = lax.scan(body, E, (V, taus, js), reverse=True)
    return E


_bt_window_scan = partial(
    jax.jit, static_argnames=("h", "g"),
    donate_argnums=(0, 1))(_bt_window_scan_impl)


@partial(jax.jit, donate_argnums=(0,))
def _seg_window_gather(Vseg, idx):
    """Stacked per-sweep stream [ns, tmax, ...] -> real windows
    [len(idx), ...] (idx local flat k*tmax+t indices)."""
    flat = Vseg.reshape((-1,) + Vseg.shape[2:])
    return jnp.take(flat, idx, axis=0)


def bt_band_to_band(res: SBRResult, E, donate: bool = False):
    """Back-transform ``E <- Q_1 Q_2 ... Q_K E`` (reverse-chronological
    block-reflector application).  Consumes (donates) the reflector
    segments.  ``E`` gains ``h`` zero pad rows internally when needed;
    the result is returned at E's original row count.
    """
    n, h, g = res.n, res.h, res.g
    E = jnp.asarray(E)
    if not res.segs:
        return E
    squeeze = E.ndim == 1
    if squeeze:
        E = E[:, None]
    rows0 = E.shape[0]
    if E.shape[0] < n + h:
        E = jnp.concatenate(
            [E, jnp.zeros((n + h - E.shape[0], E.shape[1]), E.dtype)])
    # exact reverse-chronological order: segments last-to-first, the
    # window scan runs its (chronological) xs with reverse=True
    for k in range(len(res.segs) - 1, -1, -1):
        Vw, tw, js = res.segs[k]
        res.segs[k] = None
        E = _bt_window_scan(E, Vw, tw, jnp.asarray(js), h=h, g=g)
    res.segs = []
    out = E[:rows0] if E.shape[0] != rows0 else E
    return out[:, 0] if squeeze else out
