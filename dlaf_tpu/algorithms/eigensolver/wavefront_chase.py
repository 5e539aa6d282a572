"""On-device Householder bulge chase: band -> tridiagonal as one scan.

TPU-native variant of the host chase (``hh_chase.py`` / ``ops/native/
hh_chase.cpp``), eliminating the band download, the host compute, and —
decisive on a tunneled chip — the ~n^2/2-value reflector-stream upload
(measured ~27 MB/s wire: 2.15 GB at n = 32768).  The reference keeps
this stage CPU-only (``eigensolver/band_to_tridiag/mc.h`` SweepWorker);
here the whole chase runs on the TPU as a single ``lax.scan``.

Parallelization (same pipelined-sweep wavefront as the host threads and
the reference's ``SweepWorkerDist`` ranks): sweep ``s`` executes its
step ``t`` at scan time ``T = 3 s + t``.  Two properties make the
lockstep batch race-free and exact:

* adjacent active sweeps sit ``3 b - 1`` columns apart, so their
  ``[j, j + b)`` column windows are disjoint (batched gather/scatter of
  ``W = ceil(tmax / 3) + 1`` windows per iteration, one reshaped row
  block each);
* the stagger satisfies the chase dependency (step ``t`` of sweep ``s``
  needs step ``t + 2`` of sweep ``s - 1``) with one step to spare, so a
  whole iteration is a valid linearization of the host schedule.

Everything is static-shape: the band is zero-padded so every reflector
has nominal length ``b`` — reflectors over the zero tail come out as
``tau = 0`` no-ops (LAPACK larfg convention), which *is* the host
kernel's behavior at the matrix edge, so the reflector table
(``hh_schedule``) and the V stream layout match the host chase exactly.

The per-step two-sided update runs directly on banded storage
``band[j, i] = A[j + i, j]`` via Hankel/shear *reshape* tricks (no
per-element gathers, which the TPU executes orders of magnitude slower
than dense reshapes):

* ``hankel(u, M)[c, i] = u[c + i]`` — built from a broadcast + reshape
  with row stride ``L + 2`` over a padded copy (pure layout ops);
* the correlation sums ``sum_c Y[c, r - c]`` (symmetric mat-vec and
  ``B v`` in band layout) via the complementary shear
  ``Z[c, j] = Y[c, j - c]`` (reshape with row stride ``K - 1``), whose
  wrap-around lands in the zero padding by construction.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .hh_chase import HHChaseResult, hh_schedule, sweep_reflector_counts


def _hankel(u, M: int, rows: int):
    """``H[w, c, i] = u[w, c + i]`` for ``c < rows, i < M`` (zero beyond
    ``len(u)``).

    Pure broadcast/reshape: with ``Xp = pad(u)`` of length ``L + 1``
    (``L = Lu + M``), reading the tiled flat buffer with row stride
    ``L + 2`` gives ``Xp[(c (L+2) + i) mod (L+1)] = Xp[c + i]`` —
    in-range (no wrap) for all ``c + i <= L``.
    """
    Wb, Lu = u.shape
    L = Lu + M
    Xp = jnp.pad(u, ((0, 0), (0, L + 1 - Lu)))          # [W, L+1]
    F = jnp.broadcast_to(Xp[:, None, :], (Wb, rows + 1, L + 1))
    F = F.reshape(Wb, (rows + 1) * (L + 1))
    H = F[:, : rows * (L + 2)].reshape(Wb, rows, L + 2)
    return H[:, :, :M]


def _hankel_pre(u, pre: int, M: int, rows: int):
    """``H[w, c, i] = u[w, c + i - pre]`` (zero outside ``[0, len(u))``)."""
    return _hankel(jnp.pad(u, ((0, 0), (pre, 0))), M, rows)


def _shear_sum(Y, b: int, K0: int):
    """Column sums of ``Z[c, j] = Y[w, c, j - c]`` (zeros for ``j < c``).

    ``Y`` is ``[W, b, K]`` zero-padded on the right to width ``K0`` with
    ``K0 - K >= b`` so the reshape's row wrap lands in the padding.
    Returns ``[W, K0 - 1]``.
    """
    Wb = Y.shape[0]
    Yp = jnp.pad(Y, ((0, 0), (0, 0), (0, K0 - Y.shape[2])))
    flat = Yp.reshape(Wb, b * K0)
    Z = flat[:, : b * (K0 - 1)].reshape(Wb, b, K0 - 1)
    return jnp.sum(Z, axis=1)


def _larfg_batched(x):
    """Batched LAPACK larfg (real): returns ``(v, tau, beta)`` with
    ``v[:, 0] = 1`` and ``H x = beta e1``; all-zero tails give the
    ``tau = 0`` identity reflector (beta = x[0] kept)."""
    dt = x.dtype
    alpha = x[:, 0]
    # hypot-style scaling: squaring raw entries overflows/underflows f32
    # for extreme magnitudes where the host chase (np.hypot) is safe
    amax = jnp.max(jnp.abs(x), axis=1)
    s = jnp.where(amax == 0, jnp.ones((), dt), amax)
    xs = x / s[:, None]
    xnorm2 = jnp.sum(xs[:, 1:] * xs[:, 1:], axis=1)
    zero = xnorm2 == 0
    anorm = s * jnp.sqrt(xs[:, 0] * xs[:, 0] + xnorm2)
    beta = jnp.where(alpha >= 0, -anorm, anorm)
    bsafe = jnp.where(zero, jnp.ones((), dt), beta)
    tau = jnp.where(zero, jnp.zeros((), dt), (beta - alpha) / bsafe)
    ssafe = jnp.where(zero, jnp.ones((), dt), alpha - beta)
    scale = jnp.where(zero, jnp.zeros((), dt), 1 / ssafe)
    v = jnp.concatenate([jnp.ones((x.shape[0], 1), dt),
                         x[:, 1:] * scale[:, None]], axis=1)
    return v, tau, jnp.where(zero, alpha, beta)


def _chase_step(X, v, tau, b: int, LD: int, iota_b, iota_ld):
    """One chase step on windows ``X [W, b, LD]`` with current reflectors
    ``(v [W, b], tau [W])``: two-sided apply to the diagonal block, right
    apply + bulge annihilation on the off-diagonal block.  Returns
    ``(Xn, v2, tau2)`` — the updated windows and the next reflectors."""
    dt = X.dtype
    Wb = X.shape[0]
    # ---- w = D v on the diagonal block, in band layout ----
    VHb = _hankel(v, b, b)                        # VH[c,i] = v[c+i]
    term2 = jnp.sum(X[:, :, 1:b] * VHb[:, :, 1:b], axis=2)
    cs = _shear_sum(X * v[:, :, None], b, LD + b + 1)
    term1 = cs[:, :b]                          # sum_c X[c, r-c] v[c]
    y = cs[:, b:2 * b]                         # (B v)[r]
    w1 = tau[:, None] * (term1 + term2)
    corr = jnp.sum(w1 * v, axis=1) * tau / 2
    w = w1 - corr[:, None] * v

    # ---- updates, all in band layout [c, i] ----
    WHb = _hankel(w, b, b)
    upd_d = WHb * v[:, :, None] + VHb * w[:, :, None]
    Y2H = _hankel_pre(y, b, LD, b)                # y[c+i-b]
    updB1 = tau[:, None, None] * Y2H * v[:, :, None]

    # next reflector from B column 0 (post right-apply); v[0] = 1
    bcol = X[:, 0, b:2 * b] - tau[:, None] * y
    v2, tau2, beta2 = _larfg_batched(bcol)

    # left apply H2 to bulge columns c >= 1
    V2H = _hankel_pre(v2, b, LD, b)               # v2[c+i-b]
    zX = jnp.sum(X * V2H, axis=2)
    z = zX - (tau * jnp.sum(v2 * y, axis=1))[:, None] * v
    updB2 = tau2[:, None, None] * V2H * z[:, :, None]
    updB2 = jnp.where((iota_b == 0)[None, :, None], 0, updB2)

    Xn = X - jnp.pad(upd_d, ((0, 0), (0, 0), (0, LD - b))) \
        - updB1 - updB2
    # column c=0, depths [b, 2b]: annihilated -> [beta2, 0, ..., 0]
    tail0 = jnp.concatenate(
        [Xn[:, 0, :b], beta2[:, None], jnp.zeros((Wb, b), dt)], axis=1)
    c0 = ((iota_b == 0)[None, :, None] &
          (iota_ld >= b)[None, None, :])
    Xn = jnp.where(c0, tail0[:, None, :], Xn)
    return Xn, v2, tau2


def _wavefront_width(n: int, b: int) -> int:
    """Slot count W: slot ``m`` hosts sweep ``it - m``, active while
    ``3 m + tau < cnt[s] <= tmax`` — so ``3 W >= tmax`` suffices."""
    cnt = sweep_reflector_counts(n, b)
    tmax = int(cnt.max()) if len(cnt) else 0
    return max(1, (tmax + 2) // 3)


@partial(jax.jit, static_argnames=("n", "b", "niter"),
         donate_argnums=(0, 1, 2))
def _wavefront_scan_seg(flat, v, tau, it0, n: int, b: int, niter: int):
    """``niter`` chase iterations starting at ``it0``: returns
    ``(flat, v, tau, ys)``.

    One segment of the chase — the driver runs ``ceil(nsweeps/niter)``
    of these back-to-back, carrying ``(flat, v, tau)`` through donated
    buffers, so no single stacked scan output exceeds the segment size.
    (A single whole-chase scan emits ys = 3*W*nsweeps rows; at n = 32768
    that is 4.33e9 bytes > 2^32 and CRASHED the TPU worker twice —
    r2 with the v1 scatter carry, r4 with this gather-free v2 — while
    every <2^32 buffer works: suspected 32-bit byte-offset overflow in
    the scan-output writes.  Segments also cut the scan's live memory:
    earlier segments' ys can be consumed while later ones run.)

    Iterations past ``nsweeps`` (tail padding of the last segment) are
    no-ops: every slot is inactive there (``cnt = 0``) and the
    sweep-start write is masked.
    """

    # Slice-lattice formulation (v2): at chase time ``T = 3 it + tau``
    # (``tau`` in {0,1,2}), slot ``m`` hosts sweep ``s = it - m`` at step
    # ``t = 3 m + tau``, whose window starts at flat row
    # ``1 + it + tau*b + m*(3b-1)``.  So ONE dynamic slice of height ``H``
    # at row ``it`` covers the sweep-start column (row 0) and all three
    # substeps' windows at *static* in-slice offsets — no gather/scatter
    # ops anywhere.  Reflectors are emitted as per-iteration scan outputs
    # ``ys [3, W, b]`` and compacted afterwards by index-mapped gathers
    # (``_raw_index_map`` / ``gather_raw_rows``).
    #
    # ``flat``: ``[NPf, LD]`` with ``flat[j, i] = A[j + i, j]`` (zeros
    # beyond the matrix), ``NPf >= last_it + W*(3b-1) + 2b + 1``,
    # ``LD = 2b + 1``.
    #
    # Cross-substep dataflow within one iteration (all other window rows
    # are >= 2 chase steps apart): substep 2's window row ``b-1`` of slot
    # ``m`` is substep 0's window row 0 of slot ``m+1`` (read patch), and
    # the same row pair aliases in the write-back (substep 2 wins).
    dt = flat.dtype
    LD = 2 * b + 1
    S = 3 * b - 1
    nsweeps = n - 2
    W = _wavefront_width(n, b)
    H = W * S + 2 * b + 1
    iota_b = jnp.arange(b, dtype=jnp.int32)
    iota_ld = jnp.arange(LD, dtype=jnp.int32)
    m_arr = jnp.arange(W, dtype=jnp.int32)

    def active_mask(it, tau_sub: int):
        s = it - m_arr
        cnt_s = (n - 3 - jnp.maximum(s, 0)) // b + 1
        return (s >= 0) & (3 * m_arr + tau_sub < cnt_s)

    def body(carry, it_loc):
        flat, v, tau = carry
        it = it0 + it_loc
        # padded iterations (last segment's tail) slice at the last REAL
        # row: every slot is inactive there so the write-back is a
        # bit-exact copy.  Using the raw ``it`` instead would rely on
        # dynamic-slice clamping, and the read (height H) and write
        # (height W*S+2) clamp at DIFFERENT rows — a one-row shift that
        # corrupts d[n-1] (found the hard way, r4)
        it_eff = jnp.minimum(it, nsweeps - 1)
        Z = lax.dynamic_slice(flat, (it_eff, jnp.zeros((), it.dtype)),
                              (H, LD))

        # ---- sweep s = it starts: reflector from column s ----
        # (masked on the last segment's tail padding: no sweep starts at
        # it >= nsweeps, and the row0 write would corrupt d/e rows)
        start_ok = it < nsweeps
        v_s, tau_s, beta_s = _larfg_batched(Z[0:1, 1:1 + b])
        row0 = jnp.concatenate(
            [Z[0:1, 0:1], beta_s[:, None], jnp.zeros((1, b - 1), dt),
             Z[0:1, 1 + b:]], axis=1)
        row0 = jnp.where(start_ok, row0, Z[0:1])
        v = jnp.concatenate([jnp.where(start_ok, v_s, 0), v[1:]], axis=0)
        tau = jnp.concatenate([jnp.where(start_ok, tau_s, 0), tau[1:]],
                              axis=0)

        def windows(off: int):
            return Z[off:off + W * S].reshape(W, S, LD)[:, :b, :]

        def substep(X, v, tau, act):
            vr = jnp.concatenate([tau[:, None], v[:, 1:]], axis=1)
            Xn, v2, tau2 = _chase_step(X, v, tau, b, LD, iota_b, iota_ld)
            Xn = jnp.where(act[:, None, None], Xn, X)
            v = jnp.where(act[:, None], v2, v)
            tau = jnp.where(act, tau2, tau)
            return Xn, v, tau, vr

        X0 = windows(1)
        Xn0, v, tau, vr0 = substep(X0, v, tau, active_mask(it, 0))
        X1 = windows(1 + b)
        Xn1, v, tau, vr1 = substep(X1, v, tau, active_mask(it, 1))
        X2 = windows(1 + 2 * b)
        # read patch: slot m's row b-1 was rewritten by substep 0 as slot
        # m+1's row 0 (the only <2-step-distance pair; last slot: original)
        patch = jnp.concatenate([Xn0[1:, 0:1, :], X2[W - 1:, b - 1:b, :]],
                                axis=0)
        X2 = jnp.concatenate([X2[:, :b - 1, :], patch], axis=1)
        Xn2, v, tau, vr2 = substep(X2, v, tau, active_mask(it, 2))

        # ---- write-back: the 3 substeps' windows tile the S-row blocks
        # exactly; substep 2's last row overrides substep 0's row 0 of the
        # next slot (later chase time wins) ----
        row0_adj = jnp.concatenate(
            [Xn0[0:1, 0:1, :], Xn2[:W - 1, b - 1:b, :]], axis=0)
        blocks = jnp.concatenate(
            [jnp.concatenate([row0_adj, Xn0[:, 1:, :]], axis=1),
             Xn1, Xn2[:, :b - 1, :]], axis=1)          # [W, S, LD]
        z_out = jnp.concatenate(
            [row0, blocks.reshape(W * S, LD), Xn2[W - 1:, b - 1, :]],
            axis=0)                                     # [W*S + 2, LD]
        flat = lax.dynamic_update_slice(
            flat, z_out, (it_eff, jnp.zeros((), it.dtype)))

        # slot shift: at it+1, sweep it-m lives in slot m+1
        v = jnp.concatenate([jnp.zeros((1, b), dt), v[:-1]], axis=0)
        tau = jnp.concatenate([jnp.zeros((1,), dt), tau[:-1]], axis=0)
        return (flat, v, tau), jnp.stack([vr0, vr1, vr2])

    (flat, v, tau), ys = lax.scan(
        body, (flat, v, tau), jnp.arange(niter, dtype=jnp.int32))
    return flat, v, tau, ys.reshape(niter * 3 * W, b)


#: cap on any single stacked scan-output buffer (see the >2^32 crash note
#: in :func:`_wavefront_scan_seg`); override via DLAF_WAVEFRONT_SEG_BYTES
_SEG_BYTES_DEFAULT = 1 << 30


def _segment_iters(n: int, b: int, itemsize: int) -> int:
    """Iterations per segment so one segment's ys stays under the cap."""
    import os
    cap = int(os.environ.get("DLAF_WAVEFRONT_SEG_BYTES",
                             _SEG_BYTES_DEFAULT))
    W = _wavefront_width(n, b)
    per_iter = 3 * W * b * itemsize
    nsweeps = max(n - 2, 0)
    niter = max(1, cap // max(per_iter, 1))
    nseg = -(-nsweeps // niter) if nsweeps else 1
    return -(-nsweeps // nseg) if nsweeps else 1    # balance segments


def _wavefront_scan(flat, n: int, b: int):
    """Run the whole chase as donated segment jits; returns
    ``(flat_out, [compact ys segments], rows_per_segment, sel)``.

    Each raw segment is compacted to its REAL reflector rows right
    after it is produced (the padded [niter*3*W, b] layout carries
    inactive-slot rows: 4.33 GB raw vs 2.15 GB real at n = 32768 —
    the difference between the chase/D&C stages fitting next to
    co-tenants or not).  ``sel`` is the ascending global real-raw-index
    array; raw -> compact position = searchsorted(sel, idx)."""
    dt = flat.dtype
    W = _wavefront_width(n, b)
    nsweeps = max(n - 2, 0)
    niter = _segment_iters(n, b, np.dtype(dt).itemsize)
    rows = niter * 3 * W
    sel = np.sort(_raw_index_map(n, b).astype(np.int64))
    v = jnp.zeros((W, b), dt)
    tau = jnp.zeros((W,), dt)
    segs = []
    for it0 in range(0, max(nsweeps, 1), niter):
        flat, v, tau, ys = _wavefront_scan_seg(
            flat, v, tau, jnp.int32(it0), n=n, b=b, niter=niter)
        k = it0 // niter
        lo = np.searchsorted(sel, k * rows)
        hi = np.searchsorted(sel, (k + 1) * rows)
        rel = jnp.asarray((sel[lo:hi] - k * rows).astype(np.int32))
        segs.append(_compact_seg_jit(ys, rel))
    return flat, segs, rows, sel


@partial(jax.jit, donate_argnums=(0,))
def _compact_seg_jit(seg, rel):
    return jnp.take(seg, rel, axis=0)


@partial(jax.jit, donate_argnums=(0, 1))
def _gather_seg_jit(out, seg, loc):
    """``out[r] = seg[loc[r]]`` where ``0 <= loc[r] < len(seg)`` (rows
    outside this segment keep their current value)."""
    nrows = seg.shape[0]
    ok = (loc >= 0) & (loc < nrows)
    part = jnp.take(seg, jnp.clip(loc, 0, nrows - 1), axis=0)
    return jnp.where(ok[:, None], part, out)


def gather_raw_rows(segs, idx: np.ndarray, sel=None):
    """Gather rows ``idx`` (global raw-stream indices) from the segmented
    emission-order stream; consumes (donates) every segment.

    ``sel`` (ascending host array of real raw indices): the segments are
    COMPACT — segment ``k`` holds, in order, the real rows whose raw
    index falls in ``[k*rows, (k+1)*rows)``; compact positions come from
    ``searchsorted``.  Without ``sel`` the segments are the dense padded
    layout (equal rows per segment)."""
    b = segs[0].shape[1]
    flat_idx = np.asarray(idx, np.int64).reshape(-1)
    out = jnp.zeros((flat_idx.shape[0], b), segs[0].dtype)
    if sel is not None:
        pos = np.searchsorted(sel, flat_idx)
        lo = 0
        for seg in segs:
            hi = lo + seg.shape[0]
            loc_np = np.where((pos >= lo) & (pos < hi), pos - lo, -1)
            out = _gather_seg_jit(out, seg,
                                  jnp.asarray(loc_np.astype(np.int32)))
            lo = hi
    else:
        seg_rows = segs[0].shape[0]
        for k, seg in enumerate(segs):
            loc = jnp.asarray((flat_idx - k * seg_rows).astype(np.int32))
            out = _gather_seg_jit(out, seg, loc)
    segs.clear()
    return out.reshape(tuple(np.shape(idx)) + (b,))


@lru_cache(maxsize=8)
def _raw_index_map(n: int, b: int) -> np.ndarray:
    """Sweep-major stream row ``r = off[s] + t`` -> raw ``ys`` row
    ``((s + t//3)*3 + t%3) * W + t//3`` (iteration-major emission)."""
    off, R = hh_schedule(n, b)
    cnt = sweep_reflector_counts(n, b)
    W = _wavefront_width(n, b)
    s_of_r = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    t_of_r = np.arange(R, dtype=np.int64) - off[s_of_r]
    m = t_of_r // 3
    return (((s_of_r + m) * 3 + t_of_r % 3) * W + m).astype(np.int32)


@partial(jax.jit, static_argnames=("n", "b"))
def _band_layout(ab, n: int, b: int):
    """``[b+1, n]`` extract-band layout -> padded flat ``[NPf, 2b+1]``
    (tall enough for the last real iteration's slice; segment-padded
    iterations re-slice the last real row, see ``it_eff``)."""
    W = _wavefront_width(n, b)
    NPf = n + W * (3 * b - 1) + 2 * b + 1
    band = jnp.zeros((NPf, 2 * b + 1), ab.dtype)
    return lax.dynamic_update_slice(band, ab.T, (0, 0))


def wavefront_band_to_tridiagonal(ab, band: int) -> HHChaseResult:
    """Device-resident band -> tridiagonal reduction.

    ``ab``: device (or host) array ``[band+1, n]`` lower-banded storage
    (``ab[i, j] = A[j+i, j]``), real dtype.  Returns the same
    :class:`HHChaseResult` contract as the host chase, with the
    reflector stream held in emission order as a LIST of equal-size
    segments (``V_raw``; see the segment-size rationale in
    :func:`_wavefront_scan_seg`) plus the sweep-major -> raw index map
    (``V_raw_map``): ``resolve_V()`` compacts to the sweep-major
    ``[R, b]`` layout, or ``bt_hh_window_stream`` gathers straight to
    window order (composed gathers, no sweep-major intermediate).
    """
    bp1, n = ab.shape
    if bp1 != band + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {band + 1}")
    if np.iscomplexobj(ab):
        raise ValueError("wavefront chase is real-only (complex stays on "
                         "the host path)")
    _, R = hh_schedule(n, band)
    if n <= 2 or band <= 1:
        d = np.asarray(jnp.asarray(ab)[0, :n].real, np.float64)
        e = np.asarray(jnp.asarray(ab)[1, :max(n - 1, 0)].real
                       if band >= 1 else np.zeros(max(n - 1, 0)),
                       np.float64)
        return HHChaseResult(d, e, jnp.zeros((R, max(band, 1)), ab.dtype),
                             n, band, None)
    flat = _band_layout(jnp.asarray(ab), n, band)
    flat_out, segs, _, sel = _wavefront_scan(flat, n, band)
    de = np.asarray(flat_out[:n, :2])       # one small fetch
    d = np.asarray(de[:, 0], np.float64)
    e = np.asarray(de[: n - 1, 1], np.float64)
    return HHChaseResult(d, e, None, n, band, None,
                         V_raw=segs, V_raw_map=_raw_index_map(n, band),
                         V_raw_sel=sel)
