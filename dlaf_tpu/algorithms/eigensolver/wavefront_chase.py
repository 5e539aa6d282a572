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

from functools import partial

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


@partial(jax.jit, static_argnames=("n", "b"), donate_argnums=(0,))
def _wavefront_scan(band, n: int, b: int):
    """The full chase: returns ``(band_out, V)``.

    ``band``: ``[NP, LD]`` with ``band[j, i] = A[j + i, j]`` (zeros for
    ``j + i >= n`` and ``j >= n``), ``NP = n + 2 b + 2``, ``LD = 2b + 1``.
    ``V``: ``[R + 1, b]`` sweep-major reflector stream (row ``R`` is the
    inactive-slot dump row), identical layout to the host chase.
    """
    dt = band.dtype
    NP = band.shape[0]
    LD = 2 * b + 1
    nsweeps = n - 2
    cnt_np = sweep_reflector_counts(n, b)
    off_np, R = hh_schedule(n, b)
    tmax = int(cnt_np.max()) if len(cnt_np) else 0
    W = max(1, -(-tmax // 3) + 1)
    cnt = jnp.asarray(cnt_np.astype(np.int32))
    off = jnp.asarray(off_np[:-1].astype(np.int32))
    T_total = 3 * nsweeps
    karr = jnp.arange(W, dtype=jnp.int32)
    rows_rel = jnp.arange(b, dtype=jnp.int32)
    iota_b = jnp.arange(b, dtype=jnp.int32)
    iota_ld = jnp.arange(LD, dtype=jnp.int32)

    V = jnp.zeros((R + 1, b), dt)
    v0 = jnp.zeros((W, b), dt)
    tau0 = jnp.zeros((W,), dt)

    def body(carry, T):
        band, V, v, tau = carry
        q = (T - 3 * karr) // (3 * W)
        s = karr + W * q
        t = T - 3 * s
        s_cl = jnp.clip(s, 0, max(nsweeps - 1, 0))
        active = (s >= 0) & (s < nsweeps) & (t >= 0) & (t < cnt[s_cl])
        start = active & (t == 0)

        # ---- sweep start: reflector from column s (depths 1..b) ----
        sidx = jnp.where(start, s, NP - 1)        # parked slots -> pad row
        srow = band[sidx]                          # [W, LD]
        v_s, tau_s, beta_s = _larfg_batched(srow[:, 1:1 + b])
        srow_new = jnp.concatenate(
            [srow[:, :1], beta_s[:, None],
             jnp.zeros((W, b - 1), dt), srow[:, 1 + b:]], axis=1)
        band = band.at[sidx].set(
            jnp.where(start[:, None], srow_new, jnp.zeros((), dt)))
        v = jnp.where(start[:, None], v_s, v)
        tau = jnp.where(start, tau_s, tau)

        # ---- emit V row (current reflector, before the step) ----
        ridx = jnp.where(active, off[s_cl] + t, jnp.int32(R))
        vr = jnp.concatenate([tau[:, None], v[:, 1:]], axis=1)
        V = V.at[ridx].set(jnp.where(active[:, None], vr, 0))

        # ---- window gather: cols [j, j+b) of the band ----
        j = jnp.where(active, 1 + s + t * b, NP - b - 1)
        ridx2 = (j[:, None] + rows_rel[None, :]).reshape(-1)
        X = band[ridx2].reshape(W, b, LD)

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
            [Xn[:, 0, :b], beta2[:, None], jnp.zeros((W, b), dt)], axis=1)
        c0 = ((iota_b == 0)[None, :, None] &
              (iota_ld >= b)[None, None, :])
        Xn = jnp.where(c0, tail0[:, None, :], Xn)

        Xn = jnp.where(active[:, None, None], Xn, jnp.zeros((), dt))
        band = band.at[ridx2].set(Xn.reshape(-1, LD))
        v = jnp.where(active[:, None], v2, v)
        tau = jnp.where(active, tau2, tau)
        return (band, V, v, tau), None

    (band, V, _, _), _ = lax.scan(
        body, (band, V, v0, tau0),
        jnp.arange(T_total, dtype=jnp.int32))
    return band, V


@partial(jax.jit, static_argnames=("n", "b"))
def _band_layout(ab, n: int, b: int):
    """``[b+1, n]`` extract-band layout -> padded ``[NP, 2b+1]``."""
    NP = n + 2 * b + 2
    band = jnp.zeros((NP, 2 * b + 1), ab.dtype)
    return lax.dynamic_update_slice(band, ab.T, (0, 0))


def wavefront_band_to_tridiagonal(ab, band: int) -> HHChaseResult:
    """Device-resident band -> tridiagonal reduction.

    ``ab``: device (or host) array ``[band+1, n]`` lower-banded storage
    (``ab[i, j] = A[j+i, j]``), real dtype.  Returns the same
    :class:`HHChaseResult` contract as the host chase: ``d``/``e`` as
    host float64 arrays, ``V`` as a *device* ``[R, b]`` stream.
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
    bandd = _band_layout(jnp.asarray(ab), n, band)
    band_out, V = _wavefront_scan(bandd, n, band)
    de = np.asarray(band_out[:n, :2])       # one small fetch
    d = np.asarray(de[:, 0], np.float64)
    e = np.asarray(de[: n - 1, 1], np.float64)
    return HHChaseResult(d, e, V[:R], n, band, None)
