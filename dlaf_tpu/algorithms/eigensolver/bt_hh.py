"""Back-transform of the Householder band->tridiag stage (MXU compact-WY).

Equivalent of the reference's ``bt_band_to_tridiagonal``
(``eigensolver/bt_band_to_tridiag/impl.h``): applies the bulge-chasing
reflectors of ``hh_chase.py`` to the eigenvector matrix ``E`` as *blocked*
compact-WY updates, grouped exactly like the reference (``impl.h:666-707``:
"sweeps are on diagonals, steps are on verticals" — groups of consecutive
sweeps, window per chase step, windows applied in ascending step order and
groups from the last to the first).

Validity of the regrouping (vs strict reverse-chronological application):
target order puts window ``t`` right of window ``t' > t``; the only pairs
whose relative order flips vs chronological are ``H_{s,t}``/``H_{s',t'}``
with ``s < s'`` and ``t < t'``, whose row ranges
``[1+s+tb, +b)`` and ``[1+s'+t'b, +b)`` are disjoint (distance
``(t'-t)b + (s'-s) >= b+1``), so they commute.

Each window update is ``E_w <- E_w - V (T (V^H E_w))`` with the trapezoid
``V [b+g-1, g]`` (column ``c`` = sweep ``s0+c``'s reflector at row offset
``c``) and forward compact-WY ``T`` — three MXU gemms per window, scanned
over the whole window sequence in a single ``lax.scan`` (window V matrices
are gathered from the compact reflector stream *inside* the scan body, so
device memory stays at the stream's ~n^2/2 values).  Columns of ``E`` are
untouched by the row windows, so a column-sharded ``E`` distributes the
back-transform with no collectives at all.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops import tile
from ...tune import get_tune_parameters
from .hh_chase import HHChaseResult, hh_schedule, sweep_reflector_counts


@lru_cache(maxsize=4)
def bt_hh_window_schedule(n: int, b: int, g: int):
    """Static window sequence for the grouped back-transform.

    Returns ``(widx [Nw, g], r0 [Nw])``: window ``w`` applies reflectors
    ``widx[w, c]`` (index into the sweep-major stream; -1 = absent) of
    sweeps ``s0 + c`` at matrix rows ``[r0[w], r0[w] + b + g - 1)``.
    Sequence order = application order: groups of ``g`` consecutive sweeps
    from the last group to the first, windows within a group by ascending
    chase step.
    """
    off, R = hh_schedule(n, b)
    cnt = sweep_reflector_counts(n, b)
    nsweeps = len(cnt)
    if R == 0:
        return np.zeros((0, g), np.int32), np.zeros(0, np.int32)
    widx_rows = []
    r0_rows = []
    ngroups = -(-nsweeps // g)
    for k in range(ngroups - 1, -1, -1):
        s0 = k * g
        gs = min(g, nsweeps - s0)
        tmax = int(cnt[s0:s0 + gs].max())
        for t in range(tmax):
            row = np.full(g, -1, np.int64)
            for c in range(gs):
                if t < cnt[s0 + c]:
                    row[c] = off[s0 + c] + t
            widx_rows.append(row)
            r0_rows.append(1 + s0 + t * b)
    return (np.asarray(widx_rows, np.int32),
            np.asarray(r0_rows, np.int32))


def _bt_hh_scan_impl(E, stream, widx, r0, b: int, g: int, e_sharding=None):
    """Scan the window sequence over (row-padded) E."""
    hw = b + g - 1
    dtype = E.dtype
    nc = E.shape[1]
    if e_sharding is not None:
        # column sharding: row windows never cross columns, so the whole
        # scan runs collective-free on column shards
        E = lax.with_sharding_constraint(E, e_sharding)

    def skew_right(P):
        """Row ``c`` of ``P [g, hw]`` shifted right by ``c`` (zero fill) —
        pure pad+reshape (the flattened-stride trick), no gather op."""
        Xp = jnp.concatenate([P, jnp.zeros((g, g), P.dtype)], axis=1)
        Y = Xp.reshape(-1)[: g * (hw + g - 1)].reshape(g, hw + g - 1)
        return Y[:, :hw]

    # pre-gather the stream into window order: ONE vectorized gather here
    # instead of a gather op per scan step (per-step gathers execute at
    # ~0.4 ms each on the v5e — the same pathology as the D&C rotation
    # scan); scan xs slices are dynamic-slices, the fast path.  Memory is
    # ~the stream itself (every reflector lands in exactly one window).
    # A caller that already window-ordered the stream (via
    # :func:`bt_hh_window_stream`, before the D&C stage holds two full
    # matrices) passes it 3-D and skips the gather here.
    if stream.ndim == 3:
        streamw = stream
    else:
        streamw = jnp.take(stream, jnp.maximum(widx, 0).reshape(-1),
                           axis=0).reshape(widx.shape[0], g, b)

    def body(E, xs):
        vrows, w_idx, row0 = xs                            # vrows: [g, b]
        # absent or tau==0 reflectors contribute identity: zero the whole
        # column (t_factor's tau-safe trick requires all-zero columns)
        keep = (w_idx >= 0) & (vrows[:, 0] != 0)           # [g]
        taus = jnp.where(keep, vrows[:, 0], jnp.zeros((), dtype))
        vrows = vrows.at[:, 0].set(jnp.ones((), dtype))    # implied v[0]=1
        vrows = jnp.where(keep[:, None], vrows, jnp.zeros((), dtype))
        # well-formed trapezoid V [hw, g]: column c = sweep s0+c's
        # reflector at row offset c (P's zero tail covers i - c >= b)
        P = jnp.concatenate(
            [vrows, jnp.zeros((g, hw - b), dtype)], axis=1)
        V = skew_right(P).T
        # forward compact-WY T: T^{-1} = diag(1/tau) + triu(V^H V, 1)
        tau_safe = jnp.where(taus == 0, jnp.ones_like(taus), taus)
        vhv = tile.dot(tile.adj(V), V)
        tinv = jnp.triu(vhv, 1) + jnp.diag(1.0 / tau_safe)
        zero = jnp.zeros((), row0.dtype)
        Ew = lax.dynamic_slice(E, (row0, zero), (hw, nc))
        Y = tile.dot(tile.adj(V), Ew)                      # [g, nc]
        Z = lax.linalg.triangular_solve(tinv, Y, left_side=True,
                                        lower=False)
        Ew = Ew - tile.dot(V, Z)
        E = lax.dynamic_update_slice(E, Ew, (row0, zero))
        return E, None

    E, _ = lax.scan(body, E, (streamw, widx, r0))
    return E


_bt_hh_scan = partial(jax.jit, static_argnames=("b", "g", "e_sharding"))(
    _bt_hh_scan_impl)
# donating E (the in-place scan carry) and the reflector stream (dead after
# the window pre-gather) cuts ~6.4 GB of peak at n = 32768
_bt_hh_scan_donated = partial(
    jax.jit, static_argnames=("b", "g", "e_sharding"),
    donate_argnums=(0, 1))(_bt_hh_scan_impl)


def bt_hh_apply(res: HHChaseResult, E, e_sharding=None,
                donate: bool = False, stream=None, keep_pad: bool = False):
    """Apply the band->tridiag transform: returns ``Q @ (D @ E)``.

    ``E``: ``[n, ncols]`` eigenvectors of the real tridiagonal (real); the
    result is complex iff the band input was complex.  ``e_sharding``:
    optional column ``NamedSharding`` for the distributed back-transform.
    ``donate=True`` releases ``E``'s and the stream's device buffers into
    the transform (callers must not reuse them).

    Memory-lean callers: pass ``stream=bt_hh_window_stream(res)`` (built
    before D&C), an E that already carries :func:`bt_hh_pad_rows` zero
    rows, and ``keep_pad=True`` — then no full-matrix copy is made here
    and the padded result feeds ``bt_reduction_to_band`` directly.
    """
    n, b = res.n, res.band
    if stream is None:
        res.resolve_V()         # join a pending background upload
    E = jnp.asarray(E)
    squeeze = E.ndim == 1
    if squeeze:
        E = E[:, None]
    if E.shape[0] < n:
        raise ValueError(f"E rows {E.shape[0]} < n {n}")
    if res.phases is not None:
        E = E.astype(res.phases.dtype)
        E = jnp.asarray(res.phases)[:, None] * E[:n]

    stream = stream if stream is not None else res.V
    from ...utils.asserts import assert_moderate
    assert_moderate(stream.ndim == 3 or
                    (stream.ndim == 2 and stream.shape[1] == b),
                    "reflector stream width != band", shape=stream.shape,
                    band=b)
    if res.V is not None:
        R = res.V.shape[0]
    else:                       # pending async upload, stream provided
        from .hh_chase import hh_schedule
        R = hh_schedule(n, b)[1]
    if R == 0 or n <= 2 or b <= 1:
        E = E[:n] if not keep_pad else E
        return E[:, 0] if squeeze else E

    g = int(get_tune_parameters().bt_group_size)
    g = max(1, min(g, max(n - 2, 1)))
    widx, r0 = bt_hh_window_schedule(n, b, g)

    pad = bt_hh_pad_rows(n, b, g)
    if E.shape[0] < n + pad:
        E = jnp.concatenate(
            [E, jnp.zeros((n + pad - E.shape[0],) + E.shape[1:], E.dtype)],
            axis=0)
    scan = _bt_hh_scan_donated if donate else _bt_hh_scan
    Ex = scan(E, jnp.asarray(stream), jnp.asarray(widx),
              jnp.asarray(r0), b=b, g=g, e_sharding=e_sharding)
    out = Ex if keep_pad else Ex[:n]
    return out[:, 0] if squeeze else out


def bt_hh_pad_rows(n: int, b: int, g: int | None = None) -> int:
    """Zero rows below row n the BT-B2T scan needs on E.

    Callers that produce E (the D&C gemm) can allocate them up front so
    no padded copy of E is ever made; the pad rows stay exactly zero
    through the scan (reflector entries past the matrix edge are zero).
    """
    if g is None:
        g = int(get_tune_parameters().bt_group_size)
    g = max(1, min(g, max(n - 2, 1)))
    _, r0 = bt_hh_window_schedule(n, b, g)
    hw = b + g - 1
    return max(0, (max(int(r0.max()) + hw, n) - n)) if len(r0) else 0


def bt_hh_window_stream(res: HHChaseResult, g: int | None = None):
    """Window-ordered reflector stream [Nw, g, b] (donates ``res.V``).

    Run this *before* the D&C stage when the stream is already on
    device (the gather briefly holds the stream twice, which is cheap
    then but pushes the peak over budget if it happens inside the BT
    scan while two full matrices are live) — or *after* D&C when the
    upload drained behind it (``async_upload``; the transient then
    coexists with one full matrix, same peak either way).
    """
    n, b = res.n, res.band
    if g is None:
        g = int(get_tune_parameters().bt_group_size)
    g = max(1, min(g, max(n - 2, 1)))
    if res.V is None and res.V_raw is not None and res.v_resolve is None:
        # wavefront raw stream: compose sweep-major->raw with the window
        # schedule on the host — per-segment masked gathers straight to
        # window order, no sweep-major intermediate
        from .wavefront_chase import gather_raw_rows
        widx, _ = bt_hh_window_schedule(n, b, g)
        if widx.shape[0] == 0:
            return res.resolve_V()
        idx = res.V_raw_map[np.maximum(widx, 0)]
        out = gather_raw_rows(res.V_raw, idx, sel=res.V_raw_sel)
        res.V_raw = res.V_raw_map = res.V_raw_sel = None    # donated
        return out
    res.resolve_V()
    if res.V.shape[0] == 0 or n <= 2 or b <= 1:
        return res.V
    widx, _ = bt_hh_window_schedule(n, b, g)
    out = _window_gather_jit(jnp.asarray(res.V), jnp.asarray(widx),
                             g=g, b=b)
    res.V = None        # donated; resolve_V now raises "consumed"
    return out


@partial(jax.jit, static_argnames=("g", "b"), donate_argnums=(0,))
def _window_gather_jit(stream, widx, g: int, b: int):
    return jnp.take(stream, jnp.maximum(widx, 0).reshape(-1),
                    axis=0).reshape(widx.shape[0], g, b)
