"""Multi-process (lock-step SPMD) driver for the region-distributed chase.

Executes :mod:`.hh_chase_dist`'s staircase protocol across JAX processes
(``jax.distributed``): region ``r`` is owned by one process, which
allocates only that region's band strip and produces only its owned V
rows — the chase *compute* and the reflector-stream *production* drop
~P-fold per host, the analogue of the reference's rank-pipelined
``SweepWorkerDist`` (``band_to_tridiag/mc.h:569``, tags
``mc.h:1121-1150``).

Schedule: the software pipeline ``step = 2*group + region``.  At every
step each process chases the groups its regions are due for, then all
processes exchange one fixed-size message buffer (allgather — the
lock-step SPMD transport; messages are consumed exactly one step after
production, both forward handoffs and backward refreshes).  Message
application order matters where the two strips overlap: the backward
strip (right neighbour, previous group) first, then the forward strip
(left neighbour, current group — always at least as new; the right
neighbour's writes never reach below ``c_r + b`` when regions are
``>= G*b`` wide).

The result (d, e, V) is reassembled on every process at the end via the
same allgather transport — at scale the V stream would instead be
device-put shard-wise by each owner; this driver keeps the protocol and
ownership real while returning the replicated result the back-transform
currently consumes.
"""

from __future__ import annotations

import numpy as np

from .hh_chase import HHChaseResult, hh_schedule
from .hh_chase_dist import Region, balanced_boundaries, max_group_size


def _default_allgather(buf: np.ndarray) -> np.ndarray:
    import jax
    if jax.process_count() == 1:
        return buf[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(buf))


def _owner(r: int, nparts: int, nprocs: int) -> int:
    return r * nprocs // nparts


class _MsgLayout:
    """Fixed-size per-region message slot (band dtype):

    ``[fwd_flag, fwd_strip..., exits..., bwd_flag, bwd_strip...]`` with
    exits = G x [present, t, tau, v[0..b)].
    """

    def __init__(self, regions, G: int, b: int):
        self.G, self.b = G, b
        self.rows = 2 * b + 1
        self.wf = [0] * len(regions)      # fwd strip width, region r -> r+1
        self.wb = [0] * len(regions)      # bwd strip width, region r -> r-1
        for r in range(len(regions) - 1):
            a, e = regions[r].shared_range(regions[r + 1])
            self.wf[r] = e - a
            self.wb[r + 1] = e - a
        self.exit_sz = G * (3 + b)
        self.slot = (1 + self.rows * max(self.wf) + self.exit_sz
                     + 1 + self.rows * max(self.wb or [0]))

    def pack_fwd(self, buf, r, strip, exits, g0):
        buf[0] = 1.0
        k = 1
        w = self.wf[r]
        buf[k:k + self.rows * w] = strip.ravel()
        k = 1 + self.rows * max(self.wf)
        for i in range(self.G):
            s = g0 + i
            sl = buf[k + i * (3 + self.b): k + (i + 1) * (3 + self.b)]
            if s in exits:
                v, tau, t = exits[s]
                sl[0] = 1.0
                sl[1] = float(t)
                sl[2] = tau
                sl[3:3 + len(v)] = v
        return buf

    def unpack_fwd(self, buf, r_src, g0):
        if buf[0] == 0:
            return None, {}
        w = self.wf[r_src]
        strip = buf[1:1 + self.rows * w].reshape(self.rows, w)
        k = 1 + self.rows * max(self.wf)
        exits = {}
        for i in range(self.G):
            sl = buf[k + i * (3 + self.b): k + (i + 1) * (3 + self.b)]
            if sl[0] != 0:
                t = int(np.real(sl[1]))
                tau = sl[2]
                v = sl[3:3 + self.b].copy()
                exits[g0 + i] = (v, tau, t)
        return strip, exits

    def pack_bwd(self, buf, r, strip):
        k = 1 + self.rows * max(self.wf) + self.exit_sz
        buf[k] = 1.0
        w = self.wb[r]
        buf[k + 1:k + 1 + self.rows * w] = strip.ravel()
        return buf

    def unpack_bwd(self, buf, r_src):
        k = 1 + self.rows * max(self.wf) + self.exit_sz
        if buf[k] == 0:
            return None
        w = self.wb[r_src]
        return buf[k + 1:k + 1 + self.rows * w].reshape(self.rows, w)


def hh_chase_regions_mp(ab2: np.ndarray, n: int, b: int,
                        boundaries=None, group_size: int | None = None,
                        nparts: int | None = None,
                        process_id: int | None = None,
                        num_processes: int | None = None,
                        allgather=None):
    """Lock-step multi-process region chase.

    Every process passes the same replicated band ``ab2 [(2b+1), n]``
    (cheap: O(n b) values) but chases only its owned regions.  Returns
    ``(ab2_owned, V)`` where both are the *full* arrays reassembled via
    the transport (see module docstring).
    """
    import jax
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    if allgather is None:
        allgather = _default_allgather
    if nparts is None:
        nparts = num_processes
    if boundaries is None:
        # lock-step strips are one step stale: regions must be at least
        # (G+1)*b wide so neighbour writes (incl. the initial larfg of
        # a right-neighbour-owned sweep) never overlap the fwd strip
        boundaries = balanced_boundaries(n, b, nparts, min_width=2 * b)
    cuts = np.asarray(boundaries, np.int64)
    nparts = len(cuts) - 1
    if nparts > 1:
        wmin = int(np.diff(cuts).min())
        if wmin < 2 * b:
            raise ValueError(f"MP regions must be >= 2*b wide, got {wmin}")
        G = max(1, wmin // b - 1)
    else:
        G = max_group_size(cuts, b)
    if group_size is not None:
        G = max(1, min(G, int(group_size)))

    _, R = hh_schedule(n, b)
    V = np.zeros((R, b), ab2.dtype)
    mine = [r for r in range(nparts)
            if _owner(r, nparts, num_processes) == process_id]
    regions = {}
    for r in range(nparts):
        reg = Region(n, b, int(cuts[r]), int(cuts[r + 1]), G, ab2.dtype)
        if r in mine:
            reg.load_band(ab2)
            regions[r] = reg
        else:
            regions[r] = reg      # metadata only (zeros storage, unused)

    layout = _MsgLayout([regions[r] for r in range(nparts)], G, b)
    nsweeps = max(n - 2, 0)
    ngroups = max(-(-nsweeps // G), 1)
    inbox = np.zeros((nparts, layout.slot), ab2.dtype)
    pending = {r: {} for r in mine}

    for step in range(2 * (ngroups - 1) + nparts + 1):
        outbox = np.zeros((nparts, layout.slot), ab2.dtype)
        # backward strips apply unconditionally (r+1's group may trail
        # r's last group: e.g. the initial larfg of a sweep owned by
        # r+1 writes a column owned by r after r has finished)
        for r in mine:
            if r + 1 < nparts:
                bs = layout.unpack_bwd(inbox[r + 1], r + 1)
                if bs is not None:
                    a, e = regions[r].shared_range(regions[r + 1])
                    regions[r].put_cols(a, e, bs)
        for r in mine:
            g = step - r
            if g % 2 or not 0 <= g // 2 < ngroups:
                continue
            g //= 2
            g0 = g * G
            reg = regions[r]
            # forward strip + entries from r-1 (its group g) applied
            # after the backward strip — fwd supersedes in any overlap
            entries_in = {}
            if r > 0:
                fs, exits_in = layout.unpack_fwd(inbox[r - 1], r - 1, g0)
                if fs is not None:
                    a, e = regions[r - 1].shared_range(reg)
                    reg.put_cols(a, e, fs)
                entries_in = exits_in
            pending[r].update(entries_in)

            sweeps = range(g0, min(g0 + G, nsweeps))
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
                a, e = reg.shared_range(regions[r + 1])
                layout.pack_fwd(outbox[r], r, reg.get_cols(a, e), exits, g0)
            if r > 0:
                a, e = regions[r - 1].shared_range(reg)
                layout.pack_bwd(outbox[r], r, reg.get_cols(a, e))
        gathered = allgather(outbox)           # [P, nparts, slot]
        inbox = np.zeros_like(inbox)
        for r in range(nparts):
            inbox[r] = gathered[_owner(r, nparts, num_processes), r]

    # reassemble owned columns + V rows across processes
    owned = np.zeros_like(ab2)
    for r in mine:
        c0, c1 = int(cuts[r]), int(cuts[r + 1])
        owned[:, c0:c1] = regions[r].get_cols(c0, c1)
    col_all = allgather(owned)
    V_all = allgather(V)
    ab2[...] = col_all.sum(axis=0)
    return ab2, V_all.sum(axis=0)


def hh_band_to_tridiagonal_mp(ab: np.ndarray, band: int,
                              **kw) -> HHChaseResult:
    """Multi-process :func:`.hh_chase.hh_band_to_tridiagonal` (see
    :func:`hh_chase_regions_mp`)."""
    bp1, n = ab.shape
    if bp1 != band + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {band + 1}")
    dtype = ab.dtype
    ab2 = np.zeros((2 * band + 1, n), dtype)
    ab2[: band + 1] = ab
    if n > 2 and band > 1:
        _, V = hh_chase_regions_mp(ab2, n, band, **kw)
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
