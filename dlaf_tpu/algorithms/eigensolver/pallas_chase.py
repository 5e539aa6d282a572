"""Pallas TPU kernel for the on-device bulge chase (band -> tridiagonal).

Same wavefront schedule as ``wavefront_chase.py`` (slot ``m`` of
iteration ``it`` runs sweep ``s = it - m`` substeps ``3m + tau``), but
the whole iteration executes inside ONE Pallas kernel with manual
window DMA — the XLA scan materializes ~15 fused temporaries of the
[W, b, 2b+1] window tensor per iteration (measured 2.54 ms/iter at
n = 32768, W = 86), while the kernel touches each slot's working set
once in VMEM.

Storage: the "staircase" strip ``T [n_pad, 3b]`` with
``T[r, c] = A[r, (floor(r/b) - 2) * b + c]`` — each b-row block holds a
DENSE rectangle of the band+bulge columns, so every window block
(``D = A[jc:jc+b, jc:jc+b)``, ``B = A[jc+b:jc+2b, jc:jc+b)``) is
assembled from two static-width slices of a [b, 3b] frame at a traced
column offset and a row-boundary blend — no gathers, no reshape
tricks, Mosaic-friendly.  Only the lower triangle is stored; D is
symmetrized in VMEM by one [b, b] transpose.

Slot order is DESCENDING m: slot m's substep-2 window shares one
column with slot m+1's substep-0 window, and descending order makes
slot m read exactly slot m+1's post-substep-0 values — the same
linearization the XLA scan realizes with its read patch (see
``wavefront_chase._wavefront_scan_seg``).

GROUPED double-buffered DMA (r5): slots are processed in groups of
``G = 8`` (the slot row pitch ``S = 3b - 1`` is odd, so ``G`` must be a
multiple of 8 for the group pitch ``G*S`` to keep the 8-sublane DMA
alignment invariant between consecutive groups).  One contiguous
``[GH, 3b]`` region covers a whole group's frames exactly
(``GH = G*S + OVa``, ``OVa = round8(b + 17)``), and consecutive group
regions overlap by the STATIC ``OVa`` rows:

* group ``g+1``'s region is prefetched (second buffer) while group
  ``g`` computes;
* after compute, the ``OVa`` overlap rows are patched buffer-to-buffer
  in VMEM (they carry group ``g``'s freshest writes; the prefetched
  HBM copy of those rows is stale by construction);
* group ``g``'s write-back DMA skips its first ``OVa`` rows — group
  ``g+1`` (which computes on and writes them last) owns them — so no
  two in-flight DMAs ever write the same HBM row.

This removes the two serial per-slot DMA round trips of the r4 kernel
(one in + one out per slot, each with full latency on the critical
path) in favor of 2 overlapped DMAs per 8 slots.

STATUS (r5, measured on the v5e): correct on hardware (per-iteration
agreement with interpret at f32 rounding after the non-negative-roll
fix below), but SLOWER than both the r4 per-slot kernel (1.2 ms/iter
at n=8192, Wg=24) and the XLA wavefront scan: the slab staging's
predicated copies + selects on [4b+8, 3b] operands cost ~0.5 ms/slot
on this Mosaic build.  Measured per-op landmines (micro-benchmarks,
r5): a DYNAMIC-shift ``pltpu.roll`` costs 20-35 us per window-sized
operand (~80x a copy) regardless of direction; dynamic lane rolls are
only CORRECT for non-negative shifts (static negatives are rejected,
dynamic negatives silently wrong); DMA lane offsets must be
128-aligned (dynamic lane-sliced DMA is rejected); one-hot shift
matmuls at HIGHEST precision are exact but ~670 us.  The identified
r6 lever is BATCHED slots (the substep algebra on [G*b, *] operands,
one issue per op for 8 slots) — per-op issue cost, not data volume,
dominates at [b, 3b] granularity.  Until then the XLA wavefront
remains the production on-device chase; this kernel stays opt-in
(``DLAF_B2T_ALGO=pallas``).

Drop-in segment replacement: the kernel call has the same
``(flat-ish, v, tau, it0) -> (state, v, tau, ys)`` contract as
``_wavefront_scan_seg`` with ys in identical emission order, so the
raw-stream consumers (``_raw_index_map``, ``gather_raw_rows``,
``bt_hh_window_stream``) are reused unchanged.  Select with
``DLAF_B2T_ALGO=pallas``.

Hard-won Mosaic facts baked into the code: dynamic SUBLANE rotates are
broken on hardware (shift reduced mod 16 — replaced by 8-way
predicated static copies); dynamic LANE rotates are exact for negative
shifts; DMA row offsets must be 8-aligned (pl.multiple_of hint);
size-1 minor dims in matmuls and sub-128 lane tiles crash the compiler
(hence the [b, 8] thin panels and 128-padded sweep-lane buffers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .hh_chase import HHChaseResult, hh_schedule
from .wavefront_chase import (_raw_index_map, _segment_iters,
                              _wavefront_width)

#: slots per DMA group; G*S must be a multiple of 8 and S = 3b-1 is odd
_GROUP = 8


def _group_width(n: int, b: int) -> int:
    """Slot count padded up to a whole number of groups; the padded
    slots host sweeps with ``3m >= tmax`` and are inactive at every
    iteration (their reflector-ring accesses are no-op read/writes)."""
    W = _wavefront_width(n, b)
    return -(-W // _GROUP) * _GROUP


def _ova(b: int) -> int:
    """Static inter-group row overlap: consecutive groups' regions
    share ``GH - G*S = OVa`` rows; ``b + 17`` covers the one-slot slab
    tail ``4b + 8 + 8`` minus the group pitch, rounded to sublanes."""
    return -(-(b + 17) // 8) * 8


def _t_rows(n: int, b: int) -> int:
    """T height covering the top group's DMA region, aligned to the
    staircase block (and to 8 sublanes)."""
    import math
    Wg = _group_width(n, b)
    S = 3 * b - 1
    last = max(n - 3, 0) + 1 + Wg * S + _ova(b)
    al = math.lcm(b, 8)
    return -(-last // al) * al


@partial(jax.jit, static_argnames=("n", "b"))
def build_t(ab, n: int, b: int):
    """``[b+1, n]`` banded storage -> staircase strip ``T [n_pad, 3b]``.

    ``T[k*b + rr, b + cc] = A[k*b + rr, (k-1)*b + cc]`` for
    ``cc in [0, 2b)`` (= ``ab[b + rr - cc, (k-1)*b + cc]`` when the
    depth is within the input band); columns [0, b) are the bulge
    workspace, zero at entry.
    """
    dt = ab.dtype
    npad = _t_rows(n, b)
    nk = npad // b
    rr = jnp.arange(b)[:, None]
    cc = jnp.arange(2 * b)[None, :]
    d = b + rr - cc                                    # depth in ab
    k = jnp.arange(nk)[:, None, None]
    j = (k - 1) * b + cc[None]                          # matrix column
    valid = (d[None] >= 0) & (d[None] <= b) & (j >= 0) & (j < n)
    dsafe = jnp.clip(d[None], 0, b)
    jsafe = jnp.clip(j, 0, max(n - 1, 0))
    vals = jnp.where(valid, ab[dsafe, jsafe], jnp.zeros((), dt))
    T = jnp.zeros((npad, 3 * b), dt)
    return T.at[:, b:].set(vals.reshape(npad, 2 * b))


@partial(jax.jit, static_argnames=("n", "b"))
def t_diagonals(T, n: int, b: int):
    """(d [n], e [n-1]) from the staircase strip."""
    r = jnp.arange(n)
    cd = 2 * b + (r % b)                               # col of A[r, r]
    d = T[r, cd]
    r1 = jnp.arange(max(n - 1, 0))
    ce = r1 - ((r1 + 1) // b - 2) * b                  # col of A[r+1, r]
    e = T[r1 + 1, ce]
    return d, e


def _chase_kernel(it0_ref, T_in, v_in, tau_in, T_out, v_out, tau_out,
                  ys_ref, gbuf, slab, slab2, sem_in, sem_out, sem_seed,
                  *, n, b, W, Wg, Wp, nsweeps, lvl=99):
    """One grid step = one chase iteration (all Wg slots, descending m,
    processed in NG = Wg/8 groups with double-buffered region DMA).

    Mosaic constraints shape the code: lane-dimension offsets are never
    used as dynamic slice starts (arbitrary offsets are expressed with
    ``pltpu.roll`` + static slices, and per-sweep state updates are
    one-hot masked blends over the lane axis); vector orientation is
    fixed (v is a [b, 1] column; outer products / row-vector
    contractions go through ``dot_general`` instead of transposes); and
    scalars are extracted with masked reductions.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 3 * b - 1
    G = _GROUP
    NG = Wg // G
    OVa = _ova(b)
    GH = G * S + OVa
    dt = T_out.dtype
    it = jnp.asarray(it0_ref[0] + pl.program_id(0), jnp.int32)
    it_eff = jnp.minimum(it, jnp.int32(nsweeps - 1))

    # first grid step: seed the outputs from the inputs.  ALL subsequent
    # reads go through the OUTPUT refs — intra-call read-after-write
    # (slot regions overlap by one window column, and the region
    # writeback rewrites unmodified neighbor cells) must see this call's
    # writes, which input refs only guarantee under buffer aliasing.
    @pl.when(pl.program_id(0) == 0)
    def _():
        v_out[...] = v_in[...]
        tau_out[...] = tau_in[...]
        cp = pltpu.make_async_copy(T_in, T_out, sem_seed)
        cp.start()
        cp.wait()

    rowi = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    coli = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rowv = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    col8 = lax.broadcasted_iota(jnp.int32, (b, 8), 1)
    col4 = lax.broadcasted_iota(jnp.int32, (b, 4 * b), 1)
    row4 = lax.broadcasted_iota(jnp.int32, (b, 4 * b), 0)
    laneW = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    laneT = lax.broadcasted_iota(jnp.int32, (8, Wp), 1)
    row3 = lax.broadcasted_iota(jnp.int32, (b, 3 * b), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (b, 3 * b), 1)
    zero_bb = jnp.zeros((b, 3 * b), dt)
    zbb = jnp.zeros((b, b), dt)

    def pad8(x_col):
        """[b, 1] -> [b, 8] thin panel (col 0 = x, rest exact zeros).
        Unit minor dims crash the Mosaic matmul lowering; 8-wide panels
        compose exactly (the zero columns stay zero through every
        product below)."""
        return jnp.where(col8 == 0, x_col, jnp.zeros((), dt))

    # f32 MXU passes default to bf16 rounding; the chase's two-sided
    # updates amplify that to ~1e-2 in the eigenvalues — force the
    # 3-pass highest-precision mode like the rest of the pipeline
    _prec = lax.Precision.HIGHEST

    def outer(a8, b8):
        """[b, 8] x [b, 8] thin panels -> [b, b] outer product."""
        return lax.dot_general(a8, b8, (((1,), (1,)), ((), ())),
                               preferred_element_type=dt,
                               precision=_prec)

    def matvec(M, x8):
        """M [b, b] @ panel -> [b, 8] (col 0 = M x)."""
        return lax.dot_general(M, x8, (((1,), (0,)), ((), ())),
                               preferred_element_type=dt,
                               precision=_prec)

    def vecmat(x8, M):
        """panel^T M -> [8, b] (row 0 = x^T M)."""
        return lax.dot_general(x8, M, (((0,), (0,)), ((), ())),
                               preferred_element_type=dt,
                               precision=_prec)

    # ---- group-region DMA plumbing ----------------------------------
    def j0_low(g):
        """Lowest slot base row of group g (slot k = G-1)."""
        return 1 + it_eff + (Wg - G - G * g) * S

    def gbase(g):
        return pl.multiple_of((j0_low(g) // 8) * 8, 8)

    def in_dma(g, slot):
        return pltpu.make_async_copy(
            T_out.at[pl.ds(gbase(g), GH), :], gbuf.at[slot],
            sem_in.at[slot])

    def out_dma_skip(g, slot):
        """Write-back skipping the OVa overlap rows (owned by g+1)."""
        return pltpu.make_async_copy(
            gbuf.at[slot, pl.ds(OVa, GH - OVa), :],
            T_out.at[pl.ds(gbase(g) + OVa, GH - OVa), :],
            sem_out.at[slot])

    def out_dma_full(g, slot):
        return pltpu.make_async_copy(
            gbuf.at[slot], T_out.at[pl.ds(gbase(g), GH), :],
            sem_out.at[slot])

    # ---- frame load/store: 8-way predicated sublane copies ----------
    # (sweep-start only; the substeps work on the per-slot rolled slab)
    def rows3(d0, dr, cur):
        """Buffer rows [d0 + dr, d0 + dr + b) as a [b, 3b] value (d0
        static; dr in [0, 8) is the group DMA's 8-alignment slack).  An
        8-way predicated static copy: dynamic sublane slice starts are
        not provable for Mosaic, and its dynamic sublane ROTATE is
        broken on hardware (reduces the shift mod 16 — measured)."""
        for kk in range(8):
            @pl.when(dr == kk)
            def _(kk=kk):
                slab[0:b, :] = gbuf[cur, d0 + kk:d0 + kk + b, :]
        return slab[0:b, :]

    def store3(d0, dr, cur, val):
        """Write a [b, 3b] value back to buffer rows [d0 + dr, ...)."""
        for kk in range(8):
            @pl.when(dr == kk)
            def _(kk=kk):
                gbuf[cur, d0 + kk:d0 + kk + b, :] = val

    # ---- dynamic lane shift, cheap form -----------------------------
    # pltpu.roll with a DYNAMIC shift costs ~20-35 us per [b, 3b]-scale
    # operand on this chip (micro-measured r5; its dynamic lowering is
    # ~80x slower than a copy), while STATIC rolls are ~free and scalar
    # pl.when branches are cheap.  Decompose the dynamic shift into
    # where-selected static rolls for the high bits + ONE 8-way
    # predicated static roll for the low 3 bits: ~5 executed buffer
    # passes total.  Dynamic shifts must also be NON-NEGATIVE: static
    # negatives are rejected and dynamic negatives are silently WRONG
    # on hardware (micro-measured r5).
    _shbits = max((b - 1).bit_length(), 3)

    def tl_shift(src_ref, dst_ref, sh, left: bool):
        """dst <- lane-roll of src by dynamic ``sh`` in [0, b);
        ``left=True`` rolls left (out[c] = in[c + sh])."""
        L = 3 * b
        x = src_ref[...]
        for bit in range(3, _shbits):
            amt = 1 << bit
            a = (L - amt) if left else amt
            x = jnp.where((sh & amt) != 0, pltpu.roll(x, a, axis=1), x)
        r = sh & 7
        for j in range(8):
            @pl.when(r == j)
            def _(j=j):
                a = ((L - j) % L) if left else j
                dst_ref[...] = pltpu.roll(x, a, axis=1) if a else x

    # ---- dynamic-base window algebra (sweep start only) --------------
    def offsets(jr, jc):
        jr = jnp.asarray(jr, jnp.int32)
        jc = jnp.asarray(jc, jnp.int32)
        ktop = jr // b
        base = jc - (ktop - 2) * b
        ntop = (ktop + 1) * b - jr                 # rows still in ktop
        return base, ntop

    def ext(d0, dr, cur, jr, jc):
        """Dense ``A[jr:jr+b, jc:jc+b)`` from buffer rows
        [d0 + dr, ...).  Lower-triangle cells exact; cells above the
        stored window are garbage, masked by callers.  Returns
        ``(blk, fr)``; pass ``fr`` to the matching ``put``."""
        base, ntop = offsets(jr, jc)
        fr = jnp.concatenate([rows3(d0, dr, cur), jnp.zeros((b, b), dt)],
                             axis=1)                        # [b, 4b]
        # rot[cc] = fr[base + cc]: wraps land at cc >= 4b - base >= b.
        # base in [2b-1, 3b-1): both shifts stay in (b, 3b+1] subset
        # [0, 4b) — non-negative dynamic rolls only (see rows3)
        hi = pltpu.roll(fr, 4 * b - base, axis=1)[:, :b]
        lo = pltpu.roll(fr, 5 * b - base, axis=1)[:, :b]
        return jnp.where(rowi < ntop, hi, lo), fr

    def put(d0, dr, cur, blk, jr, jc, fr):
        """Inverse of ext: blend ``blk`` into buffer rows
        [d0 + dr, ...); ``fr`` is ext's frame for these rows."""
        base, ntop = offsets(jr, jc)
        blk4 = jnp.concatenate([blk, zero_bb], axis=1)      # [b, 4b]
        emb_hi = pltpu.roll(blk4, base, axis=1)             # == base-4b
        emb_lo = pltpu.roll(blk4, base - b, axis=1)         # >= b-1 >= 0
        in_hi = (col4 >= base) & (col4 < base + b) & (row4 < ntop)
        in_lo = (col4 >= base - b) & (col4 < base) & (row4 >= ntop)
        fr = jnp.where(in_hi, emb_hi, jnp.where(in_lo, emb_lo, fr))
        store3(d0, dr, cur, fr[:, : 3 * b])

    # -- static-base window algebra on per-slot ROLLED frames ----------
    # Within a slot, jc = j0 + t*b for t = 0,1,2, so jc mod b == j0
    # mod b =: sh is slot-constant and the staircase bases are
    # base_D = 2b + sh (D at [jc, jc)), base_B = b + sh (B at
    # [jc+b, jc)), ntop = b - sh for BOTH.  Rolling each frame left by
    # sh at load (and back at store) makes both bases STATIC (2b and
    # b): ext/put collapse to static slices and static-position blends.
    # Wrap-around cells (rolled cols [3b-sh, 3b) = original bulge-
    # workspace cols [0, sh)) sit at band depth > 2b: dead cells.  D's
    # windows mask them (upper triangle); B windows only ever contain
    # depth <= 2b cells, so writing garbage there is never observed
    # (t_diagonals reads depths 0/1 only).
    def ext_s(fr, baseS, ntop):
        """Window from a rolled [b, 3b] frame; baseS is a python int."""
        hi = fr[:, baseS:baseS + b]
        lo = fr[:, baseS - b:baseS]
        return jnp.where(rowi < ntop, hi, lo)

    def put_s(fr, blk, baseS, in_hi, in_lo):
        """Blend blk back at static base; returns the new frame
        (caller stores it — frames chain across substeps).  The masks
        are hoisted per slot (they depend only on ntop)."""
        if baseS == 2 * b:
            emb_hi = jnp.concatenate([zbb, zbb, blk], axis=1)
            emb_lo = jnp.concatenate([zbb, blk, zbb], axis=1)
        else:
            emb_hi = jnp.concatenate([zbb, blk, zbb], axis=1)
            emb_lo = jnp.concatenate([blk, zbb, zbb], axis=1)
        return jnp.where(in_hi, emb_hi, jnp.where(in_lo, emb_lo, fr))

    def larfg(x):
        """Column [b, 1] -> (v [b, 1] with v[0]=1, tau, beta); all-zero
        tails give tau = 0 (identity). Mirrors _larfg_batched."""
        alpha = jnp.sum(jnp.where(rowv == 0, x, jnp.zeros((), dt)))
        amax = jnp.max(jnp.abs(x))
        sc = jnp.where(amax == 0, jnp.ones((), dt), amax)
        xs = x / sc
        xnorm2 = jnp.sum(jnp.where(rowv > 0, xs * xs, jnp.zeros((), dt)))
        zero = xnorm2 == 0
        a0 = alpha / sc
        anorm = sc * jnp.sqrt(a0 * a0 + xnorm2)
        beta = jnp.where(alpha >= 0, -anorm, anorm)
        bsafe = jnp.where(zero, jnp.ones((), dt), beta)
        tau = jnp.where(zero, jnp.zeros((), dt), (beta - alpha) / bsafe)
        ssafe = jnp.where(zero, jnp.ones((), dt), alpha - beta)
        v = jnp.where(rowv == 0, jnp.ones((), dt), x * (1.0 / ssafe))
        v = jnp.where(zero & (rowv > 0), jnp.zeros((), dt), v)
        return v, tau, jnp.where(zero, alpha, beta)

    def load_v(vi):
        hot = laneW == vi
        v = jnp.sum(jnp.where(hot, v_out[...], jnp.zeros((), dt)),
                    axis=1, keepdims=True)                  # [b, 1]
        tau = jnp.sum(jnp.where(laneT == vi, tau_out[...],
                                jnp.zeros((), dt))) * jnp.asarray(
                                    1.0 / 8.0, dt)
        return v, tau

    def store_v(vi, v, tau):
        hot = laneW == vi
        v_out[...] = jnp.where(hot, v, v_out[...])
        tau_out[...] = jnp.where(laneT == vi, tau, tau_out[...])

    Wc = jnp.asarray(W, jnp.int32)

    def slot_compute(k, cur, jl, drg, g):
        """Slot k (static, 0..G-1) of group g: m = Wg-1-(g*G+k)."""
        pos0 = (G - 1 - k) * S                       # static buffer base
        m = jnp.asarray(Wg - 1 - G * g - k, jnp.int32)
        s = jnp.asarray(it, jnp.int32) - m
        j0 = jl + pos0
        vi = lax.rem(lax.rem(s, Wc) + Wc, Wc)        # python-mod

        if lvl < 2:
            return
        # ---- sweep start (slot m == 0 <=> k = G-1 of the last group):
        # reflector from column it ----
        if k == G - 1:
            @pl.when((m == 0) & (it < nsweeps) & (lvl >= 3))
            def _():
                blk, fr0 = ext(pos0, drg, cur, j0, it)  # rows it+1..
                x = jnp.sum(jnp.where(coli == 0, blk, jnp.zeros((), dt)),
                            axis=1, keepdims=True)
                v_s, tau_s, beta_s = larfg(x)
                newcol = jnp.where(rowv == 0, beta_s, jnp.zeros((), dt))
                blk = jnp.where(coli == 0, newcol, blk)
                put(pos0, drg, cur, blk, j0, it, fr0)
                svi = lax.rem(lax.rem(it, Wc) + Wc, Wc)
                store_v(svi, v_s, tau_s)

        v, tau = load_v(vi)                          # post sweep-start

        cnt = jnp.where(s >= 0, (n - 3 - jnp.maximum(s, 0)) // b + 1,
                        jnp.zeros((), s.dtype))

        sh = j0 - (j0 // b) * b                      # slot column offset
        ntop = b - sh
        if lvl < 5:
            if lvl >= 4:
                for t in range(3):
                    act = (s >= 0) & (3 * m + t < cnt)
                    v_emit = jnp.where(rowv == 0, tau, v)
                    old = ys_ref[0, t, :, :]
                    ys_ref[0, t, :, :] = jnp.where(laneW == m, v_emit,
                                                   old)
            store_v(vi, v, tau)
            return

        # ---- slab staging: one dr-predicated copy + one cheap dynamic
        # lane shift each way; everything inside the substeps is then a
        # STATIC aligned slice of the rolled slab ----
        for kk in range(8):
            @pl.when(drg == kk)
            def _(kk=kk):
                slab[...] = gbuf[cur, pos0 + kk:pos0 + kk + 4 * b + 8, :]
        tl_shift(slab, slab2, sh, left=True)

        # hoisted put_s masks (ntop-dependent only; shared by substeps)
        hi_row = row3 < ntop
        in_hi_D = (col3 >= 2 * b) & hi_row
        in_lo_D = (col3 >= b) & (col3 < 2 * b) & ~hi_row
        in_hi_B = (col3 >= b) & (col3 < 2 * b) & hi_row
        in_lo_B = (col3 < b) & ~hi_row

        def substep(t, v, tau):
            d0 = t * b
            act = (s >= 0) & (3 * m + t < cnt)
            # emit the pre-step reflector (lane-masked blend; garbage
            # lanes of inactive steps are never referenced by the raw
            # index map).  ys block layout is [.., b, W]: sweeps on
            # lanes, so the [b, 1] state column broadcasts directly.
            v_emit = jnp.where(rowv == 0, tau, v)
            old = ys_ref[0, t, :, :]
            ys_ref[0, t, :, :] = jnp.where(laneW == m, v_emit, old)

            # D block (rows [jc, jc+b)); symmetrize from the lower part
            v8 = pad8(v)
            frd = slab2[d0:d0 + b, :]
            Dl = ext_s(frd, 2 * b, ntop)
            Dl = jnp.where(rowi >= coli, Dl, jnp.zeros((), dt))
            if lvl < 6:          # 5: ext/put identity round-trip
                slab2[d0:d0 + b, :] = put_s(frd, Dl, 2 * b, in_hi_D,
                                            in_lo_D)
                return v, tau
            Dstrict = jnp.where(rowi > coli, Dl, jnp.zeros((), dt))
            D = Dl + Dstrict.T
            if lvl < 7:          # 6: + transpose
                slab2[d0:d0 + b, :] = put_s(frd, D, 2 * b, in_hi_D,
                                            in_lo_D)
                return v, tau
            w1 = tau * matvec(D, v8)
            corr = jnp.sum(w1 * v8) * tau * 0.5
            w8 = w1 - corr * v8
            Dn = D - outer(w8, v8) - outer(v8, w8)
            Dn = jnp.where(act, Dn, D)
            slab2[d0:d0 + b, :] = put_s(frd, Dn, 2 * b, in_hi_D, in_lo_D)

            if lvl < 8:          # 7: full D update
                return v, tau
            # B block (rows [jc+b, jc+2b))
            frb = slab2[d0 + b:d0 + 2 * b, :]
            B = ext_s(frb, b, ntop)
            y8 = matvec(B, v8)
            Bn = B - tau * outer(y8, v8)
            xcol = jnp.sum(jnp.where(coli == 0, Bn, jnp.zeros((), dt)),
                           axis=1, keepdims=True)
            v2, tau2, beta2 = larfg(xcol)
            v28 = pad8(v2)
            z8 = vecmat(v28, Bn)                        # [8, b]; row0 = z
            Bn = Bn - tau2 * lax.dot_general(
                v28, z8, (((1,), (0,)), ((), ())),
                preferred_element_type=dt, precision=_prec)
            newc0 = jnp.where(rowv == 0, beta2, jnp.zeros((), dt))
            Bn = jnp.where(coli == 0, newc0, Bn)
            Bn = jnp.where(act, Bn, B)
            slab2[d0 + b:d0 + 2 * b, :] = put_s(frb, Bn, b, in_hi_B,
                                                in_lo_B)

            v = jnp.where(act, v2, v)
            tau = jnp.where(act, tau2, tau)
            return v, tau

        for t in range(3):
            v, tau = substep(t, v, tau)
        store_v(vi, v, tau)

        # un-roll and write the slab back (rows [4b, 4b+8) round-trip
        # unchanged; the next slot's overlapping read sees this write)
        tl_shift(slab2, slab, sh, left=False)
        for kk in range(8):
            @pl.when(drg == kk)
            def _(kk=kk):
                gbuf[cur, pos0 + kk:pos0 + kk + 4 * b + 8, :] = slab[...]

    # warm-up: prefetch group 0 (reads the freshly seeded T_out on the
    # first grid step — the seed copy above completed before this start)
    in_dma(0, 0).start()

    def group(g, _):
        cur = lax.rem(g, 2)
        nxt = 1 - cur

        @pl.when(g == 0)
        def _():
            in_dma(0, 0).wait()

        @pl.when(g + 1 < NG)
        def _():
            # buffer nxt must be free: its previous occupant's write-back
            # (group g-1, always the skip variant: g-1 <= NG-3 < NG-1)
            @pl.when(g >= 1)
            def _():
                out_dma_skip(g - 1, nxt).wait()
            in_dma(g + 1, nxt).start()

        jl = j0_low(g)
        drg = jl - gbase(g)                  # in [0, 8), uniform in group
        for k in range(G):
            slot_compute(k, cur, jl, drg, g)

        @pl.when(g + 1 < NG)
        def _():
            in_dma(g + 1, nxt).wait()
            # patch the overlap: rows [0, OVa) of this group's region
            # carry this group's writes; the prefetched HBM copy of the
            # same global rows (buffer-local [G*S, GH)) is stale
            gbuf[nxt, G * S:GH, :] = gbuf[cur, 0:OVa, :]

        @pl.when(g + 1 < NG)
        def _():
            out_dma_skip(g, cur).start()
        @pl.when(g + 1 == NG)
        def _():
            out_dma_full(g, cur).start()
        return 0

    lax.fori_loop(0, NG, group, 0)
    # drain before the next grid step re-reads these rows
    out_dma_full(NG - 1, (NG - 1) % 2).wait()
    if NG >= 2:
        out_dma_skip(NG - 2, (NG - 2) % 2).wait()


def _chase_call(T, vbuf, taubuf, it0, n: int, b: int, niter: int,
                interpret: bool = False):
    """One segment (``niter`` iterations) of the Pallas chase."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = _wavefront_width(n, b)
    Wg = _group_width(n, b)
    Wp = vbuf.shape[1]
    dt = T.dtype
    nsweeps = max(n - 2, 0)
    GH = _GROUP * (3 * b - 1) + _ova(b)
    import os
    lvl = int(os.environ.get("DLAF_PALLAS_LVL", "99"))
    kern = partial(_chase_kernel, n=n, b=b, W=W, Wg=Wg, Wp=Wp,
                   nsweeps=nsweeps, lvl=lvl)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(niter,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # T
            pl.BlockSpec(memory_space=pltpu.VMEM),         # vbuf
            pl.BlockSpec(memory_space=pltpu.VMEM),         # taubuf
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # T out
            pl.BlockSpec(memory_space=pltpu.VMEM),         # vbuf out
            pl.BlockSpec(memory_space=pltpu.VMEM),         # taubuf out
            pl.BlockSpec((1, 3, b, Wp), lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GH, 3 * b), dt),                # group buffers
            pltpu.VMEM((4 * b + 8, 3 * b), dt),            # slot slab
            pltpu.VMEM((4 * b + 8, 3 * b), dt),            # rolled slab
            pltpu.SemaphoreType.DMA((2,)),                 # in sems
            pltpu.SemaphoreType.DMA((2,)),                 # out sems
            pltpu.SemaphoreType.DMA(()),                   # seed sem
        ],
    )
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(T.shape, dt),
            jax.ShapeDtypeStruct(vbuf.shape, dt),
            jax.ShapeDtypeStruct(taubuf.shape, dt),
            jax.ShapeDtypeStruct((niter, 3, b, Wp), dt),
        ),
        # scalar-prefetch arg counts in the alias numbering: tensor
        # input k aliases output at k-1
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    it0a = jnp.asarray([it0], jnp.int32)
    return fn(it0a, T, vbuf, taubuf)


@partial(jax.jit, static_argnames=("niter", "W", "b"),
         donate_argnums=(0,))
def _seg_transpose(ys, niter: int, W: int, b: int):
    return jnp.transpose(ys[:, :, :, :W],
                         (0, 1, 3, 2)).reshape(niter * 3 * W, b)


def pallas_band_to_tridiagonal(ab, band: int,
                               interpret: bool | None = None
                               ) -> HHChaseResult:
    """Device-resident chase via the Pallas kernel; same result
    contract as ``wavefront_band_to_tridiagonal`` (segmented raw
    emission stream + index map)."""
    bp1, n = ab.shape
    b = band
    if bp1 != b + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {b + 1}")
    if np.iscomplexobj(ab):
        raise ValueError("pallas chase is real-only")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, R = hh_schedule(n, b)
    if n <= 2 or b <= 1:
        d = np.asarray(jnp.asarray(ab)[0, :n].real, np.float64)
        e = np.asarray(jnp.asarray(ab)[1, :max(n - 1, 0)].real
                       if b >= 1 else np.zeros(max(n - 1, 0)),
                       np.float64)
        return HHChaseResult(d, e, jnp.zeros((R, max(b, 1)), ab.dtype),
                             n, b, None)
    ab = jnp.asarray(ab)
    dt = ab.dtype
    W = _wavefront_width(n, b)
    # lane dims below 128 (or unaligned) crash / are rejected by the
    # Mosaic tiling; pad every sweep-indexed lane axis to a 128 multiple
    Wp = max(-(-W // 128) * 128, 128)
    T = build_t(ab, n, b)
    # v columns / tau row: the kernel indexes sweeps by lane so no
    # vector transposes are ever needed
    vbuf = jnp.zeros((b, Wp), dt)
    taubuf = jnp.zeros((8, Wp), dt)   # tau replicated over 8 sublanes
    nsweeps = n - 2
    niter = _segment_iters(n, b, np.dtype(dt).itemsize)
    segs = []
    for it0 in range(0, nsweeps, niter):
        T, vbuf, taubuf, ys = _chase_call(T, vbuf, taubuf, it0,
                                          n=n, b=b, niter=niter,
                                          interpret=interpret)
        # kernel emits [niter, 3, b, W] (lane-major); raw-stream order
        # is [(it*3 + tau)*W + m, b]
        segs.append(_seg_transpose(ys, niter=niter, W=W, b=b))
    d, e = t_diagonals(T, n=n, b=b)
    d = np.asarray(np.asarray(d), np.float64)
    e = np.asarray(np.asarray(e), np.float64)
    return HHChaseResult(d, e, None, n, b, None,
                         V_raw=segs, V_raw_map=_raw_index_map(n, b))
