"""Batched-slot Pallas chase (v4): band -> tridiagonal, G slots per op.

The r5 microbenchmarks (BASELINE.md "Mosaic op costs") showed per-op
ISSUE cost — not data volume — dominates the per-slot v3 kernel at
[b, 3b] granularity, and that batched ops on [G*b, *] operands are
~0.05-0.4 us each.  v4 therefore runs the whole substep algebra
BATCHED over a group of ``G`` slots:

* slot-major batched slab ``BS [G*4b, 3b]`` gathered from the group's
  shared VMEM region (the region preserves cross-slot row sharing);
* per-slot lane shifts composed as ONE dynamic base roll (value-form
  tl_shift) + per-slot STATIC rolls (slot k's shift is sh0 + k mod b,
  so the per-slot residue is the static amount k plus a conditional
  wrap roll — static rolls are ~free, BASELINE.md r5);
* the phase algebra uses the wavefront scan's global-phase
  linearization (all slots substep 0, then 1, then 2) with the same
  read patch — realized here as two small inter-slot-block row copies
  after phases 0 and 1 (rolled by the inter-slot shift residue);
* per-slot reductions become indicator-matrix MXU products
  (``ind [G, G*b]`` one-hot block rows — sums over a slot's sublanes in
  one issue), per-slot transposes become batched 3D ``swapaxes`` (one
  issue), and per-slot vector broadcasts become leading-dim
  ``broadcast_to`` + reshape.

Correctness contract and plumbing (T strip layout, ys emission order,
result types) are shared with the v3 kernel (``pallas_chase.py``);
select with ``DLAF_B2T_ALGO=pallas4``.

Reference anchor: this replaces ``band_to_tridiag/mc.h:477+``
(SweepWorker) as the on-device formulation, like the XLA wavefront
(``wavefront_chase.py``) it is schedule-equivalent to.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .hh_chase import HHChaseResult, hh_schedule
from .pallas_chase import _t_rows as _t_rows_v3
from .pallas_chase import build_t, t_diagonals
from .wavefront_chase import _raw_index_map, _wavefront_width

#: slots per batched group; G*S must be a multiple of 8 (S = 3b-1 odd)
_GROUP = 8

#: timing-bisect knob (hardware profiling only; results are WRONG for
#: lvl > 0): 0 = full kernel, 1 = skip the 3 phase substeps, 2 = also
#: skip the shift roll-in/out chains, 3 = DMA + slab gather/scatter only
import os as _os

_LVL = int(_os.environ.get("DLAF_PALLAS4_LVL", "0"))

#: keep the whole T strip in a VMEM scratch across the grid (50 MB at
#: n = 32768 < the measured 128 MB v5e VMEM), replacing the per-group
#: HBM DMA round-trip.  MEASURED SLOWER (0.51-0.56 vs 0.41-0.43 ms/iter
#: at n = 2048): Mosaic vector loads need 8-aligned sublane starts, so
#: the unaligned access becomes an aligned [4b+8] read-modify-write
#: splice that costs more than the DMA staging it replaces.  Kept as an
#: opt-in (DLAF_PALLAS4_VMEM=1) measurement path; default off.
_VMEM_T = _os.environ.get("DLAF_PALLAS4_VMEM", "0") != "0"


def _group_width(n: int, b: int) -> int:
    W = _wavefront_width(n, b)
    return -(-W // _GROUP) * _GROUP


def _gh(b: int) -> int:
    """Group region height: covers slot k=0's slab + 8-row DMA slack."""
    G, S = _GROUP, 3 * b - 1
    return -(-((G - 1) * S + 4 * b + 8) // 8) * 8


def _t_rows(n: int, b: int) -> int:
    """T height covering the top group's region (v3's bound is >= the
    v4 need: OVa >= b + 17 >= 4b + 8 - S + 7)."""
    return _t_rows_v3(n, b)


def _chase_kernel_v4(it0_ref, T_in, v_in, tau_in, T_out, v_out, tau_out,
                     ys_ref, gbuf, BS, sem_in, sem_out, sem_seed,
                     *, n, b, W, Wg, Wp, nsweeps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = _GROUP
    S = 3 * b - 1
    NG = Wg // G
    GH = _gh(b)
    L = 3 * b
    dt = T_out.dtype
    it = jnp.asarray(it0_ref[0] + pl.program_id(0), jnp.int32)
    it_eff = jnp.minimum(it, jnp.int32(nsweeps - 1))

    @pl.when(pl.program_id(0) == 0)
    def _():
        v_out[...] = v_in[...]
        tau_out[...] = tau_in[...]
        cp = pltpu.make_async_copy(T_in, gbuf if _VMEM_T else T_out,
                                   sem_seed)
        cp.start()
        cp.wait()

    # ---- static masks / iotas --------------------------------------
    Gb = G * b
    rowi = lax.broadcasted_iota(jnp.int32, (Gb, b), 0)
    coli = lax.broadcasted_iota(jnp.int32, (Gb, b), 1)
    rowmod = rowi % b
    blk = rowi // b                                       # [Gb, b]
    blk1 = blk[:, 0:1]                                    # [Gb, 1]
    rowm1 = rowmod[:, 0:1]                                # [Gb, 1]
    row3 = lax.broadcasted_iota(jnp.int32, (Gb, L), 0) % b
    col3 = lax.broadcasted_iota(jnp.int32, (Gb, L), 1)
    rowv = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    colG = lax.broadcasted_iota(jnp.int32, (G, b), 1)
    rowG1 = lax.broadcasted_iota(jnp.int32, (G, 1), 0)
    col8 = lax.broadcasted_iota(jnp.int32, (Gb, 8), 1)
    laneWb = lax.broadcasted_iota(jnp.int32, (b, Wp), 1)
    laneW8 = lax.broadcasted_iota(jnp.int32, (8, Wp), 1)
    diagF = (coli == rowmod).astype(dt)                   # [Gb, b]
    ind = (lax.broadcasted_iota(jnp.int32, (G, Gb), 1) // b ==
           lax.broadcasted_iota(jnp.int32, (G, Gb), 0)).astype(dt)
    eyeb = (lax.broadcasted_iota(jnp.int32, (b, b), 0) ==
            lax.broadcasted_iota(jnp.int32, (b, b), 1)).astype(dt)
    eyeG = (lax.broadcasted_iota(jnp.int32, (G, G), 0) ==
            lax.broadcasted_iota(jnp.int32, (G, G), 1)).astype(dt)
    zpadb = jnp.zeros((Gb, b), dt)
    _prec = lax.Precision.HIGHEST

    def mxu(a, bb, ca, cb):
        return lax.dot_general(a, bb, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=dt,
                               precision=_prec)

    def seg_rows(x_col):
        """[Gb, 1] per-slot stacked column -> [G, b] rows (one MXU)."""
        return mxu(ind, x_col * diagF, 1, 0)

    def seg_sum(x_col):
        """[Gb, 1] -> per-slot sums [G, 1] (pad to 8 lanes for the MXU,
        read back column 0)."""
        x8 = jnp.where(col8 == 0, x_col, jnp.zeros((), dt))
        return mxu(ind, x8, 1, 0)[:, 0:1]

    def bcast_rows(x_rows):
        """[G, b] per-slot rows -> [Gb, b] row-broadcast."""
        return jnp.broadcast_to(x_rows[:, None, :], (G, b, b)
                                ).reshape(Gb, b)

    def bcast_col(x_G):
        """[G, 1] per-slot scalars -> [Gb, 1]."""
        return jnp.broadcast_to(x_G[:, None, :], (G, b, 1)).reshape(Gb, 1)

    def stack_col(x_rows):
        """[G, b] rows -> [Gb, 1] stacked column (bcast + diag mask)."""
        return jnp.sum(bcast_rows(x_rows) * diagF, axis=1, keepdims=True)

    def bt_transpose(x):
        """[Gb, b] -> per-slot-block transposed [Gb, b]."""
        return jnp.swapaxes(x.reshape(G, b, b), 1, 2).reshape(Gb, b)

    def tau_to_row(tau_G):
        """[G, 1] per-slot scalars -> [1, G] row (lane broadcast +
        diagonal sublane-sum; no relayout reshape needed)."""
        sq = jnp.broadcast_to(tau_G, (G, G)) * eyeG
        return jnp.sum(sq, axis=0, keepdims=True)

    def roll_l(x, a):
        a = a % L
        return pltpu.roll(x, (L - a) % L, axis=1) if a else x

    def larfg_rows(X_rows):
        """Batched larfg on per-slot ROW vectors [G, b] -> (v_rows,
        tau [G,1], beta [G,1]); zero tails give tau = 0 (identity)."""
        alpha = X_rows[:, 0:1]
        amax = jnp.max(jnp.abs(X_rows), axis=1, keepdims=True)
        sc = jnp.where(amax == 0, jnp.ones((), dt), amax)
        xs = X_rows / sc
        xn2 = jnp.sum(jnp.where(colG > 0, xs * xs, jnp.zeros((), dt)),
                      axis=1, keepdims=True)
        zero = xn2 == 0
        a0 = alpha / sc
        anorm = sc * jnp.sqrt(a0 * a0 + xn2)
        beta = jnp.where(alpha >= 0, -anorm, anorm)
        bsafe = jnp.where(zero, jnp.ones((), dt), beta)
        tau = jnp.where(zero, jnp.zeros((), dt), (beta - alpha) / bsafe)
        ssafe = jnp.where(zero, jnp.ones((), dt), alpha - beta)
        v = jnp.where(colG == 0, jnp.ones((), dt), X_rows / ssafe)
        v = jnp.where(zero & (colG > 0), jnp.zeros((), dt), v)
        return v, tau, jnp.where(zero, alpha, beta)

    Wc = jnp.asarray(W, jnp.int32)

    def group(g):
        # ``g`` is a TRACED i32 scalar: the body is identical for every
        # group except these scalars, so the group loop is a fori_loop
        # and the Mosaic binary stays NG-independent (the unrolled form
        # measured 195-460 s server-side program load at n = 8-16k,
        # re-paid per solve once other programs evict it)
        wg1g = jnp.asarray(Wg - 1, jnp.int32) - jnp.asarray(G, jnp.int32) * g
        jl = jnp.asarray(1, jnp.int32) + it_eff \
            + (wg1g - jnp.asarray(G - 1, jnp.int32)) * jnp.asarray(S, jnp.int32)

        if _VMEM_T:
            # VMEM gather: slot k's slab starts at jl+(G-1-k)*S.  Mosaic
            # vector loads need the sublane start provably 8-aligned, so
            # load from the aligned base and slice the +kk residue
            # statically (st mod 8 differs per k: S = 383 is 7 mod 8)
            for k in range(G):
                st = jl + jnp.asarray((G - 1 - k) * S, jnp.int32)
                base = pl.multiple_of((st // 8) * 8, 8)
                dr = st - base
                for kk in range(8):
                    @pl.when(dr == kk)
                    def _(kk=kk, k=k, base=base):
                        blk = gbuf[pl.ds(base, 4 * b + 8), :]
                        BS[k * 4 * b:(k + 1) * 4 * b, :] = \
                            blk[kk:kk + 4 * b, :]
        else:
            gb = pl.multiple_of((jl // 8) * 8, 8)
            drg = jl - gb

            cp_in = pltpu.make_async_copy(
                T_out.at[pl.ds(gb, GH), :], gbuf, sem_in)
            cp_in.start()
            cp_in.wait()

            # slab gather: BS[k*4b:(k+1)*4b] = gbuf[pos0_k + drg : +4b]
            for kk in range(8):
                @pl.when(drg == kk)
                def _(kk=kk):
                    for k in range(G):
                        p0 = (G - 1 - k) * S + kk
                        BS[k * 4 * b:(k + 1) * 4 * b, :] = \
                            gbuf[p0:p0 + 4 * b, :]

        # ---- per-slot shifts: sh_k = (sh0 + k) mod b ----
        # j0_k = jl + (G-1-k)*S; sh0 = j0_{k=0} mod b
        sh0 = lax.rem(jl + jnp.asarray((G - 1) * S, jnp.int32),
                      jnp.asarray(b, jnp.int32))
        shbits = max((b - 1).bit_length(), 1)

        def dyn_roll(x, sh, left):
            for bit in range(shbits):
                amt = 1 << bit
                a = ((L - amt) if left else amt) % L
                x = jnp.where((sh & amt) != 0, pltpu.roll(x, a, axis=1),
                              x)
            return x

        # effective per-slot shift is (sh0 + k) mod b: apply the dynamic
        # sh0 + static k, then cancel the excess b*(sh0+k)//b with
        # conditional static rolls (left by -b ~ 2b, -2b ~ b mod 3b)
        if _LVL < 3:
            x = BS[...]
            if _LVL < 2:
                x = dyn_roll(x, sh0, left=True)
                parts = []
                for k in range(G):
                    xk = roll_l(x[k * 4 * b:(k + 1) * 4 * b, :], k)
                    e = sh0 + k
                    xk = jnp.where((e >= b) & (e < 2 * b),
                                   roll_l(xk, 2 * b), xk)
                    xk = jnp.where(e >= 2 * b, roll_l(xk, b), xk)
                    parts.append(xk)
                x = jnp.concatenate(parts, axis=0)
            BS[...] = x

        # per-slot quantities
        m_G = wg1g - rowG1                                     # [G, 1]
        s_G = it - m_G
        cnt_G = jnp.where(s_G >= 0,
                          (n - 3 - jnp.maximum(s_G, 0)) // b + 1,
                          jnp.zeros((), s_G.dtype))
        j0_G = jl + (jnp.asarray(G - 1, jnp.int32) - rowG1) \
            * jnp.asarray(S, jnp.int32)
        sh_G = lax.rem(j0_G, jnp.asarray(b, jnp.int32))
        ntop_G = jnp.asarray(b, jnp.int32) - sh_G
        ntop_col = bcast_col(ntop_G)                           # [Gb, 1]
        hi_mask = rowm1 < ntop_col                             # [Gb, 1]
        ntopmask = jnp.broadcast_to(hi_mask, (Gb, b))
        hi3 = jnp.broadcast_to(hi_mask, (Gb, L))
        in_hi_D = (col3 >= 2 * b) & hi3
        in_lo_D = (col3 >= b) & (col3 < 2 * b) & ~hi3
        in_hi_B = (col3 >= b) & (col3 < 2 * b) & hi3
        in_lo_B = (col3 < b) & ~hi3

        # ---- sweep start (m = 0 lives in the LAST group, slot G-1) --
        if True:  # noqa: the block gates on traced scalars via pl.when

            @pl.when((g == NG - 1) & (it < nsweeps))
            def _():
                base = (G - 1) * 4 * b
                F0 = BS[base:base + b, :]
                nt = jnp.asarray(b, jnp.int32) - lax.rem(
                    jl, jnp.asarray(b, jnp.int32))
                himask = rowv < nt
                xcol = jnp.where(himask, F0[:, 2 * b - 1:2 * b],
                                 F0[:, b - 1:b])
                # larfg on one [b, 1] column (single-slot form)
                alpha = jnp.sum(jnp.where(rowv == 0, xcol,
                                          jnp.zeros((), dt)))
                amax = jnp.max(jnp.abs(xcol))
                sc = jnp.where(amax == 0, jnp.ones((), dt), amax)
                xs = xcol / sc
                xn2 = jnp.sum(jnp.where(rowv > 0, xs * xs,
                                        jnp.zeros((), dt)))
                zero = xn2 == 0
                a0 = alpha / sc
                anorm = sc * jnp.sqrt(a0 * a0 + xn2)
                beta = jnp.where(alpha >= 0, -anorm, anorm)
                bsafe = jnp.where(zero, jnp.ones((), dt), beta)
                tau_s = jnp.where(zero, jnp.zeros((), dt),
                                  (beta - alpha) / bsafe)
                ssafe = jnp.where(zero, jnp.ones((), dt), alpha - beta)
                v_s = jnp.where(rowv == 0, jnp.ones((), dt),
                                xcol / ssafe)
                v_s = jnp.where(zero & (rowv > 0), jnp.zeros((), dt),
                                v_s)
                beta_s = jnp.where(zero, alpha, beta)
                newcol = jnp.where(rowv == 0, beta_s, jnp.zeros((), dt))
                colmask_hi = (lax.broadcasted_iota(
                    jnp.int32, (b, L), 1) == 2 * b - 1) & (rowv < nt)
                colmask_lo = (lax.broadcasted_iota(
                    jnp.int32, (b, L), 1) == b - 1) & (rowv >= nt)
                F0n = jnp.where(colmask_hi | colmask_lo,
                                jnp.broadcast_to(newcol, (b, L)), F0)
                BS[base:base + b, :] = F0n
                svi = lax.rem(lax.rem(it, Wc) + Wc, Wc)
                v_out[...] = jnp.where(laneWb == svi, v_s, v_out[...])
                tau_out[...] = jnp.where(laneW8 == svi, tau_s,
                                         tau_out[...])

        # ---- load group v/tau via one-hot gather --------------------
        vi0 = lax.rem(lax.rem(it - wg1g, Wc) + Wc, Wc)
        selL = lax.broadcasted_iota(jnp.int32, (Wp, G), 0)
        selK = lax.broadcasted_iota(jnp.int32, (Wp, G), 1)
        dlk = lax.rem(lax.rem(selL - selK - vi0, Wc) + Wc, Wc)
        sel = ((dlk == 0) & (selL < Wc)).astype(dt)           # [Wp, G]
        V_cols = mxu(v_out[...], sel, 1, 0)                    # [b, G]
        V_rows = mxu(V_cols, eyeb, 0, 0)                       # [G, b]
        tau8G = mxu(tau_out[...], sel, 1, 0)                   # [8, G]
        ones8 = jnp.full((8, 1), 1.0 / 8.0, dt)
        tau_G = mxu(tau8G, ones8, 0, 0)                        # [G, 1]

        # one-hot emission placement (m_k = Wg-1-G*g-k)
        laneGW = lax.broadcasted_iota(jnp.int32, (G, Wp), 1)
        rowGW = lax.broadcasted_iota(jnp.int32, (G, Wp), 0)
        selmj = (laneGW == wg1g - rowGW).astype(dt)
        laneM = lax.broadcasted_iota(jnp.int32, (1, Wp), 1)[0]
        maskM = (laneM >= wg1g - jnp.asarray(G - 1, jnp.int32)) \
            & (laneM <= wg1g)

        def phase(t, V_rows, V_cols, tau_G):
            act_G = (s_G >= 0) & (3 * m_G + t < cnt_G)         # [G, 1]
            act_col = bcast_col(act_G.astype(dt)) > 0          # [Gb, 1]

            # emission (pre-step reflector), lane-major [b, Wp]
            tau_bc = jnp.broadcast_to(tau_to_row(tau_G), (b, G))
            v_emit = jnp.where(rowv == 0, tau_bc, V_cols)      # [b, G]
            ysblk = mxu(v_emit, selmj, 1, 0)                   # [b, Wp]
            old = ys_ref[0, t, :, :]
            ys_ref[0, t, :, :] = jnp.where(maskM[None, :], ysblk, old)

            vb = bcast_rows(V_rows)                            # [Gb, b]
            vstack = stack_col(V_rows)                         # [Gb, 1]
            tau_col = bcast_col(tau_G)

            # gather frames
            FD = jnp.concatenate(
                [BS[k * 4 * b + t * b:k * 4 * b + (t + 1) * b, :]
                 for k in range(G)], axis=0)                   # [Gb, L]
            FB = jnp.concatenate(
                [BS[k * 4 * b + (t + 1) * b:k * 4 * b + (t + 2) * b, :]
                 for k in range(G)], axis=0)

            # ---- D block ----
            Dl = jnp.where(ntopmask, FD[:, 2 * b:3 * b], FD[:, b:2 * b])
            Dl = jnp.where(rowmod >= coli, Dl, jnp.zeros((), dt))
            Dstrict = jnp.where(rowmod > coli, Dl, jnp.zeros((), dt))
            D = Dl + bt_transpose(Dstrict)
            w1 = tau_col * jnp.sum(D * vb, axis=1, keepdims=True)
            corr = seg_sum(w1 * vstack) * tau_G * 0.5          # [G, 1]
            w = w1 - bcast_col(corr) * vstack                  # [Gb, 1]
            W_rows = seg_rows(w)                               # [G, b]
            Dn = D - w * vb - vstack * bcast_rows(W_rows)
            Dn = jnp.where(act_col, Dn, D)
            emb_hi = jnp.concatenate([zpadb, zpadb, Dn], axis=1)
            emb_lo = jnp.concatenate([zpadb, Dn, zpadb], axis=1)
            FD2 = jnp.where(in_hi_D, emb_hi,
                            jnp.where(in_lo_D, emb_lo, FD))
            for k in range(G):
                BS[k * 4 * b + t * b:k * 4 * b + (t + 1) * b, :] = \
                    FD2[k * b:(k + 1) * b, :]

            # ---- B block ----
            B = jnp.where(ntopmask, FB[:, b:2 * b], FB[:, 0:b])
            y = jnp.sum(B * vb, axis=1, keepdims=True)         # [Gb, 1]
            Bn = B - tau_col * (y * vb)
            xcol = Bn[:, 0:1]
            X_rows = seg_rows(xcol)                            # [G, b]
            v2_rows, tau2_G, beta2_G = larfg_rows(X_rows)
            v2b = bcast_rows(v2_rows)
            v2stack = stack_col(v2_rows)
            tau2_col = bcast_col(tau2_G)
            z_rows = mxu(ind, v2stack * Bn, 1, 0)              # [G, b]
            Bn = Bn - tau2_col * v2stack * bcast_rows(z_rows)
            newc0 = jnp.where(rowm1 == 0, bcast_col(beta2_G),
                              jnp.zeros((), dt))
            Bn = jnp.where(coli == 0, jnp.broadcast_to(newc0, (Gb, b)),
                           Bn)
            Bn = jnp.where(act_col, Bn, B)
            emb_hiB = jnp.concatenate([zpadb, Bn, zpadb], axis=1)
            emb_loB = jnp.concatenate([Bn, zpadb, zpadb], axis=1)
            FB2 = jnp.where(in_hi_B, emb_hiB,
                            jnp.where(in_lo_B, emb_loB, FB))
            for k in range(G):
                BS[k * 4 * b + (t + 1) * b:
                   k * 4 * b + (t + 2) * b, :] = FB2[k * b:(k + 1) * b, :]

            # state update
            actGb = jnp.broadcast_to(act_G, (G, b))
            V_rows = jnp.where(actGb, v2_rows, V_rows)
            tau_G = jnp.where(act_G, tau2_G, tau_G)
            return V_rows, tau_G

        # phases with inter-slot patches (the wavefront read patch):
        # slot k's later phases read rows slot k-1 wrote in EARLIER
        # phases; blocks are rolled copies so the copy rolls by the
        # +1 inter-slot shift residue (wrap: 1+2b ~ 1-b when sh_k == 0)
        def patch(rows_src, rows_dst, nrows):
            for k in range(1, G):
                src = BS[(k - 1) * 4 * b + rows_src:
                         (k - 1) * 4 * b + rows_src + nrows, :]
                a = roll_l(src, 1)
                wrapk = lax.rem(sh0 + jnp.asarray(k, jnp.int32),
                                jnp.asarray(b, jnp.int32)) == 0
                a = jnp.where(wrapk, roll_l(src, 1 + 2 * b), a)
                BS[k * 4 * b + rows_dst:
                   k * 4 * b + rows_dst + nrows, :] = a

        if _LVL < 1:
            V_rows, tau_G = phase(0, V_rows, V_cols, tau_G)
            V_cols = mxu(eyeb, V_rows, 0, 1)                   # [b, G]
            patch(0, S, b + 1)
            V_rows, tau_G = phase(1, V_rows, V_cols, tau_G)
            V_cols = mxu(eyeb, V_rows, 0, 1)
            patch(b, 4 * b - 1, 1)
            V_rows, tau_G = phase(2, V_rows, V_cols, tau_G)
            V_cols = mxu(eyeb, V_rows, 0, 1)

        # store group v/tau back (one-hot scatter).  Scatter only the
        # slots ACTIVE this iteration: inactive (pad / tail) slots can
        # share a vi lane modulo W with a real slot — active slots'
        # lanes are always distinct, and inactive slots would write
        # back their unchanged gathered value anyway.
        act0 = ((s_G >= 0) & (3 * m_G < cnt_G)).astype(dt)     # [G, 1]
        sel_act = sel * tau_to_row(act0)                       # [Wp, G]
        lanemask = jnp.sum(sel_act, axis=1) > 0                # [Wp]
        vnew = mxu(V_cols, sel_act, 1, 1)                      # [b, Wp]
        v_out[...] = jnp.where(lanemask[None, :], vnew, v_out[...])
        tau_new8 = jnp.broadcast_to(tau_to_row(tau_G), (8, G))
        tnew = mxu(tau_new8, sel_act, 1, 1)                    # [8, Wp]
        tau_out[...] = jnp.where(lanemask[None, :], tnew, tau_out[...])

        # un-roll and scatter back ASCENDING k: block k's copy of the
        # shared rows [S, 4b) carries its later-phase writes and must
        # override block k-1's stale copy of the same gbuf rows
        if _LVL < 2:
            x = BS[...]
            parts = []
            for k in range(G):
                xk = roll_l(x[k * 4 * b:(k + 1) * 4 * b, :], (L - k) % L)
                e = sh0 + k
                xk = jnp.where((e >= b) & (e < 2 * b), roll_l(xk, b), xk)
                xk = jnp.where(e >= 2 * b, roll_l(xk, 2 * b), xk)
                parts.append(xk)
            x = jnp.concatenate(parts, axis=0)
            x = dyn_roll(x, sh0, left=False)
            BS[...] = x
        if _VMEM_T:
            # ASCENDING k: later blocks' shared-row copies override.
            # Aligned read-modify-write: splice the slab into the
            # surrounding [4b+8] window at the static +kk residue (the
            # pad rows re-store their just-read values; k's load follows
            # k-1's store in program order, so overlaps stay coherent)
            for k in range(G):
                st = jl + jnp.asarray((G - 1 - k) * S, jnp.int32)
                base = pl.multiple_of((st // 8) * 8, 8)
                dr = st - base
                @pl.when(dr == 0)
                def _(k=k, base=base):
                    gbuf[pl.ds(base, 4 * b), :] = \
                        BS[k * 4 * b:(k + 1) * 4 * b, :]
                for kk in range(1, 8):
                    @pl.when(dr == kk)
                    def _(kk=kk, k=k, base=base):
                        blk = gbuf[pl.ds(base, 4 * b + 8), :]
                        sl = BS[k * 4 * b:(k + 1) * 4 * b, :]
                        gbuf[pl.ds(base, 4 * b + 8), :] = \
                            jnp.concatenate(
                                [blk[:kk, :], sl, blk[kk + 4 * b:, :]],
                                axis=0)
        else:
            for kk in range(8):
                @pl.when(drg == kk)
                def _(kk=kk):
                    for k in range(G):
                        p0 = (G - 1 - k) * S + kk
                        gbuf[p0:p0 + 4 * b, :] = \
                            BS[k * 4 * b:(k + 1) * 4 * b, :]

            cp_out = pltpu.make_async_copy(
                gbuf, T_out.at[pl.ds(gb, GH), :], sem_out)
            cp_out.start()
            cp_out.wait()

    lax.fori_loop(0, NG,
                  lambda g, c: (group(jnp.asarray(g, jnp.int32)), c)[1],
                  jnp.int32(0))

    if _VMEM_T:
        # flush the VMEM-resident T once, on the segment's last iteration
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            cp = pltpu.make_async_copy(gbuf, T_out, sem_out)
            cp.start()
            cp.wait()


def _chase_call_v4(T, vbuf, taubuf, it0, n: int, b: int, niter: int,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = _wavefront_width(n, b)
    Wg = _group_width(n, b)
    Wp = vbuf.shape[1]
    dt = T.dtype
    nsweeps = max(n - 2, 0)
    GH = _gh(b)
    kern = partial(_chase_kernel_v4, n=n, b=b, W=W, Wg=Wg, Wp=Wp,
                   nsweeps=nsweeps)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, b, Wp), lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[
            # _VMEM_T: the WHOLE T strip lives in VMEM across the grid
            # (50 MB at n = 32768); else a per-group staging region
            pltpu.VMEM((T.shape[0] if _VMEM_T else GH, 3 * b), dt),
            pltpu.VMEM((_GROUP * 4 * b, 3 * b), dt),       # batched slab
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
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
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 << 20),
    )
    it0a = jnp.asarray([it0], jnp.int32)
    return fn(it0a, T, vbuf, taubuf)


def pallas_band_to_tridiagonal_v4(ab, band: int,
                                  interpret: bool | None = None
                                  ) -> HHChaseResult:
    """Batched-slot device chase; same contract as the v3/wavefront."""
    from .pallas_chase import _seg_transpose
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
    Wp = max(-(-W // 128) * 128, 128)
    T = build_t(ab, n, b)
    vbuf = jnp.zeros((b, Wp), dt)
    taubuf = jnp.zeros((8, Wp), dt)
    nsweeps = n - 2
    # segment on the REAL emission width Wp (lane-padded to 128), not
    # the wavefront's W: v4's ys block is [3, b, Wp] per iteration, so
    # sizing by W under-counts up to 6x and a 32k run would stack a
    # > 2^32-byte ys output — the exact r4 wavefront crash mode
    cap = int(_os.environ.get("DLAF_WAVEFRONT_SEG_BYTES", 1 << 30))
    per_iter = 3 * b * Wp * np.dtype(dt).itemsize
    niter = max(1, cap // per_iter)
    nseg = -(-nsweeps // niter) if nsweeps else 1
    niter = -(-nsweeps // nseg) if nsweeps else 1
    # compact each segment to its real reflector rows right away
    # (padding slots drop the retained stream 4.33 -> 2.15 GB at 32k;
    # same contract as the wavefront's compact segments)
    from .wavefront_chase import _compact_seg_jit
    rows = niter * 3 * W
    sel = np.sort(_raw_index_map(n, b).astype(np.int64))
    segs = []
    for it0 in range(0, nsweeps, niter):
        T, vbuf, taubuf, ys = _chase_call_v4(T, vbuf, taubuf, it0,
                                             n=n, b=b, niter=niter,
                                             interpret=interpret)
        k = it0 // niter
        lo = np.searchsorted(sel, k * rows)
        hi = np.searchsorted(sel, (k + 1) * rows)
        rel = jnp.asarray((sel[lo:hi] - k * rows).astype(np.int32))
        segs.append(_compact_seg_jit(
            _seg_transpose(ys, niter=niter, W=W, b=b), rel))
    d, e = t_diagonals(T, n=n, b=b)
    d = np.asarray(np.asarray(d), np.float64)
    e = np.asarray(np.asarray(e), np.float64)
    return HHChaseResult(d, e, None, n, b, None,
                         V_raw=segs, V_raw_map=_raw_index_map(n, b),
                         V_raw_sel=sel)
