"""Back-transform of eigenvectors through the band->tridiag stage (BT-B2T).

Equivalent of the reference's ``bt_band_to_tridiagonal``
(``eigensolver/bt_band_to_tridiag.h``, impl ``bt_band_to_tridiag/impl.h``:
grouped application of the bulge-chasing Householder reflectors to the
eigenvector matrix).  Here the chase emits Givens rotations
(``band_to_tridiag.py``); the back-transform computes ``E <- Q2 E`` with
``Q2 = G_1^H ... G_M^H D``:

* the *static* rotation schedule is packed into waves of row-disjoint
  rotations (``bt_wave_schedule``) — each wave applies as one gathered,
  fully-vectorized row-pair mix over all columns (VPU work, no MXU);
* ``lax.scan`` over waves keeps the XLA program small regardless of the
  O(n^2) rotation count;
* the data-dependent inputs are only the (c, s) value streams and the phase
  diagonal;
* for large problems the waves are *accumulated* onto the MXU: every run of
  ``g`` consecutive waves composes to an orthogonal operator with bandwidth
  <= g, materialized block-tridiagonally by applying the run to three
  striped identity matrices and then applied to E as batched [3g x g] x
  [g x ncols] gemms — the analogue of the reference's grouped reflector
  application (``bt_band_to_tridiag_hh_apply_group_size``).  ~4x the
  rotation flops, but at MXU instead of gather/VPU rates.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops import tile
from ...tune import get_tune_parameters
from .band_to_tridiag import BandToTridiagResult, bt_wave_schedule


@jax.jit
def _apply_waves(E, cw, sw, p_top, p_bot):
    """Scan the rotation waves over E's rows (Q2 = prod G^H applied).

    Each wave (row-disjoint rotations) IS a tridiagonal matrix; applying it
    as ``a*E + u*shift_up(E) + l*shift_down(E)`` replaces the row
    gather/scatter (latency-bound on TPU) with contiguous elementwise work.
    Only the small [R] -> [n] coefficient scatters remain.
    """
    NT = E.shape[0]
    dt = E.dtype

    def body(E, wave):
        c, s, top, bot = wave
        c = c.astype(dt)
        s = s.astype(dt)
        # G^H = [[c, -s], [conj(s), c]] on rows (top, bot = top + 1)
        a = jnp.ones((NT,), dt).at[top].set(c).at[bot].set(c)
        u = jnp.zeros((NT,), dt).at[top].set(-s)
        l = jnp.zeros((NT,), dt).at[bot].set(jnp.conjugate(s))
        zrow = jnp.zeros_like(E[:1])
        e_up = jnp.concatenate([E[1:], zrow], axis=0)    # E[r + 1]
        e_dn = jnp.concatenate([zrow, E[:-1]], axis=0)   # E[r - 1]
        E = a[:, None] * E + u[:, None] * e_up + l[:, None] * e_dn
        return E, None

    E, _ = lax.scan(body, E, (cw, sw, p_top, p_bot))
    return E


def _shift_rows(x, shift):
    """x'[..., i, :] = x[..., i - shift, :] with zero fill (static shift)."""
    if shift == 0:
        return x
    NT = x.shape[-2]
    zeros = jnp.zeros(x.shape[:-2] + (abs(shift), x.shape[-1]), x.dtype)
    if shift > 0:
        return jnp.concatenate([zeros, x[..., : NT - shift, :]], axis=-2)
    return jnp.concatenate([x[..., -shift:, :], zeros], axis=-2)


@partial(jax.jit, static_argnames=("s", "n"))
def _apply_waves_banded(E, cw, sw, p_top, p_bot, s: int, n: int):
    """Hierarchical accumulate-and-apply on the MXU.

    Each group of ``s`` (power of two) waves composes — in log2(s) *batched*
    banded-matrix products, not s sequential steps — into one orthogonal
    operator of bandwidth s, which is applied to E as batched block-
    tridiagonal gemms.  Sequential depth per group is O(log s) + 1 instead
    of s, which matters because scan-step overhead (~0.2 ms on this
    platform) dominates the direct wave-by-wave application.

    ``E``: [NT, ncols], NT = Np + 2 (Np = n rounded up to s, scratch pair at
    (Np, Np+1)); wave arrays [W, R], W a multiple of s, padded slots target
    the scratch pair.
    """
    NT = E.shape[0]
    Np = NT - 2
    nbk = Np // s
    W, R = cw.shape
    ng = W // s
    dtype = E.dtype

    # static block-extraction tables: B_J[r', c] = O[(J-1)s + r', Js + c]
    # with banded storage O_band[i, d] = O[i, i - s + d], d in [0, 2s]
    rp = np.arange(3 * s)[None, :, None]           # r'
    cc_ = np.arange(s)[None, None, :]              # c
    d_raw = cc_ - rp + 2 * s                       # band diagonal index
    valid = (d_raw >= 0) & (d_raw <= 2 * s)
    take = np.clip(d_raw, 0, 2 * s) + s            # cols of band_pad [4s+1]
    row_idx = (np.arange(nbk)[:, None] * s +
               np.arange(3 * s)[None, :])          # rows of band_pad
    d_tab = jnp.asarray(np.broadcast_to(take, (nbk, 3 * s, s)))
    v_tab = jnp.asarray(np.broadcast_to(valid, (nbk, 3 * s, s)))
    r_tab = jnp.asarray(row_idx)

    cg = cw.reshape(ng, s, R)
    sg = sw.reshape(ng, s, R)
    tg = p_top.reshape(ng, s, R)
    bg = p_bot.reshape(ng, s, R)

    def mk_tridiag(c, sv, top, bot):
        """Level-0 banded op [NT, 3]: cols (sub, diag, super)."""
        c = c.astype(dtype)
        sv = sv.astype(dtype)
        a = jnp.ones((NT,), dtype).at[top].set(c).at[bot].set(c)
        u = jnp.zeros((NT,), dtype).at[top].set(-sv)       # O[i, i+1]
        ll = jnp.zeros((NT,), dtype).at[bot].set(jnp.conjugate(sv))
        return jnp.stack([ll, a, u], axis=-1)

    def group_body(E, xs):
        cgi, sgi, tgi, bgi = xs
        ops = jax.vmap(mk_tridiag)(cgi, sgi, tgi, bgi)     # [s, NT, 3]
        h = 1
        while ops.shape[0] > 1:
            B = ops[0::2]          # applied first
            A = ops[1::2]          # applied second:  C = A @ B
            hC = 2 * h
            npair = A.shape[0]
            C = jnp.zeros((npair, NT, 2 * hC + 1), dtype)
            for dA in range(2 * h + 1):
                bsh = _shift_rows(B, h - dA)
                C = C.at[:, :, dA:dA + 2 * h + 1].add(
                    A[:, :, dA:dA + 1] * bsh)
            ops = C
            h = hC
        band = ops[0]                                      # [NT, 2s+1]
        # rows beyond Np (scratch) act as identity and are excluded below
        band_pad = jnp.concatenate(
            [jnp.zeros((s, 2 * s + 1), dtype), band[:Np],
             jnp.zeros((s, 2 * s + 1), dtype)], axis=0)
        band_pad = jnp.concatenate(
            [jnp.zeros((band_pad.shape[0], s), dtype), band_pad,
             jnp.zeros((band_pad.shape[0], s), dtype)], axis=1)
        win = jnp.take(band_pad, r_tab, axis=0)            # [nbk, 3s, 4s+1]
        Bblk = jnp.take_along_axis(win, d_tab, axis=2)
        Bblk = jnp.where(v_tab, Bblk, jnp.zeros((), dtype))
        Eb = E[:Np].reshape(nbk, s, -1)
        C = jnp.einsum("jab,jbc->jac", Bblk, Eb,
                       precision=tile._precision())        # [nbk, 3s, nc]
        c0, c1, c2 = C[:, :s], C[:, s:2 * s], C[:, 2 * s:]
        zero = jnp.zeros_like(c0[:1])
        up = jnp.concatenate([c0[1:], zero], axis=0)
        dn = jnp.concatenate([zero, c2[:-1]], axis=0)
        Enew = (up + c1 + dn).reshape(Np, -1)
        return jnp.concatenate([Enew, E[Np:]], axis=0), None

    E, _ = lax.scan(group_body, E, (cg, sg, tg, bg))
    return E


@partial(jax.jit, static_argnames=("scratch_p",))
def _expand_waves(cs, ss, idx, pad, p_waves, scratch_p: int):
    """Device-side wave expansion: gather the compact (c, s) value streams
    into padded [W, R] wave form (the [W, R] index tables are static per
    (n, band) and cached on device; only the O(M) streams cross the host
    link per call)."""
    cw = jnp.where(pad, jnp.ones((), cs.dtype), cs[idx])
    sw = jnp.where(pad, jnp.zeros((), ss.dtype), ss[idx])
    p = jnp.where(pad, jnp.int32(scratch_p), p_waves)
    return cw, sw, p


@lru_cache(maxsize=2)
def _device_wave_schedule(n: int, b: int, padW: int):
    """Static per-(n, band) wave tables, resident on device."""
    p_waves, idx_waves = bt_wave_schedule(n, b)
    pad = idx_waves < 0
    idx = np.where(pad, 0, idx_waves)
    if padW:
        R = idx.shape[1]
        idx = np.concatenate([idx, np.zeros((padW, R), idx.dtype)])
        pad = np.concatenate([pad, np.ones((padW, R), bool)])
        p_waves = np.concatenate(
            [p_waves, np.zeros((padW, R), p_waves.dtype)])
    return (jnp.asarray(idx), jnp.asarray(pad),
            jnp.asarray(p_waves.astype(np.int32)))


def bt_band_to_tridiagonal(res: BandToTridiagResult, E):
    """Apply the band->tridiag transform: returns ``Q2 @ (D @ E)``.

    ``E``: ``[n, ncols]`` (eigenvectors of the real tridiagonal).  Complex
    band input requires complex ``E`` storage (phases are unitary scalars).
    """
    n, b = res.n, res.band
    E = jnp.asarray(E)
    squeeze = E.ndim == 1
    if squeeze:
        E = E[:, None]
    if E.ndim != 2:
        raise ValueError(f"E must be 1-D or 2-D, got shape {E.shape}")
    if np.iscomplexobj(res.phases):
        E = E.astype(res.phases.dtype)
    E = jnp.asarray(res.phases)[:, None] * E

    M = len(res.cs)
    if M == 0 or n <= 2 or b <= 1:
        return E[:, 0] if squeeze else E

    rdt = np.zeros((), E.dtype).real.dtype
    sdt = E.dtype if np.iscomplexobj(res.ss) else rdt
    cs_dev = jnp.asarray(res.cs.astype(rdt))
    ss_dev = jnp.asarray(res.ss.astype(sdt))

    p0, _ = bt_wave_schedule(n, b)
    W = p0.shape[0]
    s = get_tune_parameters().bt_group_size
    # the pairwise compose loop in _apply_waves_banded needs a power of two;
    # round a user-set value (DLAF_BT_GROUP_SIZE) down rather than erroring
    # at trace time with an opaque shape mismatch
    s = max(1, 1 << (int(s).bit_length() - 1)) if s >= 1 else 1
    ncols = int(np.prod(E.shape[1:])) if E.ndim > 1 else 1
    banded = W >= 4 * s and n >= 3 * s and ncols >= s
    padW = (-W) % s if banded else 0
    scratch = (-(-n // s) * s if banded else n) + 1

    idx, pad, p_waves = _device_wave_schedule(n, b, padW)
    cw, sw, p = _expand_waves(cs_dev, ss_dev, idx, pad, p_waves,
                              scratch_p=scratch)

    if banded:
        Np = scratch - 1
        Ex = jnp.concatenate(
            [E, jnp.zeros((Np + 2 - n,) + E.shape[1:], E.dtype)], axis=0)
        Ex = _apply_waves_banded(Ex, cw, sw, p - 1, p, s=s, n=n)
        out = Ex[:n]
        return out[:, 0] if squeeze else out

    Ex = jnp.concatenate([E, jnp.zeros((2,) + E.shape[1:], E.dtype)], axis=0)
    Ex = _apply_waves(Ex, cw, sw, p - 1, p)
    out = Ex[:n]
    return out[:, 0] if squeeze else out
