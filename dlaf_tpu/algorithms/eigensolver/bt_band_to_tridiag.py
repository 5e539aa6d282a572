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
  diagonal.

A WY/blocked regrouping of the waves onto the MXU is the known follow-up for
large-n throughput (the reference tunes the same trade via
``bt_band_to_tridiag_hh_apply_group_size``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .band_to_tridiag import BandToTridiagResult, bt_wave_schedule


@jax.jit
def _apply_waves(E, cw, sw, p_top, p_bot):
    """Scan the rotation waves over E's rows (Q2 = prod G^H applied)."""

    def body(E, wave):
        c, s, top, bot = wave
        r1 = jnp.take(E, top, axis=0)
        r2 = jnp.take(E, bot, axis=0)
        # G = [[c, s], [-conj(s), c]]  =>  G^H = [[c, -s], [conj(s), c]]
        n1 = c[:, None] * r1 - s[:, None] * r2
        n2 = jnp.conjugate(s)[:, None] * r1 + c[:, None] * r2
        E = E.at[top].set(n1)
        E = E.at[bot].set(n2)
        return E, None

    E, _ = lax.scan(body, E, (cw, sw, p_top, p_bot))
    return E


def bt_band_to_tridiagonal(res: BandToTridiagResult, E):
    """Apply the band->tridiag transform: returns ``Q2 @ (D @ E)``.

    ``E``: ``[n, ncols]`` (eigenvectors of the real tridiagonal).  Complex
    band input requires complex ``E`` storage (phases are unitary scalars).
    """
    n, b = res.n, res.band
    E = jnp.asarray(E)
    if np.iscomplexobj(res.phases):
        E = E.astype(res.phases.dtype)
    E = jnp.asarray(res.phases)[:, None] * E

    M = len(res.cs)
    if M == 0 or n <= 2 or b <= 1:
        return E

    p_waves, idx_waves = bt_wave_schedule(n, b)
    pad = idx_waves < 0
    idx = np.where(pad, 0, idx_waves)
    cw = np.asarray(res.cs)[idx]
    sw = np.asarray(res.ss)[idx]
    cw = np.where(pad, 1.0, cw)           # padding = identity rotation
    sw = np.where(pad, 0.0 * sw, sw)
    # padded slots rotate two scratch rows appended below E (identity values,
    # all writes identical) so real rotations never share scatter targets
    p = np.where(pad, n + 1, p_waves)
    Ex = jnp.concatenate([E, jnp.zeros((2,) + E.shape[1:], E.dtype)], axis=0)
    Ex = _apply_waves(Ex, jnp.asarray(cw.astype(res.cs.dtype)),
                      jnp.asarray(sw), jnp.asarray(p - 1), jnp.asarray(p))
    return Ex[:n]
