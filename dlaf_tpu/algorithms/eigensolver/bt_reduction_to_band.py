"""Back-transform of eigenvectors through the reduction-to-band stage
(BT-R2B).

Equivalent of the reference's ``bt_reduction_to_band``
(``eigensolver/bt_reduction_to_band.h``, impl ``bt_reduction_to_band/
impl.h``): blocked application of ``Q1 = H_0 H_1 ...`` (compact-WY panels
from ``reduction_to_band``) to the eigenvector matrix — T-factor + two gemms
per panel, all MXU work scheduled by the XLA partitioner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_exact, store_natural_exact
from .reduction_to_band import _cdiv, t_factor


def _panel_v(nat_hh, n, b, k):
    """Reconstruct V of panel k from the reduction output (unit diagonal
    where tau != 0 is restored by the caller via the tau mask)."""
    j0, c0 = k * b, (k + 1) * b
    pm = n - c0
    pan = nat_hh[c0:, j0:j0 + b]
    rows = lax.broadcasted_iota(jnp.int32, (pm, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (pm, b), 1)
    return jnp.where(rows > cols, pan, jnp.zeros_like(pan)), rows, cols


@partial(jax.jit, static_argnames=("band_size",))
def bt_reduction_to_band(band_size: int, mat_e, mat_hh: DistMatrix, taus):
    """Returns ``Q1 @ E``.

    ``mat_e``: DistMatrix (or array) of eigenvectors [n, m]; ``mat_hh``: the
    ``reduction_to_band`` output holding V below the band; ``taus``:
    ``[n_panels, band_size]``.
    """
    b = band_size
    is_dist = isinstance(mat_e, DistMatrix)
    E = natural_exact(mat_e) if is_dist else jnp.asarray(mat_e)
    nat_hh = natural_exact(mat_hh)
    n = nat_hh.shape[0]
    n_panels = max(_cdiv(n, b) - 1, 0)
    if E.dtype != nat_hh.dtype:
        E = E.astype(nat_hh.dtype)

    for k in range(n_panels - 1, -1, -1):
        c0 = (k + 1) * b
        V, rows, cols = _panel_v(nat_hh, n, b, k)
        tk = taus[k]
        unit = jnp.where((rows == cols) & (tk[None, :] != 0),
                         jnp.ones_like(V), jnp.zeros_like(V))
        V = V + unit
        # columns with tau == 0 are all-zero by construction (see
        # reduction_to_band._larfg); t_factor relies on that
        T = t_factor(V, tk)
        W = tile.dot(tile.adj(V), E[c0:])        # V^H E
        upd = -tile.dot(V, tile.dot(T, W))
        # pad+add instead of scatter-add (GSPMD-safe, see
        # reduction_to_band.set_block)
        E = E + jnp.pad(upd, ((c0, 0), (0, 0)))

    if is_dist:
        return store_natural_exact(mat_e, E)
    return E
