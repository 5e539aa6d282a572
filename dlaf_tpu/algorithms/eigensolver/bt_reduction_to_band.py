"""Back-transform of eigenvectors through the reduction-to-band stage
(BT-R2B).

Equivalent of the reference's ``bt_reduction_to_band``
(``eigensolver/bt_reduction_to_band.h``, impl ``bt_reduction_to_band/
impl.h``): blocked application of ``Q1 = H_0 H_1 ...`` (compact-WY panels
from ``reduction_to_band``) to the eigenvector matrix — T-factor + two gemms
per panel, all MXU work.

Panels are bucketed to a few fixed shapes (same scheme as
``reduction_to_band``): each bucket compiles ONE ``fori_loop`` body with
dynamic slices instead of ``n/b`` distinct unrolled gemm shapes — at
n = 32768, b = 128 that is 4 compiled bodies instead of 255.  Padded rows
are exact zeros and contribute nothing to the WY update.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_exact, store_natural_exact
from .reduction_to_band import _cdiv, t_factor


def bt_reduction_to_band(band_size: int, mat_e, mat_hh: DistMatrix, taus,
                         e_sharding=None, donate: bool = False):
    """Returns ``Q1 @ E``.

    ``mat_e``: DistMatrix (or array) of eigenvectors [n, m]; ``mat_hh``: the
    ``reduction_to_band`` output holding V below the band; ``taus``:
    ``[n_panels, band_size]``.  ``e_sharding``: optional column
    ``NamedSharding`` distributing the gemms over E's columns.

    ``donate=True`` (array ``mat_e``, no sharding) routes to an in-place
    path that donates E, reads V panels with clamped-and-masked slices
    (no padded copies of E or mat_hh), and streams the WY update over
    column chunks — peak ~2 full buffers instead of ~4, the difference
    between fitting and OOM at n = 32768.  ``mat_e`` may carry extra
    zero rows below row n (e.g. the BT-B2T scan pad); they are preserved.
    """
    if isinstance(mat_hh, PackedPanels):
        from ...tune import get_tune_parameters
        E = jnp.asarray(mat_e)
        if E.dtype != mat_hh.data.dtype:
            E = E.astype(mat_hh.data.dtype)
        tp = get_tune_parameters()
        grp = max(int(tp.bt_r2b_group_size), 1)
        cc = max(int(tp.bt_r2b_chunk_cols), 128)
        return _bt_r2b_inplace_packed(E, mat_hh.data, taus,
                                      band_size=band_size, n=mat_hh.n,
                                      group=grp, chunk_cols=cc)
    if donate and not isinstance(mat_e, DistMatrix) and e_sharding is None:
        E = jnp.asarray(mat_e)
        nat_hh_dtype = mat_hh.dtype
        if E.dtype != nat_hh_dtype:
            E = E.astype(nat_hh_dtype)
        return _bt_r2b_inplace(E, mat_hh, taus, band_size=band_size)
    if not isinstance(mat_e, DistMatrix):
        mat_e = jnp.asarray(mat_e)
        n = mat_hh.size[0]
        if mat_e.shape[0] > n:          # strip BT-scan pad rows
            mat_e = mat_e[:n]
    return _bt_r2b_padded(band_size, mat_e, mat_hh, taus,
                          e_sharding=e_sharding)


class PackedPanels(NamedTuple):
    """Reflector panels packed to ~n^2/2 values (half of mat_hh).

    ``data``: [total_rows, b]; panel k of bucket (k_lo, k_hi, pmp, base)
    occupies rows [base + (k - k_lo) * pmp, ...), read with the same
    clamped-start convention as the in-place consumer (rows start at
    ``min((k+1) b, n - pmp)``).
    """
    data: jnp.ndarray
    n: int
    b: int


def _panel_buckets(n: int, b: int):
    """[(k_lo, k_hi, pmp, base)] covering panels k_hi-1 .. in apply order."""
    from .reduction_to_band import _bucket_granule
    G = _bucket_granule(n, b)
    n_panels = max(_cdiv(n, b) - 1, 0)
    out = []
    base = 0
    k_hi = n_panels
    while k_hi > 0:
        pm = n - k_hi * b
        pmp = min(max(_cdiv(pm, G) * G, b), n)
        k_lo = k_hi
        while k_lo > 0 and min(max(_cdiv(n - k_lo * b, G) * G, b), n) == pmp:
            k_lo -= 1
        out.append((k_lo, k_hi, pmp, base))
        base += (k_hi - k_lo) * pmp
        k_hi = k_lo
    return out, base


def pack_hh_panels(mat_hh: DistMatrix, band_size: int, *,
                   donate: bool = True) -> PackedPanels:
    """Pack mat_hh's V panels into a [~n^2/2b, b] buffer (donates mat_hh).

    Halves the reflector footprint the BT stages keep alive (4.0 GB ->
    2.15 GB at n = 32768 f32): the band and its upper mirror are dead
    weight once ``extract_band`` ran.
    """
    fn = _pack_jit_donated if donate else _pack_jit
    data = fn(mat_hh, band_size=band_size)
    return PackedPanels(data, mat_hh.size[0], band_size)


def _pack_impl(mat_hh: DistMatrix, band_size: int):
    b = band_size
    nat = natural_exact(mat_hh)
    n = nat.shape[0]
    buckets, total = _panel_buckets(n, b)
    P = jnp.zeros((max(total, 1), b), nat.dtype)

    for (k_lo, k_hi, pmp, base) in buckets:
        def body(i, P, k_lo=k_lo, pmp=pmp, base=base):
            k = k_lo + i
            c0 = (k + 1) * b
            cs = jnp.minimum(jnp.int32(c0), jnp.int32(n - pmp))
            pan = lax.dynamic_slice(nat, (cs, jnp.int32(k * b)), (pmp, b))
            return lax.dynamic_update_slice(P, pan, (base + i * pmp, 0))

        P = lax.fori_loop(0, k_hi - k_lo, body, P)
    return P


_pack_jit = partial(jax.jit, static_argnames=("band_size",))(_pack_impl)
_pack_jit_donated = partial(jax.jit, static_argnames=("band_size",),
                            donate_argnums=(0,))(_pack_impl)


@partial(jax.jit, static_argnames=("band_size", "n", "group",
                                   "chunk_cols"),
         donate_argnums=(0,))
def _bt_r2b_inplace_packed(E, P, taus, band_size: int, n: int,
                           group: int = 4, chunk_cols: int = 2048):
    """In-place WY back-transform reading packed reflector panels."""
    b = band_size
    n_panels = max(_cdiv(n, b) - 1, 0)
    nc = E.shape[1]
    dtype = E.dtype
    if n_panels == 0:
        return E

    buckets, _ = _panel_buckets(n, b)
    Cc = min(chunk_cols, nc)
    nfull, tail = nc // Cc, nc % Cc

    for (k_lo, k_hi, pmp, base) in buckets:
        def vframe(k, cs2, H, pmp=pmp, base=base, k_lo=k_lo):
            """Packed panel ``k``'s reflector block embedded in the
            ``[H, b]`` frame whose row 0 is matrix row ``cs2``."""
            c0 = (k + 1) * b
            cs_k = jnp.minimum(jnp.int32(c0), jnp.int32(n - pmp))
            pan = lax.dynamic_slice(P, (base + (k - k_lo) * pmp, 0),
                                    (pmp, b))
            buf = jnp.zeros((H, b), dtype)
            buf = lax.dynamic_update_slice(buf, pan,
                                           (cs_k - cs2, jnp.int32(0)))
            rows = lax.broadcasted_iota(jnp.int32, (H, b), 0)
            cols = lax.broadcasted_iota(jnp.int32, (H, b), 1)
            tk = jnp.take(taus, k, axis=0)
            shift = jnp.int32(c0) - cs2
            V = jnp.where(rows > cols + shift, buf, jnp.zeros_like(buf))
            V = V + jnp.where((rows == cols + shift) & (tk[None, :] != 0),
                              jnp.ones_like(V), jnp.zeros_like(V))
            return V, tk

        def apply_wy(E, W, T, cs2, H):
            Wh = tile.adj(W)

            def col_chunk(j, E, cw):
                cc0 = j * Cc if cw == Cc else nfull * Cc
                Es = lax.dynamic_slice(E, (cs2, jnp.int32(cc0)), (H, cw))
                X = tile.dot(Wh, Es)
                Es = Es - tile.dot(W, tile.dot(T, X))
                return lax.dynamic_update_slice(E, Es,
                                                (cs2, jnp.int32(cc0)))

            E = lax.fori_loop(0, nfull, partial(col_chunk, cw=Cc), E)
            if tail:
                E = col_chunk(0, E, tail)
            return E

        def body(i, E, k_hi=k_hi, pmp=pmp):
            k = k_hi - 1 - i
            c0 = (k + 1) * b
            cs = jnp.minimum(jnp.int32(c0), jnp.int32(n - pmp))
            V, tk = vframe(k, cs, pmp)
            return apply_wy(E, V, t_factor(V, tk), cs, pmp)

        def group_body(i, E, g, k_top, pmp=pmp):
            # aggregate g consecutive panels into one g*b-wide compact-WY
            # block: Q_{kl} ... Q_{kl+g-1} = I - W T W^H with
            # W = [V_{kl} | ... | V_{kl+g-1}] (t_factor's identity holds
            # for any ordered reflector sequence) — the outer update
            # gemm runs at contraction depth g*b instead of b (~3x the
            # MXU rate already at 2b) and the panel loop shrinks g-fold.
            kl = k_top - g * i - (g - 1)   # lowest k; applied last
            H = pmp + (g - 1) * b
            cs2 = jnp.minimum(jnp.int32((kl + 1) * b), jnp.int32(n - H))
            Vs, ts = zip(*[vframe(kl + j, cs2, H) for j in range(g)])
            W = jnp.concatenate(Vs, axis=1)
            T = t_factor(W, jnp.concatenate(ts))
            return apply_wy(E, W, T, cs2, H)

        cnt = k_hi - k_lo
        g = group
        while g > 1 and (pmp + (g - 1) * b > n or cnt < g):
            g -= 1
        if g > 1:
            E = lax.fori_loop(0, cnt // g,
                              partial(group_body, g=g, k_top=k_hi - 1), E)
            rem = cnt % g
            if rem > 1 and pmp + (rem - 1) * b <= n:
                E = group_body(0, E, g=rem, k_top=k_lo + rem - 1)
            elif rem:                      # singles, applied last
                for i in range(cnt - rem, cnt):
                    E = body(i, E)
        else:
            E = lax.fori_loop(0, cnt, body, E)
    return E


@partial(jax.jit, static_argnames=("band_size",), donate_argnums=(0,))
def _bt_r2b_inplace(E, mat_hh: DistMatrix, taus, band_size: int):
    """In-place blocked WY back-transform (single-chip memory path)."""
    b = band_size
    nat_hh = natural_exact(mat_hh)
    n = nat_hh.shape[0]
    n_panels = max(_cdiv(n, b) - 1, 0)
    nc = E.shape[1]
    dtype = E.dtype
    if n_panels == 0:
        return E

    from .reduction_to_band import _bucket_granule
    G = _bucket_granule(n, b)
    Cc = min(2048, nc)
    nfull, tail = nc // Cc, nc % Cc

    def body(i, E, k_hi, pmp):
        k = k_hi - 1 - i
        j0 = k * b
        c0 = j0 + b
        # clamped read start: the slice stays in bounds, the rows that
        # slid in above c0 are masked out of V so they contribute nothing
        cs = jnp.minimum(jnp.int32(c0), jnp.int32(n - pmp))
        shift = jnp.int32(c0) - cs
        pan = lax.dynamic_slice(nat_hh, (cs, jnp.int32(j0)), (pmp, b))
        rows = lax.broadcasted_iota(jnp.int32, (pmp, b), 0)
        cols = lax.broadcasted_iota(jnp.int32, (pmp, b), 1)
        tk = jnp.take(taus, k, axis=0)
        V = jnp.where(rows > cols + shift, pan, jnp.zeros_like(pan))
        unit = jnp.where((rows == cols + shift) & (tk[None, :] != 0),
                         jnp.ones_like(V), jnp.zeros_like(V))
        V = V + unit
        T = t_factor(V, tk)
        Vh = tile.adj(V)

        def col_chunk(j, E, cw):
            cc0 = j * Cc if cw == Cc else nfull * Cc
            Es = lax.dynamic_slice(E, (cs, jnp.int32(cc0)), (pmp, cw))
            W = tile.dot(Vh, Es)
            Es = Es - tile.dot(V, tile.dot(T, W))
            return lax.dynamic_update_slice(E, Es, (cs, jnp.int32(cc0)))

        E = lax.fori_loop(0, nfull, partial(col_chunk, cw=Cc), E)
        if tail:
            E = col_chunk(0, E, tail)
        return E

    k_hi = n_panels
    while k_hi > 0:
        pm = n - k_hi * b
        pmp = min(max(_cdiv(pm, G) * G, b), n)
        k_lo = k_hi
        while k_lo > 0 and min(max(_cdiv(n - k_lo * b, G) * G, b), n) == pmp:
            k_lo -= 1
        E = lax.fori_loop(0, k_hi - k_lo,
                          partial(body, k_hi=k_hi, pmp=pmp), E)
        k_hi = k_lo
    return E


@partial(jax.jit, static_argnames=("band_size", "e_sharding"))
def _bt_r2b_padded(band_size: int, mat_e, mat_hh: DistMatrix, taus,
                   e_sharding=None):
    """Padded-workspace path (distributed / sharded runs)."""
    b = band_size
    is_dist = isinstance(mat_e, DistMatrix)
    E = natural_exact(mat_e) if is_dist else jnp.asarray(mat_e)
    nat_hh = natural_exact(mat_hh)
    n = nat_hh.shape[0]
    n_panels = max(_cdiv(n, b) - 1, 0)
    if E.dtype != nat_hh.dtype:
        E = E.astype(nat_hh.dtype)
    if n_panels == 0:
        return store_natural_exact(mat_e, E) if is_dist else E

    # bucket panel heights (compile-time: few fixed shapes)
    G = max(b, 1024) if n >= 2048 else max(b, _cdiv(max(n // 8, 1), b) * b)
    nc = E.shape[1]
    dtype = E.dtype

    NATP = jnp.zeros((n + G, n), dtype)
    NATP = lax.dynamic_update_slice(NATP, nat_hh, (0, 0))
    if is_dist and mat_e.grid is not None:
        NATP = lax.with_sharding_constraint(NATP, mat_e.grid.sharding())
    EP = jnp.zeros((n + G, nc), dtype)
    EP = lax.dynamic_update_slice(EP, E, (0, 0))
    if e_sharding is not None:
        EP = lax.with_sharding_constraint(EP, e_sharding)

    def body(i, EP, k_hi, pmp):
        k = k_hi - 1 - i
        j0 = k * b
        c0 = j0 + b
        pan = lax.dynamic_slice(NATP, (c0, j0), (pmp, b))
        rows = lax.broadcasted_iota(jnp.int32, (pmp, b), 0)
        cols = lax.broadcasted_iota(jnp.int32, (pmp, b), 1)
        tk = jnp.take(taus, k, axis=0)
        V = jnp.where(rows > cols, pan, jnp.zeros_like(pan))
        unit = jnp.where((rows == cols) & (tk[None, :] != 0),
                         jnp.ones_like(V), jnp.zeros_like(V))
        V = V + unit
        # columns with tau == 0 are all-zero by construction (see
        # reduction_to_band._larfg); t_factor relies on that
        T = t_factor(V, tk)
        Es = lax.dynamic_slice(EP, (c0, 0), (pmp, nc))
        W = tile.dot(tile.adj(V), Es)
        Es = Es - tile.dot(V, tile.dot(T, W))
        return lax.dynamic_update_slice(EP, Es, (c0, 0))

    # apply panels k = n_panels-1 .. 0, grouped into equal-padded buckets
    k_hi = n_panels
    while k_hi > 0:
        pm = n - k_hi * b                    # height of panel k_hi - 1
        pmp = max(_cdiv(pm, G) * G, b)
        k_lo = k_hi
        while k_lo > 0 and max(_cdiv(n - k_lo * b, G) * G, b) == pmp:
            k_lo -= 1
        EP = lax.fori_loop(0, k_hi - k_lo,
                           partial(body, k_hi=k_hi, pmp=pmp), EP)
        k_hi = k_lo

    E = EP[:n]
    if is_dist:
        return store_natural_exact(mat_e, E)
    return E
