"""Reduction of a Hermitian matrix to band form (stage 1 of the eigensolver).

Equivalent of the reference's ``reduction_to_band``
(``eigensolver/reduction_to_band/impl.h:993`` local, ``:1150+`` distributed;
api ``reduction_to_band/api.h:22-25``): blocked Householder panel
factorization + compact-WY two-sided trailing update.  TPU-native mapping:

* the reference's multi-threaded panel task with blocking in-task allreduces
  (``impl.h:604-700``) becomes a ``lax.fori_loop`` over the panel's columns —
  per-column norms/dots become XLA reductions (ICI collectives when sharded);
* the T factor is computed without the reference's multi-threaded larft
  (``factorization/qr/t_factor_impl.h``): with V the unit-lower reflector
  block and taus the scalars, ``T^{-1} = diag(1/tau) + triu(V^H V, 1)``, one
  MXU gemm + one small triangular solve;
* the trailing her2k (``impl.h:820+``) and the W/X hemm chain
  (``impl.h:701-830``) run as full-matrix gemms over the natural-order
  Hermitian matrix, scheduled by the XLA partitioner (we keep both triangles
  — trading 2x rectangle MXU flops for no owner bookkeeping).

Output contract mirrors the reference: the returned matrix holds the band
(diagonal blocks + upper-triangular subdiagonal R blocks) with the reflectors
V stored strictly below the band, plus the tau scalars.  Lower (uplo=L) only,
like the reference's implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ..internal import natural_exact, store_natural_exact


def _is_complex(dtype):
    return jnp.issubdtype(dtype, jnp.complexfloating)


def _cdiv(a, b):
    return -(-a // b)


def set_block(nat, val, r0: int, c0: int):
    """Write ``val`` into ``nat[r0:r0+h, c0:c0+w]`` without a scatter.

    ``.at[slice].set`` lowers to scatter, which mis-compiles under GSPMD on
    unevenly-sharded axes (observed on 1x8 CPU meshes); pad + select lowers
    to elementwise ops the partitioner handles correctly.
    """
    n0, n1 = nat.shape
    h, w = val.shape
    emb = jnp.pad(val, ((r0, n0 - r0 - h), (c0, n1 - c0 - w)))
    rows = lax.broadcasted_iota(jnp.int32, (n0, n1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n0, n1), 1)
    mask = (rows >= r0) & (rows < r0 + h) & (cols >= c0) & (cols < c0 + w)
    return jnp.where(mask, emb, nat)


def _larfg(col, j, pm, dtype):
    """Householder generator for panel column ``col`` with pivot row ``j``.

    Returns (v, tau, beta): v unit at the pivot, zero above, scaled below;
    tau the scalar; beta the (real in exact arithmetic) new pivot value.
    Mirrors LAPACK ``larfg`` semantics (reference tiles call it through
    lapackpp in ``eigensolver/reduction_to_band/impl.h`` panel kernels).
    """
    rows = lax.broadcasted_iota(jnp.int32, (pm, 1), 0)[:, 0]
    below = rows > j
    pivot = rows == j
    rdtype = jnp.zeros((), dtype).real.dtype

    alpha = jnp.sum(jnp.where(pivot, col, jnp.zeros_like(col)))
    sigma = jnp.sum(jnp.where(below, jnp.abs(col) ** 2,
                              jnp.zeros((pm,), rdtype)))
    alpha_re = alpha.real.astype(rdtype)
    anorm = jnp.sqrt(jnp.abs(alpha) ** 2 + sigma)
    beta_r = jnp.where(alpha_re > 0, -anorm, anorm)  # -sign(re(alpha))*norm
    beta = beta_r.astype(dtype)

    if _is_complex(dtype):
        zero_case = (sigma == 0) & (alpha.imag == 0)
    else:
        zero_case = sigma == 0
    safe_den = jnp.where(zero_case, jnp.ones((), dtype), alpha - beta)
    safe_beta = jnp.where(beta == 0, jnp.ones((), dtype), beta)
    tau = jnp.where(zero_case, jnp.zeros((), dtype),
                    (beta - alpha) / safe_beta)
    v = jnp.where(below, col / safe_den,
                  jnp.where(pivot, jnp.ones((pm,), dtype),
                            jnp.zeros((pm,), dtype)))
    v = jnp.where(zero_case, jnp.zeros((pm,), dtype), v)  # tau=0 => v=0
    beta_out = jnp.where(zero_case, alpha, beta)
    return v, tau, beta_out


try:  # XLA's blocked Householder QR (one fused call per panel); the
    # public lax.linalg only exposes (q, r), the raw LAPACK-convention
    # (v/tau) form lives in the internal module
    from jax._src.lax.linalg import geqrf as _geqrf
except ImportError:  # pragma: no cover - jax version drift
    _geqrf = None


def _panel_qr_geqrf(panel):
    """Panel QR via the geqrf primitive (same (R, V, taus) contract as
    :func:`_panel_qr_loop`; ~70x faster per panel on TPU)."""
    pm, w = panel.shape
    dtype = panel.dtype
    k = min(pm, w)
    out, taus_k = _geqrf(panel)
    taus = jnp.zeros((w,), dtype)
    taus = lax.dynamic_update_slice(taus, taus_k.astype(dtype), (0,))
    rows = lax.broadcasted_iota(jnp.int32, (pm, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (pm, w), 1)
    R = jnp.where(rows <= cols, out, jnp.zeros_like(out))
    V = jnp.where((rows > cols) & (cols < k), out, jnp.zeros_like(out))
    V = V + jnp.where((rows == cols) & (cols < k),
                      jnp.ones_like(out), jnp.zeros_like(out))
    # convention: tau == 0 -> whole column zero (t_factor relies on it)
    V = jnp.where(taus[None, :] == 0, jnp.zeros_like(V), V)
    return R, V, taus


def _panel_qr(panel):
    """Householder QR of one panel: returns (R-ized panel, V, taus).

    V's column j is zeroed entirely when tau_j == 0 (identity reflector);
    the T-factor identity below relies on this convention.
    """
    complex_on_tpu = _is_complex(panel.dtype) and \
        jax.default_backend() not in ("cpu",)
    if _geqrf is not None and not complex_on_tpu:
        return _panel_qr_geqrf(panel)
    return _panel_qr_loop(panel)


def _panel_qr_loop(panel):
    """Column-by-column larfg fallback (reference semantics, any backend)."""
    pm, w = panel.shape
    dtype = panel.dtype
    rows = lax.broadcasted_iota(jnp.int32, (pm, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (pm, w), 1)

    def body(j, carry):
        panel, V, taus = carry
        col = lax.dynamic_slice(panel, (0, j), (pm, 1))[:, 0]
        v, tau, beta = _larfg(col, j, pm, dtype)
        # apply H^H = I - conj(tau) v v^H to columns > j (R = Q^H panel;
        # LAPACK convention: H^H x = beta e1, Q = H_0 H_1 ...)
        wrow = jnp.conjugate(v) @ panel  # [w]
        upd = jnp.conjugate(tau) * v[:, None] * wrow[None, :]
        panel = panel - jnp.where(cols > j, upd, jnp.zeros_like(upd))
        # column j becomes [r_0..r_{j-1}, beta, 0, ...]
        rr = lax.broadcasted_iota(jnp.int32, (pm, 1), 0)[:, 0]
        newcol = jnp.where(rr == j, beta,
                           jnp.where(rr > j, jnp.zeros((), dtype), col))
        panel = lax.dynamic_update_slice(panel, newcol[:, None], (0, j))
        V = lax.dynamic_update_slice(V, v[:, None], (0, j))
        taus = lax.dynamic_update_slice(taus, tau[None], (j,))
        return panel, V, taus

    V0 = jnp.zeros((pm, w), dtype)
    taus0 = jnp.zeros((w,), dtype)
    return lax.fori_loop(0, w, body, (panel, V0, taus0))


def t_factor(V, taus):
    """Compact-WY T: ``T^{-1} = diag(1/tau) + triu(V^H V, 1)``.

    Requires V columns with tau=0 to be all-zero (then 1/tau := 1 keeps the
    system invertible and the reflector contributes identity).
    """
    w = V.shape[1]
    dtype = V.dtype
    tau_safe = jnp.where(taus == 0, jnp.ones_like(taus), taus)
    vhv = tile.dot(tile.adj(V), V)
    tinv = jnp.triu(vhv, 1) + jnp.diag(1.0 / tau_safe)
    eye = jnp.eye(w, dtype=dtype)
    return lax.linalg.triangular_solve(tinv, eye, left_side=True, lower=False)


def _reduction_to_band(a: DistMatrix,
                       band_size: int | None = None
                       ) -> Tuple[DistMatrix, jnp.ndarray]:
    """Reduce a Hermitian matrix (lower stored) to band form.

    Returns ``(mat_out, taus)``: ``mat_out``'s band holds the banded matrix
    (and its Hermitian mirror above), the reflectors V sit strictly below the
    band; ``taus`` has shape ``[nr_panels, band_size]``.  Any
    ``band_size >= 1`` is supported (the reference picks
    ``block/divisor >= eigensolver_min_band`` via ``internal/get_band_size.h``
    and requires it to divide the block; panels here are band-width
    regardless of the storage block).
    """
    n = a.size[0]
    nb = a.block_size[0]
    if a.size[0] != a.size[1] or a.block_size[0] != a.block_size[1]:
        raise ValueError("reduction_to_band requires square matrix/blocks")
    if band_size is None:
        band_size = nb
    b = int(band_size)
    if b < 1:
        raise ValueError("band_size must be >= 1")

    nt = _cdiv(n, b)
    n_panels = max(nt - 1, 0)
    dtype = a.dtype
    nat = tile.hermitian_full(natural_exact(a), "L")
    taus_all = jnp.zeros((max(n_panels, 1), b), dtype)
    if n_panels == 0:
        return store_natural_exact(a, nat), taus_all

    G = _bucket_granule(n, b)
    NAT = jnp.zeros((n + G, n + G), dtype)
    NAT = lax.dynamic_update_slice(NAT, nat, (0, 0))

    def constrain(x):
        # distributed runs: keep the workspace 2D-sharded; the SPMD
        # partitioner gathers the panel (the reference's panel broadcast)
        # and shards the trailing two-sided update
        if a.grid is None:
            return x
        return lax.with_sharding_constraint(x, a.grid.sharding())

    NAT, taus_all = _panel_loop(constrain(NAT), taus_all, n, b, G, constrain)
    return store_natural_exact(a, NAT[:n, :n]), taus_all


def _bucket_granule(n: int, b: int) -> int:
    """Panel-height bucket granule G.

    Panel sizes are bucketed (padded up to a multiple of G) so each bucket
    compiles ONE fori_loop body with dynamic slices — the unbucketed
    unrolled loop compiles nt distinct gemm shapes (minutes of XLA time at
    nt ~ 16+).  Padded rows/cols hold exact zeros and stay zero through
    the two-sided updates, so no masking is needed.
    Granularity: multiples of 1024 for large n — XLA's QR/gemm lowerings
    compile orders of magnitude slower at odd sizes (measured: geqrf at
    1792 rows ~ 90s, at 1920/2048/4096 ~ 1s).

    G >= 2b keeps >= 2 panels per bucket: trip-count-1 fori_loops get
    fully unrolled by XLA, and in the unrolled region layout assignment
    happily flips the whole [n+G]^2 workspace to the QR custom call's
    preferred column-major (the mirror-read transpose becomes a free
    bitcast there) — full-matrix flip copies on every tail panel
    (AOT-measured r5 at b=1024: 196 column-major refs, 4.8 GiB temps;
    b=512 with 2-panel buckets: 0 refs, 0.8 GiB).
    """
    if n >= 2048:
        return max(2 * b, 1024)
    return max(b, _cdiv(max(n // 8, 1), b) * b)


def _panel_loop(NAT, taus_all, n, b, G, constrain):
    """Blocked-Householder panel sweep over the padded full workspace."""
    dtype = NAT.dtype
    n_panels = max(_cdiv(n, b) - 1, 0)

    # the panel QR runs at power-of-two heights (zero pad rows produce
    # zero reflector rows, so results are identical): geqrf is the
    # expensive-to-compile op and powers of two are its fast-compile
    # shapes, so this costs ~log2(n/b) compiles instead of one while
    # halving the average QR work vs a single full-height shape
    PH_max = max(_cdiv(n - b, G) * G, b)

    def _ph_for(pmp):
        ph = b
        while ph < pmp:
            ph *= 2
        return min(ph, max(PH_max, b))

    # Above this trailing-block byte size the two-sided update streams over
    # [pmp, G] column chunks instead of materializing the full [pmp, pmp]
    # trailing block twice per panel (slice out + updated copy) — at
    # n = 32768 f32 that is the difference between a 13 GB and a ~9 GB
    # reduction peak (measured via Compiled.memory_analysis).
    from ...tune import get_tune_parameters
    chunk_bytes = get_tune_parameters().r2b_chunk_bytes

    def body(k, carry, pmp, PH):
        NAT, taus_all = carry
        j0 = k * b
        c0 = j0 + b
        # read the panel from the Hermitian MIRROR (adj of the [b, pmp]
        # row block): geqrf's custom call prefers COLUMN-major operands,
        # and slicing the panel directly propagates that preference all
        # the way to the while carry — XLA then keeps the whole [n+G]^2
        # workspace in {0,1} and inserts full-matrix layout-flip copies
        # at every bucket boundary (measured r5: 110 column-major refs,
        # 2x temp at n=8192, 4.25 GiB copies at 32k).  The transpose
        # INVERTS the layout pull: the small [pmp, b] panel may get
        # whatever layout QR wants while the workspace stays row-major.
        panel = tile.adj(lax.dynamic_slice(NAT, (j0, c0), (b, pmp)))
        pfix = jnp.zeros((PH, b), dtype)
        pfix = lax.dynamic_update_slice(pfix, panel, (0, 0))
        Rf, Vf, taus = _panel_qr(pfix)
        R = lax.dynamic_slice(Rf, (0, 0), (pmp, b))
        V = lax.dynamic_slice(Vf, (0, 0), (pmp, b))
        T = t_factor(V, taus)
        taus_all = lax.dynamic_update_slice(taus_all, taus[None], (k, 0))

        # panel output blocks: R in the band, V strictly below; R^H above
        rows = lax.broadcasted_iota(jnp.int32, (pmp, b), 0)
        cols = lax.broadcasted_iota(jnp.int32, (pmp, b), 1)
        pout = jnp.where(rows <= cols, R, V)
        rband = jnp.where(rows <= cols, R, jnp.zeros_like(R))[:b]

        # two-sided trailing update: A <- A - X V^H - V X^H
        VT = tile.dot(V, T)
        trail_bytes = pmp * pmp * jnp.zeros((), dtype).itemsize
        if chunk_bytes and trail_bytes > chunk_bytes and pmp % G == 0:
            # Streamed over column chunks so the full [pmp, pmp] trailing
            # block is never materialized.  Chunks are 4G wide (bigger
            # gemms, ~3x the chunked-path rate) with a G-wide tail loop
            # covering pmp % 4G.  Statement order is load-bearing for
            # XLA's in-place while-carry aliasing (else copy insertion
            # double-buffers the whole workspace): ALL reads of NAT
            # (yacc) come before ANY write, and the one-shot DUS writes
            # (pout/rband) come before the write loop (upd).
            CW = 4 * G
            nc4 = pmp // CW
            ncg = (pmp - nc4 * CW) // G

            def yacc(j, Yc, cw, base):              # Y = A V T, streamed
                # barrier: ties each chunk read to the previous partial
                # sum, else the scheduler materializes many [pmp, cw]
                # slices concurrently (measured: halves the sweep temps)
                Yc, j2 = lax.optimization_barrier((Yc, j))
                sl = lax.dynamic_slice(NAT, (c0, c0 + base + j2 * cw),
                                       (pmp, cw))
                vt = lax.dynamic_slice(VT, (base + j2 * cw, 0), (cw, b))
                return Yc + tile.dot(sl, vt)

            Y = jnp.zeros((pmp, b), dtype)
            if nc4:       # zero-trip loops still trace their (oversized)
                Y = lax.fori_loop(0, nc4, partial(yacc, cw=CW, base=0), Y)
            if ncg:       # slice shapes, so gate at the python level
                Y = lax.fori_loop(0, ncg,
                                  partial(yacc, cw=G, base=nc4 * CW), Y)
            S = tile.dot(tile.adj(VT), Y)            # T^H V^H A V T
            X = Y - 0.5 * tile.dot(V, S)
            # one k=2b gemm per chunk instead of two k=b gemms:
            # X v^H + V x^H = [X|V] [v^H; x^H] — the deeper contraction
            # runs ~3x faster on the MXU (measured 21 -> 67 TF at
            # [32768, 2048] chunks)
            XV = jnp.concatenate([X, V], axis=1)     # [pmp, 2b]
            VXh = jnp.concatenate([tile.adj(V), tile.adj(X)], axis=0)

            NAT = lax.dynamic_update_slice(NAT, pout, (c0, j0))
            NAT = lax.dynamic_update_slice(NAT, tile.adj(rband), (j0, c0))

            def upd(j, NATc, cw, base):             # rank-2b, one col chunk
                h = lax.dynamic_slice(VXh, (0, base + j * cw),
                                      (2 * b, cw))
                cur = lax.dynamic_slice(NATc, (c0, c0 + base + j * cw),
                                        (pmp, cw))
                new = cur - tile.dot(XV, h)
                return lax.dynamic_update_slice(NATc, new,
                                                (c0, c0 + base + j * cw))

            if nc4:
                NAT = lax.fori_loop(0, nc4, partial(upd, cw=CW, base=0),
                                    NAT)
            if ncg:
                NAT = lax.fori_loop(0, ncg,
                                    partial(upd, cw=G, base=nc4 * CW), NAT)
        else:
            trail = lax.dynamic_slice(NAT, (c0, c0), (pmp, pmp))
            Y = tile.dot(trail, VT)                  # A V T
            S = tile.dot(tile.adj(VT), Y)            # T^H V^H A V T
            X = Y - 0.5 * tile.dot(V, S)
            trail = trail - tile.dot(               # fused k=2b rank-2b
                jnp.concatenate([X, V], axis=1),
                jnp.concatenate([tile.adj(V), tile.adj(X)], axis=0))
            NAT = lax.dynamic_update_slice(NAT, trail, (c0, c0))
            NAT = lax.dynamic_update_slice(NAT, pout, (c0, j0))
            NAT = lax.dynamic_update_slice(NAT, tile.adj(rband), (j0, c0))
        return constrain(NAT), taus_all

    carry = (NAT, taus_all)
    k0 = 0
    while k0 < n_panels:
        pm = n - (k0 + 1) * b
        pmp = max(_cdiv(pm, G) * G, b)
        k1 = k0
        while k1 < n_panels and max(_cdiv(n - (k1 + 1) * b, G) * G, b) == pmp:
            k1 += 1
        carry = lax.fori_loop(k0, k1,
                              partial(body, pmp=pmp, PH=_ph_for(pmp)),
                              carry)
        k0 = k1

    return carry


_r2b_jit = partial(jax.jit, static_argnames=("band_size",))(
    _reduction_to_band)
# donating the input lets XLA alias it into the Hermitian-full workspace:
# at n = 32768 that n^2 buffer (4.3 GB f32) is the difference between the
# reduction fitting next to its padded carry or not
_r2b_jit_donated = partial(jax.jit, static_argnames=("band_size",),
                           donate_argnums=(0,))(_reduction_to_band)


def _full_natural(a: DistMatrix):
    """Full-Hermitian natural matrix; same shape as the donated input, so
    the output aliases it (peak = input + one transpose temp; the
    ``where`` form measurably avoids the extra protective copy that
    ``tril(a) + adj(tril(a,-1))`` costs under input/output aliasing)."""
    nat = natural_exact(a)
    m = nat.shape[0]
    i = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return jnp.where(i >= j, nat, tile.adj(nat))


_full_jit_donated = jax.jit(_full_natural, donate_argnums=(0,))


def _pad_workspace(nat, G: int):
    n = nat.shape[0]
    NAT = jnp.zeros((n + G, n + G), nat.dtype)
    return lax.dynamic_update_slice(NAT, nat, (0, 0))


_pad_jit_donated = partial(jax.jit, static_argnames=("G",),
                           donate_argnums=(0,))(_pad_workspace)

_main_jit_cache: dict = {}


def _main_jit_for(dist, grid, b: int, G: int):
    """Donated-workspace sweep jit for one (distribution, band) signature.

    The multi-jit split keeps every stage's live set to at most two
    full-matrix buffers (one-jit reduction peak 13 GB -> ~8.5 GB at
    n = 32768 f32): the sweep's fori carry aliases the *donated*
    [n+G, n+G] workspace (donation aliases equal-shaped outputs, so the
    final workspace is returned), and the [n, n] band/reflector output is
    extracted in a separate jit (:func:`_store_jit_for`) that donates the
    workspace.
    """
    key = (dist, grid, b, G)
    fn = _main_jit_cache.get(key)
    if fn is not None:
        return fn
    n = dist.size[0]
    n_panels = max(_cdiv(n, b) - 1, 0)

    def main(NAT):
        def constrain(x):
            if grid is None:
                return x
            return lax.with_sharding_constraint(x, grid.sharding())

        taus_all = jnp.zeros((max(n_panels, 1), b), NAT.dtype)
        NAT2, taus_all = _panel_loop(NAT, taus_all, n, b, G, constrain)
        return taus_all, NAT2

    fn = jax.jit(main, donate_argnums=(0,))
    _main_jit_cache[key] = fn
    return fn


_store_jit_cache: dict = {}


def _store_jit_for(dist, grid):
    """Workspace -> storage-order data (donates the workspace)."""
    key = (dist, grid)
    fn = _store_jit_cache.get(key)
    if fn is not None:
        return fn
    n = dist.size[0]

    def store(NAT):
        res = NAT[:n, :n]
        Mp, Np = dist.padded_size
        if (n, n) != (Mp, Np):
            padded = jnp.zeros((Mp, Np), res.dtype)
            padded = lax.dynamic_update_slice(padded, res, (0, 0))
        else:
            padded = res
        from ...matrix.layout import natural_to_storage
        data = natural_to_storage(padded, dist)
        if grid is not None:
            data = lax.with_sharding_constraint(data, grid.sharding())
        return data

    fn = jax.jit(store, donate_argnums=(0,))
    _store_jit_cache[key] = fn
    return fn


def reduction_to_band(a: DistMatrix, band_size: int | None = None, *,
                      donate: bool = False
                      ) -> Tuple[DistMatrix, jnp.ndarray]:
    """See :func:`_reduction_to_band`; ``donate=True`` releases ``a``'s
    device buffer into the reduction (the caller must not reuse it)."""
    from ...tune import get_tune_parameters
    chunk_bytes = get_tune_parameters().r2b_chunk_bytes
    n = a.size[0]
    b = int(band_size) if band_size is not None else a.block_size[0]
    big = bool(chunk_bytes) and \
        n * n * jnp.zeros((), a.dtype).itemsize > chunk_bytes
    if donate and big and _cdiv(n, max(b, 1)) > 1:
        G = _bucket_granule(n, b)
        nat = _full_jit_donated(a)
        NAT = _pad_jit_donated(nat, G=G)
        del nat
        taus, NAT2 = _main_jit_for(a.dist, a.grid, b, G)(NAT)
        data = _store_jit_for(a.dist, a.grid)(NAT2)
        return DistMatrix(data, a.dist, a.grid), taus
    fn = _r2b_jit_donated if donate else _r2b_jit
    return fn(a, band_size)


reduction_to_band.__doc__ = _reduction_to_band.__doc__


@partial(jax.jit, static_argnames=("band_size",))
def extract_band(mat: DistMatrix, band_size: int) -> jnp.ndarray:
    """Lower-banded storage ``ab[i, j] = A[j + i, j]`` (i in [0, band]).

    The reflectors stored below the band never alias band diagonals, so this
    reads straight off the reduction output.  Returns ``[band+1, n]``
    (LAPACK ``sbtrd``-style), replicated.
    """
    nat = natural_exact(mat)
    n = nat.shape[0]
    ab = jnp.zeros((band_size + 1, n), dtype=nat.dtype)
    for i in range(min(band_size, max(n - 1, 0)) + 1):
        d = jnp.diagonal(nat, offset=-i)
        ab = ab.at[i, : n - i].set(d)
    return ab
