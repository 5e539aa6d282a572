"""C-API-shaped layer: grid registry, descriptors, per-type entry points.

Equivalent of the reference's ``include/dlaf_c/`` + ``src/c_api/`` layer
(§2.10 of SURVEY.md): ``dlaf_initialize/finalize`` (``dlaf_c/init.h:27-35``),
``dlaf_create_grid`` context registry counted down from INT_MAX
(``src/c_api/grid.cpp:27-40``), ``DLAF_descriptor {m,n,mb,nb,i,j,ld}``
(``dlaf_c/desc.h:16``), and per-type solver entry points with in-place
user-buffer semantics plus ScaLAPACK-style wrappers (``dlaf_pdsyevd``-family,
``dlaf_c/eigensolver/eigensolver.h:36-80``).

The buffers are numpy arrays in ScaLAPACK column-major layout; each call
wraps them zero-copy-in-spirit (device transfer happens once), runs the
distributed algorithm, and writes results back — exactly the reference's
``Matrix(layout, ptr)`` + ``MatrixMirror`` flow (``src/c_api/eigensolver/
eigensolver.cpp:1-140``).  Grids address devices of the current process (the
single-controller analogue of the reference's MPI communicators).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_INT_MAX = 2 ** 31 - 1
_grids: Dict[int, "object"] = {}
_next_ctx = _INT_MAX
_initialized = False


@dataclasses.dataclass
class DLAF_descriptor:
    """ScaLAPACK-style descriptor (``dlaf_c/desc.h:16``).

    ``m, n``: global buffer dims; ``(i, j)``: 1-based operand origin;
    ``subm/subn``: operand dims (None = everything from ``(i, j)`` on).
    """

    m: int
    n: int
    mb: int
    nb: int
    isrc: int = 0
    jsrc: int = 0
    i: int = 1          # 1-based submatrix origin, ScaLAPACK convention
    j: int = 1
    ld: int = 0
    subm: Optional[int] = None
    subn: Optional[int] = None

    def __post_init__(self):
        if self.i < 1 or self.j < 1:
            raise ValueError("submatrix origins are 1-based")
        if self.isrc < 0 or self.jsrc < 0:
            raise ValueError("invalid source rank offsets")
        if self.mb != self.nb:
            raise ValueError("square blocks required")
        if self.subm is not None and self.i - 1 + self.subm > self.m:
            raise ValueError("operand exceeds the global matrix")
        if self.subn is not None and self.j - 1 + self.subn > self.n:
            raise ValueError("operand exceeds the global matrix")


def make_dlaf_descriptor(m: int, n: int, i: int, j: int,
                         desc) -> DLAF_descriptor:
    """ScaLAPACK 9-int descriptor -> :class:`DLAF_descriptor`
    (``dlaf_c/utils.h: make_dlaf_descriptor``).  ``desc`` =
    ``[dtype, ctxt, M, N, mb, nb, rsrc, csrc, lld]``; ``m, n`` are the
    operand (submatrix) dims and ``(i, j)`` its 1-based origin."""
    d = [int(x) for x in desc]
    if len(d) != 9:
        raise ValueError("ScaLAPACK descriptor must have 9 entries")
    return DLAF_descriptor(m=d[2], n=d[3], mb=d[4], nb=d[5],
                           isrc=d[6], jsrc=d[7], i=i, j=j, ld=d[8],
                           subm=m, subn=n)


def dlaf_initialize(*argv_lists) -> None:
    """``dlaf_initialize`` — runtime startup.

    Mirrors the reference's ``dlaf::initialize(argc, argv)``
    (``init.cpp``): applies ``--dlaf:key=value`` command-line overrides on
    top of environment defaults into the tuning state, ensures the
    persistent compile cache is installed, and (when the standard
    ``JAX_COORDINATOR_ADDRESS``/``DLAF_NUM_PROCESSES`` variables are set
    and multiple processes are requested) brings up the multi-process
    runtime.  Accepts any number of argv-like string lists, matching the
    reference's (pika argv, dlaf argv) pair; unknown options are ignored
    like the reference's ``allow_unregistered``.
    """
    global _initialized
    if _initialized:
        return
    import os

    from ..miniapp.options import apply_dlaf_args
    for argv in argv_lists:
        if argv and not isinstance(argv, (str, bytes)):
            apply_dlaf_args([str(a) for a in argv], strict=False)

    nproc = int(os.environ.get("DLAF_NUM_PROCESSES", "1") or 1)
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if nproc > 1 and coord:
        import jax

        if jax.process_count() == 1:
            from ..parallel.multiprocess import initialize_multiprocess
            initialize_multiprocess(
                coordinator_address=coord, num_processes=nproc,
                process_id=int(os.environ.get("DLAF_PROCESS_ID", "0")))
    _initialized = True


def dlaf_finalize() -> None:
    global _initialized, _grids
    if not _initialized and not _grids:
        return
    _initialized = False
    _grids.clear()
    import jax

    if jax.process_count() > 1:  # pragma: no cover - multi-process only
        try:
            jax.distributed.shutdown()
        except Exception:
            pass


def dlaf_create_grid(nprow: int, npcol: int, order: str = "R") -> int:
    """``dlaf_create_grid`` — returns a context handle (counted down from
    INT_MAX like the reference, to avoid BLACS handle clashes)."""
    global _next_ctx
    if order.upper() not in ("R", "C"):
        raise ValueError("order must be 'R' or 'C'")
    from ..parallel.grid import Grid
    grid = None
    if (nprow, npcol) != (1, 1):
        grid = Grid((nprow, npcol))
    ctx = _next_ctx
    _next_ctx -= 1
    _grids[ctx] = grid
    return ctx


def dlaf_free_grid(ctx: int) -> None:
    _grids.pop(ctx, None)


def _grid_from_context(ctx: int):
    if ctx not in _grids:
        raise KeyError(f"unknown grid context {ctx}")
    return _grids[ctx]


def _wrap(a: np.ndarray, desc: DLAF_descriptor, grid):
    """User buffer (column-major natural order) -> DistMatrix.

    Honors the full ScaLAPACK descriptor: ``(i, j)`` select the operand
    submatrix of the buffer's global matrix (1-based), ``subm/subn``
    its dims, and ``isrc/jsrc`` place its top-left block on that source
    rank (reference ``make_layout``, ``src/c_api/utils.h:19-20``).
    """
    from ..matrix.matrix import DistMatrix
    if a.shape != (desc.m, desc.n):
        a = np.asarray(a).reshape(desc.m, desc.n, order="F")
    i1 = desc.i - 1 + (desc.subm if desc.subm is not None else
                       desc.m - desc.i + 1)
    j1 = desc.j - 1 + (desc.subn if desc.subn is not None else
                       desc.n - desc.j + 1)
    sub = a[desc.i - 1:i1, desc.j - 1:j1]
    gs = (1, 1) if grid is None else grid.shape
    src = (desc.isrc % gs[0], desc.jsrc % gs[1])
    return DistMatrix.from_natural(jnp.asarray(np.ascontiguousarray(sub)),
                                   (desc.mb, desc.nb), grid, src_rank=src)


def _writeback(dst: np.ndarray, mat, desc: DLAF_descriptor):
    out = np.asarray(mat.to_natural())
    oi, oj = desc.i - 1, desc.j - 1
    if dst.shape == out.shape:          # exact operand view (e.g. partial z)
        dst[...] = out
    elif dst.ndim == 2 and dst.shape == (desc.m, desc.n):
        dst[oi:oi + out.shape[0], oj:oj + out.shape[1]] = out
    elif dst.ndim == 1 and dst.size == desc.m * desc.n:
        # flat column-major buffer: F-order view, then window write
        full = dst.reshape((desc.m, desc.n), order="F")
        full[oi:oi + out.shape[0], oj:oj + out.shape[1]] = out
    else:
        # partial-spectrum result into a flat full-size buffer: leading
        # columns only (valid for origin (1, 1))
        flat = dst.reshape(-1)
        flat[: out.size] = out.ravel(order="F")


# -- per-type entry points ----------------------------------------------------

def _cholesky(ctx, uplo, a, desc):
    from .. import cholesky_factorization
    from ..tune import get_tune_parameters
    grid = _grid_from_context(ctx)
    iters = get_tune_parameters().fp64_refine_iters
    if (iters > 0 and np.asarray(a).dtype == np.float64
            and (grid is None or grid.mesh.size == 1)):
        # d-type accuracy on an f32 chip: f32 factor + dd-residual
        # Newton steps (algorithms/refine.py; reference computes d
        # natively — include/dlaf/types.h:31-61)
        from ..algorithms.refine import cholesky_refine
        av = np.asarray(a)
        if av.shape != (desc.m, desc.n):
            av = av.reshape(desc.m, desc.n, order="F")
        oi, oj = desc.i - 1, desc.j - 1
        m = desc.subm if desc.subm is not None else desc.m
        sub = av[oi:oi + m, oj:oj + m]
        L = cholesky_refine(sub, (desc.mb, desc.nb), uplo.upper(),
                            iters=iters)
        src = np.asarray(a)
        if src.shape == (desc.m, desc.n):
            src[oi:oi + m, oj:oj + m] = L
        else:
            src.reshape((desc.m, desc.n),
                        order="F")[oi:oi + m, oj:oj + m] = L
        return 0
    mat = _wrap(a, desc, grid)
    out = cholesky_factorization(mat, uplo.upper())
    _writeback(a, out, desc)
    return 0


def _operand_view(a, desc):
    """(full buffer, 1-based descriptor) -> writable operand sub-view."""
    av = np.asarray(a)
    if av.shape != (desc.m, desc.n):
        av = av.reshape(desc.m, desc.n, order="F")
    oi, oj = desc.i - 1, desc.j - 1
    m = desc.subm if desc.subm is not None else desc.m - oi
    nn = desc.subn if desc.subn is not None else desc.n - oj
    return av[oi:oi + m, oj:oj + nn]


def _fp64_refine_route(grid, *arrays):
    """d-type accuracy on an f32 chip: route through the dd-residual
    refinement paths (algorithms/refine.py) when enabled — the
    reference computes d natively (include/dlaf/types.h:31-61)."""
    from ..tune import get_tune_parameters
    iters = get_tune_parameters().fp64_refine_iters
    return (iters if iters > 0
            and all(np.asarray(x).dtype == np.float64 for x in arrays)
            and (grid is None or grid.mesh.size == 1) else 0)


def _cholesky_inverse(ctx, uplo, a, desc):
    """Reference semantics (``dlaf_c/inverse/cholesky.h``): ``a`` holds
    the CHOLESKY FACTOR on entry (potri, not potrf+potri)."""
    from ..algorithms.inverse.cholesky import inverse_from_cholesky_factor
    grid = _grid_from_context(ctx)
    iters = _fp64_refine_route(grid, a)
    if iters:
        from ..algorithms.refine import cholesky_inverse_refine
        sub = _operand_view(a, desc)
        sub[...] = cholesky_inverse_refine(
            uplo.upper(), sub, (desc.mb, desc.nb), iters=iters)
        return 0
    mat = _wrap(a, desc, grid)
    out = inverse_from_cholesky_factor(uplo.upper(), mat)
    _writeback(a, out, desc)
    return 0


def _eigensolver(ctx, uplo, a, desca, w, z, descz, n_ev=None):
    from .. import hermitian_eigensolver
    grid = _grid_from_context(ctx)
    from ..algorithms.eigensolver.complex_embed import needs_real_embedding
    if needs_real_embedding(np.asarray(a).dtype):
        # complex on a real-only backend (axon TPU): pair-of-reals
        # embedding at the host boundary (complex_embed.py)
        from ..algorithms.eigensolver.eigensolver import (
            hermitian_eigensolver_host)
        if a.shape != (desca.m, desca.n):
            a = np.asarray(a).reshape(desca.m, desca.n, order="F")
        nop = desca.subm if desca.subm is not None else \
            desca.m - desca.i + 1
        sub = a[desca.i - 1:desca.i - 1 + nop,
                desca.j - 1:desca.j - 1 + nop]
        lam, U = hermitian_eigensolver_host(
            sub, (desca.mb, desca.nb), uplo.upper(), grid=grid,
            eigenvalues_index_end=n_ev)
        w[: len(lam)] = lam
        zdst = z[:, : U.shape[1]] if z.ndim == 2 else z
        if zdst.shape == U.shape:
            zdst[...] = U
        else:
            zdst.reshape(-1)[: U.size] = U.ravel(order="F")
        return 0
    iters = _fp64_refine_route(grid, a)
    if iters:
        from ..algorithms.refine import hermitian_eigensolver_refined
        sub = _operand_view(a, desca)
        lam, U = hermitian_eigensolver_refined(
            sub, (desca.mb, desca.nb), uplo.upper(),
            eigenvalues_index_end=n_ev)
        w[: len(lam)] = lam
        zdst = z[:, : U.shape[1]] if z.ndim == 2 else z
        if zdst.shape == U.shape:
            zdst[...] = U
        else:
            zdst.reshape(-1)[: U.size] = U.ravel(order="F")
        return 0
    mat = _wrap(a, desca, grid)
    lam, v = hermitian_eigensolver(mat, uplo.upper(),
                                   eigenvalues_index_end=n_ev)
    w[: len(np.asarray(lam))] = np.asarray(lam)
    _writeback(z[:, : v.size[1]] if z.ndim == 2 else z, v, descz)
    return 0


def _eigensolver_partial(ctx, uplo, a, desca, w, z, descz,
                         eigenvalues_index_begin, eigenvalues_index_end):
    """Partial-spectrum entry (reference
    ``dlaf_c/eigensolver/eigensolver.h:44-67``: begin must be 0)."""
    if int(eigenvalues_index_begin) != 0:
        raise ValueError("eigenvalues_index_begin must be 0 (reference "
                         "contract)")
    return _eigensolver(ctx, uplo, a, desca, w, z, descz,
                        n_ev=int(eigenvalues_index_end))


def _gen_eigensolver(ctx, uplo, a, desca, b, descb, w, z, descz,
                     factorized=False, n_ev=None):
    from .. import hermitian_generalized_eigensolver
    grid = _grid_from_context(ctx)
    from ..algorithms.eigensolver.complex_embed import needs_real_embedding
    if needs_real_embedding(np.asarray(a).dtype):
        from ..algorithms.eigensolver.eigensolver import (
            hermitian_generalized_eigensolver_host)
        if a.shape != (desca.m, desca.n):
            a = np.asarray(a).reshape(desca.m, desca.n, order="F")
        if b.shape != (descb.m, descb.n):
            b = np.asarray(b).reshape(descb.m, descb.n, order="F")
        nop = desca.subm if desca.subm is not None else \
            desca.m - desca.i + 1
        suba = a[desca.i - 1:desca.i - 1 + nop,
                 desca.j - 1:desca.j - 1 + nop]
        subb = b[descb.i - 1:descb.i - 1 + nop,
                 descb.j - 1:descb.j - 1 + nop]
        lam, U = hermitian_generalized_eigensolver_host(
            suba, subb, (desca.mb, desca.nb), uplo.upper(),
            factorized=factorized, eigenvalues_index_end=n_ev)
        w[: len(lam)] = lam
        zdst = z[:, : U.shape[1]] if z.ndim == 2 else z
        if zdst.shape == U.shape:
            zdst[...] = U
        else:
            zdst.reshape(-1)[: U.size] = U.ravel(order="F")
        return 0
    iters = _fp64_refine_route(grid, a, b)
    if iters:
        from ..algorithms.refine import (
            hermitian_generalized_eigensolver_refined)
        suba = _operand_view(a, desca)
        subb = _operand_view(b, descb)
        lam, U = hermitian_generalized_eigensolver_refined(
            suba, subb, (desca.mb, desca.nb), uplo.upper(),
            factorized=factorized, eigenvalues_index_end=n_ev)
        w[: len(lam)] = lam
        zdst = z[:, : U.shape[1]] if z.ndim == 2 else z
        if zdst.shape == U.shape:
            zdst[...] = U
        else:
            zdst.reshape(-1)[: U.size] = U.ravel(order="F")
        return 0
    ma = _wrap(a, desca, grid)
    mb = _wrap(b, descb, grid)
    lam, v = hermitian_generalized_eigensolver(
        ma, mb, uplo.upper(), factorized=factorized,
        eigenvalues_index_end=n_ev)
    w[: len(np.asarray(lam))] = np.asarray(lam)
    _writeback(z[:, : v.size[1]] if z.ndim == 2 else z, v, descz)
    return 0


def _gen_eigensolver_factorized(ctx, uplo, a, desca, b, descb, w, z,
                                descz):
    return _gen_eigensolver(ctx, uplo, a, desca, b, descb, w, z, descz,
                            factorized=True)


def _gen_eigensolver_partial(ctx, uplo, a, desca, b, descb, w, z, descz,
                             eigenvalues_index_begin,
                             eigenvalues_index_end, factorized=False):
    if int(eigenvalues_index_begin) != 0:
        raise ValueError("eigenvalues_index_begin must be 0 (reference "
                         "contract)")
    return _gen_eigensolver(ctx, uplo, a, desca, b, descb, w, z, descz,
                            factorized=factorized,
                            n_ev=int(eigenvalues_index_end))


def _gen_eigensolver_partial_factorized(ctx, uplo, a, desca, b, descb,
                                        w, z, descz,
                                        eigenvalues_index_begin,
                                        eigenvalues_index_end):
    return _gen_eigensolver_partial(ctx, uplo, a, desca, b, descb, w, z,
                                    descz, eigenvalues_index_begin,
                                    eigenvalues_index_end,
                                    factorized=True)


def _make_typed(fn, dtype):
    """Per-dtype entry point (reference naming ``dlaf_<algo>_<s|d|c|z>``).

    Unlike the C original there is no compile-time typing, so the wrapper
    validates every array argument against its declared dtype (mixing
    ``dlaf_cholesky_s`` with f64 buffers is a caller bug, not a cast)."""
    want = np.dtype(dtype)
    rdt = np.dtype(np.zeros((), want).real.dtype)

    def typed(*args, **kw):
        for a in list(args) + list(kw.values()):
            if (isinstance(a, np.ndarray)
                    and np.issubdtype(a.dtype, np.inexact)
                    and a.dtype not in (want, rdt)):
                raise TypeError(
                    f"buffer dtype {a.dtype} does not match entry point "
                    f"dtype {want}")
        return fn(*args, **kw)
    typed.dtype = dtype
    return typed


# reference naming: dlaf_<algo>_<s|d|c|z> (``dlaf_c/*/*.h``)
for _t, _dt in (("s", np.float32), ("d", np.float64),
                ("c", np.complex64), ("z", np.complex128)):
    globals()[f"dlaf_cholesky_factorization_{_t}"] = \
        _make_typed(_cholesky, _dt)
    # historical alias of this build (kept for callers of round <= 3)
    globals()[f"dlaf_cholesky_{_t}"] = \
        globals()[f"dlaf_cholesky_factorization_{_t}"]
    globals()[f"dlaf_inverse_from_cholesky_factor_{_t}"] = \
        _make_typed(_cholesky_inverse, _dt)
    globals()[f"dlaf_cholesky_inverse_{_t}"] = \
        globals()[f"dlaf_inverse_from_cholesky_factor_{_t}"]
    _kind = ("symmetric" if _dt in (np.float32, np.float64)
             else "hermitian")
    globals()[f"dlaf_{_kind}_eigensolver_{_t}"] = \
        _make_typed(_eigensolver, _dt)
    globals()[f"dlaf_{_kind}_eigensolver_partial_spectrum_{_t}"] = \
        _make_typed(_eigensolver_partial, _dt)
    globals()[f"dlaf_{_kind}_generalized_eigensolver_{_t}"] = \
        _make_typed(_gen_eigensolver, _dt)
    globals()[f"dlaf_{_kind}_generalized_eigensolver_factorized_{_t}"] = \
        _make_typed(_gen_eigensolver_factorized, _dt)
    globals()[
        f"dlaf_{_kind}_generalized_eigensolver_partial_spectrum_{_t}"] = \
        _make_typed(_gen_eigensolver_partial, _dt)
    globals()[f"dlaf_{_kind}_generalized_eigensolver_partial_spectrum"
              f"_factorized_{_t}"] = \
        _make_typed(_gen_eigensolver_partial_factorized, _dt)


# -- ScaLAPACK-style wrappers -------------------------------------------------
#
# Reference calling shape (``dlaf_c/*/*.h`` DLAF_WITH_SCALAPACK section):
# descriptors are ScaLAPACK 9-int arrays whose ctxt entry resolves the
# grid (register handles with dlaf_create_grid / dlaf_create_grid_from
# _blacs); a DLAF_descriptor plus an explicit ``ctx=`` keyword is also
# accepted.  Unlike the reference, operand origins ia/ja != 1 ARE
# supported (``Distribution.sub_distribution`` handles the offsets).

def _sca_desc(n, nb, lld=None):
    return DLAF_descriptor(n, n, nb, nb, ld=lld or n)


def _norm_desc(mop, nop, i, j, desc, ctx):
    """(operand dims, 1-based origin, 9-int or DLAF descriptor, explicit
    ctx) -> (DLAF_descriptor, resolved ctx)."""
    if isinstance(desc, DLAF_descriptor):
        d = dataclasses.replace(desc, i=int(i), j=int(j),
                                subm=int(mop), subn=int(nop))
        if ctx is None:
            raise ValueError("DLAF_descriptor form requires ctx=")
        return d, ctx
    d = make_dlaf_descriptor(int(mop), int(nop), int(i), int(j), desc)
    return d, (int(desc[1]) if ctx is None else ctx)


def _set_info(info, rc):
    if info is not None:
        info[0] = rc
    return rc


def _sca_potrf(uplo, n, a, ia, ja, desca, info=None, *, ctx=None):
    d, c = _norm_desc(n, n, ia, ja, desca, ctx)
    return _set_info(info, _cholesky(c, uplo, a, d))


def _sca_potri(uplo, n, a, ia, ja, desca, info=None, *, ctx=None):
    d, c = _norm_desc(n, n, ia, ja, desca, ctx)
    return _set_info(info, _cholesky_inverse(c, uplo, a, d))


def _sca_evd(uplo, n, a, ia, ja, desca, w, z, iz, jz, descz,
             info=None, *, ctx=None):
    da, c = _norm_desc(n, n, ia, ja, desca, ctx)
    dz, _ = _norm_desc(n, n, iz, jz, descz, c)
    return _set_info(info, _eigensolver(c, uplo, a, da, w, z, dz))


def _sca_evd_partial(uplo, n, a, ia, ja, desca, w, z, iz, jz, descz,
                     eigenvalues_index_begin, eigenvalues_index_end,
                     info=None, *, ctx=None):
    da, c = _norm_desc(n, n, ia, ja, desca, ctx)
    dz, _ = _norm_desc(n, n, iz, jz, descz, c)
    return _set_info(info, _eigensolver_partial(
        c, uplo, a, da, w, z, dz, eigenvalues_index_begin,
        eigenvalues_index_end))


def _sca_gvd(uplo, n, a, ia, ja, desca, b, ib, jb, descb, w, z, iz, jz,
             descz, info=None, *, ctx=None, factorized=False):
    da, c = _norm_desc(n, n, ia, ja, desca, ctx)
    db, _ = _norm_desc(n, n, ib, jb, descb, c)
    dz, _ = _norm_desc(n, n, iz, jz, descz, c)
    return _set_info(info, _gen_eigensolver(
        c, uplo, a, da, b, db, w, z, dz, factorized=factorized))


def _sca_gvd_factorized(*args, **kw):
    kw["factorized"] = True
    return _sca_gvd(*args, **kw)


def _sca_gvd_partial(uplo, n, a, ia, ja, desca, b, ib, jb, descb, w, z,
                     iz, jz, descz, eigenvalues_index_begin,
                     eigenvalues_index_end, info=None, *, ctx=None,
                     factorized=False):
    da, c = _norm_desc(n, n, ia, ja, desca, ctx)
    db, _ = _norm_desc(n, n, ib, jb, descb, c)
    dz, _ = _norm_desc(n, n, iz, jz, descz, c)
    return _set_info(info, _gen_eigensolver_partial(
        c, uplo, a, da, b, db, w, z, dz, eigenvalues_index_begin,
        eigenvalues_index_end, factorized=factorized))


def _sca_gvd_partial_factorized(*args, **kw):
    kw["factorized"] = True
    return _sca_gvd_partial(*args, **kw)


for _t, _dt, _ev in (("s", np.float32, "syevd"), ("d", np.float64, "syevd"),
                     ("c", np.complex64, "heevd"),
                     ("z", np.complex128, "heevd")):
    _gv = "sygvd" if _ev == "syevd" else "hegvd"
    globals()[f"dlaf_p{_t}potrf"] = _make_typed(_sca_potrf, _dt)
    globals()[f"dlaf_p{_t}potri"] = _make_typed(_sca_potri, _dt)
    globals()[f"dlaf_p{_t}{_ev}"] = _make_typed(_sca_evd, _dt)
    globals()[f"dlaf_p{_t}{_ev}_partial_spectrum"] = \
        _make_typed(_sca_evd_partial, _dt)
    globals()[f"dlaf_p{_t}{_gv}"] = _make_typed(_sca_gvd, _dt)
    globals()[f"dlaf_p{_t}{_gv}_factorized"] = \
        _make_typed(_sca_gvd_factorized, _dt)
    globals()[f"dlaf_p{_t}{_gv}_partial_spectrum"] = \
        _make_typed(_sca_gvd_partial, _dt)
    globals()[f"dlaf_p{_t}{_gv}_partial_spectrum_factorized"] = \
        _make_typed(_sca_gvd_partial_factorized, _dt)


def dlaf_pdsygvx(uplo, n, a, desca, b, descb, w, z, descz, ctx, info=None):
    """Deprecated round-1 shape (kept for compatibility; the reference
    set is the dlaf_p{s,d,c,z}{sy,he}gvd family above)."""
    rc = _gen_eigensolver(ctx, uplo, a, desca, b, descb, w, z, descz)
    if info is not None:
        info[0] = rc
    return rc


def dlaf_free_all_grids() -> None:
    """``dlaf_free_all_grids`` (``dlaf_c/grid.h:45``)."""
    _grids.clear()


def dlaf_create_grid_from_blacs(blacs_ctxt: int, nprow: int = None,
                                npcol: int = None,
                                order: str = "R") -> None:
    """Register a grid under an EXISTING (BLACS) context handle
    (``dlaf_c/grid.h:77``).  There is no BLACS runtime to query here, so
    the grid dims must be passed explicitly; the handle is then usable
    as the ctxt entry of ScaLAPACK descriptors."""
    if nprow is None or npcol is None:
        raise ValueError("no BLACS runtime to query: pass nprow/npcol")
    if order.upper() not in ("R", "C"):
        raise ValueError("order must be 'R' or 'C'")
    from ..parallel.grid import Grid
    grid = None
    if (nprow, npcol) != (1, 1):
        grid = Grid((nprow, npcol))
    _grids[int(blacs_ctxt)] = grid
