"""Embedding bridge for the native C ABI (``api/native/dlaf_c_shim.cpp``).

The C shim (equivalent of the reference's ``src/c_api/*.cpp``) embeds
CPython and calls these functions, passing raw buffer addresses as
integers; here they are wrapped zero-copy as numpy views (column-major,
ScaLAPACK layout, honoring the leading dimension) and routed through the
Python C-API layer ``api/c_api.py`` — mirroring the reference's
``Matrix(layout, ptr)`` wrap of user memory
(``src/c_api/utils.h:19-20``).  Every function returns an int rc
(0 = success) because exceptions cannot cross the C boundary.
"""

from __future__ import annotations

import ctypes
import os
import traceback

import numpy as np

# the C ABI is typed (s/d): double entry points need real f64, which JAX
# disables by default (TPU runs keep f32 — set DLAF_C_ENABLE_X64=0 there)
if os.environ.get("DLAF_C_ENABLE_X64", "1") != "0":
    import jax
    jax.config.update("jax_enable_x64", True)

from . import c_api

_CT = {"s": (ctypes.c_float, np.float32),
       "d": (ctypes.c_double, np.float64),
       "c": (ctypes.c_float, np.complex64),
       "z": (ctypes.c_double, np.complex128)}


def _wrap_mat(addr: int, typ: str, m: int, n: int, ld: int) -> np.ndarray:
    """Zero-copy F-order [m, n] view of a column-major local buffer
    (complex types view the interleaved re/im pairs)."""
    ct, dt = _CT[typ]
    mult = 2 if np.issubdtype(dt, np.complexfloating) else 1
    flat = np.ctypeslib.as_array(ctypes.cast(addr, ctypes.POINTER(ct)),
                                 shape=(n, max(ld, m) * mult))
    return flat.view(dt)[:, :m].T  # view; writes propagate to the C buffer


def _wrap_vec(addr: int, typ: str, n: int) -> np.ndarray:
    """Real vector view (eigenvalues are real for every type)."""
    ct, _ = _CT[typ]
    return np.ctypeslib.as_array(ctypes.cast(addr, ctypes.POINTER(ct)),
                                 shape=(n,))


def initialize() -> int:
    c_api.dlaf_initialize()
    return 0


def finalize() -> int:
    c_api.dlaf_finalize()
    return 0


def create_grid(nprow: int, npcol: int, order: int) -> int:
    try:
        return c_api.dlaf_create_grid(nprow, npcol, chr(order))
    except Exception:
        traceback.print_exc()
        return -1


def free_grid(ctx: int) -> int:
    c_api.dlaf_free_grid(ctx)
    return 0


def free_all_grids() -> int:
    c_api.dlaf_free_all_grids()
    return 0


def _desc(m, n, mb, nb, ld, i=1, j=1, nop=None):
    return c_api.DLAF_descriptor(m, n, mb, nb, ld=ld, i=i, j=j,
                                 subm=nop, subn=nop)


def _kind(typ):
    return "symmetric" if typ in ("s", "d") else "hermitian"


def cholesky(ctx: int, uplo: int, typ: str, addr: int,
             m: int, n: int, mb: int, nb: int, ld: int,
             i: int = 1, j: int = 1, nop: int = 0) -> int:
    try:
        a = _wrap_mat(addr, typ, m, n, ld)
        fn = getattr(c_api, f"dlaf_cholesky_factorization_{typ}")
        return fn(ctx, chr(uplo), a,
                  _desc(m, n, mb, nb, ld, i, j, nop or None))
    except Exception:
        traceback.print_exc()
        return 1


def cholesky_inverse(ctx: int, uplo: int, typ: str, addr: int,
                     m: int, n: int, mb: int, nb: int, ld: int,
                     i: int = 1, j: int = 1, nop: int = 0) -> int:
    try:
        a = _wrap_mat(addr, typ, m, n, ld)
        fn = getattr(c_api, f"dlaf_inverse_from_cholesky_factor_{typ}")
        return fn(ctx, chr(uplo), a,
                  _desc(m, n, mb, nb, ld, i, j, nop or None))
    except Exception:
        traceback.print_exc()
        return 1


def eigensolver(ctx: int, uplo: int, typ: str, a_addr: int, w_addr: int,
                z_addr: int, n: int, mb: int, nb: int,
                lda: int, ldz: int, n_ev: int = -1) -> int:
    """Full (n_ev < 0) or partial-spectrum ([0, n_ev)) eigensolver."""
    try:
        a = _wrap_mat(a_addr, typ, n, n, lda)
        z = _wrap_mat(z_addr, typ, n, n, ldz)
        w = _wrap_vec(w_addr, typ, n)
        if n_ev < 0:
            fn = getattr(c_api, f"dlaf_{_kind(typ)}_eigensolver_{typ}")
            return fn(ctx, chr(uplo), a, _desc(n, n, mb, nb, lda),
                      w, z, _desc(n, n, mb, nb, ldz))
        fn = getattr(
            c_api, f"dlaf_{_kind(typ)}_eigensolver_partial_spectrum_{typ}")
        return fn(ctx, chr(uplo), a, _desc(n, n, mb, nb, lda),
                  w, z[:, :n_ev], _desc(n, n, mb, nb, ldz), 0, n_ev)
    except Exception:
        traceback.print_exc()
        return 1


def gen_eigensolver(ctx: int, uplo: int, typ: str, a_addr: int,
                    b_addr: int, w_addr: int, z_addr: int, n: int,
                    mb: int, nb: int, lda: int, ldb: int, ldz: int,
                    factorized: int = 0, n_ev: int = -1) -> int:
    """Generalized eigensolver (B or its Cholesky factor), full or
    partial spectrum."""
    try:
        a = _wrap_mat(a_addr, typ, n, n, lda)
        b = _wrap_mat(b_addr, typ, n, n, ldb)
        z = _wrap_mat(z_addr, typ, n, n, ldz)
        w = _wrap_vec(w_addr, typ, n)
        kind = _kind(typ)
        if n_ev < 0:
            suffix = "_factorized" if factorized else ""
            fn = getattr(
                c_api, f"dlaf_{kind}_generalized_eigensolver{suffix}_{typ}")
            return fn(ctx, chr(uplo), a, _desc(n, n, mb, nb, lda),
                      b, _desc(n, n, mb, nb, ldb),
                      w, z, _desc(n, n, mb, nb, ldz))
        suffix = "_factorized" if factorized else ""
        fn = getattr(c_api, f"dlaf_{kind}_generalized_eigensolver_"
                            f"partial_spectrum{suffix}_{typ}")
        return fn(ctx, chr(uplo), a, _desc(n, n, mb, nb, lda),
                  b, _desc(n, n, mb, nb, ldb),
                  w, z[:, :n_ev], _desc(n, n, mb, nb, ldz), 0, n_ev)
    except Exception:
        traceback.print_exc()
        return 1
