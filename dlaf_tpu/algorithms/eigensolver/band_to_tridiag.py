"""Band -> real symmetric tridiagonal reduction (stage 2 of the eigensolver).

Equivalent of the reference's ``band_to_tridiagonal``
(``eigensolver/band_to_tridiag/mc.h``): the reference runs CPU-only
bulge-chasing ``SweepWorker`` state machines over a 1D re-blocked band with
P2P pipelining; this build keeps the same hardware choice — the chase's value
recurrence is inherently sequential and a terrible fit for SPMD/XLA — and
runs it on the host, but restructures the *transform* so the O(n^2 * ncols)
back-transform work lands on the MXU/VPU (see ``bt_band_to_tridiag.py``).

Design (Schwarz/Kaufman Givens chasing, diagonal-by-diagonal):

* the rotation *schedule* (which row pairs rotate, in what order) is a pure
  function of ``(n, band)`` — data-independent, so it is precomputed once and
  shared by the host value kernel and the JAX back-transform (whose gather
  indices therefore become static constants in the XLA program);
* the rotation *values* (c, s) form a sequential recurrence over the band —
  computed on host (numpy here; a C++ FFI kernel accelerates large n);
* for each bandwidth k = b..2 and column j, the in-band element at distance
  k is annihilated by a rotation of rows (j+k-1, j+k); the similarity
  transform spills one fill element at distance k+1, chased down at row
  positions stepped by k until the border;
* complex Hermitian input yields a complex subdiagonal; a final unitary
  diagonal phase scaling makes it real (LAPACK ``zhbtrd`` does the same),
  with the phases folded into the back-transform.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Tuple

import numpy as np


@lru_cache(maxsize=None)
def rotation_schedule(n: int, b: int) -> Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Static forward-order rotation positions: arrays (p, q, k).

    Rotation m acts on rows/cols ``(p[m]-1, p[m])`` and annihilates the
    element at ``(p[m], q[m])`` while the working bandwidth is ``k[m]``.
    """
    native = _schedule_native(n, b)
    if native is not None:
        return native
    ps_parts, qs_parts, ks_parts = [], [], []
    for k in range(b, 1, -1):
        if n - k <= 0:
            continue
        j = np.arange(0, n - k, dtype=np.int64)
        L = (n - 1 - (j + k)) // k + 1          # chase length per column
        total = int(L.sum())
        jj = np.repeat(j, L)
        starts = np.cumsum(L) - L
        r = np.arange(total, dtype=np.int64) - np.repeat(starts, L)
        p = jj + (r + 1) * k
        q = np.where(r == 0, jj, p - k - 1)
        ps_parts.append(p)
        qs_parts.append(q)
        ks_parts.append(np.full(total, k, np.int64))
    if not ps_parts:
        z = np.zeros(0, np.int32)
        return z, z.copy(), z.copy()
    return (np.concatenate(ps_parts).astype(np.int32),
            np.concatenate(qs_parts).astype(np.int32),
            np.concatenate(ks_parts).astype(np.int32))


def _schedule_native(n: int, b: int):
    """Native schedule fill (linear C++ loop; numpy path below is the
    reference but spends minutes at M ~ 1e8)."""
    import ctypes

    from ...ops.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "dlaf_rotation_schedule"):
        return None
    fn = lib.dlaf_rotation_schedule
    fn.restype = ctypes.c_int64
    M = fn(ctypes.c_int64(n), ctypes.c_int64(b), None, None, None)
    ps = np.zeros(M, np.int32)
    qs = np.zeros(M, np.int32)
    ks = np.zeros(M, np.int32)
    fn(ctypes.c_int64(n), ctypes.c_int64(b),
       ps.ctypes.data_as(ctypes.c_void_p),
       qs.ctypes.data_as(ctypes.c_void_p),
       ks.ctypes.data_as(ctypes.c_void_p))
    return ps, qs, ks


def _chase_native(ab2: np.ndarray, n: int, b: int):
    """Dispatch to the C++ chase kernel; None -> use the numpy fallback."""
    import ctypes

    from ...ops.native import get_lib
    lib = get_lib()
    if lib is None:
        return None
    dt = ab2.dtype
    fns = {np.dtype(np.float32): ("dlaf_chase_s", np.float32, np.float32),
           np.dtype(np.float64): ("dlaf_chase_d", np.float64, np.float64),
           np.dtype(np.complex64): ("dlaf_chase_c", np.float32, np.complex64),
           np.dtype(np.complex128): ("dlaf_chase_z", np.float64,
                                     np.complex128)}
    if dt not in fns:
        return None
    name, cdt, sdt = fns[dt]
    ps, qs, ks = rotation_schedule(n, b)
    M = len(ps)
    cs = np.zeros(M, cdt)
    ss = np.zeros(M, sdt)
    # the native kernel uses LAPACK-style column-major banded storage
    # (unit-stride inner loops); transpose at the boundary
    ab2c = np.asfortranarray(ab2)
    fn = getattr(lib, name)
    fn.restype = ctypes.c_int
    rc = fn(ab2c.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n), ctypes.c_int64(b),
            np.ascontiguousarray(ps).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(qs).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(ks).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(M),
            cs.ctypes.data_as(ctypes.c_void_p),
            ss.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    ab2[...] = ab2c
    return np.asarray(cs, np.float64), ss


def _lartg(f, g):
    """Givens generator: c real, s with [c s; -conj(s) c] @ [f; g] = [r; 0]."""
    if g == 0:
        return 1.0, 0.0 * g, f
    af = abs(f)
    if af == 0:
        ag = abs(g)
        return 0.0, np.conj(g) / ag, ag + 0 * f
    d = np.hypot(af, abs(g))
    sign_f = f / af
    return af / d, sign_f * np.conj(g) / d, sign_f * d


def chase_values(ab2: np.ndarray, n: int, b: int):
    """Run the chase over banded storage ``ab2[(b+2), n]``, in place.

    ``ab2[i, j] = A[j+i, j]`` for i <= b (+1 fill row).  Returns
    ``(cs, ss)`` in schedule order.  Dispatches to the native C++ kernel
    (``ops/native/chase.cpp``) when available; this numpy loop is the
    reference implementation and fallback.
    """
    native = _chase_native(ab2, n, b)
    if native is not None:
        return native
    ps, qs, ks = rotation_schedule(n, b)
    M = len(ps)
    cs = np.zeros(M, np.float64)
    ss = np.zeros(M, ab2.dtype)

    for m in range(M):
        p, q, k = int(ps[m]), int(qs[m]), int(ks[m])
        # pivot A[p-1, q], target A[p, q]
        f = ab2[p - 1 - q, q]
        g = ab2[p - q, q]
        c, s, r = _lartg(f, g)
        cs[m], ss[m] = c, s
        ab2[p - 1 - q, q] = r
        ab2[p - q, q] = 0.0

        # row pair on remaining left columns (max(0, p-1-k) .. p-2, except q)
        for col in range(max(0, p - 1 - k), p - 1):
            if col == q:
                continue
            a1 = ab2[p - 1 - col, col]
            a2 = ab2[p - col, col]
            ab2[p - 1 - col, col] = c * a1 + s * a2
            ab2[p - col, col] = -np.conj(s) * a1 + c * a2

        # 2x2 diagonal block (d1, off, d2) -> G B G^H: row update (r1, r2)
        # then column update (matches the C++ kernel in ops/native/chase.cpp)
        d1 = ab2[0, p - 1]
        off = ab2[1, p - 1]  # A[p, p-1]
        d2 = ab2[0, p]
        r1 = (c * d1 + s * off, c * np.conj(off) + s * d2)
        r2 = (-np.conj(s) * d1 + c * off, -np.conj(s) * np.conj(off) + c * d2)
        nd1 = c * r1[0] + np.conj(s) * r1[1]
        noff = c * r2[0] + np.conj(s) * r2[1]
        nd2 = -s * r2[0] + c * r2[1]
        ab2[0, p - 1] = nd1.real if np.isrealobj(ab2) else nd1
        ab2[1, p - 1] = noff
        ab2[0, p] = nd2.real if np.isrealobj(ab2) else nd2

        # column pair for rows below (p+1 .. min(p+k, n-1))
        for row in range(p + 1, min(p + k, n - 1) + 1):
            a1 = ab2[row - (p - 1), p - 1]
            a2 = ab2[row - p, p]
            ab2[row - (p - 1), p - 1] = c * a1 + np.conj(s) * a2
            ab2[row - p, p] = -s * a1 + c * a2

    return cs, ss


@dataclasses.dataclass
class BandToTridiagResult:
    """Tridiagonal + the transform needed for the back-transform.

    ``Q2`` satisfies ``Band = Q2 @ Tridiag(d, e) @ Q2^H`` with
    ``Q2 = G_1^H G_2^H ... G_M^H D`` (G_m in schedule order, D the phase
    diagonal).  The reference returns ``{tridiagonal, hh_reflectors}``
    (``band_to_tridiag/api.h``); rotations play the reflectors' role here.
    """

    d: np.ndarray          # [n] real diagonal
    e: np.ndarray          # [n-1] real off-diagonal
    cs: np.ndarray         # [M] rotation cosines (real)
    ss: np.ndarray         # [M] rotation sines (dtype of A)
    phases: np.ndarray     # [n] unitary diagonal making e real
    n: int
    band: int


def band_to_tridiagonal(ab: np.ndarray, band: int) -> BandToTridiagResult:
    """Reduce lower-banded storage ``ab[(band+1), n]`` to real tridiagonal."""
    bp1, n = ab.shape
    if bp1 != band + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {band + 1}")
    dtype = ab.dtype
    complex_in = np.iscomplexobj(ab)

    ab2 = np.zeros((band + 2, n), dtype)
    ab2[: band + 1] = ab
    if n > 2 and band > 1:
        cs, ss = chase_values(ab2, n, band)
    else:
        M = 0
        cs = np.zeros(0, np.float64)
        ss = np.zeros(0, dtype)

    d = ab2[0, :].copy()
    e_c = ab2[1, : max(n - 1, 0)].copy()

    phases = np.ones(n, dtype)
    if complex_in:
        for j in range(n - 1):
            mag = abs(e_c[j])
            ph = e_c[j] / mag if mag != 0 else 1.0
            # T_real = D^H T D with D[j+1] = D[j] * ph
            phases[j + 1] = phases[j] * ph
            e_c[j] = mag
        d = d.real
        e = e_c.real
    else:
        d = d.real if complex_in else d
        e = e_c
    return BandToTridiagResult(np.asarray(d.real, np.float64),
                               np.asarray(e.real if complex_in else e,
                                          np.float64),
                               cs, ss, phases, n, band)


@lru_cache(maxsize=None)
def bt_wave_schedule(n: int, b: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack the *reversed* rotation stream into parallel waves.

    Returns ``(p_waves, idx_waves)`` of shape ``[W, R]``: wave w applies
    rotations ``idx_waves[w]`` (indices into schedule order; -1 = padding)
    at row pairs ``(p-1, p)``.  Rotations within a wave touch disjoint row
    pairs, so they commute; waves are ASAP levels of the row-conflict DAG
    over the reversed stream (the back-transform order).
    """
    ps, _, _ = rotation_schedule(n, b)
    M = len(ps)
    if M == 0:
        return np.zeros((0, 0), np.int32), np.full((0, 0), -1, np.int32)
    native = _wave_pack_native(ps, n)
    if native is not None:
        return native
    levels = _wave_levels(ps, n)
    W = int(levels.max()) + 1
    counts = np.bincount(levels, minlength=W)
    R = int(counts.max())
    # vectorized packing: application order is reversed-m; stable-sort the
    # reversed stream by level, then slot = rank within the level group
    rev = np.arange(M - 1, -1, -1)
    lv_rev = levels[rev]
    order = np.argsort(lv_rev, kind="stable")
    starts = np.zeros(W + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    ranks = np.arange(M) - starts[lv_rev[order]]
    p_waves = np.zeros((W, R), np.int32)
    idx_waves = np.full((W, R), -1, np.int32)
    m_sorted = rev[order]
    p_waves[lv_rev[order], ranks] = ps[m_sorted]
    idx_waves[lv_rev[order], ranks] = m_sorted
    return p_waves, idx_waves


def _wave_pack_native(ps: np.ndarray, n: int):
    """Full wave packing in C++ (levels + table fill in linear passes)."""
    import ctypes

    from ...ops.native import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "dlaf_wave_pack"):
        return None
    fn = lib.dlaf_wave_pack
    fn.restype = ctypes.c_int64
    psc = np.ascontiguousarray(ps, np.int32)
    M = len(psc)
    r_out = np.zeros(1, np.int64)
    W = fn(psc.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(M),
           ctypes.c_int64(n + 1),
           r_out.ctypes.data_as(ctypes.c_void_p), None, None)
    R = int(r_out[0])
    p_waves = np.zeros((W, R), np.int32)
    idx_waves = np.zeros((W, R), np.int32)
    fn(psc.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(M),
       ctypes.c_int64(n + 1), r_out.ctypes.data_as(ctypes.c_void_p),
       p_waves.ctypes.data_as(ctypes.c_void_p),
       idx_waves.ctypes.data_as(ctypes.c_void_p))
    return p_waves, idx_waves


def _wave_levels(ps: np.ndarray, n: int) -> np.ndarray:
    """ASAP levels of the reversed stream (native kernel; numpy fallback)."""
    import ctypes

    from ...ops.native import get_lib
    M = len(ps)
    lib = get_lib()
    if lib is not None and hasattr(lib, "dlaf_wave_levels"):
        levels = np.zeros(M, np.int64)
        nl = np.zeros(1, np.int64)
        psc = np.ascontiguousarray(ps, np.int32)
        lib.dlaf_wave_levels(psc.ctypes.data_as(ctypes.c_void_p),
                             ctypes.c_int64(M), ctypes.c_int64(n + 1),
                             levels.ctypes.data_as(ctypes.c_void_p),
                             nl.ctypes.data_as(ctypes.c_void_p))
        return levels
    last_level = np.full(n + 1, -1, np.int64)
    levels = np.empty(M, np.int64)
    for m in range(M - 1, -1, -1):
        p = ps[m]
        lv = max(last_level[p - 1], last_level[p]) + 1
        levels[m] = lv
        last_level[p - 1] = lv
        last_level[p] = lv
    return levels
