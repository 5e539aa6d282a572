"""Standard and generalized Hermitian eigensolver drivers.

Equivalent of the reference's ``hermitian_eigensolver``
(``eigensolver/eigensolver.h:33,146``, impl ``eigensolver/eigensolver/
impl.h:37-105``) and ``hermitian_generalized_eigensolver[_factorized]``
(``eigensolver/gen_eigensolver.h``, impl ``gen_eigensolver/impl.h:31-104``).

Pipeline (the reference's §3.3 call stack, re-hosted per stage):
  reduction_to_band (XLA/MXU) -> band_to_tridiagonal (host chase, like the
  reference's CPU-only stage) -> tridiagonal D&C (XLA) -> BT band->tridiag
  (XLA wave kernel) -> BT reduction->band (XLA/MXU).

Partial spectrum: ``eigenvalues_index_end`` mirrors the reference's
``[begin=0, end)`` contract (``eigensolver.h:53``): only the first columns
are back-transformed (both BTs operate on the column slice, the analogue of
the reference's MatrixRef slicing at ``eigensolver/impl.h:90-92``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...matrix.matrix import DistMatrix
from ...ops import tile
from ...tune import get_tune_parameters
from ..factorization.cholesky import cholesky_factorization
from ..internal import natural_exact, store_natural_exact
from ..solver.triangular import triangular_solver
from .band_to_tridiag import band_to_tridiagonal
from .bt_band_to_tridiag import bt_band_to_tridiagonal
from .bt_hh import bt_hh_apply
from .bt_reduction_to_band import bt_reduction_to_band
from .hh_chase import hh_band_to_tridiagonal
from .gen_to_std import generalized_to_standard
from .reduction_to_band import extract_band, reduction_to_band
from .tridiag_solver import tridiagonal_eigensolver


def get_band_size(nb: int) -> int:
    """Reference heuristic (``internal/get_band_size.h``):
    ``max(nb / divisor, min_band)`` clipped to the block size — plus a cap
    (``eigensolver_max_band``) because the host chase costs O(n^2 b)."""
    p = get_tune_parameters()
    band = max(nb // p.band_size_divisor, p.eigensolver_min_band)
    return max(1, min(nb, band, max(p.eigensolver_max_band,
                                    p.eigensolver_min_band)))


def hermitian_eigensolver(
        a: DistMatrix, uplo: str = "L", *,
        band_size: Optional[int] = None,
        eigenvalues_index_end: Optional[int] = None,
        leaf_size: int = 64,
        donate_input: bool = False,
) -> Tuple[jnp.ndarray, DistMatrix]:
    """Eigenvalues (ascending) and eigenvectors of a Hermitian matrix.

    Returns ``(eigenvalues [n_ev], eigenvectors DistMatrix [n, n_ev])``
    where ``n_ev = eigenvalues_index_end or n``.

    ``donate_input=True`` releases ``a``'s device buffer after the
    reduction stage (the reference overwrites A in place; value semantics
    otherwise keep the input alive through the whole chain — at n = 32768
    that extra n^2 buffer is the difference between fitting and OOM).
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    n = a.size[0]
    if a.size[0] != a.size[1]:
        raise ValueError("matrix must be square")
    nb = a.block_size[0]
    n_ev = n if eigenvalues_index_end is None else int(eigenvalues_index_end)
    if not 0 <= n_ev <= n:
        raise ValueError(f"eigenvalues_index_end {n_ev} out of range")
    rdtype = np.zeros((), a.dtype).real.dtype

    if n == 0:
        return jnp.zeros((0,), rdtype), a.with_data(a.data)

    band = get_band_size(nb) if band_size is None else int(band_size)

    from ...matrix.io import debug_dump
    debug_dump("eigensolver", a, "input")

    # uplo=U: materialize the full Hermitian; reduction reads lower
    if uplo == "U":
        a = store_natural_exact(a, tile.hermitian_full(natural_exact(a), "U"))

    # distributed runs: memory-distribute the mid-stages (the reference's
    # distributed merge keeps O(n) vectors replicated and distributes the
    # eigenvector matrix, merge.h:1810) — D&C rows, back-transform columns
    row_shard = col_shard = None
    if a.grid is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        mesh = a.grid.mesh
        row_shard = NamedSharding(mesh, P(("p", "q"), None))
        col_shard = NamedSharding(mesh, P(None, ("p", "q")))

    tp = get_tune_parameters()
    timer = None
    if tp.trace_eigensolver_stages:
        from ...utils.trace import StageTimer
        timer = StageTimer()

    def mark(name, x=None):
        if timer is not None:
            if x is not None:       # force completion before attributing
                np.asarray(jnp.asarray(x).ravel()[0:1])
            dt = timer.mark(name)
            import sys
            # stderr: bench.py's stdout is a JSON-line protocol
            print(f"  [stage] {name}: {dt:.2f}s", file=sys.stderr,
                  flush=True)

    adtype, ablock, agrid = a.dtype, a.block_size, a.grid
    import jax

    # two-stage reduction (SBR): full -> sbr_band with wide MXU-friendly
    # panels, then a block bulge chase sbr_band -> band (the reference's
    # band-size knobs adapted to the MXU contraction-depth cliff;
    # band_reduction.py).  Stage 1 distributes (partitioner-style
    # reduction); the dense stage-2 scan is REPLICATED across the mesh —
    # a serial O(n^2 b) stage at single-chip wall with zero collectives
    # (the multi-process analogue is the rank-pipelined hh_chase_mp,
    # the reference's SweepWorkerDist — mc.h:569).
    sbr_b1 = int(tp.eigensolver_sbr_band)
    if (sbr_b1 == 0 and jax.default_backend() not in ("cpu",)
            and n >= int(tp.eigensolver_sbr_auto_min)):
        # auto policy: two-stage wins from ~24k (measured r4 crossover;
        # the b1=1024 stage-1 memory wall fell with the r5 layout fixes
        # — 1.45 GiB temps at 32k, was 13.1)
        sbr_b1 = 1024
    use_sbr = (sbr_b1 > band and n > sbr_b1 + 1
               and jax.process_count() == 1)
    red_band = sbr_b1 if use_sbr else band

    def replicate(x):
        """Multi-device mesh: make the serial-stage operand fully
        replicated so the scan runs redundantly on every device (no
        per-iteration halo collectives, single-chip wall time)."""
        if agrid is None or agrid.mesh.size == 1:
            return x
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        return jax.device_put(x, NamedSharding(agrid.mesh, P()))

    mat_hh, taus = reduction_to_band(a, red_band, donate=donate_input)
    if donate_input:
        a = None          # buffer donated into the reduction jit
    mark("reduction_to_band", mat_hh.data)
    b2t_algo = tp.band_to_tridiag_algo
    if b2t_algo == "auto":
        # measured policy (BASELINE.md r4): on-device wavefront wins up
        # to wavefront_max_n on accelerator backends and is immune to
        # tunnel-wire variance; the host chase amortizes better at the
        # largest sizes (and on CPU, where the scan has no MXU to ride)
        b2t_algo = ("wavefront"
                    if (jax.default_backend() not in ("cpu",)
                        and n <= int(tp.wavefront_max_n)) else "hh")
        p4min = int(tp.pallas4_min_n)
        if (b2t_algo == "wavefront" and p4min > 0 and n >= p4min
                and band <= 256):
            # batched-slot Mosaic kernel: wins once the wavefront width
            # is large (see tune.pallas4_min_n for the measured model).
            # band <= 256 keeps the [G*4b, 3b] VMEM slab under ~25 MB;
            # at band >= 512 it exceeds the 100 MB kernel budget
            b2t_algo = "pallas4"
    use_wavefront = (b2t_algo in ("wavefront", "pallas", "pallas4")
                     and not np.issubdtype(np.dtype(adtype),
                                           np.complexfloating)
                     and jax.process_count() == 1 and n > 2 and band > 1)
    use_hh = b2t_algo != "givens"
    sbr_res = None
    if use_sbr:
        from .band_reduction import (_band_strip_from_storage,
                                     band_dense_from_band_strip,
                                     band_dense_from_reduction,
                                     band_to_band, extract_band_dense)
        lean_dense = (jax.process_count() == 1 and col_shard is None
                      and use_hh
                      and mat_hh.dist.grid_size == (1, 1))
        if lean_dense:
            # strip-first order caps the stage at ~Ap + n^2/2: extract
            # the [b1+1, n] band strip (one gather off the identity
            # storage layout), PACK (donating the n^2 mat_hh), then
            # build the padded dense from the strip — the direct
            # mat_hh->dense build holds mat_hh + Ap (9.2 GB at 32k),
            # the only stage above the 8.6 GB input-build floor
            ab1 = _band_strip_from_storage(
                mat_hh.data, red_band, mat_hh.dist.padded_size[1], n)
            from .bt_reduction_to_band import pack_hh_panels
            mat_hh = pack_hh_panels(mat_hh, red_band, donate=True)
            mark("pack_hh_panels")
            dense = band_dense_from_band_strip(
                ab1, n, red_band, pad=2 * red_band + band)
            ab1 = None
        else:
            dense = replicate(band_dense_from_reduction(
                mat_hh, red_band, pad=2 * red_band + band))
            if use_hh and col_shard is None:
                from .bt_reduction_to_band import pack_hh_panels
                mat_hh = pack_hh_panels(mat_hh, red_band, donate=True)
                mark("pack_hh_panels")
        # unpad=False: the band is read straight off the padded stage-2
        # workspace — the unpad slice cannot alias (shape change) and
        # held padded + dense concurrently (8.9 GB at n = 32768)
        dense, sbr_res = band_to_band(dense, n, h=red_band, g=band,
                                      unpad=False)
        mark("band_to_band (SBR stage 2)", dense)
        ab = extract_band_dense(dense, band, n=n)
        dense = None
        if not use_wavefront:
            ab = np.asarray(ab)
        mark("extract_band")
    else:
        if use_wavefront:
            ab = replicate(extract_band(mat_hh, band))  # stays on device
        else:
            ab = np.asarray(extract_band(mat_hh, band))
        mark("extract_band")
        if use_hh and col_shard is None:
            # mat_hh's band + mirror are dead weight from here on: keep
            # only the packed V panels (~n^2/2) through the BT stages
            from .bt_reduction_to_band import pack_hh_panels
            mat_hh = pack_hh_panels(mat_hh, red_band, donate=True)
            mark("pack_hh_panels")
    # pre-warm the D&C programs during the HOST chase (device idle then):
    # a same-shape run on zeros forces server-side program load + first
    # execution, ~13 + 13 s at n = 32768 that would otherwise sit on the
    # critical path of the real D&C stage.  Skipped for the wavefront
    # chase (the device is busy) and for small problems.
    prewarm_th = None
    if (tp.dc_prewarm and use_hh and not use_wavefront and n >= 8192
            and jax.process_count() == 1):
        import threading

        from .bt_hh import bt_hh_pad_rows
        pre_pad = bt_hh_pad_rows(n, band) if (n > 2 and band > 1) else 0
        pre_leaf = min(leaf_size, max(n, 1))

        def _dc_prewarm():
            try:
                lam0, q0 = tridiagonal_eigensolver(
                    jnp.zeros((n,), rdtype), jnp.zeros((n - 1,), rdtype),
                    leaf_size=pre_leaf, q_sharding=row_shard,
                    row_pad=pre_pad)
                np.asarray(jnp.asarray(q0).ravel()[0:1])   # force exec
                del lam0, q0
            except Exception:       # noqa: BLE001 — warm-up best-effort
                pass

        prewarm_th = threading.Thread(target=_dc_prewarm, daemon=True)
        prewarm_th.start()

    if use_wavefront:
        # device-resident chase: no band download, no host compute, no
        # reflector-stream upload.  Two implementations:
        # "wavefront" = XLA slice-lattice scan (wavefront_chase.py),
        # "pallas" = manual-DMA Mosaic kernel on the staircase strip
        # (pallas_chase.py) — same schedule, far less HBM traffic.
        if b2t_algo == "pallas":
            from .pallas_chase import pallas_band_to_tridiagonal
            res = pallas_band_to_tridiagonal(ab, band)
            mark("band_to_tridiag (pallas, on device)")
        elif b2t_algo == "pallas4":
            from .pallas_chase_v4 import pallas_band_to_tridiagonal_v4
            res = pallas_band_to_tridiagonal_v4(ab, band)
            mark("band_to_tridiag (pallas v4, on device)")
        else:
            from .wavefront_chase import wavefront_band_to_tridiagonal
            res = wavefront_band_to_tridiagonal(ab, band)
            mark("band_to_tridiag (wavefront, on device)")
    elif use_hh:
        if jax.process_count() > 1:
            # rank-pipelined chase: each process chases only its owned
            # column regions (reference SweepWorkerDist, mc.h:569)
            from .hh_chase_mp import hh_band_to_tridiagonal_mp
            res = hh_band_to_tridiagonal_mp(ab, band)
        else:
            # stream the reflector upload during the chase and let it
            # keep draining in the background: on the tunneled TPU the
            # ~n^2/2-value host->device copy costs ~3x the chase itself,
            # so the tail hides behind the (device-bound) D&C stage and
            # is joined only when the back-transform needs the stream
            res = hh_band_to_tridiagonal(ab, band, device_stream=True,
                                         async_upload=True)
    else:
        res = band_to_tridiagonal(ab, band)
    if not use_wavefront:
        mark("band_to_tridiag (host chase)")

    if prewarm_th is not None:
        prewarm_th.join()
        mark("D&C prewarm join")

    streamw = None
    row_pad = 0
    want_bt_stream = False
    if use_hh and n > 2 and band > 1:
        from .hh_chase import hh_schedule
        want_bt_stream = hh_schedule(n, band)[1] > 0
    if want_bt_stream:
        # have D&C allocate the BT scan's zero pad rows up front, and
        # window-order the reflector stream outside the BT scan — both
        # remove every full-matrix copy from the BT path.  The window
        # gather runs NOW if the stream is fully on device (its 2x
        # transient is cheap before D&C holds two full matrices); with
        # a pending async upload it runs after D&C instead (the join
        # point), where the transient coexists with one matrix only.
        from .bt_hh import bt_hh_pad_rows, bt_hh_window_stream
        row_pad = bt_hh_pad_rows(n, band)
        if res.v_resolve is None:
            streamw = bt_hh_window_stream(res)

    lam, z = tridiagonal_eigensolver(jnp.asarray(res.d, rdtype),
                                     jnp.asarray(res.e, rdtype),
                                     leaf_size=min(leaf_size, max(n, 1)),
                                     q_sharding=row_shard,
                                     row_pad=row_pad)
    lam = lam[:n_ev]
    if n_ev < n:
        z = z[:, :n_ev]
    mark("tridiag D&C", z)

    if want_bt_stream and streamw is None:
        # join the background upload (drained behind D&C) + window-order
        from .bt_hh import bt_hh_window_stream
        streamw = bt_hh_window_stream(res)
        mark("reflector upload join")
    if use_hh:
        # z and the reflector stream are dead after this transform
        e2 = bt_hh_apply(res, z, e_sharding=col_shard, donate=True,
                         stream=streamw, keep_pad=True)
        z = streamw = None
    else:
        e2 = bt_band_to_tridiagonal(res, z)
    mark("bt_band_to_tridiag", e2)
    if e2.dtype != adtype:
        e2 = e2.astype(adtype)
    if sbr_res is not None:
        # SBR stage-2 back-transform (between the chase BT and the
        # stage-1 panel BT: E = Q1 (Q2 (Q3 E_tridiag)))
        from .band_reduction import bt_band_to_band
        e2 = bt_band_to_band(sbr_res, e2, donate=True)
        sbr_res = None
        mark("bt_band_to_band (SBR)", e2)
    e = bt_reduction_to_band(red_band, e2, mat_hh, taus,
                             e_sharding=col_shard,
                             donate=use_hh and col_shard is None)
    e2 = None
    mark("bt_reduction_to_band", e)

    evec = DistMatrix.from_natural(e[:n] if e.shape[0] != n else e,
                                   ablock, agrid)
    debug_dump("eigensolver", evec, "eigenvectors")
    if timer is not None:
        import sys

        from ...utils import trace as _trace
        _trace.last_stage_times = dict(timer.stages)
        print("eigensolver stage breakdown:", file=sys.stderr)
        timer.report(file=sys.stderr)
    return lam, evec


def hermitian_eigensolver_host(
        a: np.ndarray, block_size, uplo: str = "L", *,
        grid=None, eigenvalues_index_end: Optional[int] = None,
        **kw) -> Tuple[np.ndarray, np.ndarray]:
    """Complex Hermitian eigensolver for real-only backends.

    The platform cannot ``device_put`` complex buffers (axon TPU), so
    the complex matrix enters as HOST numpy, is encoded as the real
    symmetric ``[2n, 2n]`` block embedding (``complex_embed.py``), runs
    the whole real pipeline on the chip, and the complex eigenpairs are
    extracted on the host.  2x the flops of a native complex solve, at
    full MXU rate.  Works on any backend (CPU tests compare it against
    the native complex path).

    Returns host ``(eigenvalues [n_ev], eigenvectors [n, n_ev]
    complex)``.
    """
    from .complex_embed import embed_hermitian, extract_eigenpairs
    a = np.asarray(a)
    n = a.shape[0]
    if a.shape != (n, n):
        raise ValueError("matrix must be square")
    if not np.issubdtype(a.dtype, np.complexfloating):
        raise ValueError("hermitian_eigensolver_host is the complex "
                         "boundary; real input goes through "
                         "hermitian_eigensolver")
    if uplo == "U":       # embed needs the full Hermitian matrix
        a = np.triu(a) + np.triu(a, 1).conj().T
    elif uplo == "L":
        a = np.tril(a) + np.tril(a, -1).conj().T
    else:
        raise ValueError("invalid uplo")
    n_ev = n if eigenvalues_index_end is None else int(eigenvalues_index_end)
    M = embed_hermitian(a)
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    mat = DistMatrix.from_natural(jnp.asarray(M), block_size, grid)
    # 2*n_ev real columns cover the doubled spectrum's first n_ev pairs,
    # plus slack for a cluster straddling the cut
    n_ev2 = min(2 * n, 2 * n_ev + 2) if n_ev < n else 2 * n
    lam2, v2 = hermitian_eigensolver(
        mat, "L", eigenvalues_index_end=n_ev2, donate_input=True, **kw)
    lam2 = np.asarray(lam2)
    v2n = np.asarray(v2.to_natural())
    # extraction expects the full doubled spectrum length for shape
    # bookkeeping only at [0, n_ev2); pad the tail values
    if n_ev2 < 2 * n:
        pad = np.full(2 * n - n_ev2, np.inf, lam2.dtype)
        lam2 = np.concatenate([lam2, pad])
        v2n = np.concatenate(
            [v2n, np.zeros((2 * n, 2 * n - n_ev2), v2n.dtype)], axis=1)
    return extract_eigenpairs(lam2, v2n, n, n_ev=n_ev)


def hermitian_generalized_eigensolver_host(
        a: np.ndarray, b: np.ndarray, block_size, uplo: str = "L", *,
        factorized: bool = False,
        eigenvalues_index_end: Optional[int] = None,
        **kw) -> Tuple[np.ndarray, np.ndarray]:
    """Complex generalized eigenproblem A x = lambda B x for real-only
    backends (same pair-of-reals embedding as
    :func:`hermitian_eigensolver_host`, applied to BOTH operands).

    A real generalized eigenvector ``v = [p; q]`` of the embedded pencil
    maps to the complex one ``u = p + iq``; the doubled spectrum's
    cluster extraction reuses the standard machinery, followed by a
    B-metric re-orthonormalization (generalized eigenvectors are
    B-orthonormal, not orthonormal).  ``factorized=True`` means ``b``
    holds B's Cholesky factor; the INTERLEAVED embedding is
    triangularity-preserving, so the embedded factor is reused directly
    on the device (reference ``gen_eigensolver/impl.h:81-104``) — B is
    never reassembled.
    """
    from .complex_embed import (deinterleave_rows, embed_hermitian,
                                embed_hermitian_interleaved,
                                extract_eigenpairs)
    a = np.asarray(a)
    b = np.asarray(b)
    n = a.shape[0]
    if not np.issubdtype(a.dtype, np.complexfloating):
        raise ValueError("complex boundary; real input goes through "
                         "hermitian_generalized_eigensolver")
    if uplo == "U":
        a = np.triu(a) + np.triu(a, 1).conj().T
    elif uplo == "L":
        a = np.tril(a) + np.tril(a, -1).conj().T
    else:
        raise ValueError("invalid uplo")
    n_ev = n if eigenvalues_index_end is None else int(eigenvalues_index_end)
    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    fac = None
    if factorized:
        fac = np.tril(b) if uplo == "L" else np.triu(b)
        Ma = DistMatrix.from_natural(
            jnp.asarray(embed_hermitian_interleaved(a)), block_size)
        Mb = DistMatrix.from_natural(
            jnp.asarray(embed_hermitian_interleaved(fac)), block_size)
    else:
        b = (np.tril(b) + np.tril(b, -1).conj().T if uplo == "L"
             else np.triu(b) + np.triu(b, 1).conj().T)
        Ma = DistMatrix.from_natural(jnp.asarray(embed_hermitian(a)),
                                     block_size)
        Mb = DistMatrix.from_natural(jnp.asarray(embed_hermitian(b)),
                                     block_size)
    n_ev2 = min(2 * n, 2 * n_ev + 2) if n_ev < n else 2 * n
    lam2, v2 = hermitian_generalized_eigensolver(
        Ma, Mb, uplo if factorized else "L", factorized=factorized,
        eigenvalues_index_end=n_ev2, **kw)
    lam2 = np.asarray(lam2)
    v2n = np.asarray(v2.to_natural())
    if factorized:
        v2n = deinterleave_rows(v2n)
    if n_ev2 < 2 * n:
        lam2 = np.concatenate([lam2, np.full(2 * n - n_ev2, np.inf,
                                             lam2.dtype)])
        v2n = np.concatenate(
            [v2n, np.zeros((2 * n, 2 * n - n_ev2), v2n.dtype)], axis=1)
    lam, U = extract_eigenpairs(lam2, v2n, n, n_ev=n_ev)
    # B-metric re-orthonormalization: the extraction's plain QR broke
    # B-orthonormality; restore it with the Cholesky of the small Gram
    if factorized:
        # G = (op(F) U)^H (op(F) U) from the factor, B never formed
        W = (fac.conj().T @ U) if uplo == "L" else (fac @ U)
        G = W.conj().T.astype(np.complex128) @ W.astype(np.complex128)
    else:
        G = U.conj().T @ (b.astype(np.complex128) @ U)
    L = np.linalg.cholesky((G + G.conj().T) / 2)
    U = (U @ np.linalg.inv(L).conj().T).astype(U.dtype)
    return lam, U


def hermitian_generalized_eigensolver(
        a: DistMatrix, b: DistMatrix, uplo: str = "L", *,
        factorized: bool = False,
        eigenvalues_index_end: Optional[int] = None,
        **kw,
) -> Tuple[jnp.ndarray, DistMatrix]:
    """Solve A x = lambda B x (A Hermitian, B HPD).

    ``factorized=True`` means ``b`` already holds B's Cholesky factor
    (the reference's ``hermitian_generalized_eigensolver_factorized``).
    """
    if uplo not in ("L", "U"):
        raise ValueError("invalid uplo")
    fb = b if factorized else cholesky_factorization(b, uplo)
    std = generalized_to_standard(uplo, a, fb)
    lam, evec = hermitian_eigensolver(
        std, uplo, eigenvalues_index_end=eigenvalues_index_end, **kw)
    # back-substitution on the eigenvector slice:
    # uplo=L: x = L^-H y ; uplo=U: x = U^-1 y
    if uplo == "L":
        evec = triangular_solver("L", "L", "C", "N", 1.0, fb, evec)
    else:
        evec = triangular_solver("L", "U", "N", "N", 1.0, fb, evec)
    return lam, evec
