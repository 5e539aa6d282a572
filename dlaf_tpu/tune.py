"""Runtime-tunable algorithm parameters.

Equivalent of the reference's ``TuneParameters`` (``include/dlaf/tune.h:
114-168``) and its three-layer precedence (compiled defaults <- environment
``DLAF_*`` <- explicit overrides, ``src/init.cpp:203-230``).  The knobs differ
because the execution model differs: there is no thread/stream pool to size;
instead we tune matmul precision, lookahead depth of the unrolled drivers, and
the recursive-triangle split used by trailing Hermitian updates.
"""

from __future__ import annotations

import dataclasses
import os


def _env(name, default, cast):
    v = os.environ.get(name)
    if v is None:
        return default
    if cast is bool:
        return v.strip().upper() in ("1", "ON", "TRUE", "YES")
    return cast(v)


@dataclasses.dataclass
class TuneParameters:
    #: jax matmul precision for f32 tile ops: "highest" keeps LAPACK-grade
    #: accuracy on the MXU (3-pass bf16x9); "default" trades accuracy for
    #: speed.  (Reference has no analogue: cuBLAS is always full precision.)
    matmul_precision: str = _env("DLAF_MATMUL_PRECISION", "highest", str)
    #: f32 'highest' matmuls via explicit 3-way bf16 split (6 native MXU
    #: products, ops/splitmm.py): "on" forces it, "off"/"auto" disable.
    #: Measured (v5e, n=16384 POTRF end-to-end): the blanket split path
    #: REGRESSES the factorization 19.2 -> 15.7 TF despite winning some
    #: isolated deep-gemm microbenches — the materialized bf16 splits and
    #: f32 accumulator chain add HBM traffic that XLA's fused emulation
    #: avoids.  Kept as an opt-in for shape experiments.
    f32_split_matmul: str = _env("DLAF_F32_SPLIT_MATMUL", "off", str)
    #: recursion depth for triangle-aware trailing updates (herk/her2k):
    #: depth d wastes <= 2^-d of the rectangle flops on the masked diagonal
    #: band.  0 = plain full-rectangle update.
    herk_split_depth: int = _env("DLAF_HERK_SPLIT_DEPTH", 2, int)
    #: base block size of the recursive single-device POTRF/TRTRI fast path
    #: (below this, the XLA cholesky/triangular_solve HLOs take over).
    potrf_base_size: int = _env("DLAF_POTRF_BASE_SIZE", 128, int)
    #: panel width of the left-looking single-device POTRF.  Measured on
    #: v5e (n=32768 sweep, scripts/potrf_sweep.py): narrow panels win big —
    #: the left-looking update gemm [n-k, k] x [k, panel] runs ~45 TF at
    #: deep k vs ~31 TF for square shapes, and panel=512 puts ~98% of the
    #: flops there (512/128: 28.8 TF k_hi=9; old 4096/256: 25.1 TF).
    potrf_panel_size: int = _env("DLAF_POTRF_PANEL_SIZE", 512, int)
    #: distributed POTRF schedule: "kloop" (shard_map driver with explicit
    #: panel collectives) or "partitioner" (natural-order recursion, XLA
    #: SPMD places the collectives)
    cholesky_distributed_algo: str = _env("DLAF_CHOLESKY_DISTRIBUTED_ALGO",
                                          "kloop", str)
    #: wave-group size of the MXU banded back-transform (BT band->tridiag);
    #: the reference's ``bt_band_to_tridiag_hh_apply_group_size`` analogue.
    #: For the "hh" chase it is the number of sweeps per compact-WY window.
    #: Measured sweep at n=16384 b=128 (r4): g=64 1.90 s, g=128 1.39,
    #: g=192 1.73, g=256 1.58 -> 128 is the knee.
    bt_group_size: int = _env("DLAF_BT_GROUP_SIZE", 128, int)
    #: panels aggregated per compact-WY block in BT-R2B (outer gemm
    #: contraction depth = group * band; quads measured 1.68x over
    #: singles at n = 16384 b = 128).
    bt_r2b_group_size: int = _env("DLAF_BT_R2B_GROUP_SIZE", 4, int)
    #: WY-update column-chunk width in the in-place BT-R2B (temps scale
    #: with it: Es/X chunks are [<=n, chunk]).  Lower it (1024) to shave
    #: ~0.5 GB off the 8.3 GB n=32768 stage peak next to co-tenants.
    bt_r2b_chunk_cols: int = _env("DLAF_BT_R2B_CHUNK_COLS", 2048, int)
    #: band->tridiag algorithm: "auto" (DEFAULT: on an accelerator
    #: backend the on-device wavefront chase up to ``wavefront_max_n``
    #: — measured wins: n=8192 HEEV 4.1 vs 5.7 s, n=16384 23.2 vs
    #: 29.4 s warm, and immune to the tunnel-wire variance that blows
    #: the host path to 45+ s on bad days — the host chase above it and
    #: on CPU), "hh" (host Householder chase + compact-WY MXU
    #: back-transform, the reference's SweepWorker formulation),
    #: "wavefront" (the chase on the TPU as one lax.scan —
    #: wavefront_chase.py; real dtypes, single process; falls back to
    #: "hh" otherwise), "pallas" (the wavefront schedule as a manual-DMA
    #: Mosaic kernel — pallas_chase.py; correct, perf WIP), or "givens"
    #: (rotation chase + wave back-transform).
    band_to_tridiag_algo: str = _env("DLAF_B2T_ALGO", "auto", str)
    #: largest n "auto" runs the on-device wavefront chase for.  At 32k
    #: the host path is 118-152 s on a healthy wire but 241 s measured
    #: on a degraded one (the 2.15 GB reflector upload is hostage to the
    #: tunnel), while the wavefront end-to-end is a steady ~120-125
    #: (chase 83 s measured) — expected value favors the wavefront at
    #: every size, so the default cutoff is above the north star.
    wavefront_max_n: int = _env("DLAF_WAVEFRONT_MAX_N", 65536, int)
    #: smallest n "auto" picks the batched-slot Pallas chase (v4,
    #: pallas_chase_v4.py) instead of the XLA wavefront.  Measured r5
    #: (fori kernel, steady state): n=8192 0.46-0.48 vs wavefront 0.50
    #: ms/iter, n=16384 0.66-0.74 vs 1.03 (10.8 vs 16.8 s); cost model
    #: ~0.25 ms fixed + ~0.07 per 8-slot group -> 32k ~1.0 vs 2.54.
    #: Driver-route residuals 4-5e-5 at n=1024-8192 on hw.  0 disables
    #: (wavefront everywhere).
    pallas4_min_n: int = _env("DLAF_PALLAS4_MIN_N", 8192, int)
    #: reduction-to-band trailing blocks larger than this stream the
    #: two-sided update over column chunks instead of materializing the
    #: full [pmp, pmp] trailing block twice per panel (0 = never stream).
    #: Cuts the n=32768 f32 reduction peak from ~13 GB to ~9 GB.
    r2b_chunk_bytes: int = _env("DLAF_R2B_CHUNK_BYTES", 1 << 30, int)
    #: D&C merges whose Q block exceeds this run as separate donated jits
    #: (peak ~2 full matrices instead of ~4 inside one jit; 0 = never).
    dc_stage_bytes: int = _env("DLAF_DC_STAGE_BYTES", 1 << 30, int)
    #: above this size the staged FULL merge runs the in-place lean
    #: update (rotations + U gemm over row blocks in the donated buffer:
    #: peak ~1 matrix + block transients, at the cost of rebuilding the
    #: analytic U once per row block; 0 = never).
    dc_lean_bytes: int = _env("DLAF_DC_LEAN_BYTES", 2 << 30, int)
    #: row-block height of the lean update (smaller = less transient
    #: memory, more U rebuild passes)
    dc_lean_rowblock: int = _env("DLAF_DC_LEAN_ROWBLOCK", 4096, int)
    #: pre-warm the D&C programs (same-shape run on zeros) in a
    #: background thread during the host chase — hides the ~13 s
    #: server-side program load + ~13 s first execution at n = 32768.
    dc_prewarm: bool = _env("DLAF_DC_PREWARM", True, bool)
    #: SBR intermediate band: when > the chase band, the reduction runs
    #: in TWO stages — full -> sbr_band (wide panels, k = 2*sbr_band
    #: trailing contractions at MXU-efficient depth) then a block bulge
    #: chase sbr_band -> band (band_reduction.py).  0 = AUTO (b1 = 1024
    #: on accelerator backends from ``eigensolver_sbr_auto_min`` up —
    #: measured crossover 24576, BASELINE.md r4; the b=1024 memory wall
    #: fell with the r5 layout fixes), -1 = force one-stage.
    #: Analogue of the reference's band-size knobs (``tune.h:114-163``)
    #: adapted to the MXU's contraction-depth cliff.
    eigensolver_sbr_band: int = _env("DLAF_SBR_BAND", 0, int)

    #: AUTO-mode SBR enable threshold (measured r4: two-stage wins from
    #: ~24k; at 16384 it loses slightly)
    eigensolver_sbr_auto_min: int = _env("DLAF_SBR_AUTO_MIN", 24576, int)

    #: fp64 iterative refinement for the d-typed C-API entries on a chip
    #: without native f64 (algorithms/refine.py): number of dd-residual
    #: Newton steps applied after the f32 factorization.  0 = off (the
    #: reference computes d natively; here d buffers otherwise get
    #: f32-accurate results).  Single-process, real dtypes only.
    fp64_refine_iters: int = _env("DLAF_FP64_REFINE", 0, int)
    #: minimum band size for the two-stage eigensolver
    #: (reference ``tune.h: eigensolver_min_band``, default 100).
    eigensolver_min_band: int = _env("DLAF_EIGENSOLVER_MIN_BAND", 100, int)
    #: maximum auto-chosen band size: the host chase costs O(n^2 b), so
    #: huge blocks must not drag the band with them.  128 wins at every
    #: measured size (HEEV n=8192: 5.7 s at band 128 vs 15.5 s at 512;
    #: n=32768 tuned at 128) — the reflector-stream bytes are
    #: band-independent, so a smaller band only cuts chase cost.
    #: Explicit band_size overrides.
    eigensolver_max_band: int = _env("DLAF_EIGENSOLVER_MAX_BAND", 128, int)
    #: band size divisor: band = max(block / divisor, min_band)
    #: (reference ``internal/get_band_size.h``).
    band_size_divisor: int = _env("DLAF_BAND_SIZE_DIVISOR", 2, int)
    #: print a wall-clock stage breakdown of every hermitian_eigensolver
    #: call (forces a device sync per stage — diagnostics only)
    trace_eigensolver_stages: bool = _env("DLAF_TRACE_EIGENSOLVER_STAGES",
                                          False, bool)
    #: debug dumps of algorithm inputs/outputs (reference's 9 HDF5 dump
    #: flags, ``tune.h``); writes .npz via matrix/io.py when set.
    debug_dump_cholesky: bool = _env("DLAF_DEBUG_DUMP_CHOLESKY", False, bool)
    debug_dump_eigensolver: bool = _env("DLAF_DEBUG_DUMP_EIGENSOLVER", False,
                                        bool)
    debug_dump_dir: str = _env("DLAF_DEBUG_DUMP_DIR", ".", str)


_params = TuneParameters()


def get_tune_parameters() -> TuneParameters:
    """Globally mutable, like the reference's ``getTuneParameters()``."""
    return _params


def set_tune_parameters(**kwargs) -> TuneParameters:
    for k, v in kwargs.items():
        if not hasattr(_params, k):
            raise AttributeError(f"unknown tune parameter {k!r}")
        setattr(_params, k, v)
    return _params
