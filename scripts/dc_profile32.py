#!/usr/bin/env python
"""Attribute the n=32768 D&C stage (~30 s) to its component costs.

Times, at top-merge scale on the real chip: the lean in-place merge
stage (as the driver runs it), its pieces (rotation scan per row block,
U-chunk build, chunk gemm), and the analysis (deflation + secular).
Run from the repo root.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dlaf_tpu.algorithms.eigensolver import tridiag_solver as ts
from dlaf_tpu.tune import set_tune_parameters
from dlaf_tpu.utils.timing import slope_time


def main():
    m = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16384
    set_tune_parameters(matmul_precision="highest",
                        dc_stage_bytes=512 << 20, dc_lean_bytes=512 << 20,
                        dc_lean_rowblock=2048)
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((m, m)), dt)
    lam = jnp.asarray(np.sort(rng.standard_normal(m)), dt)
    e = jnp.asarray(rng.standard_normal(m), dt)
    eps = jnp.asarray(np.finfo(np.float32).eps, dt)

    jits = ts._dc_stage_jits(m, m, m // 2, True, 2048, None, lean=True)

    i0 = jnp.int32(0)
    info = jits["analysis"](lam, Q, e, i0)
    t = slope_time(lambda l, q: jits["analysis"](l, q, e, i0), lam, Q,
                   k_hi=3, reps=2)
    print(f"analysis (deflate+secular+perm, m={m}): {t:.3f}s", flush=True)

    cp = jax.jit(lambda q: q + 0)       # feed the donating jit a fresh buf
    tc = slope_time(cp, Q, k_hi=3, reps=2)
    t = slope_time(lambda q: jits["lean"](cp(q), info), Q, k_hi=3, reps=2)
    print(f"lean merge stage (rot+gemm in place, m={m}): {t - tc:.3f}s "
          f"(copy overhead {tc:.3f}s subtracted)", flush=True)

    # pieces: one row block's rotation scan; one U chunk; one chunk gemm
    rb = 2048
    Rb = Q[:rb]
    rot1 = jax.jit(lambda Rb: ts._rotate_rows(
        jnp.swapaxes(Rb, 0, 1), info.rli, info.rjj, info.rc, info.rs))
    t = slope_time(rot1, Rb, k_hi=3, reps=2)
    nblk = m // rb
    print(f"rotation scan on one [{rb},{m}] row block: {t:.3f}s "
          f"(x{nblk} blocks = {t * nblk:.2f}s)", flush=True)

    cols = jnp.arange(2048, dtype=jnp.int32)
    uchunk = jax.jit(lambda c: ts._u_chunk(info, c))
    t = slope_time(uchunk, cols, k_hi=3, reps=2)
    nch = m // 2048
    print(f"U chunk build [m,2048]: {t:.3f}s (x{nch} chunks x{nblk} "
          f"blocks = {t * nch * nblk:.2f}s)", flush=True)

    Uc = uchunk(cols)
    gm = jax.jit(lambda Rb, Uc: Rb @ Uc)
    t = slope_time(gm, Rb, Uc, k_hi=3, reps=2)
    print(f"chunk gemm [{rb},{m}]x[{m},2048]: {t:.3f}s (x{nch}x{nblk} "
          f"= {t * nch * nblk:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
