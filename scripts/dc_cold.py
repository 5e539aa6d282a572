#!/usr/bin/env python
"""D&C stage cold-call (program load + exec) vs warm exec at scale.

Usage: python scripts/dc_cold.py [n]  (default 32768; lean settings)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.tridiag_solver import (
        tridiagonal_eigensolver)
    from dlaf_tpu.tune import set_tune_parameters

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    set_tune_parameters(matmul_precision="highest",
                        dc_stage_bytes=512 << 20, dc_lean_bytes=512 << 20,
                        dc_lean_rowblock=2048)
    rng = np.random.default_rng(0)

    def once(tag):
        d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        e = jnp.asarray(rng.standard_normal(n - 1).astype(np.float32))
        t0 = time.perf_counter()
        lam, Q = tridiagonal_eigensolver(d, e, leaf_size=64)
        np.asarray(Q.ravel()[0:1])
        t1 = time.perf_counter()
        print(f"[{tag}] D&C n={n}: {t1 - t0:.2f}s", flush=True)
        del lam, Q

    once("cold (compile-cache hit + program load + exec)")
    once("warm (exec)")
    once("warm (exec)")


if __name__ == "__main__":
    main()
