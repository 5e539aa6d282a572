#!/usr/bin/env python
"""On-chip complex (c64) HEEV probe via the pair-of-reals embedding.

The axon TPU cannot transfer complex buffers at all; this drives
``hermitian_eigensolver_host`` (real [2n, 2n] block embedding on the
chip, host extraction) and records wall time + residual for BASELINE.md.

Usage: python scripts/complex_probe.py [n]   (default 4096)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dlaf_tpu import hermitian_eigensolver_host

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))) \
        .astype(np.complex64)
    a = (a + a.conj().T) / 2

    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        lam, U = hermitian_eigensolver_host(a, 1024, "L", band_size=128)
        t1 = time.perf_counter()
        resid = np.linalg.norm(a @ U - U * lam[None, :]) / np.linalg.norm(a)
        orth = np.abs(U.conj().T @ U - np.eye(n)).max()
        print(f"[{tag}] c64 HEEV n={n} (embedded 2n={2*n}): "
              f"{t1 - t0:.2f}s  resid {resid:.2e}  orth {orth:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
