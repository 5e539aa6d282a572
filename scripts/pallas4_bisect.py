#!/usr/bin/env python
"""Steady-state timing of the v4 chase at one DLAF_PALLAS4_LVL.

The FIRST execution after compile pays a ~42 s server-side program load
(measured n=2048); steady state is runs 2+.  Usage:
  DLAF_PALLAS4_LVL=K python scripts/pallas4_bisect.py [n]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.pallas_chase_v4 import (
        _LVL, pallas_band_to_tridiagonal_v4)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    b = 128
    rng = np.random.default_rng(0)
    ab = rng.standard_normal((b + 1, n)).astype(np.float32)
    abd = jnp.asarray(ab)
    r = pallas_band_to_tridiagonal_v4(abd, b)     # compile + load
    _ = float(np.asarray(r.d)[0])
    for rep in range(4):
        t0 = time.time()
        r = pallas_band_to_tridiagonal_v4(abd, b)
        _ = float(np.asarray(r.d)[0])
        dt = time.time() - t0
        print(f"lvl={_LVL} n={n} run[{rep}] {dt:.2f}s "
              f"({dt / max(n - 2, 1) * 1e3:.3f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
