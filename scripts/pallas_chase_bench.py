#!/usr/bin/env python
"""Pallas chase on the real chip: correctness probe + timing.

Usage: python scripts/pallas_chase_bench.py [n ...]  (b=128)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import scipy.linalg as sla

    if os.environ.get("PALLAS_V4"):
        from dlaf_tpu.algorithms.eigensolver.pallas_chase_v4 import (
            pallas_band_to_tridiagonal_v4 as pallas_band_to_tridiagonal)
    else:
        from dlaf_tpu.algorithms.eigensolver.pallas_chase import (
            pallas_band_to_tridiagonal)

    ns = [int(a) for a in sys.argv[1:]] or [2048]
    b = int(os.environ.get("PALLAS_BAND", "128"))
    for n in ns:
        rng = np.random.default_rng(0)
        ab = rng.standard_normal((b + 1, n)).astype(np.float32)
        abd = jnp.asarray(ab)
        t0 = time.perf_counter()
        res = pallas_band_to_tridiagonal(abd, b)
        t1 = time.perf_counter()
        res2 = pallas_band_to_tridiagonal(abd, b)
        _ = res2.d
        t2 = time.perf_counter()
        msg = f"n={n} b={b}: cold {t1-t0:.1f}s warm {t2-t1:.2f}s"
        if n <= 4096:
            from dlaf_tpu.algorithms.eigensolver.hh_chase import (
                hh_band_to_tridiagonal)
            ref = hh_band_to_tridiagonal(ab.copy(), b, force_numpy=True)
            lam_p = sla.eigvalsh_tridiagonal(res.d, res.e)
            lam_r = sla.eigvalsh_tridiagonal(ref.d, ref.e)
            err = np.abs(lam_p - lam_r).max() / max(np.abs(lam_r).max(), 1)
            msg += f"  eig err {err:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
