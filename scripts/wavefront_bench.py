#!/usr/bin/env python
"""Wavefront (on-device) chase timing at bench sizes, vs the host path.

Run from the repo root on the TPU env: python scripts/wavefront_bench.py [n]
"""
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        wavefront_band_to_tridiagonal)

    ns = [int(a) for a in _sys.argv[1:]] or [8192, 16384]
    b = 128
    for n in ns:
        rng = np.random.default_rng(0)
        ab = rng.standard_normal((b + 1, n)).astype(np.float32)
        abd = jnp.asarray(ab)
        t0 = time.perf_counter()
        res = wavefront_band_to_tridiagonal(abd, b)
        t1 = time.perf_counter()        # d/e fetched => chase complete
        res2 = wavefront_band_to_tridiagonal(abd, b)
        _ = res2.d
        t2 = time.perf_counter()
        gf = 6 * n * n * b / (t2 - t1) / 1e9
        vshape = ([s.shape for s in res.V_raw]
                  if isinstance(res.V_raw, list) else
                  res.V_raw.shape if res.V_raw is not None else res.V.shape)
        print(f"n={n} b={b}: cold {t1 - t0:.1f}s  warm {t2 - t1:.2f}s "
              f"({gf:.0f} GF/s model)  V raw: {vshape}", flush=True)


if __name__ == "__main__":
    main()
