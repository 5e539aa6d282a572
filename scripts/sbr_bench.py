#!/usr/bin/env python
"""Two-stage (SBR) vs one-stage reduction timing on the real chip.

Usage: python scripts/sbr_bench.py [n] [b1]
  b1 = 0 (default): one-stage reduction full -> 128 (baseline)
  b1 > 0: stage 1 full -> b1, then stage 2 block chase b1 -> 128

One mode per invocation (memory); run from the repo root. Each mode
runs twice and reports the warm pass (cold includes compile/queue).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n, b1, band=128):
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.band_reduction import (
        band_dense_from_reduction, band_to_band, extract_band_dense)
    from dlaf_tpu.algorithms.eigensolver.reduction_to_band import (
        extract_band, reduction_to_band)
    from dlaf_tpu.algorithms.internal import natural_exact
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.matrix.matrix import DistMatrix
    from dlaf_tpu.tune import set_tune_parameters

    set_tune_parameters(matmul_precision="highest")

    def sync(x):
        np.asarray(jnp.asarray(x).ravel()[0:1])

    for it in range(2):
        mat = mu.random_hermitian_dist(n, 2048, dtype=np.float32, seed=3)
        sync(mat.data)
        # ownership passes into the reduction: when donation cannot
        # alias (padded output shapes), holding `mat` here would keep
        # the 4.3 GB input alive through stage 2 at n = 32768
        holder = [mat]
        del mat
        tag = "warm" if it else "cold"
        if not b1:
            t0 = time.perf_counter()
            mat_hh, taus = reduction_to_band(holder.pop(), band,
                                             donate=True)
            sync(mat_hh.data)
            t1 = time.perf_counter()
            ab = extract_band(mat_hh, band)
            sync(ab)
            t2 = time.perf_counter()
            print(f"[{tag}] one-stage n={n} b={band}: red2band "
                  f"{t1-t0:.2f}s  extract {t2-t1:.2f}s", flush=True)
            del mat_hh, taus, ab
        else:
            t0 = time.perf_counter()
            mat_hh, taus = reduction_to_band(holder.pop(), b1,
                                             donate=True)
            sync(mat_hh.data)
            t1 = time.perf_counter()
            dense = band_dense_from_reduction(mat_hh, b1, pad=2 * b1 + band)
            del mat_hh
            sync(dense)
            t2 = time.perf_counter()
            dense, res = band_to_band(dense, n, h=b1, g=band, unpad=False)
            sync(dense)
            t3 = time.perf_counter()
            ab = extract_band_dense(dense, band, n=n)
            sync(ab)
            t4 = time.perf_counter()
            nseg = len(res.segs)
            from dlaf_tpu.algorithms.eigensolver.band_reduction import (
                sbr_stage2_ops)
            gf1 = (2 / 3 * n**3 - n**2 * b1) / max(t1 - t0, 1e-9) / 1e9
            gf2 = sbr_stage2_ops(n, b1, band) / max(t3 - t2, 1e-9) / 1e9
            print(f"[{tag}] two-stage n={n} b1={b1}->b={band}: stage1 "
                  f"{t1-t0:.2f}s ({gf1:.0f} GF/s)  dense {t2-t1:.2f}s  "
                  f"stage2 {t3-t2:.2f}s ({gf2:.0f} GF/s model, {nseg} "
                  f"segs)  extract {t4-t3:.2f}s  TOTAL {t4-t0:.2f}s",
                  flush=True)
            del dense, res, ab, taus


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    b1 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    # shared-worker co-tenants: RESOURCE_EXHAUSTED comes in waves; retry
    # with backoff (see bench.py)
    import gc
    for attempt in range(5):
        try:
            run(n, b1)
            break
        except Exception as exc:              # noqa: BLE001
            print(f"attempt {attempt} failed: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
            gc.collect()
            time.sleep(120)
    else:
        raise SystemExit(1)
