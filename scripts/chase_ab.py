#!/usr/bin/env python
"""Interleaved A/B: v4 batched-slot Pallas chase vs XLA wavefront chase.

Same process, alternating runs, so shared-chip co-tenant noise hits both
arms equally.  Usage: python scripts/chase_ab.py [n ...]   (b=128)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.pallas_chase_v4 import (
        pallas_band_to_tridiagonal_v4)
    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        wavefront_band_to_tridiagonal)

    ns = [int(a) for a in sys.argv[1:]] or [2048]
    b = int(os.environ.get("PALLAS_BAND", "128"))
    reps = int(os.environ.get("AB_REPS", "3"))
    for n in ns:
        rng = np.random.default_rng(0)
        ab = rng.standard_normal((b + 1, n)).astype(np.float32)
        abd = jnp.asarray(ab)
        arms = {"wavefront": lambda: wavefront_band_to_tridiagonal(abd, b),
                "pallas4": lambda: pallas_band_to_tridiagonal_v4(abd, b)}
        # cold pass (compile; persistent cache may make this fast)
        for name, fn in arms.items():
            t0 = time.time()
            r = fn()
            _ = float(np.asarray(r.d)[0])
            print(f"n={n} {name} cold {time.time() - t0:.2f}s", flush=True)
        for rep in range(reps):
            for name, fn in arms.items():
                t0 = time.time()
                r = fn()
                _ = float(np.asarray(r.d)[0])
                dt = time.time() - t0
                print(f"n={n} {name} warm[{rep}] {dt:.2f}s "
                      f"({dt / max(n - 2, 1) * 1e3:.2f} ms/iter)",
                      flush=True)


if __name__ == "__main__":
    main()
