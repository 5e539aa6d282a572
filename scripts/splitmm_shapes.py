#!/usr/bin/env python
"""Split-bf16 vs native-'highest' f32 matmul at POTRF-like shapes.

The blanket split path regressed full POTRF (19.2 -> 15.7 TF at n=16384),
so gate design needs per-shape data: for each (m, k, n) measure both paths
and print effective TF/s.  Shapes mirror the factorization's gemm mix:
deep outer-panel updates (k multiples of 4096), strip-interior updates
(k <= 2048), and small base-block products.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dlaf_tpu.ops.splitmm import dot_f32x6
from dlaf_tpu.utils.timing import slope_time


def main():
    shapes = [
        (12288, 4096, 4096),   # outer panel, deep
        (12288, 8192, 4096),
        (8192, 2048, 2048),    # strip halves
        (12288, 2048, 2048),
        (8192, 1024, 1024),
        (4096, 512, 512),
        (2048, 256, 256),      # base-ish
        (8192, 8192, 8192),    # square reference point
    ]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
        nat = jax.jit(lambda x, y: jnp.matmul(x, y, precision="highest"))
        spl = jax.jit(dot_f32x6)
        fl = 2 * m * k * n
        tn = slope_time(nat, a, b, k_lo=1, k_hi=9, reps=2)
        ts = slope_time(spl, a, b, k_lo=1, k_hi=9, reps=2)
        print(f"m={m:6d} k={k:5d} n={n:5d}: native {fl/tn/1e12:6.1f} TF  "
              f"split {fl/ts/1e12:6.1f} TF", flush=True)


if __name__ == "__main__":
    main()
