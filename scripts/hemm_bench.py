#!/usr/bin/env python
"""Triangle-aware HEMM vs dense-mirror HEMM (depth=0) at n=16384."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu import DistMatrix
    from dlaf_tpu.algorithms.multiplication.hermitian import (
        hermitian_multiplication)
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import set_tune_parameters
    from dlaf_tpu.utils.timing import slope_time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    set_tune_parameters(matmul_precision="highest")
    a = mu.random_hermitian_dist(n, 2048, dtype=np.float32, seed=1)
    b = mu.random_hermitian_dist(n, 2048, dtype=np.float32, seed=2)
    c = DistMatrix.zeros((n, n), (2048, 2048))

    for depth in (0, 2, 3):
        set_tune_parameters(herk_split_depth=depth)
        fn = lambda bm: hermitian_multiplication("L", "L", 1.0, a, bm,
                                                 0.0, c).data
        t = slope_time(fn, b, k_hi=3, reps=2)
        gf = 2 * n * n * n / t / 1e9       # hemm model flops (n^2 m mul+add)
        print(f"depth={depth}: {t:.3f}s  {gf:.0f} GF/s (hemm model)",
              flush=True)


if __name__ == "__main__":
    main()
