#!/usr/bin/env python
"""POTRF accuracy/rate vs matmul precision (highest = bf16x9 ~31 TF,
high = bf16x6 ~63 TF on this chip).  If the factorization residual at
"high" matches "highest", the cheaper arithmetic is the honest default.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dlaf_tpu import total_ops
    from dlaf_tpu.algorithms.factorization.recursive import lpotrf_lower
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.tune import set_tune_parameters
    from dlaf_tpu.utils.timing import slope_time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    a = mu.random_hermitian_positive_definite(n, np.float32, seed=0)
    ad = jnp.asarray(a)
    flops = total_ops(np.float32, n ** 3 / 6, n ** 3 / 6)

    for prec in ("highest", "high"):
        set_tune_parameters(matmul_precision=prec)
        fn = jax.jit(lambda x, p=prec: lpotrf_lower(x))
        t0 = time.time()
        l1 = fn(ad)
        l1h = np.tril(np.asarray(l1))
        tc = time.time() - t0
        resid = np.linalg.norm(l1h @ l1h.T - a) / np.linalg.norm(a)
        t = slope_time(fn, ad, k_lo=1, k_hi=3, reps=2)
        print(f"prec={prec}: {flops / t / 1e9:.0f} GF/s  resid {resid:.3e}"
              f"  (first-call {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
