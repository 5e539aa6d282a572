#!/usr/bin/env python
"""Single-chip POTRF tuning sweep (panel/base) with slope timing.

Shape analysis (BASELINE.md): the 'highest'-precision gemm rate is ~31 TF
at contraction depth k >= 4096 and ~17-25 TF at k <= 2048; the in-panel
strip recursion spends ~1.5 * panel / n of the flops at shallow k, so a
smaller panel raises the blended ceiling as long as compile/overhead do
not bite.  Prints GFlop/s per config.
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
    from dlaf_tpu.utils.timing import slope_time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ad = mu.random_hermitian_positive_definite_device(n, jnp.float32, seed=0)
    flops = total_ops(np.float32, n ** 3 / 6, n ** 3 / 6)

    if len(sys.argv) > 2:       # explicit "panel:base" configs
        configs = [tuple(int(v) for v in c.split(":")) for c in sys.argv[2:]]
    else:
        configs = [(4096, 256), (2048, 256), (2048, 512), (8192, 256),
                   (4096, 512)]
    for panel, base in configs:
        fn = jax.jit(lambda x, p=panel, b=base: lpotrf_lower(x, p, b))
        t0 = time.time()
        fn(ad).block_until_ready()
        tc = time.time() - t0
        t = slope_time(fn, ad, k_lo=1, k_hi=3, reps=2)
        print(f"panel={panel} base={base}: {flops / t / 1e9:.0f} GF/s "
              f"({t:.2f}s/run, first-call {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
