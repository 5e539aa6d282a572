#!/usr/bin/env python
"""Validate a POTRF config: device-side residual + high-rep slope timing.

Usage: python scripts/potrf_validate.py [n] [panel:base]

Checks ||tril(L) tril(L)^H - A||_F / ||A||_F on device (no host transfer of
the matrices) at a mid size, then slope-times the target size with k_hi=9
for a tighter rate estimate than the sweep's k_hi=3.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dlaf_tpu import total_ops
    from dlaf_tpu.algorithms.factorization.recursive import lpotrf_lower
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.utils.timing import slope_time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    panel, base = (int(v) for v in (sys.argv[2] if len(sys.argv) > 2
                                    else "512:128").split(":"))

    # correctness at a size small enough to afford the residual matmul
    nv = 8192
    av = mu.random_hermitian_positive_definite_device(nv, jnp.float32, seed=3)

    @jax.jit
    def resid(a):
        l = jnp.tril(lpotrf_lower(a, panel, base))
        r = jnp.linalg.norm(l @ l.T - a) / jnp.linalg.norm(a)
        return r

    r = float(resid(av))
    print(f"n={nv} panel={panel} base={base}: residual {r:.3e}", flush=True)
    assert r < 1e-5 * nv ** 0.5, r
    del av

    ad = mu.random_hermitian_positive_definite_device(n, jnp.float32, seed=0)
    flops = total_ops(np.float32, n ** 3 / 6, n ** 3 / 6)
    fn = jax.jit(lambda x: lpotrf_lower(x, panel, base))
    t = slope_time(fn, ad, k_lo=1, k_hi=9, reps=3)
    print(f"n={n} panel={panel} base={base}: {flops / t / 1e9:.0f} GF/s "
          f"({t:.3f}s/run, k_hi=9)", flush=True)


if __name__ == "__main__":
    main()
