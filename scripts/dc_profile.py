#!/usr/bin/env python
"""Profile the D&C merge's component costs on the TPU at n=8192 scale.

The full tridiagonal_eigensolver is one jit, so the 14 s warm time needs
attribution: this times (a) the Givens column-rotation scan, (b) one
secular chunk solve, (c) the deflation scan, (d) a U-chunk + gemm, each
standalone at top-merge size.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dlaf_tpu.algorithms.eigensolver import tridiag_solver as ts
from dlaf_tpu.utils.timing import slope_time


def main():
    m = 8192
    dt = jnp.float32
    rng = np.random.default_rng(0)
    Q = jnp.asarray(rng.standard_normal((m, m)), dt)
    D = jnp.asarray(np.sort(rng.standard_normal(m)), dt)
    z = jnp.asarray(rng.standard_normal(m) / np.sqrt(m), dt)
    li = jnp.asarray(rng.integers(0, m, m), jnp.int32)
    jj = jnp.asarray(rng.integers(0, m, m), jnp.int32)
    c = jnp.full((m,), 0.8, dt)
    s = jnp.full((m,), 0.6, dt)

    rot = jax.jit(lambda Q: ts._apply_rotations(Q, li, jj, c, s))
    t = slope_time(rot, Q, k_hi=3, reps=2)
    print(f"rotation scan ({m} rots on [{m},{m}]): {t:.3f}s", flush=True)

    eps = jnp.asarray(np.finfo(np.float32).eps, dt)
    defl = jax.jit(lambda D, z: ts._deflate_vectors(D, z, jnp.float32(1.0),
                                                    eps))
    t = slope_time(defl, D, z, k_hi=3, reps=2)
    print(f"deflation scan (m={m}): {t:.3f}s", flush=True)

    jblk = jnp.arange(2048, dtype=jnp.int32)
    sec = jax.jit(lambda D, z: ts._secular_block(
        D, z * z, jnp.float32(1.0), jnp.int32(m), jblk, jnp.float32))
    t = slope_time(sec, D, z, k_hi=3, reps=2)
    print(f"secular block (m={m}, mc=2048, 90 iters): {t:.3f}s", flush=True)

    merge = jax.jit(lambda D, Q, z: ts._merge(D, Q, z, jnp.float32(0.5),
                                              eps))
    t = slope_time(merge, D, Q, z, k_hi=3, reps=2)
    print(f"full merge (m={m}): {t:.3f}s", flush=True)


if __name__ == "__main__":
    main()
