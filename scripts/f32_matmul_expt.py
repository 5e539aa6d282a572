#!/usr/bin/env python
"""Measure f32-equivalent matmul rates by contraction depth and algorithm.

Compares, at m = n = 4096 over k in {512..8192}:
  * XLA precision='highest' (the r1 roofline path)
  * DotAlgorithmPreset.BF16_BF16_F32_X6
  * manual split-6 (ops/splitmm.dot_f32x6)
  * precision='high' (x3) for context
Prints GF/s (2 m n k flop model) + max rel error vs a float64 host
reference on a 512^3 probe.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dlaf_tpu.ops.splitmm import dot_f32x6
    from dlaf_tpu.utils.timing import slope_time

    rng = np.random.default_rng(0)
    # accuracy probe on 512^3
    ah = rng.standard_normal((512, 512)).astype(np.float32)
    bh = rng.standard_normal((512, 512)).astype(np.float32)
    ref = ah.astype(np.float64) @ bh.astype(np.float64)

    algos = {
        "highest": lambda x, y: jnp.matmul(x, y, precision="highest"),
        "x6_preset": lambda x, y: lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            precision=lax.DotAlgorithmPreset.BF16_BF16_F32_X6),
        "split6": dot_f32x6,
        "high_x3": lambda x, y: jnp.matmul(x, y, precision="high"),
    }
    for name, f in algos.items():
        out = np.asarray(jax.jit(f)(jnp.asarray(ah), jnp.asarray(bh)))
        err = np.abs(out - ref).max() / np.abs(ref).max()
        print(f"{name}: max rel err {err:.3e}", flush=True)

    m = 4096
    for k in (512, 1024, 2048, 4096, 8192):
        a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((k, m)).astype(np.float32))
        for name, f in algos.items():
            fn = jax.jit(lambda x, fn_=f, b_=b: fn_(x, b_) * 1e-3)
            try:
                t = slope_time(fn, a, k_lo=1, k_hi=9, reps=2)
            except Exception as exc:                     # noqa: BLE001
                print(f"k={k} {name}: FAILED {type(exc).__name__}",
                      flush=True)
                continue
            print(f"k={k} {name}: {2 * m * m * k / t / 1e9:.0f} GF/s",
                  flush=True)


if __name__ == "__main__":
    main()
