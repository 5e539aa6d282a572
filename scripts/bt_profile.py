#!/usr/bin/env python
"""Attribute the bt_hh window-scan cost at n=8192, b=128, g=128.

Times the real _bt_hh_scan (slope), then variants with pieces knocked
out, to find the per-window overhead (gemms are ~0.1 s of model time;
warm stage walltimes vary 4-8 s run to run, so only slope numbers count).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dlaf_tpu.algorithms.eigensolver import bt_hh
from dlaf_tpu.ops import tile
from dlaf_tpu.utils.timing import slope_time


def main():
    n, b, g = 8192, 128, 128
    dt = jnp.float32
    widx, r0 = bt_hh.bt_hh_window_schedule(n, b, g)
    print(f"windows: {len(r0)}")
    rng = np.random.default_rng(0)
    R = int(widx.max()) + 1
    stream = jnp.asarray(rng.standard_normal((R, b)) * 0.1, dt)
    hw = b + g - 1
    pad = max(0, int(r0.max()) + hw - n)
    E = jnp.asarray(rng.standard_normal((n + pad, n)), dt)
    widx_j = jnp.asarray(widx)
    r0_j = jnp.asarray(r0)

    f = jax.jit(lambda E, s: bt_hh._bt_hh_scan(E, s, widx_j, r0_j, b=b, g=g))
    t = slope_time(f, E, stream, k_hi=3, reps=2)
    print(f"full scan: {t:.3f}s  ({t / len(r0) * 1e3:.3f} ms/window)",
          flush=True)

    # variant: no triangular solve (Z = Y)
    def scan_nosolve(E, stream):
        nc = E.shape[1]
        streamw = jnp.take(stream, jnp.maximum(widx_j, 0).reshape(-1),
                           axis=0).reshape(widx_j.shape[0], g, b)

        def skew_right(P):
            Xp = jnp.concatenate([P, jnp.zeros((g, g), P.dtype)], axis=1)
            Y = Xp.reshape(-1)[: g * (hw + g - 1)].reshape(g, hw + g - 1)
            return Y[:, :hw]

        def body(E, xs):
            vrows, w_idx, row0 = xs
            keep = (w_idx >= 0) & (vrows[:, 0] != 0)
            vrows = vrows.at[:, 0].set(jnp.ones((), dt))
            vrows = jnp.where(keep[:, None], vrows, jnp.zeros((), dt))
            P = jnp.concatenate([vrows, jnp.zeros((g, hw - b), dt)], axis=1)
            V = skew_right(P).T
            zero = jnp.zeros((), row0.dtype)
            Ew = lax.dynamic_slice(E, (row0, zero), (hw, nc))
            Y = tile.dot(tile.adj(V), Ew)
            Ew = Ew - tile.dot(V, Y)
            E = lax.dynamic_update_slice(E, Ew, (row0, zero))
            return E, None

        E, _ = lax.scan(body, E, (streamw, widx_j, r0_j))
        return E

    f2 = jax.jit(scan_nosolve)
    t2 = slope_time(f2, E, stream, k_hi=3, reps=2)
    print(f"no-solve scan: {t2:.3f}s ({t2 / len(r0) * 1e3:.3f} ms/window)",
          flush=True)

    # variant: solve only (what does one [g,g] x [g,n] triangular_solve
    # cost, scanned Nw times on a carried matrix?)
    tinv = jnp.asarray(np.triu(rng.standard_normal((g, g))) +
                       5 * np.eye(g), dt)

    def scan_solveonly(Y0):
        def body(Y, _):
            Z = lax.linalg.triangular_solve(tinv, Y[:g], left_side=True,
                                            lower=False)
            Y = lax.dynamic_update_slice(Y, Z, (0, 0))
            return Y, None
        Y, _ = lax.scan(body, Y0, None, length=len(r0))
        return Y

    f3 = jax.jit(scan_solveonly)
    t3 = slope_time(f3, E[:n], k_hi=3, reps=2)
    print(f"solve-only scan: {t3:.3f}s ({t3 / len(r0) * 1e3:.3f} ms/window)",
          flush=True)


if __name__ == "__main__":
    main()
