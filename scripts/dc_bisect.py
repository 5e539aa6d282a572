#!/usr/bin/env python
"""Bisect the TPU worker crash in tridiagonal D&C at n >= 16384.

Runs one construct of the solver at the target size, selected by
DC_MODE, so the crashing construct can be pinpointed on the shared
TPU without re-running the whole eigensolver:

  DC_MODE=eigh     batched leaf eigh [n/64, 64, 64] + placement loop
  DC_MODE=rot      deflation-rotation scan on a [n, n] Q
  DC_MODE=secular  chunked secular solve at m = n
  DC_MODE=gemm     streamed U gemm chunks at m = n
  DC_MODE=merge    one full _merge at m = n
  DC_MODE=full     tridiagonal_eigensolver(d, e)  (default)

Usage: DC_MODE=rot python scripts/dc_bisect.py [n]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dlaf_tpu.algorithms.eigensolver import tridiag_solver as ts

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    mode = os.environ.get("DC_MODE", "full")
    dt = jnp.float32
    eps = jnp.asarray(np.finfo(np.float32).eps, dt)

    key = jax.random.PRNGKey(0)
    kd, ke = jax.random.split(key)
    d = jax.random.uniform(kd, (n,), dt, -1.0, 1.0)
    e = jax.random.uniform(ke, (n - 1,), dt, 0.1, 1.0)

    def sync(x):
        return jnp.asarray(x).ravel()[0].item()

    t0 = time.time()
    print(f"mode={mode} n={n}", flush=True)

    if mode == "full":
        lam, q = ts.tridiagonal_eigensolver(d, e, leaf_size=64)
        sync(lam), sync(q)
    elif mode == "eigh":
        @jax.jit
        def f(d, e):
            ls = 64
            starts = jnp.arange(0, n, ls, dtype=jnp.int32)
            idx = starts[:, None] + jnp.arange(ls)[None, :]
            dcb = jnp.take(d, idx)
            eb = jnp.take(e, jnp.minimum(idx[:, :-1], n - 2))
            blocks = jax.vmap(lambda d_, e_: jnp.diag(d_) + jnp.diag(e_, 1)
                              + jnp.diag(e_, -1))(dcb, eb)
            w, v = jnp.linalg.eigh(blocks)
            lam = jnp.zeros((n,), dt)
            Q = jnp.zeros((n, n), dt)

            def place(t, st):
                lam, Q = st
                i0 = starts[t]
                lam = jax.lax.dynamic_update_slice(lam, w[t], (i0,))
                Q = jax.lax.dynamic_update_slice(Q, v[t], (i0, i0))
                return lam, Q
            return jax.lax.fori_loop(0, starts.shape[0], place, (lam, Q))
        lam, q = f(d, e)
        sync(lam), sync(q)
    elif mode == "rot":
        @jax.jit
        def f(d):
            Q = jnp.eye(n, dtype=dt)
            li = jnp.arange(n, dtype=jnp.int32)
            jj = (li + 1) % n
            c = jnp.full((n,), 0.8, dt)
            s = jnp.full((n,), 0.6, dt)
            return ts._apply_rotations(Q, li, jj, c, s)
        sync(f(d))
    elif mode == "secular":
        @jax.jit
        def f(d):
            Da = jnp.sort(d)
            za = jnp.full((n,), 1.0 / np.sqrt(n), dt)
            mc = 2048
            nchunks = -(-n // mc)
            jidx = jnp.arange(n)

            def sec_chunk(i, acc):
                origin, mu = acc
                c0 = jnp.minimum(i * mc, n - mc)
                jblk = c0 + jidx[:mc]
                ob, mb = ts._secular_block(Da, za * za, jnp.asarray(0.5, dt),
                                           n, jblk, dt)
                return (jax.lax.dynamic_update_slice(origin, ob, (c0,)),
                        jax.lax.dynamic_update_slice(mu, mb, (c0,)))
            return jax.lax.fori_loop(0, nchunks, sec_chunk,
                                     (jnp.zeros((n,), dt),
                                      jnp.zeros((n,), dt)))
        o, m = f(d)
        sync(o), sync(m)
    elif mode == "gemm":
        @jax.jit
        def f(d):
            Q = jnp.eye(n, dtype=dt)
            mc = min(2048, n)
            nchunks = -(-n // mc)
            jidx = jnp.arange(n)
            Qn = jnp.zeros((n, n), dt)

            def gemm_chunk(i, Qn):
                c0 = jnp.minimum(i * mc, n - mc)
                Uc = jnp.ones((n, mc), dt) * (1.0 / n)
                blk = Q @ Uc
                return jax.lax.dynamic_update_slice(Qn, blk, (0, c0))
            return jax.lax.fori_loop(0, nchunks, gemm_chunk, Qn)
        sync(f(d))
    elif mode == "merge":
        @jax.jit
        def f(d):
            D = jnp.concatenate([jnp.sort(d[: n // 2]),
                                 jnp.sort(d[n // 2:])])
            Q = jnp.eye(n, dtype=dt)
            z = jnp.full((n,), 1.0 / np.sqrt(n), dt)
            return ts._merge(D, Q, z, jnp.asarray(0.5, dt), eps)
        lam, q = f(d)
        sync(lam), sync(q)
    else:
        raise SystemExit(f"unknown DC_MODE {mode}")

    print(f"OK {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
