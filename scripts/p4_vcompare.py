#!/usr/bin/env python
"""Compare the v4 chase's resolved reflector stream against the XLA
wavefront's on the SAME input — isolates hw ys-emission bugs that the
interpret-mode tests cannot see.  Usage: python scripts/p4_vcompare.py [n]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.pallas_chase_v4 import (
        pallas_band_to_tridiagonal_v4)
    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        wavefront_band_to_tridiagonal)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(os.environ.get("PALLAS_BAND", "128"))
    rng = np.random.default_rng(0)
    ab = rng.standard_normal((b + 1, n)).astype(np.float32)
    abd = jnp.asarray(ab)
    rw = wavefront_band_to_tridiagonal(abd, b)
    rp = pallas_band_to_tridiagonal_v4(abd, b)
    d_err = np.abs(np.asarray(rw.d) - np.asarray(rp.d)).max()
    e_err = np.abs(np.asarray(rw.e) - np.asarray(rp.e)).max()
    Vw = np.asarray(rw.resolve_V())
    Vp = np.asarray(rp.resolve_V())
    print(f"n={n} b={b}: d err {d_err:.3e}  e err {e_err:.3e}  "
          f"V shapes {Vw.shape} {Vp.shape}", flush=True)
    dv = np.abs(Vw - Vp)
    print(f"V err max {dv.max():.3e} mean {dv.mean():.3e} "
          f"nbad(>1e-3) {(dv > 1e-3).sum()} / {dv.size}")
    if dv.max() > 1e-3:
        bad = np.argwhere(dv > 1e-3)
        print("first bad rows (row=sweep-major index, col):")
        print(bad[:20])
        r0 = bad[0][0]
        print("wavefront row:", Vw[r0][:10])
        print("pallas4  row:", Vp[r0][:10])


if __name__ == "__main__":
    main()
