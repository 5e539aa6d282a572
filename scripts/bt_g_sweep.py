#!/usr/bin/env python
"""BT-B2T window-scan group-size sweep (verdict r3 item 7)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dlaf_tpu.algorithms.eigensolver import bt_hh
from dlaf_tpu.utils.timing import slope_time


def main():
    n, b = (int(_sys.argv[1]) if len(_sys.argv) > 1 else 16384), 128
    dt = jnp.float32
    rng = np.random.default_rng(0)
    for g in (64, 128, 192, 256):
        widx, r0 = bt_hh.bt_hh_window_schedule(n, b, g)
        R = int(widx.max()) + 1
        stream = jnp.asarray(rng.standard_normal((R, b)) * 0.1, dt)
        hw = b + g - 1
        pad = max(0, int(r0.max()) + hw - n)
        E = jnp.asarray(rng.standard_normal((n + pad, n)), dt)
        widx_j, r0_j = jnp.asarray(widx), jnp.asarray(r0)
        f = jax.jit(lambda E, s, w=widx_j, r=r0_j, g=g:
                    bt_hh._bt_hh_scan(E, s, w, r, b=b, g=g))
        t = slope_time(f, E, stream, k_hi=3, reps=2)
        gf = 2.0 * n * n * n / t / 1e9     # bt_b2t m^2 n model (m = n)
        print(f"g={g}: {t:.3f}s  {len(r0)} windows  "
              f"{t/len(r0)*1e3:.3f} ms/window  {gf:.0f} GF/s model",
              flush=True)


if __name__ == "__main__":
    main()
