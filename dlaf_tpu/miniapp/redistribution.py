"""miniapp_redistribution equivalent
(``miniapp/miniapp_redistribution.cpp``): re-block a distributed matrix to a
different block size, report GB/s moved."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import util as mu
from ..matrix.copy import redistribute
from ..matrix.matrix import DistMatrix
from . import options as opt
from ..utils.timing import slope_time


def main(argv=None):
    p = opt.make_parser("redistribution", m_default=4096, nb_default=256)
    p.add_argument("--block-size-out", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size
    nb_out = args.block_size_out or max(nb // 2, 1)

    a = mu.random(n, n, dtype, 19)
    mat = DistMatrix.from_natural(jnp.asarray(a), nb, grid)

    @jax.jit
    def alg(m):
        return redistribute(m, nb_out, grid, keep_grid=True)

    nbytes = n * n * np.dtype(dtype).itemsize
    for r in range(args.nruns):
        secs = slope_time(alg, mat, k_lo=1, k_hi=5)
        print(f"[{r}] {secs:.6f}s {nbytes / secs / 1e9:.2f} GB/s "
              f"({nb} -> {nb_out})")
    if args.check != "none":
        out = np.asarray(alg(mat).to_natural())
        resid = np.abs(out - a).max()
        print(f"check: residual {resid:.3e} "
              f"[{'PASSED' if resid == 0 else 'CHECK'}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
