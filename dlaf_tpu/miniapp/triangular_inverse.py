"""miniapp_triangular_inverse equivalent
(``miniapp/miniapp_triangular_inverse.cpp``; flop model n^3/3 at ``:135-136``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import util as mu
from ..matrix.matrix import DistMatrix
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    args = opt.parse_with_tune(opt.make_parser("triangular_inverse"), argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    from .. import cholesky_factorization, triangular_inverse

    def make_input():
        a = mu.random_hermitian_positive_definite(n, dtype, seed=7)
        mat = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        f = jax.block_until_ready(cholesky_factorization(mat, "L"))
        lf = np.tril(np.asarray(f.to_natural()))
        return {"l": lf, "f": f}

    @jax.jit
    def alg(f):
        return triangular_inverse("L", "N", f)

    def check(state, result):
        x = np.tril(np.asarray(result.to_natural()))
        return float(np.abs(x @ state["l"] - np.eye(n)).max())

    return run("triangular_inverse", args, make_input,
               lambda s: alg(s["f"]),
               lambda a_, dt: total_ops(dt, n ** 3 / 3, n ** 3 / 3),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
