"""miniapp_triangular_multiplication equivalent
(``miniapp/miniapp_triangular_multiplication.cpp``; flop model ``:143-144``).
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
    p = opt.make_parser("triangular_multiplication")
    p.add_argument("--nrhs", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size
    w = args.nrhs or n

    from .. import triangular_multiplication

    def make_input():
        a = mu.random_lower_triangular(n, dtype, seed=5)
        b = mu.random(n, w, dtype, seed=6)
        ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
        return {"a": a, "b": b, "ma": ma, "mb": mb}

    @jax.jit
    def alg(ma, mb):
        return triangular_multiplication("L", "L", "N", "N", 1.0, ma, mb)

    def check(state, result):
        x = np.asarray(result.to_natural())
        want = np.tril(state["a"]) @ state["b"]
        return float(np.linalg.norm(x - want) /
                     max(np.linalg.norm(want), 1e-30))

    return run("triangular_multiplication", args, make_input,
               lambda s: alg(s["ma"], s["mb"]),
               lambda a_, dt: total_ops(dt, n * n * w / 2, n * n * w / 2),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
