"""miniapp_cholesky equivalent (``miniapp/miniapp_cholesky.cpp``).

GFlop/s model: ``total_ops<T>(n^3/6, n^3/6) / t``
(``miniapp_cholesky.cpp:157-161``).
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
    args = opt.parse_with_tune(opt.make_parser("cholesky"), argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    def make_input():
        a = mu.random_hermitian_positive_definite(n, dtype, seed=0)
        return {"a": a,
                "mat": DistMatrix.from_natural(jnp.asarray(a), nb, grid)}

    from .. import cholesky_factorization

    @jax.jit
    def alg(mat):
        return cholesky_factorization(mat)

    def check(state, result):
        f = np.tril(np.asarray(result.to_natural()))
        a = state["a"]
        return float(np.linalg.norm(f @ f.conj().T - a) /
                     max(np.linalg.norm(a), 1e-30))

    return run("cholesky", args, make_input,
               lambda s: alg(s["mat"]),
               lambda a_, dt: total_ops(dt, n ** 3 / 6, n ** 3 / 6),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
