"""miniapp_inverse_from_cholesky_factor equivalent
(``miniapp/miniapp_inverse_from_cholesky_factor.cpp``; flop model 2n^3/3 at
``:133-134``)."""

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
    args = opt.parse_with_tune(
        opt.make_parser("inverse_from_cholesky_factor"), argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    from .. import cholesky_factorization, inverse_from_cholesky_factor

    def make_input():
        a = mu.random_hermitian_positive_definite(n, dtype, seed=8)
        mat = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        f = jax.block_until_ready(cholesky_factorization(mat, "L"))
        return {"a": a, "f": f}

    @jax.jit
    def alg(f):
        return inverse_from_cholesky_factor("L", f)

    def check(state, result):
        x = np.asarray(result.to_natural())
        inv = np.tril(x) + np.tril(x, -1).conj().T
        resid = np.abs(inv @ state["a"] - np.eye(n)).max()
        return float(resid / np.linalg.cond(state["a"]))

    return run("inverse_from_cholesky_factor", args, make_input,
               lambda s: alg(s["f"]),
               lambda a_, dt: total_ops(dt, 2 * n ** 3 / 3, 2 * n ** 3 / 3),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
