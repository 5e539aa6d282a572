"""miniapp_gen_to_std equivalent (``miniapp/miniapp_gen_to_std.cpp``).

GFlop/s model: ``total_ops<T>(n^3/2, n^3/2) / t`` (``:150-151``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg as sla

from ..matrix import util as mu
from ..matrix.matrix import DistMatrix
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    args = opt.parse_with_tune(opt.make_parser("gen_to_std"), argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    from .. import cholesky_factorization, generalized_to_standard

    def make_input():
        a = mu.random_hermitian_positive_definite(n, dtype, seed=1)
        b = mu.random_hermitian_positive_definite(n, dtype, seed=2)
        ma = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        mb = DistMatrix.from_natural(jnp.asarray(b), nb, grid)
        fb = jax.block_until_ready(cholesky_factorization(mb, "L"))
        return {"a": a, "b": b, "ma": ma, "fb": fb}

    @jax.jit
    def alg(ma, fb):
        return generalized_to_standard("L", ma, fb)

    def check(state, result):
        out = np.asarray(result.to_natural())
        std = np.tril(out) + np.tril(out, -1).conj().T
        f = sla.cholesky(state["b"], lower=True)
        want = sla.solve_triangular(f, state["a"], lower=True)
        want = sla.solve_triangular(f, want.conj().T, lower=True).conj().T
        return float(np.linalg.norm(std - want) /
                     max(np.linalg.norm(want), 1e-30))

    return run("gen_to_std", args, make_input,
               lambda s: alg(s["ma"], s["fb"]),
               lambda a_, dt: total_ops(dt, n ** 3 / 2, n ** 3 / 2),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
