"""miniapp_gen_eigensolver equivalent
(``miniapp/miniapp_gen_eigensolver.cpp``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..matrix import util as mu
from ..matrix.matrix import DistMatrix
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    p = opt.make_parser("gen_eigensolver", m_default=2048, nb_default=256)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    from .. import hermitian_generalized_eigensolver

    def make_input():
        a = mu.random_hermitian(n, dtype, seed=10)
        b = mu.random_hermitian_positive_definite(n, dtype, seed=11)
        return {"a": a, "b": b,
                "ma": DistMatrix.from_natural(jnp.asarray(a), nb, grid),
                "mb": DistMatrix.from_natural(jnp.asarray(b), nb, grid)}

    def alg(ma, mb):
        return hermitian_generalized_eigensolver(ma, mb, "L")

    def check(state, result):
        lam, v = result
        lam = np.asarray(lam)
        vn = np.asarray(v.to_natural())
        a, b = state["a"], state["b"]
        r = np.linalg.norm(a @ vn - (b @ vn) * lam[None, :])
        return float(r / max(np.linalg.norm(a), 1e-30))

    flops = total_ops(dtype, 13 * n ** 3 / 3, 13 * n ** 3 / 3)
    return run("gen_eigensolver", args, make_input,
               lambda s: alg(s["ma"], s["mb"]), lambda a_, dt: flops, check)


if __name__ == "__main__":
    raise SystemExit(main())
