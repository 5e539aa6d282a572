"""miniapp_eigensolver equivalent (``miniapp/miniapp_eigensolver.cpp``).

Reports end-to-end wall time (the reference prints no single flop count for
HEEV; stage flop models live in the per-stage miniapps) plus an aggregate
GFlop/s using the classic ``4/3 n^3`` tridiagonalization + ``2 n^3``
back-transform model for context.
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
    p = opt.make_parser("eigensolver", m_default=2048, nb_default=256)
    p.add_argument("--band-size", type=int, default=None)
    p.add_argument("--percent-evals", type=float, default=100.0)
    p.add_argument("--input-file", default=None,
                   help="matrix snapshot (.npz) to solve instead of a "
                        "random one (reference --input-file, HDF5 there)")
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size

    if args.input_file:
        from ..matrix.io import load_matrix
        loaded = load_matrix(args.input_file, block_size=nb, grid=grid)
        n = loaded.size[0]
        args.matrix_size = n
    n_ev = max(0, min(n, int(round(n * args.percent_evals / 100.0))))

    from .. import hermitian_eigensolver

    def make_input():
        if args.input_file:
            return {"a": np.asarray(loaded.to_natural()), "mat": loaded}
        a = mu.random_hermitian(n, dtype, seed=9)
        return {"a": a,
                "mat": DistMatrix.from_natural(jnp.asarray(a), nb, grid)}

    def alg(mat):
        # not one jit: the band->tridiag stage is a host kernel, exactly as
        # the reference runs its CPU-only stage inside the timed region
        return hermitian_eigensolver(
            mat, "L", band_size=args.band_size,
            eigenvalues_index_end=None if n_ev == n else n_ev)

    def check(state, result):
        lam, v = result
        lam = np.asarray(lam)
        vn = np.asarray(v.to_natural())
        a = state["a"]
        r = np.linalg.norm(a @ vn - vn * lam[None, :])
        return float(r / max(np.linalg.norm(a), 1e-30))

    flops = total_ops(dtype, 4 * n ** 3 / 3 + 2 * n ** 3,
                      4 * n ** 3 / 3 + 2 * n ** 3)
    return run("eigensolver", args, make_input,
               lambda s: alg(s["mat"]), lambda a_, dt: flops, check)


if __name__ == "__main__":
    raise SystemExit(main())
