"""miniapp_tridiag_solver equivalent
(``miniapp/miniapp_tridiag_solver.cpp``)."""

from __future__ import annotations

import jax
import numpy as np

from ..algorithms.eigensolver.tridiag_solver import tridiagonal_eigensolver
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    p = opt.make_parser("tridiag_solver", m_default=2048)
    args = opt.parse_with_tune(p, argv)
    if args.type in ("c", "z"):
        raise SystemExit("tridiag_solver is real-typed (like the reference's "
                         "tridiagonal stage)")
    dtype = opt.dtype_of(args)
    n = args.matrix_size

    def make_input():
        rng = np.random.default_rng(14)
        return {"d": rng.uniform(-1, 1, n).astype(dtype),
                "e": rng.uniform(-1, 1, max(n - 1, 0)).astype(dtype)}

    def alg(d, e):
        return tridiagonal_eigensolver(d, e)

    def check(state, result):
        lam, q = map(np.asarray, result)
        t = np.diag(state["d"]) + np.diag(state["e"], 1) + \
            np.diag(state["e"], -1)
        return float(np.abs(t @ q - q * lam[None, :]).max())

    # D&C flop model ~ 4/3 n^3 for the eigenvector gemms
    return run("tridiag_solver", args, make_input,
               lambda s: alg(s["d"], s["e"]),
               lambda a_, dt: total_ops(dt, 4 * n ** 3 / 3, 0),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
