"""miniapp_bt_reduction_to_band equivalent
(``miniapp/miniapp_bt_reduction_to_band.cpp``; flop model ``(m-b)^2 n`` at
``:198-199``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.eigensolver.bt_reduction_to_band import (
    bt_reduction_to_band)
from ..algorithms.eigensolver.reduction_to_band import reduction_to_band
from ..matrix import util as mu
from ..matrix.matrix import DistMatrix
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    p = opt.make_parser("bt_reduction_to_band", m_default=2048,
                        nb_default=256)
    p.add_argument("--band-size", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size
    band = args.band_size or nb

    def make_input():
        a = mu.random_hermitian(n, dtype, seed=17)
        mat = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
        mat_hh, taus = jax.block_until_ready(reduction_to_band(mat, band))
        e = DistMatrix.from_natural(
            jnp.asarray(mu.random(n, n, dtype, 18)), nb, grid)
        return {"hh": mat_hh, "taus": taus, "e": e}

    @jax.jit
    def alg(e, hh, taus):
        return bt_reduction_to_band(band, e, hh, taus)

    return run("bt_reduction_to_band", args, make_input,
               lambda s: alg(s["e"], s["hh"], s["taus"]),
               lambda a_, dt: total_ops(dt, (n - band) ** 2 * n, 0),
               None)


if __name__ == "__main__":
    raise SystemExit(main())
