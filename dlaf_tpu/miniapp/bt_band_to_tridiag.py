"""miniapp_bt_band_to_tridiag equivalent
(``miniapp/miniapp_bt_band_to_tridiag.cpp``; flop model ``m^2 n`` at
``:176-177``)."""

from __future__ import annotations

import jax
import numpy as np

from ..algorithms.eigensolver.band_to_tridiag import band_to_tridiagonal
from ..algorithms.eigensolver.bt_band_to_tridiag import (
    bt_band_to_tridiagonal)
from ..algorithms.eigensolver.bt_hh import bt_hh_apply
from ..algorithms.eigensolver.hh_chase import hh_band_to_tridiagonal
from ..matrix import util as mu
from ..tune import get_tune_parameters
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    p = opt.make_parser("bt_band_to_tridiag", m_default=1024, nb_default=32)
    p.add_argument("--band-size", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    n = args.matrix_size
    band = args.band_size or args.block_size

    use_hh = get_tune_parameters().band_to_tridiag_algo != "givens"

    def make_input():
        a = mu.random_hermitian(n, dtype, seed=15)
        ab = np.zeros((band + 1, n), dtype)
        for i in range(band + 1):
            ab[i, : n - i] = np.diagonal(a, -i)
        res = (hh_band_to_tridiagonal(ab, band) if use_hh
               else band_to_tridiagonal(ab, band))
        e = mu.random(n, n, dtype, 16)
        return {"res": res, "e": e}

    def alg(res, e):
        if use_hh:
            return bt_hh_apply(res, e)
        return bt_band_to_tridiagonal(res, e)

    return run("bt_band_to_tridiag", args, make_input,
               lambda s: alg(s["res"], s["e"]),
               lambda a_, dt: total_ops(dt, n ** 2 * n, 0),
               None)


if __name__ == "__main__":
    raise SystemExit(main())
