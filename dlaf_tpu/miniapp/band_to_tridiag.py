"""miniapp_band_to_tridiag equivalent
(``miniapp/miniapp_band_to_tridiag.cpp``; flop model ``3 n^2 b`` at
``:140-141``).  Host chase (the reference is CPU-only here too)."""

from __future__ import annotations

import numpy as np

from ..algorithms.eigensolver.band_to_tridiag import band_to_tridiagonal
from ..algorithms.eigensolver.hh_chase import hh_band_to_tridiagonal
from ..matrix import util as mu
from ..tune import get_tune_parameters
from ..types import total_ops
from . import options as opt
from .runner import run


def main(argv=None):
    p = opt.make_parser("band_to_tridiag", m_default=2048, nb_default=64)
    p.add_argument("--band-size", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    n = args.matrix_size
    band = args.band_size or args.block_size

    def make_input():
        a = mu.random_hermitian(n, dtype, seed=13)
        ab = np.zeros((band + 1, n), dtype)
        for i in range(band + 1):
            ab[i, : n - i] = np.diagonal(a, -i)
        return {"ab": ab}

    def alg(ab):
        algo = get_tune_parameters().band_to_tridiag_algo
        if algo == "wavefront" and not np.iscomplexobj(ab):
            from ..algorithms.eigensolver.wavefront_chase import (
                wavefront_band_to_tridiagonal)
            return wavefront_band_to_tridiagonal(ab, band)
        if algo != "givens":
            return hh_band_to_tridiagonal(ab.copy(), band)
        return band_to_tridiagonal(ab.copy(), band)

    def check(state, result):
        t = np.diag(result.d) + np.diag(result.e, 1) + np.diag(result.e, -1)
        full = np.zeros((n, n), dtype)
        ab = state["ab"]
        for i in range(band + 1):
            full += np.diagflat(ab[i, : n - i], -i)
            if i:
                full += np.diagflat(ab[i, : n - i].conj(), i)
        got = np.linalg.eigvalsh(t)
        want = np.linalg.eigvalsh(full)
        return float(np.abs(got - want).max() / max(np.abs(want).max(), 1))

    return run("band_to_tridiag", args, make_input,
               lambda s: alg(s["ab"]),
               lambda a_, dt: total_ops(dt, 3 * n * n * band, 0),
               check)


if __name__ == "__main__":
    raise SystemExit(main())
