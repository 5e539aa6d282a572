"""miniapp_reduction_to_band equivalent
(``miniapp/miniapp_reduction_to_band.cpp``; flop model ``2/3 n^3 - n^2 b``
at ``:171-172``)."""

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
    p = opt.make_parser("reduction_to_band", m_default=2048, nb_default=256)
    p.add_argument("--band-size", type=int, default=None)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size
    band = args.band_size or nb

    from .. import reduction_to_band

    def make_input():
        a = mu.random_hermitian(n, dtype, seed=12)
        return {"a": a,
                "mat": DistMatrix.from_natural(jnp.asarray(a), nb, grid)}

    @jax.jit
    def alg(mat):
        return reduction_to_band(mat, band)

    def check(state, result):
        out_m, _ = result
        out = np.asarray(out_m.to_natural())
        bandm = np.zeros_like(out)
        for i in range(-min(band, n - 1), min(band, n - 1) + 1):
            bandm += np.diagflat(np.diagonal(out, i), i)
        got = np.linalg.eigvalsh(bandm)
        want = np.linalg.eigvalsh(state["a"])
        return float(np.abs(got - want).max() /
                     max(np.abs(want).max(), 1e-30))

    flops = total_ops(dtype, 2 * n ** 3 / 3 - n * n * band,
                      2 * n ** 3 / 3 - n * n * band)
    return run("reduction_to_band", args, make_input,
               lambda s: alg(s["mat"]), lambda a_, dt: flops, check)


if __name__ == "__main__":
    raise SystemExit(main())
