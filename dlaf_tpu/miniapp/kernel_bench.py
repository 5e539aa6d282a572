"""Kernel-level micro-benchmarks.

Equivalent of the reference's ``miniapp/kernel/`` executables
(``miniapp_laset``, ``miniapp_larft_gemv``): time individual tile kernels in
isolation — laset/lacpy (VPU), gemm (MXU at the tuned precision), the
compact-WY T factor, and the Pallas triangle herk.

Usage: ``python -m dlaf_tpu.miniapp.kernel_bench [--kernel all] [-n 4096]``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import util as mu
from ..ops import tile
from ..utils.timing import slope_time
from . import options as opt


def main(argv=None):
    p = opt.make_parser("kernel", m_default=4096, nb_default=128)
    p.add_argument("--kernel", default="all",
                   choices=["all", "laset", "gemm", "tfactor", "herk"])
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    n, nb = args.matrix_size, args.block_size
    bpe = np.dtype(dtype).itemsize

    def bench(name, fn, *xs, flops=0, nbytes=0):
        f = jax.jit(fn)
        t = slope_time(f, *xs, k_hi=5)
        extra = []
        if flops:
            extra.append(f"{flops / t / 1e9:.1f} GF/s")
        if nbytes:
            extra.append(f"{nbytes / t / 1e9:.1f} GB/s")
        print(f"{name}: {t * 1e6:.1f} us  {'  '.join(extra)}")

    x = jnp.asarray(mu.random(n, n, dtype, 1))
    v = jnp.asarray(mu.random(n, nb, dtype, 2))

    if args.kernel in ("all", "laset"):
        bench("laset", lambda: tile.laset((n, n), 0.0, 1.0, dtype),
              nbytes=n * n * bpe)
        bench("lacpy L", lambda a: tile.lacpy(a, "L"), x,
              nbytes=2 * n * n * bpe)
    if args.kernel in ("all", "gemm"):
        bench(f"gemm {n}x{n}x{n}", lambda a: tile.dot(a, a), x,
              flops=2 * n ** 3)
    if args.kernel in ("all", "tfactor"):
        from ..algorithms.eigensolver.reduction_to_band import t_factor
        taus = jnp.asarray(mu.random(nb, 1, dtype, 3))[:, 0]
        bench(f"t_factor {n}x{nb}", t_factor, v, taus,
              flops=2 * n * nb * nb)
    if args.kernel in ("all", "herk") and dtype == np.float32 and \
            n % 512 == 0:
        from ..ops.pallas.herk import herk_lower_pallas
        bench(f"pallas herk {n}x{nb if nb % 1024 == 0 else 1024}",
              herk_lower_pallas, x,
              jnp.asarray(mu.random(n, 1024, dtype, 4)),
              flops=n * (n + 512) * 1024)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
