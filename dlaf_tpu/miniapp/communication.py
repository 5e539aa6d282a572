"""miniapp_communication equivalent (``miniapp/miniapp_communication.cpp``).

The reference benchmarks MPI bcast/p2p in isolation; here the primitives are
XLA collectives over the mesh: panel-shaped masked-psum broadcast (the
framework's bcast), all-reduce, and a ppermute ring shift.  Reports GB/s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from ..parallel.comm import make_comm
from ..utils.timing import slope_time
from . import options as opt


def main(argv=None):
    p = opt.make_parser("communication", m_default=4096, nb_default=256)
    args = opt.parse_with_tune(p, argv)
    dtype = opt.dtype_of(args)
    grid = opt.build_grid(args)
    n, nb = args.matrix_size, args.block_size
    if grid is None:
        raise SystemExit("communication miniapp needs --grid-rows/cols > 1")

    x = jax.device_put(jnp.ones((n, nb), dtype), grid.replicated())

    def bench(name, fn, nbytes):
        f = jax.jit(fn)
        secs = slope_time(f, x, k_lo=1, k_hi=5)
        gbs = nbytes / secs / 1e9
        print(f"{name}: {secs * 1e6:.1f} us  {gbs:.2f} GB/s")

    bpe = np.dtype(dtype).itemsize

    def allreduce(v):
        def k(vv):
            return lax.psum(vv, ("p", "q"))
        return jax.shard_map(k, mesh=grid.mesh, in_specs=P(),
                             out_specs=P())(v)

    def bcast(v):
        def k(vv):
            c = make_comm(grid)
            return c.bcast_from(vv, 0, 0)
        return jax.shard_map(k, mesh=grid.mesh, in_specs=P(),
                             out_specs=P())(v)

    def ring(v):
        def k(vv):
            np_ = grid.nrows * grid.ncols
            perm = [(i, (i + 1) % np_) for i in range(np_)]
            # flatten the 2D mesh into a ring over ('p','q')
            return lax.ppermute(vv, ("p", "q"), perm)
        return jax.shard_map(k, mesh=grid.mesh, in_specs=P(),
                             out_specs=P(), check_vma=False)(v)

    for _ in range(args.nruns):
        bench("all-reduce", allreduce, n * nb * bpe)
        bench("panel bcast (masked psum)", bcast, n * nb * bpe)
        bench("ppermute ring", ring, n * nb * bpe)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
