"""Pallas triangle-aware HERK: ``C_lower -= X X^H`` touching only lower
tiles.

The MXU analogue of the reference's tiled herk loop
(``blas/tile.h: herk`` dispatched per lower tile by
``factorization/cholesky/impl.h:273-299``): the grid enumerates only the
lower-triangle tile pairs (packed 1D), so unlike a masked dense matmul no
flops are spent on the upper half, and unlike the recursive concat
formulation there is no re-assembly copy traffic — the kernel writes into
the donated C buffer.

f32 accumulation on the MXU via ``preferred_element_type``; used by the
single-device POTRF fast path when profitable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(i_tab, j_tab, x_i, x_j, c_in, c_out, acc):
    """Grid: (tri_tiles, k_steps).  Accumulate -x_i @ x_j^H into c."""
    kk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kk == 0)
    def _():
        acc[:] = c_in[:]

    acc[:] -= jax.lax.dot_general(
        x_i[:], x_j[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(acc.dtype)

    @pl.when(kk == nk - 1)
    def _():
        c_out[:] = acc[:]


@functools.partial(jax.jit,
                   static_argnames=("tile_m", "tile_k", "interpret"))
def herk_lower_pallas(c, x, *, tile_m: int = 512, tile_k: int = 1024,
                      interpret: bool = False):
    """Return ``c`` with ``c_lower -= x @ x^H``.

    LAPACK herk contract: only lower tiles (at tile_m granularity) of the
    result are specified; strictly-upper tiles may hold garbage (the donated
    buffer is not rewritten there).  ``c``: [m, m], ``x``: [m, k]; m
    divisible by tile_m, k by tile_k (callers pad).  Real f32; single-pass
    bf16 inputs with f32 accumulation (~111 TF/s measured on v5e) — use the
    XLA dense path when "highest" (bf16x6) accuracy is required.
    """
    m, k = x.shape
    assert c.shape == (m, m)
    assert m % tile_m == 0 and k % tile_k == 0
    mt = m // tile_m
    nk = k // tile_k

    # packed lower-triangle tile enumeration (i >= j)
    pairs = [(i, j) for i in range(mt) for j in range(i + 1)]
    i_tab = jnp.asarray(np.asarray([p[0] for p in pairs], np.int32))
    j_tab = jnp.asarray(np.asarray([p[1] for p in pairs], np.int32))
    T = len(pairs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, nk),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k),
                         lambda t, kk, it, jt: (it[t], kk)),
            pl.BlockSpec((tile_m, tile_k),
                         lambda t, kk, it, jt: (jt[t], kk)),
            pl.BlockSpec((tile_m, tile_m),
                         lambda t, kk, it, jt: (it[t], jt[t])),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_m),
                               lambda t, kk, it, jt: (it[t], jt[t])),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_m), c.dtype)],
    )

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
        input_output_aliases={4: 0},   # donate c (index incl. prefetch args)
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * tile_m * tile_m * k,
            bytes_accessed=(2 * T * tile_m * k + 2 * T * tile_m * tile_m)
            * c.dtype.itemsize,
            transcendentals=0),
    )(i_tab, j_tab, x, x, c)
