"""Layout conversions between natural and block-cyclic storage order.

Replaces the reference's allocation layouts (``matrix/allocation_types.h``,
``matrix/col_major_layout.h``) and the ScaLAPACK-compatible import/export used
by the C API (``src/c_api/utils.h:19-20``): there, a layout maps tile indices
to memory offsets in rank-local buffers; here, a distributed matrix is one
``jax.Array`` in *storage order* (see ``distribution.py``) and the conversions
below are pure reshapes/transposes that XLA turns into the optimal all-to-all
when the operand is sharded.
"""

from __future__ import annotations

import jax.numpy as jnp

from .distribution import Distribution


def pad_natural(a, dist: Distribution, fill=0.0, diag_fill=None):
    """Pad a natural ``[m, n]`` array to the distribution's padded size.

    ``diag_fill`` (e.g. 1.0) fills the *diagonal* of the pad region — used so
    factorizations of padded SPD matrices stay well defined.
    """
    m, n = dist.size
    Mp, Np = dist.padded_size
    if a.shape != (m, n):
        raise ValueError(f"array shape {a.shape} != distribution size {(m, n)}")
    out = jnp.zeros((Mp, Np), dtype=a.dtype)
    if fill != 0.0:
        out = out + jnp.asarray(fill, a.dtype)
    out = out.at[:m, :n].set(a)
    if diag_fill is not None:
        k = min(Mp, Np)
        diag = jnp.where(jnp.arange(k) < min(m, n),
                         jnp.diagonal(out)[:k],
                         jnp.asarray(diag_fill, a.dtype))
        out = out.at[jnp.arange(k), jnp.arange(k)].set(diag)
    return out


def unpad_natural(a, dist: Distribution):
    m, n = dist.size
    return a[:m, :n]


def natural_to_storage(a_padded, dist: Distribution):
    """Permute tile rows/cols from natural to cyclic storage order.

    Natural tile row ``t = l * P + p`` moves to storage row ``p * lmt + l``.
    Pure reshape/transpose; under a ``P('p','q')`` sharding this lowers to the
    minimal redistribution collective.
    """
    mb, nb = dist.block_size
    P, Q = dist.grid_size
    lmt, lnt = dist.local_nr_tiles
    Mp, Np = dist.padded_size
    x = a_padded.reshape(lmt, P, mb, lnt, Q, nb)
    x = x.transpose(1, 0, 2, 4, 3, 5)
    return x.reshape(Mp, Np)


def storage_to_natural(s, dist: Distribution):
    mb, nb = dist.block_size
    P, Q = dist.grid_size
    lmt, lnt = dist.local_nr_tiles
    Mp, Np = dist.padded_size
    x = s.reshape(P, lmt, mb, Q, lnt, nb)
    x = x.transpose(1, 0, 2, 4, 3, 5)
    return x.reshape(Mp, Np)
