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
    if (Mp, Np) == (m, n):
        return jnp.asarray(a)    # no pad: avoid an extra n^2 copy
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

    Natural tile row ``t = l * P + r`` is owned by rank
    ``p = (r + src) % P`` and moves to storage row ``p * lmt + l``.
    Pure reshape/roll/transpose; under a ``P('p','q')`` sharding this
    lowers to the minimal redistribution collective.
    """
    mb, nb = dist.block_size
    P, Q = dist.grid_size
    sp, sq = dist.src_rank
    lmt, lnt = dist.local_nr_tiles
    Mp, Np = dist.padded_size
    if P == 1 and Q == 1:
        return a_padded          # identity permutation: avoid the eager
        # reshape/transpose round-trip (2 extra n^2 buffers at n=32768)
    x = a_padded.reshape(lmt, P, mb, lnt, Q, nb)
    if sp:
        x = jnp.roll(x, sp, axis=1)
    if sq:
        x = jnp.roll(x, sq, axis=4)
    x = x.transpose(1, 0, 2, 4, 3, 5)
    return x.reshape(Mp, Np)


def storage_to_natural(s, dist: Distribution):
    mb, nb = dist.block_size
    P, Q = dist.grid_size
    sp, sq = dist.src_rank
    lmt, lnt = dist.local_nr_tiles
    Mp, Np = dist.padded_size
    if P == 1 and Q == 1:
        return s                 # identity permutation (see above)
    x = s.reshape(P, lmt, mb, Q, lnt, nb)
    x = x.transpose(1, 0, 2, 4, 3, 5)
    if sp:
        x = jnp.roll(x, -sp, axis=1)
    if sq:
        x = jnp.roll(x, -sq, axis=4)
    return x.reshape(Mp, Np)


class ColMajorLayout:
    """ScaLAPACK-compatible rank-local column-major layout.

    Equivalent of the reference's ``matrix/col_major_layout.h``: maps a
    rank's local tile index to the byte/element offset of that tile inside
    the rank-local column-major buffer (``lld`` leading dimension), the
    contract of every ScaLAPACK descriptor.  Used by the C ABI bridge to
    wrap user buffers without copies and by import/export of local blocks.
    """

    def __init__(self, dist: Distribution, rank=(0, 0), lld: int | None = None):
        self.dist = dist
        self.rank = tuple(rank)
        lm, ln = dist.local_element_count(self.rank)
        self.local_size = (lm, ln)
        self.lld = int(lld) if lld is not None else max(lm, 1)
        if self.lld < lm:
            raise ValueError(f"lld {self.lld} < local rows {lm}")

    def local_tile_origin(self, lt) -> tuple:
        """(row, col) element origin of local tile ``lt`` in the rank-local
        column-major buffer."""
        mb, nb = self.dist.block_size
        return (lt[0] * mb, lt[1] * nb)

    def tile_offset(self, lt) -> int:
        """Element offset of local tile ``lt``'s top-left corner."""
        r, c = self.local_tile_origin(lt)
        return r + c * self.lld

    def tile_size_of(self, lt) -> tuple:
        """True (unpadded) size of local tile ``lt`` on this rank."""
        mb, nb = self.dist.block_size
        lm, ln = self.local_size
        return (min(mb, lm - lt[0] * mb), min(nb, ln - lt[1] * nb))

    def min_mem_size(self) -> int:
        """Elements needed by the buffer (reference ``minMemSize``)."""
        lm, ln = self.local_size
        if lm == 0 or ln == 0:
            return 0
        return self.lld * (ln - 1) + lm
