"""Matrix generators and predicates.

Equivalent of the reference's ``include/dlaf/util_matrix.h``: predicates like
``square_size``/``square_blocksize`` and generators like
``set_random_hermitian_positive_definite`` (used by miniapps and tests).
Generators are deterministic given a seed and produce *natural* arrays; wrap
with :meth:`DistMatrix.from_natural` to distribute.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..types import is_complex


def square_size(mat) -> bool:
    return mat.size[0] == mat.size[1]


def square_block_size(mat) -> bool:
    return mat.block_size[0] == mat.block_size[1]


def same_process_grid(a, b) -> bool:
    ga = None if a.grid is None else a.grid.shape
    gb = None if b.grid is None else b.grid.shape
    return ga == gb


def random(m, n, dtype=np.float64, seed=0):
    """Uniform random in [-1, 1] (reference ``util_matrix.h:set_random``)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, (m, n))
    if is_complex(dtype):
        x = x + 1j * rng.uniform(-1.0, 1.0, (m, n))
    return x.astype(dtype)


def random_hermitian(n, dtype=np.float64, seed=0):
    x = random(n, n, dtype, seed)
    h = (x + x.conj().T) / 2
    np.fill_diagonal(h, h.diagonal().real)
    return h.astype(dtype)


def random_hermitian_positive_definite(n, dtype=np.float64, seed=0):
    """Hermitian with eigenvalues in [2n-1, 2n+1] — exactly the reference's
    ``set_random_hermitian_positive_definite`` recipe (off-diagonal in the
    unit ball / 2n + diagonal 2n), guaranteed SPD and well conditioned."""
    h = random_hermitian(n, dtype, seed)
    a = h + 2.0 * n * np.eye(n, dtype=dtype)
    return a.astype(dtype)


def random_hermitian_device(n, dtype=np.float32, seed=0):
    """Device-side :func:`random_hermitian` (jax PRNG, jit): the array is
    born on the accelerator — no O(n^2) host buffer and no host->device
    transfer, which matters at the north-star sizes (4 GB at n = 32768
    through the tunneled platform).  Same distribution family as the
    reference recipe (uniform in the unit ball, Hermitized), different
    stream than the numpy generators."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1,), static_argnames=("dt",))
    def gen(key, n, dt=None):
        if is_complex(dt):
            rdt = jnp.zeros(0, dt).real.dtype
            kr, ki = jax.random.split(key)
            x = (jax.random.uniform(kr, (n, n), rdt, -1.0, 1.0)
                 + 1j * jax.random.uniform(ki, (n, n), rdt, -1.0, 1.0))
            x = x.astype(dt)
        else:
            x = jax.random.uniform(key, (n, n), dt, -1.0, 1.0)
        # (x + x^H)/2 has an exactly-real diagonal already
        return (x + x.conj().T) / 2

    return gen(jax.random.key(seed), n, dt=jnp.dtype(dtype))


def random_hermitian_dist(n, block_size, grid=None, dtype=np.float32,
                          seed=0, spd=False):
    """Random Hermitian DistMatrix generated directly in storage order,
    ONE fused jit: peak ~2 n^2 buffers instead of the ~3 of
    ``random_hermitian_device`` + ``from_natural`` (the difference
    between surviving and OOM-ing next to co-tenants at n = 32768)."""
    import jax
    import jax.numpy as jnp

    from .distribution import Distribution
    from .layout import natural_to_storage, pad_natural
    from .matrix import DistMatrix

    if isinstance(block_size, int):
        block_size = (block_size, block_size)
    gs = (1, 1) if grid is None else grid.shape
    dist = Distribution((n, n), tuple(block_size), gs)

    @partial(jax.jit, static_argnames=("dt", "spd"))
    def build(key, dt=None, spd=False):
        x = jax.random.uniform(key, (n, n), jnp.dtype(dt), -1.0, 1.0)
        h = (x + x.T) / 2
        if spd:
            ii = jnp.arange(n)
            h = h.at[ii, ii].add(jnp.asarray(2.0 * n, h.dtype))
        return natural_to_storage(pad_natural(h, dist), dist)

    import jax.random as jrandom
    data = build(jrandom.PRNGKey(seed), dt=np.dtype(dtype), spd=spd)
    if grid is not None:
        data = jax.device_put(data, grid.sharding())
    return DistMatrix(data, dist, grid)


def random_hermitian_positive_definite_device(n, dtype=np.float32, seed=0):
    """Device-side SPD generator: Hermitian + 2n I (eigenvalues in
    [2n-1, 2n+1], the reference conditioning)."""
    import jax.numpy as jnp
    h = random_hermitian_device(n, dtype, seed)
    ii = jnp.arange(n)
    return h.at[ii, ii].add(jnp.asarray(2.0 * n, h.dtype).real)


def random_lower_triangular(n, dtype=np.float64, seed=0):
    """Well-conditioned lower-triangular (unit-ish diagonal).

    Off-diagonal entries are scaled by 1/n: a dense random triangular
    matrix with O(1) off-diagonals has condition number exponential in n
    (the forward-substitution growth factor compounds per row), which
    makes any large-n solve check meaningless — at n = 8192 an f32 solve
    overflows to NaN.  With row sums O(1) the growth factor is bounded
    (~e^{1/4}), so residual checks measure the implementation, not the
    conditioning.  (The reference sidesteps this by not implementing the
    trsm miniapp check at all, ``miniapp_triangular_solver.cpp:94-96``.)
    """
    x = np.tril(random(n, n, dtype, seed)) / max(n, 1)
    np.fill_diagonal(x, n * x.diagonal() / 4.0 + 2.0)
    return x.astype(dtype)


def random_upper_triangular(n, dtype=np.float64, seed=0):
    return random_lower_triangular(n, dtype, seed).conj().T.astype(dtype)
