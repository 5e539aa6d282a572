"""Scalar types, dtype registry and flop accounting.

TPU-native re-design of the reference's ``include/dlaf/types.h`` (see
``/root/reference/include/dlaf/types.h:25-277``): the reference defines
``SizeType``, ``Device``/``Backend`` enums and per-type flop weights
(``TypeInfo<T>::ops_add/ops_mul``, complex mul = 6 real ops).  Here the
"backend" is always XLA and the "device" is whatever platform JAX selected,
so only the flop model and dtype helpers carry over.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# The reference uses std::ptrdiff_t; plain Python ints here.
SizeType = int

#: dtypes supported by the framework (reference: float, double,
#: complex<float>, complex<double>).  bfloat16 is TPU-native extra.
REAL_DTYPES = (jnp.float32, jnp.float64)
COMPLEX_DTYPES = (jnp.complex64, jnp.complex128)
SUPPORTED_DTYPES = REAL_DTYPES + COMPLEX_DTYPES + (jnp.bfloat16,)


def is_complex(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating)


def real_dtype_of(dtype):
    """The real dtype underlying ``dtype`` (itself if already real)."""
    return jnp.zeros((), dtype=dtype).real.dtype


def ops_weights(dtype) -> tuple[int, int]:
    """(ops per add, ops per mul) — reference ``types.h:159-162``.

    A complex multiply counts as 6 real flops, a complex add as 2.
    """
    if is_complex(dtype):
        return 2, 6
    return 1, 1


def total_ops(dtype, add: float, mul: float) -> float:
    """Total real flops for ``add`` additions and ``mul`` multiplications.

    Mirrors ``dlaf::total_ops<T>()`` (reference ``types.h:165-170``) so the
    benchmark harness reports GFlop/s with identical flop models.
    """
    wa, wm = ops_weights(dtype)
    return wa * add + wm * mul


def machine_epsilon(dtype) -> float:
    return float(np.finfo(np.dtype(real_dtype_of(dtype))).eps)
