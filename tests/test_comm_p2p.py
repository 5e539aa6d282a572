"""P2P neighbor exchange (``MeshComm.shift_p/shift_q``).

Equivalent of the reference's tile send/recv kernels
(``communication/kernels/p2p.h:29,45``): ppermute rings over mesh axes,
open (pipeline-style, zeros at the boundary) and cyclic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from dlaf_tpu.parallel.comm import LocalComm, MeshComm
from dlaf_tpu.parallel.grid import Grid


def _grid():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Grid((2, 4))


@pytest.mark.parametrize("shift,cyclic", [(1, False), (1, True),
                                          (-1, False), (2, True),
                                          (3, False)])
def test_shift_q(shift, cyclic):
    grid = _grid()
    Pn, Qn = grid.shape

    def body(x):
        comm = MeshComm(Pn, Qn)
        return comm.shift_q(x, shift, cyclic)

    x = jnp.arange(Pn * Qn, dtype=jnp.float32).reshape(Pn, Qn)
    f = shard_map(body, mesh=grid.mesh, in_specs=P("p", "q"),
                  out_specs=P("p", "q"))
    out = np.asarray(jax.jit(f)(x)).reshape(Pn, Qn)
    ref = np.zeros((Pn, Qn), np.float32)
    for q in range(Qn):
        src = q - shift
        if cyclic:
            ref[:, q] = np.asarray(x)[:, src % Qn]
        elif 0 <= src < Qn:
            ref[:, q] = np.asarray(x)[:, src]
    assert np.array_equal(out, ref)


def test_shift_p_ring_rotation():
    grid = _grid()
    Pn, Qn = grid.shape

    def body(x):
        comm = MeshComm(Pn, Qn)
        # two cyclic steps down the column ring = rotation by 2
        return comm.shift_p(comm.shift_p(x, 1, cyclic=True), 1, cyclic=True)

    x = jnp.arange(Pn * Qn, dtype=jnp.float32).reshape(Pn, Qn)
    f = shard_map(body, mesh=grid.mesh, in_specs=P("p", "q"),
                  out_specs=P("p", "q"))
    out = np.asarray(jax.jit(f)(x)).reshape(Pn, Qn)
    ref = np.roll(np.asarray(x), 2 % Pn, axis=0)
    assert np.array_equal(out, ref)


def test_local_comm_shift():
    c = LocalComm()
    x = jnp.ones((3,))
    assert np.array_equal(np.asarray(c.shift_p(x, 1, cyclic=True)), x)
    assert np.array_equal(np.asarray(c.shift_q(x, 0)), x)
    assert np.array_equal(np.asarray(c.shift_p(x, 1)), np.zeros(3))
