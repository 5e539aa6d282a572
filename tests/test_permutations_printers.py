"""Permutation + printer tests (reference: ``test/unit/permutations/``)."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from dlaf_tpu import DistMatrix, MatrixRef
from dlaf_tpu.algorithms.permutations.general import permute
from dlaf_tpu.matrix import util as mu
from dlaf_tpu.matrix.printers import print_csv, print_numpy


@pytest.mark.parametrize("coord", ["Row", "Col"])
def test_permute(grid, coord):
    n, nb = 12, 4
    a = mu.random(n, n, np.float64, 1)
    src = DistMatrix.from_natural(jnp.asarray(a), nb, grid)
    dst = DistMatrix.from_natural(jnp.zeros((n, n)), nb, grid)
    rng = np.random.default_rng(0)
    p = rng.permutation(n)
    out = np.asarray(permute(p, src, dst, coord).to_natural())
    want = a[p, :] if coord == "Row" else a[:, p]
    np.testing.assert_array_equal(out, want)


def test_permute_subrange(dist_grid):
    n, nb = 16, 4
    a = mu.random(n, n, np.float64, 2)
    src = DistMatrix.from_natural(jnp.asarray(a), nb, dist_grid)
    dst = DistMatrix.from_natural(jnp.zeros((n, n)), nb, dist_grid)
    rin = MatrixRef(src, (4, 4), (8, 8))
    rout = MatrixRef(dst, (8, 0), (8, 8))
    p = np.array([3, 1, 0, 2, 7, 6, 5, 4])
    out = np.asarray(permute(p, rin, rout, "Col").to_natural())
    np.testing.assert_array_equal(out[8:16, 0:8], a[4:12, 4:12][:, p])


def test_printers():
    m = DistMatrix.from_natural(jnp.asarray(np.eye(3)), 2)
    buf = io.StringIO()
    print_numpy(m, "x", file=buf)
    s = buf.getvalue()
    assert s.startswith("x = np.array(") and "1." in s
    buf2 = io.StringIO()
    print_csv(m, file=buf2)
    assert len(buf2.getvalue().strip().splitlines()) == 3
