"""C API layer tests (reference: ``test/unit/c_api/``)."""

import numpy as np
import pytest

from dlaf_tpu.api import c_api
from dlaf_tpu.matrix import util as mu


@pytest.fixture(autouse=True)
def _init():
    c_api.dlaf_initialize()
    yield
    c_api.dlaf_finalize()


def test_grid_registry():
    ctx1 = c_api.dlaf_create_grid(1, 1)
    ctx2 = c_api.dlaf_create_grid(2, 2)
    assert ctx1 == 2 ** 31 - 1 and ctx2 == ctx1 - 1  # counted down
    c_api.dlaf_free_grid(ctx1)
    with pytest.raises(KeyError):
        c_api._grid_from_context(ctx1)
    c_api.dlaf_free_grid(ctx2)


def test_descriptor_validation():
    with pytest.raises(NotImplementedError):
        c_api.DLAF_descriptor(4, 4, 2, 2, i=2)
    with pytest.raises(ValueError):
        c_api.DLAF_descriptor(4, 4, 2, 3)


def test_cholesky_d_inplace():
    n, nb = 16, 4
    ctx = c_api.dlaf_create_grid(2, 2)
    a = mu.random_hermitian_positive_definite(n, np.float64, 1)
    buf = a.copy()
    desc = c_api.DLAF_descriptor(n, n, nb, nb)
    rc = c_api.dlaf_cholesky_d(ctx, "L", buf, desc)
    assert rc == 0
    f = np.tril(buf)
    np.testing.assert_allclose(f @ f.T, a, rtol=0, atol=1e-10)
    c_api.dlaf_free_grid(ctx)


def test_pdsyevd():
    n, nb = 12, 4
    ctx = c_api.dlaf_create_grid(2, 2)
    a = mu.random_hermitian(n, np.float64, 2)
    buf = a.copy()
    w = np.zeros(n)
    z = np.zeros((n, n))
    desc = c_api.DLAF_descriptor(n, n, nb, nb)
    info = np.zeros(1, np.int32)
    rc = c_api.dlaf_pdsyevd("L", n, buf, desc, w, z, desc, ctx, info)
    assert rc == 0 and info[0] == 0
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), rtol=0, atol=1e-9)
    np.testing.assert_allclose(a @ z, z * w[None, :], rtol=0, atol=1e-8)
    c_api.dlaf_free_grid(ctx)


def test_pzheevd_and_gen():
    n, nb = 8, 4
    ctx = c_api.dlaf_create_grid(1, 1)
    a = mu.random_hermitian(n, np.complex128, 3)
    buf = a.copy()
    w = np.zeros(n)
    z = np.zeros((n, n), np.complex128)
    desc = c_api.DLAF_descriptor(n, n, nb, nb)
    assert c_api.dlaf_pzheevd("L", n, buf, desc, w, z, desc, ctx) == 0
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), rtol=0, atol=1e-9)

    b = mu.random_hermitian_positive_definite(n, np.float64, 4)
    a2 = mu.random_hermitian(n, np.float64, 5)
    w2 = np.zeros(n)
    z2 = np.zeros((n, n))
    rc = c_api.dlaf_pdsygvx("L", n, a2.copy(), desc, b.copy(), desc, w2, z2,
                            desc, ctx)
    assert rc == 0
    import scipy.linalg as sla
    np.testing.assert_allclose(w2, sla.eigh(a2, b, eigvals_only=True),
                               rtol=0, atol=1e-8)
    c_api.dlaf_free_grid(ctx)
