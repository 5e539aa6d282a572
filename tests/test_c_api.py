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
    with pytest.raises(ValueError):
        c_api.DLAF_descriptor(4, 4, 2, 2, i=0)     # 1-based origins
    with pytest.raises(ValueError):
        c_api.DLAF_descriptor(4, 4, 2, 2, isrc=-1)
    with pytest.raises(ValueError):
        c_api.DLAF_descriptor(4, 4, 2, 3)
    # submatrix origins and source offsets are now supported
    c_api.DLAF_descriptor(4, 4, 2, 2, i=2, j=3, isrc=1)


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
    """Reference ScaLAPACK wrapper shape: 9-int descriptor whose ctxt
    entry resolves the grid (``dlaf_c/eigensolver/eigensolver.h``)."""
    n, nb = 12, 4
    ctx = c_api.dlaf_create_grid(2, 2)
    a = mu.random_hermitian(n, np.float64, 2)
    buf = a.copy()
    w = np.zeros(n)
    z = np.zeros((n, n))
    desc9 = [1, ctx, n, n, nb, nb, 0, 0, n]
    info = np.zeros(1, np.int32)
    rc = c_api.dlaf_pdsyevd("L", n, buf, 1, 1, desc9, w, z, 1, 1, desc9,
                            info)
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
    desc = c_api.DLAF_descriptor(n, n, nb, nb, ld=n)
    assert c_api.dlaf_pzheevd("L", n, buf, 1, 1, desc, w, z, 1, 1, desc,
                              ctx=ctx) == 0
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), rtol=0, atol=1e-9)

    b = mu.random_hermitian_positive_definite(n, np.float64, 4)
    a2 = mu.random_hermitian(n, np.float64, 5)
    w2 = np.zeros(n)
    z2 = np.zeros((n, n))
    descd = c_api.DLAF_descriptor(n, n, nb, nb, ld=n)
    rc = c_api.dlaf_pdsygvd("L", n, a2.copy(), 1, 1, descd, b.copy(), 1, 1,
                            descd, w2, z2, 1, 1, descd, ctx=ctx)
    assert rc == 0
    import scipy.linalg as sla
    np.testing.assert_allclose(w2, sla.eigh(a2, b, eigvals_only=True),
                               rtol=0, atol=1e-8)
    # deprecated round-1 shape keeps working
    w3 = np.zeros(n)
    z3 = np.zeros((n, n))
    assert c_api.dlaf_pdsygvx("L", n, a2.copy(), descd, b.copy(), descd,
                              w3, z3, descd, ctx) == 0
    np.testing.assert_allclose(w3, w2, atol=1e-9)
    c_api.dlaf_free_grid(ctx)


def test_partial_spectrum_entries():
    """Typed partial-spectrum entries + the ScaLAPACK partial wrapper
    (reference ``dlaf_c/eigensolver/eigensolver.h:44-67``)."""
    n, nb, k = 12, 4, 5
    ctx = c_api.dlaf_create_grid(2, 2)
    a = mu.random_hermitian(n, np.float64, 6)
    w = np.zeros(n)
    z = np.zeros((n, k))
    desc = c_api.DLAF_descriptor(n, n, nb, nb, ld=n)
    rc = c_api.dlaf_symmetric_eigensolver_partial_spectrum_d(
        ctx, "L", a.copy(), desc, w, z, desc, 0, k)
    assert rc == 0
    lam = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(w[:k], lam[:k], atol=1e-9)
    np.testing.assert_allclose(a @ z, z * w[None, :k], atol=1e-8)
    with pytest.raises(ValueError):
        c_api.dlaf_symmetric_eigensolver_partial_spectrum_d(
            ctx, "L", a.copy(), desc, w, z, desc, 1, k)

    # generalized partial spectrum (+factorized round-trip)
    import scipy.linalg as sla
    b = mu.random_hermitian_positive_definite(n, np.float64, 7)
    w2 = np.zeros(n)
    z2 = np.zeros((n, k))
    rc = c_api.dlaf_symmetric_generalized_eigensolver_partial_spectrum_d(
        ctx, "L", a.copy(), desc, b.copy(), desc, w2, z2, desc, 0, k)
    assert rc == 0
    np.testing.assert_allclose(w2[:k],
                               sla.eigh(a, b, eigvals_only=True)[:k],
                               atol=1e-8)
    fb = np.linalg.cholesky(b)
    w3 = np.zeros(n)
    z3 = np.zeros((n, k))
    fn = getattr(c_api, "dlaf_symmetric_generalized_eigensolver_partial"
                        "_spectrum_factorized_d")
    assert fn(ctx, "L", a.copy(), desc, fb.copy(), desc, w3, z3, desc,
              0, k) == 0
    np.testing.assert_allclose(w3[:k], w2[:k], atol=1e-8)

    # ScaLAPACK-shaped partial wrapper
    w4 = np.zeros(n)
    z4 = np.zeros((n, k))
    desc9 = [1, ctx, n, n, nb, nb, 0, 0, n]
    info = np.zeros(1, np.int32)
    c_api.dlaf_pdsyevd_partial_spectrum("L", n, a.copy(), 1, 1, desc9,
                                        w4, z4, 1, 1, desc9, 0, k, info)
    assert info[0] == 0
    np.testing.assert_allclose(w4[:k], lam[:k], atol=1e-9)
    c_api.dlaf_free_grid(ctx)


def test_pdpotrf_submatrix_and_potri():
    """ia/ja != 1 works through the ScaLAPACK wrappers (superset of the
    reference, which requires 1) + the potri wrapper round-trip."""
    n_full, n_op, nb = 20, 12, 4
    ctx = c_api.dlaf_create_grid(1, 1)
    rng = np.random.default_rng(11)
    base = rng.standard_normal((n_full, n_full))
    spd = base[:n_op, :n_op] @ base[:n_op, :n_op].T + n_op * np.eye(n_op)
    buf = np.asarray(base, order="F").copy(order="F")
    buf[4:4 + n_op, 4:4 + n_op] = spd
    desc9 = [1, ctx, n_full, n_full, nb, nb, 0, 0, n_full]
    info = np.zeros(1, np.int32)
    c_api.dlaf_pdpotrf("L", n_op, buf, 5, 5, desc9, info)
    assert info[0] == 0
    f = np.tril(buf[4:4 + n_op, 4:4 + n_op])
    np.testing.assert_allclose(f @ f.T, spd, atol=1e-10)
    # potri on the factor completes the inverse
    c_api.dlaf_pdpotri("L", n_op, buf, 5, 5, desc9, info)
    assert info[0] == 0
    inv = buf[4:4 + n_op, 4:4 + n_op]
    inv = np.tril(inv) + np.tril(inv, -1).T
    np.testing.assert_allclose(inv @ spd, np.eye(n_op), atol=1e-8)
    c_api.dlaf_free_grid(ctx)


def test_reference_typed_names_and_grid_utils():
    """Canonical reference entry names resolve; free_all_grids and
    create_grid_from_blacs registry semantics."""
    for t in "sdcz":
        assert hasattr(c_api, f"dlaf_cholesky_factorization_{t}")
        assert hasattr(c_api, f"dlaf_inverse_from_cholesky_factor_{t}")
        kind = "symmetric" if t in "sd" else "hermitian"
        for name in (f"dlaf_{kind}_eigensolver_{t}",
                     f"dlaf_{kind}_eigensolver_partial_spectrum_{t}",
                     f"dlaf_{kind}_generalized_eigensolver_{t}",
                     f"dlaf_{kind}_generalized_eigensolver_factorized_{t}",
                     f"dlaf_{kind}_generalized_eigensolver_partial"
                     f"_spectrum_{t}",
                     f"dlaf_{kind}_generalized_eigensolver_partial"
                     f"_spectrum_factorized_{t}"):
            assert hasattr(c_api, name), name
        ev = "syevd" if t in "sd" else "heevd"
        gv = "sygvd" if t in "sd" else "hegvd"
        for name in (f"dlaf_p{t}potrf", f"dlaf_p{t}potri",
                     f"dlaf_p{t}{ev}", f"dlaf_p{t}{ev}_partial_spectrum",
                     f"dlaf_p{t}{gv}", f"dlaf_p{t}{gv}_factorized",
                     f"dlaf_p{t}{gv}_partial_spectrum",
                     f"dlaf_p{t}{gv}_partial_spectrum_factorized"):
            assert hasattr(c_api, name), name
    c_api.dlaf_create_grid_from_blacs(7, 1, 1)
    assert c_api._grid_from_context(7) is None
    c_api.dlaf_free_all_grids()
    with pytest.raises(KeyError):
        c_api._grid_from_context(7)
    d = c_api.make_dlaf_descriptor(8, 8, 1, 1, [1, 0, 16, 16, 4, 4, 0, 0,
                                                16])
    assert (d.m, d.n, d.mb, d.subm) == (16, 16, 4, 8)


def test_descriptor_submatrix_and_src():
    """Full ScaLAPACK descriptor semantics: operand submatrix at 1-based
    (i, j) and nonzero isrc/jsrc source rank offsets."""
    import jax.numpy as jnp
    import numpy as np

    from dlaf_tpu.api import c_api as C

    n_full, n_op, nb = 24, 16, 4
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_full, n_full))
    spd = base[: n_op, : n_op]
    spd = spd @ spd.T + n_op * np.eye(n_op)
    buf = np.asarray(base, np.float64, order="F").copy(order="F")
    buf[8:8 + n_op, 8:8 + n_op] = spd
    orig = buf.copy()

    ctx = C.dlaf_create_grid(1, 1, "R")
    desc = C.DLAF_descriptor(n_full, n_full, nb, nb, isrc=0, jsrc=0,
                             i=9, j=9, ld=n_full)
    rc = C.dlaf_cholesky_d(ctx, "L", buf, desc)
    assert rc == 0
    f = np.tril(buf[8:8 + n_op, 8:8 + n_op])
    assert np.linalg.norm(f @ f.T - spd) / np.linalg.norm(spd) < 1e-12
    # outside the operand window the buffer is untouched
    mask = np.ones_like(buf, bool)
    mask[8:8 + n_op, 8:8 + n_op] = False
    assert np.array_equal(buf[mask], orig[mask])
    C.dlaf_free_grid(ctx)


def test_descriptor_isrc_multirank():
    """isrc/jsrc shift ownership on a real grid (8 virtual devices)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from dlaf_tpu.api import c_api as C

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    n, nb = 32, 4
    rng = np.random.default_rng(8)
    a = rng.standard_normal((n, n))
    spd = np.asarray(a @ a.T + n * np.eye(n), order="F")
    ref = spd.copy()

    ctx = C.dlaf_create_grid(2, 4, "R")
    desc = C.DLAF_descriptor(n, n, nb, nb, isrc=0, jsrc=0, ld=n)
    # partitioner path handles any src; the kloop driver requires (0, 0),
    # so route through the partitioner algo
    from dlaf_tpu.tune import get_tune_parameters, set_tune_parameters
    old = get_tune_parameters().cholesky_distributed_algo
    set_tune_parameters(cholesky_distributed_algo="partitioner")
    try:
        desc2 = C.DLAF_descriptor(n, n, nb, nb, isrc=1, jsrc=2, ld=n)
        buf = spd.copy(order="F")
        rc = C.dlaf_cholesky_d(ctx, "L", buf, desc2)
        assert rc == 0
        f = np.tril(buf)
        assert np.linalg.norm(f @ f.T - ref) / np.linalg.norm(ref) < 1e-12
    finally:
        set_tune_parameters(cholesky_distributed_algo=old)
    C.dlaf_free_grid(ctx)


def test_cholesky_d_fp64_refine_knob():
    """DLAF_FP64_REFINE routes the d entry through the dd-residual
    refinement (f32 factor + Newton step) on single-device grids."""
    from dlaf_tpu.tune import set_tune_parameters
    n, nb = 48, 16
    ctx = c_api.dlaf_create_grid(1, 1)
    a = mu.random_hermitian_positive_definite(n, np.float64, 5)
    buf = a.copy()
    desc = c_api.DLAF_descriptor(n, n, nb, nb)
    set_tune_parameters(fp64_refine_iters=1)
    try:
        rc = c_api.dlaf_cholesky_d(ctx, "L", buf, desc)
    finally:
        set_tune_parameters(fp64_refine_iters=0)
    assert rc == 0
    f = np.tril(buf)
    r = np.linalg.norm(f @ f.T - a) / np.linalg.norm(a)
    assert r < 1e-12
    c_api.dlaf_free_grid(ctx)


def test_potri_syevd_sygvd_d_fp64_refine_routes():
    """With DLAF_FP64_REFINE every d-typed entry (potri / syevd /
    sygvd) reaches fp64-grade results through the dd-residual
    refinement paths (VERDICT r4 #4: d parity breadth on chip)."""
    from dlaf_tpu.tune import set_tune_parameters
    n, nb = 64, 16
    ctx = c_api.dlaf_create_grid(1, 1)
    a = mu.random_hermitian_positive_definite(n, np.float64, 7)
    bmat = mu.random_hermitian_positive_definite(n, np.float64, 8) \
        + np.eye(n)
    desc = c_api.DLAF_descriptor(n, n, nb, nb)
    set_tune_parameters(fp64_refine_iters=2)
    try:
        # potri: factor-input semantics
        buf = np.linalg.cholesky(a).copy()
        rc = c_api.dlaf_inverse_from_cholesky_factor_d(ctx, "L", buf, desc)
        assert rc == 0
        X = np.tril(buf) + np.tril(buf, -1).T
        assert np.linalg.norm(a @ X - np.eye(n)) < 1e-9

        # syevd: d-grade eigenVECTORS, not just values
        buf = a.copy()
        w = np.zeros(n)
        z = np.zeros((n, n))
        rc = c_api.dlaf_symmetric_eigensolver_d(ctx, "L", buf, desc, w, z,
                                                desc)
        assert rc == 0
        assert np.abs(w - np.linalg.eigvalsh(a)).max() < 1e-10
        r = np.linalg.norm(a @ z - z * w[None, :]) / np.linalg.norm(a)
        assert r < 1e-10
        assert np.linalg.norm(z.T @ z - np.eye(n)) < 1e-10

        # sygvd: d-grade B-orthonormal vectors
        import scipy.linalg as sla
        bufa, bufb = a.copy(), bmat.copy()
        w = np.zeros(n)
        z = np.zeros((n, n))
        rc = c_api.dlaf_symmetric_generalized_eigensolver_d(
            ctx, "L", bufa, desc, bufb, desc, w, z, desc)
        assert rc == 0
        assert np.abs(w - sla.eigh(a, bmat, eigvals_only=True)).max() < 1e-9
        r = np.linalg.norm(a @ z - (bmat @ z) * w[None, :]) \
            / np.linalg.norm(a)
        assert r < 1e-9
        assert np.linalg.norm(z.T @ bmat @ z - np.eye(n)) < 1e-9
    finally:
        set_tune_parameters(fp64_refine_iters=0)
    c_api.dlaf_free_grid(ctx)
