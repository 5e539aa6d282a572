"""Complex-on-real-backend mechanisms (``complex_embed.py``,
``ops/complexmm.py``): the pair-of-reals encoding SURVEY §7 prescribes
for backends without complex transfer/lowerings (the axon TPU)."""

import numpy as np
import pytest

from dlaf_tpu.algorithms.eigensolver.complex_embed import (
    embed_hermitian, extract_eigenpairs)
from dlaf_tpu.ops.complexmm import cgemm_pair, cherk_pair, pair_to_complex


def random_hermitian_c(n, dtype, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = (a + a.conj().T) / 2
    return a.astype(dtype)


def test_embedding_spectrum_doubled():
    a = random_hermitian_c(17, np.complex128, 0)
    M = embed_hermitian(a)
    assert M.dtype == np.float64 and M.shape == (34, 34)
    np.testing.assert_allclose(M, M.T, atol=0)
    lam = np.linalg.eigvalsh(a)
    lam2 = np.linalg.eigvalsh(M)
    np.testing.assert_allclose(lam2[0::2], lam, atol=1e-12)
    np.testing.assert_allclose(lam2[1::2], lam, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 9, 24])
def test_extract_eigenpairs_roundtrip(n):
    a = random_hermitian_c(n, np.complex128, n)
    lam2, v2 = np.linalg.eigh(embed_hermitian(a))
    lam, U = extract_eigenpairs(lam2, v2, n)
    np.testing.assert_allclose(lam, np.linalg.eigvalsh(a), atol=1e-11)
    resid = np.linalg.norm(a @ U - U * lam[None, :])
    assert resid / max(np.linalg.norm(a), 1) < 1e-11
    np.testing.assert_allclose(U.conj().T @ U, np.eye(n), atol=1e-11)


def test_extract_with_degenerate_cluster():
    """Multiple eigenvalues: the doubled eigenspace returns arbitrary
    real bases; cluster-QR must still give complex-orthonormal pairs."""
    rng = np.random.default_rng(3)
    n = 12
    q, _ = np.linalg.qr(rng.standard_normal((n, n))
                        + 1j * rng.standard_normal((n, n)))
    lam_true = np.sort(np.r_[np.full(4, -1.0), np.full(3, 0.5),
                             rng.standard_normal(n - 7)])
    a = (q * lam_true[None, :]) @ q.conj().T
    a = (a + a.conj().T) / 2
    lam2, v2 = np.linalg.eigh(embed_hermitian(a))
    lam, U = extract_eigenpairs(lam2, v2, n)
    np.testing.assert_allclose(lam, np.linalg.eigvalsh(a), atol=1e-11)
    resid = np.linalg.norm(a @ U - U * lam[None, :])
    assert resid / np.linalg.norm(a) < 1e-10
    np.testing.assert_allclose(U.conj().T @ U, np.eye(n), atol=1e-10)


def test_host_eigensolver_matches_native_complex():
    """hermitian_eigensolver_host (embedding path) vs the native complex
    pipeline, full and partial spectrum, both uplo."""
    from dlaf_tpu import hermitian_eigensolver_host

    n = 40
    a = random_hermitian_c(n, np.complex128, 7)
    for uplo in ("L", "U"):
        lam, U = hermitian_eigensolver_host(
            np.tril(a) if uplo == "L" else np.triu(a), 16, uplo)
        np.testing.assert_allclose(lam, np.linalg.eigvalsh(a), atol=1e-10)
        resid = np.linalg.norm(a @ U - U * lam[None, :])
        assert resid / np.linalg.norm(a) < 1e-10
    k = 7
    lam_k, U_k = hermitian_eigensolver_host(a, 16, "L",
                                            eigenvalues_index_end=k)
    assert lam_k.shape == (k,) and U_k.shape == (n, k)
    np.testing.assert_allclose(lam_k, np.linalg.eigvalsh(a)[:k],
                               atol=1e-10)
    resid = np.linalg.norm(a @ U_k - U_k * lam_k[None, :])
    assert resid / np.linalg.norm(a) < 1e-10


def test_c_api_complex_embedding_route(monkeypatch):
    """The c/z C-API entries route through the embedding when the
    backend can't run native complex (forced here via monkeypatch)."""
    from dlaf_tpu.algorithms.eigensolver import complex_embed
    from dlaf_tpu.api import c_api

    monkeypatch.setattr(complex_embed, "needs_real_embedding",
                        lambda dt: np.issubdtype(np.dtype(dt),
                                                 np.complexfloating))
    n, nb = 16, 4
    ctx = c_api.dlaf_create_grid(1, 1)
    a = random_hermitian_c(n, np.complex128, 9)
    w = np.zeros(n)
    z = np.zeros((n, n), np.complex128)
    desc = c_api.DLAF_descriptor(n, n, nb, nb, ld=n)
    rc = c_api.dlaf_hermitian_eigensolver_z(ctx, "L", a.copy(), desc, w,
                                            z, desc)
    assert rc == 0
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), atol=1e-10)
    resid = np.linalg.norm(a @ z - z * w[None, :])
    assert resid / np.linalg.norm(a) < 1e-9
    c_api.dlaf_free_grid(ctx)


@pytest.mark.parametrize("algo", ["4mul", "gauss"])
def test_cgemm_pair(algo):
    rng = np.random.default_rng(11)
    A = rng.standard_normal((24, 17)) + 1j * rng.standard_normal((24, 17))
    B = rng.standard_normal((17, 9)) + 1j * rng.standard_normal((17, 9))
    cr, ci = cgemm_pair(np.real(A), np.imag(A), np.real(B), np.imag(B),
                        algo=algo)
    np.testing.assert_allclose(pair_to_complex(cr, ci), A @ B, atol=1e-12)


def test_cherk_pair():
    rng = np.random.default_rng(12)
    A = rng.standard_normal((15, 21)) + 1j * rng.standard_normal((15, 21))
    cr, ci = cherk_pair(np.real(A), np.imag(A))
    C = pair_to_complex(cr, ci)
    np.testing.assert_allclose(C, A @ A.conj().T, atol=1e-12)
    np.testing.assert_allclose(np.asarray(cr), np.asarray(cr).T, atol=1e-12)


def test_host_generalized_eigensolver_complex():
    """Complex HEGV via the double embedding: A x = lam B x with
    B-orthonormal complex eigenvectors, plain and factorized."""
    import scipy.linalg as sla

    from dlaf_tpu import hermitian_generalized_eigensolver_host

    rng = np.random.default_rng(21)
    n = 28
    a = random_hermitian_c(n, np.complex128, 21)
    m = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = m @ m.conj().T + n * np.eye(n)

    lam, U = hermitian_generalized_eigensolver_host(a, b, 8, "L")
    want = sla.eigh(a, b, eigvals_only=True)
    np.testing.assert_allclose(lam, want, atol=1e-9)
    resid = np.linalg.norm(a @ U - (b @ U) * lam[None, :])
    assert resid / np.linalg.norm(a) < 1e-9
    np.testing.assert_allclose(U.conj().T @ b @ U, np.eye(n), atol=1e-9)

    # factorized form: pass B's Cholesky factor
    f = np.linalg.cholesky(b)
    lam2, U2 = hermitian_generalized_eigensolver_host(
        a, f, 8, "L", factorized=True)
    np.testing.assert_allclose(lam2, want, atol=1e-9)

    # partial spectrum
    k = 5
    lam3, U3 = hermitian_generalized_eigensolver_host(
        a, b, 8, "L", eigenvalues_index_end=k)
    assert lam3.shape == (k,) and U3.shape == (n, k)
    np.testing.assert_allclose(lam3, want[:k], atol=1e-9)


def test_c_api_complex_gen_embedding_route(monkeypatch):
    from dlaf_tpu.algorithms.eigensolver import complex_embed
    from dlaf_tpu.api import c_api

    monkeypatch.setattr(complex_embed, "needs_real_embedding",
                        lambda dt: np.issubdtype(np.dtype(dt),
                                                 np.complexfloating))
    import scipy.linalg as sla
    rng = np.random.default_rng(22)
    n, nb = 16, 4
    a = random_hermitian_c(n, np.complex128, 22)
    m = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    b = m @ m.conj().T + n * np.eye(n)
    ctx = c_api.dlaf_create_grid(1, 1)
    w = np.zeros(n)
    z = np.zeros((n, n), np.complex128)
    desc = c_api.DLAF_descriptor(n, n, nb, nb, ld=n)
    rc = c_api.dlaf_hermitian_generalized_eigensolver_z(
        ctx, "L", a.copy(), desc, b.copy(), desc, w, z, desc)
    assert rc == 0
    np.testing.assert_allclose(w, sla.eigh(a, b, eigvals_only=True),
                               atol=1e-8)
    resid = np.linalg.norm(a @ z - (b @ z) * w[None, :])
    assert resid / np.linalg.norm(a) < 1e-8
    c_api.dlaf_free_grid(ctx)


def test_interleaved_embedding_properties():
    """interleave() is a ring homomorphism that preserves triangularity:
    interleave(L) IS the Cholesky factor of interleave(B)."""
    from dlaf_tpu.algorithms.eigensolver.complex_embed import (
        deinterleave_rows, embed_hermitian_interleaved)
    rng = np.random.default_rng(3)
    n = 24
    g = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex128)
    b = g @ g.conj().T + n * np.eye(n)
    L = np.linalg.cholesky(b)
    Mb = embed_hermitian_interleaved(b)
    Ml = embed_hermitian_interleaved(L)
    assert np.allclose(Ml, np.tril(Ml))                  # triangular
    assert np.allclose(Ml @ Ml.T, Mb, atol=1e-10)        # factor of embed
    Lr = np.linalg.cholesky(Mb)
    assert np.allclose(Lr, Ml, atol=1e-8)                # THE factor
    # row de-interleave maps to the block convention
    u = rng.standard_normal((2 * n, 3))
    blk = deinterleave_rows(u)
    assert np.allclose(blk[:n], u[0::2]) and np.allclose(blk[n:], u[1::2])


def test_host_generalized_factorized_uses_interleaved_factor():
    """The factorized path must reuse the supplied factor (interleaved
    embedding) — verified by residual AND by feeding a factor whose
    reassembled B would differ from the pencil actually solved."""
    import scipy.linalg as sla

    from dlaf_tpu import hermitian_generalized_eigensolver_host
    rng = np.random.default_rng(17)
    n = 40
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n)))
    a = (a + a.conj().T) / 2
    g = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n)))
    b = g @ g.conj().T + n * np.eye(n)
    f = np.linalg.cholesky(b)
    lam_ref = sla.eigh(a, b, eigvals_only=True)
    for uplo, fac in (("L", f), ("U", f.conj().T.copy())):
        au = np.triu(a) if uplo == "U" else np.tril(a)
        lam, U = hermitian_generalized_eigensolver_host(
            au.astype(np.complex64), fac.astype(np.complex64), 8, uplo,
            factorized=True, band_size=4)
        assert np.abs(lam - lam_ref).max() < 2e-3 * np.abs(lam_ref).max()
        r = np.linalg.norm(a @ U - (b @ U) * lam[None, :]) \
            / np.linalg.norm(a)
        assert r < 5e-5, f"uplo={uplo} residual {r}"
        borth = np.linalg.norm(U.conj().T @ b @ U - np.eye(n))
        assert borth < 5e-5, f"uplo={uplo} B-orth {borth}"
