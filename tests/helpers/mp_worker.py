"""Worker for the 2-process distributed test (see test_multiprocess.py).

Runs distributed Cholesky and the full HEEV chain over a 2x4 grid that
spans two processes (4 virtual CPU devices each), checks residuals, and
exits 0 on success — the analogue of one rank of the reference's
``mpiexec -n 6`` test jobs (``cmake/DLAF_AddTest.cmake:107-120``).
"""

import sys


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    from dlaf_tpu.parallel.multiprocess import (gather_natural, global_grid,
                                                initialize_multiprocess)
    initialize_multiprocess(f"localhost:{port}", 2, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert len(jax.devices()) == 8, len(jax.devices())
    assert jax.process_count() == 2

    from dlaf_tpu import cholesky_factorization, hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.matrix.matrix import DistMatrix

    grid = global_grid((2, 4))

    # ---- distributed Cholesky ----
    n, nb = 64, 8
    a = mu.random_hermitian_positive_definite(n, np.float32, seed=0)
    mat = DistMatrix.from_natural(jnp.asarray(a), (nb, nb), grid)
    f = gather_natural(cholesky_factorization(mat))
    fl = np.tril(f)
    resid = np.linalg.norm(fl @ fl.T - a) / np.linalg.norm(a)
    assert resid < 1e-4, f"cholesky resid {resid}"
    print(f"[{pid}] cholesky ok {resid:.2e}", flush=True)

    # ---- rank-pipelined band->tridiag chase over the real transport ----
    from dlaf_tpu.algorithms.eigensolver.hh_chase import \
        hh_band_to_tridiagonal
    from dlaf_tpu.algorithms.eigensolver.hh_chase_mp import \
        hh_band_to_tridiagonal_mp
    nb_, b_ = 96, 8
    rng = np.random.default_rng(13)
    # float32: x64 is disabled, so the allgather transport is f32-exact
    band_ab = rng.standard_normal((b_ + 1, nb_)).astype(np.float32)
    ref = hh_band_to_tridiagonal(band_ab.copy(), b_, force_numpy=True)
    out = hh_band_to_tridiagonal_mp(band_ab.copy(), b_, nparts=4)
    np.testing.assert_allclose(out.d, ref.d, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.e, ref.e, rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.V, ref.V, rtol=0, atol=1e-12)
    print(f"[{pid}] mp chase ok", flush=True)

    # ---- per-rank (independent) snapshot IO across both processes ----
    import os
    import tempfile

    from dlaf_tpu.matrix.io import load_matrix, save_matrix
    tdir = os.environ.get("DLAF_MP_TMP", tempfile.gettempdir())
    snap = os.path.join(tdir, f"mp_snap_{port}.h5")
    save_matrix(snap, mat)                  # auto-sharded: 2 rank files
    assert os.path.exists(os.path.join(
        tdir, f"mp_snap_{port}.r{pid}of2.h5"))
    # barrier so both rank files exist before either process loads
    from dlaf_tpu.parallel.multiprocess import barrier
    barrier()
    back = load_matrix(snap, grid=grid)
    diff = np.abs(np.asarray(gather_natural(back)) - a).max()
    assert diff == 0, f"io roundtrip diff {diff}"
    print(f"[{pid}] io ok", flush=True)

    # ---- full HEEV chain ----
    rng = np.random.default_rng(7)
    h = rng.standard_normal((n, n)).astype(np.float32)
    h = (h + h.T) / 2
    mh = DistMatrix.from_natural(jnp.asarray(h), (nb, nb), grid)
    lam, v = hermitian_eigensolver(mh, "L", band_size=8)
    lam = np.asarray(lam)
    vn = gather_natural(v)
    resid = np.linalg.norm(h @ vn - vn * lam[None, :]) / np.linalg.norm(h)
    assert resid < 5e-5, f"heev resid {resid}"
    assert np.abs(np.sort(lam) - np.linalg.eigvalsh(h)).max() < 1e-3
    print(f"[{pid}] heev ok {resid:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
