"""Drive the ASAN/UBSAN-instrumented native kernels (see
test_native_asan.py).  Runs under LD_PRELOAD=libasan, exercising the
threaded HH chase (plain + streamed-prefix pump), its cancel path, and
the Givens chase, then checks results against the numpy references.
Exit 0 = clean; sanitizer errors abort the process (halt_on_error).
"""

import ctypes
import sys

import numpy as np


def main() -> int:
    so_path = sys.argv[1]

    import dlaf_tpu.ops.native as native
    with native._LOCK:
        native._LIB = ctypes.CDLL(so_path)
        native._TRIED = True

    from dlaf_tpu.algorithms.eigensolver.hh_chase import (
        hh_band_to_tridiagonal, hh_chase_numpy, hh_schedule)

    n, b = 700, 16
    rng = np.random.default_rng(5)
    ab = rng.standard_normal((b + 1, n)).astype(np.float64)

    ref2 = np.zeros((2 * b + 1, n), np.float64)
    ref2[: b + 1] = ab
    Vref = hh_chase_numpy(ref2, n, b)

    # plain native chase (all four dtypes' entry points exist; drive d+s)
    res = hh_band_to_tridiagonal(ab.copy(), b)
    np.testing.assert_allclose(res.d, ref2[0], atol=1e-10)
    np.testing.assert_allclose(res.e, ref2[1, : n - 1], atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.V), Vref, atol=1e-10)
    print("hh chase d ok", flush=True)

    res_s = hh_band_to_tridiagonal(ab.astype(np.float32), b)
    assert np.abs(res_s.d - ref2[0]).max() < 1e-2
    print("hh chase s ok", flush=True)

    # streamed-prefix variant (the pump path): chunk_cb consumption
    from dlaf_tpu.algorithms.eigensolver.hh_chase import _hh_chase_native
    got = []
    ab2 = np.zeros((2 * b + 1, n), np.float64)
    ab2[: b + 1] = ab
    V = _hh_chase_native(ab2, n, b, chunk_cb=lambda rows: got.append(
        rows.copy()))
    assert V is not None
    R = hh_schedule(n, b)[1]
    streamed = np.concatenate(got) if got else np.zeros((0, b))
    assert streamed.shape[0] == R
    np.testing.assert_allclose(streamed, Vref, atol=1e-10)
    np.testing.assert_allclose(V, Vref, atol=1e-10)
    print("hh chase streamed ok", flush=True)

    # detached pump + immediate join (exercises cancel/exception paths)
    state = {"rows": 0}
    ab3 = np.zeros((2 * b + 1, n), np.float64)
    ab3[: b + 1] = ab

    def cb(rows):
        state["rows"] += rows.shape[0]

    handle = _hh_chase_native(ab3, n, b, chunk_cb=cb, detach_pump=True)
    assert handle is not None
    handle.join()
    assert state["rows"] == R
    print("hh chase pump ok", flush=True)

    # Givens chase kernel (chase.cpp)
    from dlaf_tpu.algorithms.eigensolver.band_to_tridiag import (
        band_to_tridiagonal)
    res_g = band_to_tridiagonal(ab.copy(), b)
    import scipy.linalg as sla
    lam_g = sla.eigvalsh_tridiagonal(res_g.d, res_g.e)
    lam_h = sla.eigvalsh_tridiagonal(res.d, res.e)
    np.testing.assert_allclose(np.sort(lam_g), np.sort(lam_h), atol=1e-8)
    print("givens chase ok", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
