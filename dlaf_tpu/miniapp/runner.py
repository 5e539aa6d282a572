"""Shared miniapp run loop (reference flow: ``miniapp_cholesky.cpp:106-199``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix.matrix import DistMatrix
from ..utils.timing import _force, slope_time
from . import options as opt


def run(name, args, make_input, run_alg, flops_fn, check_fn=None):
    """Generic miniapp loop.

    ``make_input() -> state`` (host data + DistMatrix inputs);
    ``run_alg(state) -> result`` (jittable end-to-end);
    ``flops_fn(args, dtype) -> flop count``; ``check_fn(state, result)``
    returns a residual to print.
    """
    dtype = opt.dtype_of(args)
    state = make_input()
    flops = flops_fn(args, dtype)

    for _ in range(args.nwarmups):
        _force(run_alg(state))

    for r in range(args.nruns):
        secs = slope_time(run_alg, state, k_lo=1, k_hi=3, reps=1)
        gflops = flops / secs / 1e9
        opt.report(name, args, r, secs, gflops)
        if check_fn is not None and (
                args.check == "all" or
                (args.check == "last" and r == args.nruns - 1)):
            resid = check_fn(state, run_alg(state))
            tol = check_tolerance(_effective_dtype(dtype),
                                  args.matrix_size)
            ok = resid == resid and resid < tol
            status = "PASSED" if ok else "FAILED"
            print(f"check: residual {resid:.3e} (tol {tol:.1e}) [{status}]")
            if not ok:
                return 1
    return 0


def _effective_dtype(dtype):
    """The dtype the device actually computes in.

    Without ``jax_enable_x64`` JAX silently downcasts f64/c128 inputs to
    f32/c64 (the default on the TPU path; tests enable x64 on the CPU
    mesh), so the residual check must use the tolerance of the dtype the
    arithmetic really ran at — checking f32 arithmetic against an f64
    bound is a guaranteed spurious FAIL."""
    if jax.config.jax_enable_x64:
        return dtype
    d = np.dtype(dtype)
    if d == np.float64:
        return np.float32
    if d == np.complex128:
        return np.complex64
    return dtype


def check_tolerance(dtype, n: int) -> float:
    """Type-scaled residual threshold, reference-style (``check_cholesky``
    norm-ratio bounds in ``miniapp_cholesky.cpp``): the miniapp checks return
    relative Frobenius residuals, expected O(eps * sqrt(n)) for backward-
    stable algorithms; allow a generous constant but fail anything that is
    wrong rather than merely inaccurate."""
    eps = float(np.finfo(np.zeros((), dtype).real.dtype).eps)
    return 200.0 * eps * max(float(n), 1.0) ** 0.5
