"""Benchmark timing utilities.

Equivalent of the reference's ``common::Timer`` + miniapp protocol
(``miniapp/miniapp_cholesky.cpp:128-190``: warmups, barrier-fenced per-run
wall times).  On the tunneled TPU platform ``block_until_ready`` does not
synchronize and device->host fetches carry seconds of relay latency, so the
robust primitive is *slope timing*: dispatch K in-order executions, fetch one
scalar from the last (the device executes queued programs in order), and
difference two K values to cancel the constant overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def slope_time(fn, *args, k_lo: int = 1, k_hi: int = 9, reps: int = 3
               ) -> float:
    """Seconds per execution of ``fn(*args)``, overhead-cancelled."""

    def timed(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            r = fn(*args)
        _force(r)
        return time.perf_counter() - t0

    timed(1)  # compile + warm
    t_lo = min(timed(k_lo) for _ in range(reps))
    t_hi = min(timed(k_hi) for _ in range(reps))
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


def _force(r):
    """Force execution by fetching one scalar from the last result."""
    leaves = jax.tree_util.tree_leaves(r)
    for leaf in reversed(leaves):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            jnp.asarray(leaf).ravel()[0:1].block_until_ready()
            _ = jnp.asarray(leaf).ravel()[0].item()
            return
    jax.block_until_ready(r)


def run_benchmark(fn, *args, nruns: int = 5, nwarmups: int = 1):
    """Reference miniapp protocol: warmups then timed runs.

    Returns a list of per-run seconds.  Uses slope timing per "run" so the
    numbers are honest on the tunneled platform as well as on CPU.
    """
    for _ in range(nwarmups):
        _force(fn(*args))
    times = []
    for _ in range(nruns):
        times.append(slope_time(fn, *args, k_lo=1, k_hi=3, reps=1))
    return times
