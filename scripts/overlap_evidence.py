#!/usr/bin/env python
"""Measure comm/compute overlap in the scheduled TPU programs.

AOT-compiles the distributed drivers for a detached ``v5e:2x4`` topology and
reports, per algorithm, how many async collectives have real compute (fusion/
dot) scheduled inside their start..done window by XLA's latency-hiding
scheduler — the TPU analogue of the reference's RoundRobin lookahead panels
(``factorization/cholesky/impl.h:218-221``).

Run from the repo root on the default (axon/TPU) environment:
    python scripts/overlap_evidence.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def abstract_dist_matrix(n, nb, grid, dtype="float32"):
    import jax

    from dlaf_tpu.matrix.distribution import Distribution
    from dlaf_tpu.matrix.matrix import DistMatrix

    dist = Distribution((n, n), (nb, nb), grid.shape)
    data = jax.ShapeDtypeStruct(dist.padded_size, dtype,
                                sharding=grid.sharding())
    return DistMatrix(data, dist, grid)


def main():
    from dlaf_tpu import (cholesky_factorization, triangular_solver,
                          general_multiplication)
    from dlaf_tpu.utils.overlap import overlap_report, tpu_topology_grid

    import jax

    grid = tpu_topology_grid((2, 4))
    n, nb = 2048, 256
    a = abstract_dist_matrix(n, nb, grid)
    b = abstract_dist_matrix(n, nb, grid)

    cases = {
        "cholesky": lambda: jax.jit(
            lambda m: cholesky_factorization(m).data).lower(a).compile(),
        "trsm_LLNN": lambda: jax.jit(
            lambda l, r: triangular_solver(
                "L", "L", "N", "N", 1.0, l, r).data).lower(a, b).compile(),
        "gemm": lambda: jax.jit(
            lambda x, y: general_multiplication(
                1.0, "N", x, "N", y, 0.0, y).data).lower(a, b).compile(),
    }

    results = {}
    for name, build in cases.items():
        comp = build()
        rep = overlap_report(comp.as_text())
        results[name] = rep
        print(f"{name}: {rep['with_compute_in_window']}/{rep['collectives']} "
              f"collectives overlap compute "
              f"({rep['total_compute_ops_hidden']} compute ops hidden)")
        for kind, d in rep["by_kind"].items():
            print(f"  {kind}: {d['overlapped']}/{d['count']} "
                  f"({d['compute_hidden']} hidden)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
