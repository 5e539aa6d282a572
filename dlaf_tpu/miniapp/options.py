"""Common miniapp command-line options + dispatch.

Equivalent of the reference's ``miniapp/include/dlaf/miniapp/options.h``
(flags at ``options.h:41-217``: ``--type s|d|c|z``, ``--grid-rows/cols``,
``--nruns``, ``--nwarmups``, ``--check last|all|none``, ``--csv``) and of the
``--dlaf:*`` tune-parameter plumbing (``src/init.cpp:203-230``; here any
``--dlaf:key=value`` sets the matching ``TuneParameters`` field, layered
defaults <- env DLAF_* <- command line, same precedence as the reference).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..tune import get_tune_parameters, set_tune_parameters

TYPE_MAP = {
    "s": np.float32,
    "d": np.float64,
    "c": np.complex64,
    "z": np.complex128,
}


def make_parser(name: str, m_default=4096, nb_default=256) -> \
        argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=f"miniapp_{name}",
        description=f"dlaf_tpu miniapp: {name} (reference miniapp_{name})")
    p.add_argument("--type", choices="sdcz", default="d",
                   help="scalar type: s|d|c|z (default d)")
    p.add_argument("--matrix-size", "-n", type=int, default=m_default)
    p.add_argument("--block-size", "-b", type=int, default=nb_default)
    p.add_argument("--grid-rows", type=int, default=1)
    p.add_argument("--grid-cols", type=int, default=1)
    p.add_argument("--nruns", type=int, default=3)
    p.add_argument("--nwarmups", type=int, default=1)
    p.add_argument("--check", choices=["last", "all", "none"],
                   default="none")
    p.add_argument("--csv", action="store_true",
                   help="print a CSVData-2 row per run")
    p.add_argument("--local", action="store_true",
                   help="force the process-local (no-grid) backend")
    return p


def apply_dlaf_args(argv, strict: bool = True):
    """Apply ``--dlaf:key=value`` entries to TuneParameters; returns the
    remaining (non-dlaf) arguments.  ``strict=False`` skips unknown keys
    (the reference's ``allow_unregistered`` init path)."""
    rest = []
    for arg in argv:
        if not str(arg).startswith("--dlaf:"):
            rest.append(arg)
            continue
        kv = str(arg)[len("--dlaf:"):]
        if "=" not in kv:
            if strict:
                raise SystemExit(f"malformed tune flag {arg!r}")
            continue
        k, v = kv.split("=", 1)
        cur = getattr(get_tune_parameters(), k, None)
        if cur is None:
            if strict:
                raise SystemExit(f"unknown tune parameter {k!r}")
            continue
        cast = type(cur)
        if cast is bool:
            v = v.strip().upper() in ("1", "ON", "TRUE", "YES")
        else:
            v = cast(v)
        set_tune_parameters(**{k: v})
    return rest


def parse_with_tune(parser: argparse.ArgumentParser, argv=None):
    """Parse args; ``--dlaf:key=value`` entries update TuneParameters."""
    argv = list(sys.argv[1:] if argv is None else argv)
    return parser.parse_args(apply_dlaf_args(argv))


def build_grid(args):
    """Grid from --grid-rows/cols (None = process-local backend)."""
    if args.local or (args.grid_rows == 1 and args.grid_cols == 1):
        return None
    from ..parallel.grid import Grid
    return Grid((args.grid_rows, args.grid_cols))


def dtype_of(args):
    return TYPE_MAP[args.type]


def report(name, args, run_idx, seconds, gflops, extra=""):
    """Reference-style result line + optional CSVData-2 row
    (``miniapp_cholesky.cpp:174-190``)."""
    print(f"[{run_idx}] {seconds:.6f}s {gflops:.2f}GFlop/s "
          f"({args.matrix_size}, {args.matrix_size}) "
          f"({args.block_size}, {args.block_size}) "
          f"({args.grid_rows}, {args.grid_cols}) {extra}")
    if args.csv:
        print(f"CSVData-2, run, {run_idx}, matrixsize, {args.matrix_size}, "
              f"blocksize, {args.block_size}, gridrows, {args.grid_rows}, "
              f"gridcols, {args.grid_cols}, time_s, {seconds:.6f}, "
              f"gflops, {gflops:.3f}, type, {args.type}, miniapp, {name}")
    sys.stdout.flush()
