#!/usr/bin/env python
"""Scaling-study driver.

Equivalent of the reference's job-generation scripts
(``scripts/gen_dlaf_{strong,weak}-{mc,gpu}.py`` + ``scripts/miniapps.py``):
runs a miniapp over a list of grid shapes / matrix sizes and collects the
``CSVData-2`` rows into one CSV file for ``plot_scaling.py``.

Strong scaling: fixed -n over growing grids.  Weak scaling: -n grows with
sqrt(devices) so per-device memory stays constant.

Example:
  python scripts/run_scaling.py cholesky --mode weak -n 4096 -b 512 \
      --grids 1x1 2x2 2x4 --out scaling.csv
"""

from __future__ import annotations

import argparse
import math
import os as _os
import subprocess
import sys
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("miniapp", help="miniapp module name, e.g. cholesky")
    p.add_argument("--mode", choices=["strong", "weak"], default="strong")
    p.add_argument("-n", "--matrix-size", type=int, default=4096)
    p.add_argument("-b", "--block-size", type=int, default=512)
    p.add_argument("--grids", nargs="+", default=["1x1"],
                   help="grid shapes like 2x4")
    p.add_argument("--nruns", type=int, default=3)
    p.add_argument("--type", default="s")
    p.add_argument("--out", default="scaling.csv")
    args = p.parse_args()

    rows = []
    for g in args.grids:
        pr, pc = (int(x) for x in g.split("x"))
        n = args.matrix_size
        if args.mode == "weak":
            n = int(round(args.matrix_size * math.sqrt(pr * pc)))
            n -= n % args.block_size or 0
        cmd = [sys.executable, "-m", f"dlaf_tpu.miniapp.{args.miniapp}",
               "-n", str(n), "-b", str(args.block_size),
               "--grid-rows", str(pr), "--grid-cols", str(pc),
               "--nruns", str(args.nruns), "--type", args.type, "--csv"]
        print("+", " ".join(cmd), flush=True)
        out = subprocess.run(cmd, capture_output=True, text=True)
        print(out.stdout)
        if out.returncode != 0:
            print(out.stderr, file=sys.stderr)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("CSVData-2"):
                rows.append(line)

    with open(args.out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
