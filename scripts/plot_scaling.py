#!/usr/bin/env python
"""Parse ``CSVData-2`` rows and print/plot strong- or weak-scaling curves.

Equivalent of the reference's ``scripts/plot_*_{strong,weak}.py`` +
``postprocess.py``: groups rows by (miniapp, matrix size), reports best
GFlop/s per grid and parallel efficiency vs the smallest grid.  Writes a PNG
when matplotlib is available, otherwise prints a table.
"""

from __future__ import annotations

import argparse
import collections


def parse(path):
    rows = []
    for line in open(path):
        if not line.startswith("CSVData-2"):
            continue
        parts = [x.strip() for x in line.split(",")]
        kv = dict(zip(parts[1::2], parts[2::2]))
        rows.append(kv)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--png", default=None)
    args = p.parse_args()

    rows = parse(args.csv)
    groups = collections.defaultdict(dict)
    for r in rows:
        key = (r.get("miniapp", "?"), r["matrixsize"], r["blocksize"])
        grid = (int(r["gridrows"]), int(r["gridcols"]))
        gf = float(r["gflops"])
        cur = groups[key].get(grid, 0.0)
        groups[key][grid] = max(cur, gf)

    for key, bygrid in groups.items():
        name, n, nb = key
        print(f"\n{name} n={n} nb={nb}")
        grids = sorted(bygrid, key=lambda g: g[0] * g[1])
        base_g = grids[0]
        base = bygrid[base_g] / (base_g[0] * base_g[1])
        print(f"{'grid':>8} {'devices':>8} {'GFlop/s':>10} {'eff %':>6}")
        for g in grids:
            d = g[0] * g[1]
            eff = 100.0 * bygrid[g] / (base * d)
            print(f"{g[0]}x{g[1]:>6} {d:>8} {bygrid[g]:>10.1f} {eff:>6.1f}")

    if args.png:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; table only")
            return
        fig, ax = plt.subplots()
        for key, bygrid in groups.items():
            grids = sorted(bygrid, key=lambda g: g[0] * g[1])
            xs = [g[0] * g[1] for g in grids]
            ys = [bygrid[g] for g in grids]
            ax.plot(xs, ys, marker="o", label=f"{key[0]} n={key[1]}")
        ax.set_xlabel("devices")
        ax.set_ylabel("GFlop/s")
        ax.set_xscale("log", base=2)
        ax.legend()
        fig.savefig(args.png, dpi=120, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
