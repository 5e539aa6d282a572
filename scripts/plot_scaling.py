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
    p.add_argument("--weak", action="store_true",
                   help="weak-scaling table: rows with DIFFERENT matrix "
                        "sizes compare by per-device rate (the reference's "
                        "plot_*_weak.py efficiency definition)")
    args = p.parse_args()

    rows = parse(args.csv)
    groups = collections.defaultdict(dict)
    for r in rows:
        # weak runs grow n with the grid: group across sizes
        key = ((r.get("miniapp", "?"), r["blocksize"]) if args.weak
               else (r.get("miniapp", "?"), r["matrixsize"],
                     r["blocksize"]))
        grid = (int(r["gridrows"]), int(r["gridcols"]))
        gf = float(r["gflops"])
        cur = groups[key].get(grid, (0.0, ""))[0]
        if gf >= cur:
            groups[key][grid] = (gf, r["matrixsize"])

    for key, bygrid in groups.items():
        if args.weak:
            name, nb = key
            print(f"\n{name} (weak scaling) nb={nb}")
        else:
            name, n, nb = key
            print(f"\n{name} n={n} nb={nb}")
        grids = sorted(bygrid, key=lambda g: g[0] * g[1])
        base_g = grids[0]
        base = bygrid[base_g][0] / (base_g[0] * base_g[1])
        print(f"{'grid':>8} {'devices':>8} {'n':>8} {'GFlop/s':>10} "
              f"{'eff %':>6}")
        for g in grids:
            d = g[0] * g[1]
            gf, n_g = bygrid[g]
            # weak efficiency = per-device rate vs the base grid's
            eff = 100.0 * gf / (base * d)
            print(f"{g[0]}x{g[1]:>6} {d:>8} {n_g:>8} {gf:>10.1f} "
                  f"{eff:>6.1f}")

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
            ys = [bygrid[g][0] for g in grids]
            ax.plot(xs, ys, marker="o", label=f"{key[0]} n={key[1]}")
        ax.set_xlabel("devices")
        ax.set_ylabel("GFlop/s")
        ax.set_xscale("log", base=2)
        ax.legend()
        fig.savefig(args.png, dpi=120, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
