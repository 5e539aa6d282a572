#!/usr/bin/env python
"""AOT memory analysis of the reduction main sweep at n=32768: find the
aliasing break that makes temps superlinear in the band (VERDICT r4 #3 /
CLAUDE.md r6: b=512 -> 6.9 GB temps, b=1024 -> 13.1 GB).

Compile-only (no HBM beyond compile); prints memory_analysis per band
and the biggest temp-shaped instructions from the optimized HLO.
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def probe(n, b, dump_big=True):
    from dlaf_tpu.algorithms.eigensolver.reduction_to_band import (
        _bucket_granule, _main_jit_for)
    from dlaf_tpu.matrix.distribution import Distribution

    dist = Distribution((n, n), (2048, 2048))
    G = _bucket_granule(n, b)
    ws = jax.ShapeDtypeStruct((n + G, n + G), jnp.float32)
    fn = _main_jit_for(dist, None, b, G)
    lowered = fn.lower(ws)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    print(f"n={n} b={b} G={G}: "
          f"temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
          f"arg={ma.argument_size_in_bytes/2**30:.2f} "
          f"out={ma.output_size_in_bytes/2**30:.2f} "
          f"alias={ma.alias_size_in_bytes/2**30:.2f}", flush=True)
    if not dump_big:
        return
    txt = comp.as_text()
    # histogram of big f32 shapes appearing as instruction outputs
    sizes = collections.Counter()
    for m in re.finditer(r"f32\[(\d+),(\d+)\]", txt):
        r, c = int(m.group(1)), int(m.group(2))
        byt = r * c * 4
        if byt >= 1 << 28:            # >= 256 MB
            sizes[(r, c)] += 1
    for (r, c), cnt in sorted(sizes.items(),
                              key=lambda kv: -kv[0][0] * kv[0][1]):
        print(f"  f32[{r},{c}] ({r*c*4/2**30:.2f} GiB) x{cnt}")
    # copy/fusion ops on workspace-sized arrays = the aliasing breaks
    nG = None
    for line in txt.splitlines():
        if "copy" in line and re.search(r"f32\[3\d{4},3\d{4}\]", line):
            print("  COPY:", line.strip()[:160])


if __name__ == "__main__":
    n = int(os.environ.get("PROBE_N", "32768"))
    for b in [int(x) for x in
              os.environ.get("PROBE_BANDS", "512,1024").split(",")]:
        probe(n, b)
