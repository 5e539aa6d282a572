#!/usr/bin/env python
"""AOT memory analysis of the wavefront chase scan (no execution).

Compiles `_wavefront_scan` + the BT window gather for the given sizes and
prints XLA's memory_analysis — run before attempting a new size on the
shared TPU worker (advisor r3: the emission-order ys output is ~2x the
compact stream; raw+windowed transiently coexist in the BT gather).

Usage: python scripts/wavefront_mem.py [n ...]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dlaf_tpu.algorithms.eigensolver.hh_chase import hh_schedule
    from dlaf_tpu.algorithms.eigensolver.wavefront_chase import (
        _gather_seg_jit, _segment_iters, _wavefront_scan_seg,
        _wavefront_width)

    ns = [int(a) for a in _sys.argv[1:]] or [32768]
    b = 128
    for n in ns:
        W = _wavefront_width(n, b)
        LD = 2 * b + 1
        niter = _segment_iters(n, b, 4)
        nsweeps = max(n - 2, 0)
        nseg = -(-nsweeps // niter)
        NPf = n + W * (3 * b - 1) + 2 * b + 1
        flat = jax.ShapeDtypeStruct((NPf, LD), jnp.float32)
        vsh = jax.ShapeDtypeStruct((W, b), jnp.float32)
        tsh = jax.ShapeDtypeStruct((W,), jnp.float32)
        it0 = jax.ShapeDtypeStruct((), jnp.int32)
        comp = jax.jit(
            _wavefront_scan_seg.__wrapped__,
            static_argnames=("n", "b", "niter"),
            donate_argnums=(0, 1, 2)).lower(
                flat, vsh, tsh, it0, n=n, b=b, niter=niter).compile()
        ma = comp.memory_analysis()
        gb = 1 / (1 << 30)
        print(f"n={n} b={b} W={W} niter={niter} x{nseg} segs: scan-seg args "
              f"{ma.argument_size_in_bytes*gb:.2f} "
              f"out {ma.output_size_in_bytes*gb:.2f} temp "
              f"{ma.temp_size_in_bytes*gb:.2f} alias "
              f"{ma.alias_size_in_bytes*gb:.2f} GB", flush=True)

        # segment gather: out accumulates while one segment is read
        _, R = hh_schedule(n, b)
        out = jax.ShapeDtypeStruct((R, b), jnp.float32)
        seg = jax.ShapeDtypeStruct((niter * 3 * W, b), jnp.float32)
        loc = jax.ShapeDtypeStruct((R,), jnp.int32)
        comp2 = jax.jit(
            _gather_seg_jit.__wrapped__,
            donate_argnums=(0, 1)).lower(out, seg, loc).compile()
        ma2 = comp2.memory_analysis()
        print(f"  seg-gather (compact R={R} = {R*b*4*gb:.2f} GB; raw total "
              f"{nseg*niter*3*W*b*4*gb:.2f} GB in {nseg} segs): args "
              f"{ma2.argument_size_in_bytes*gb:.2f} out "
              f"{ma2.output_size_in_bytes*gb:.2f} temp "
              f"{ma2.temp_size_in_bytes*gb:.2f} alias "
              f"{ma2.alias_size_in_bytes*gb:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
