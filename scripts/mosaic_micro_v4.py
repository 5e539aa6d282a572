#!/usr/bin/env python
"""Micro-costs of the BATCHED-slot pallas-chase (v4) candidate
primitives on the real chip.  One kernel, `which` selects the primitive
at runtime, `reps` is a dynamic inner-loop count -> one compile total;
slope-timed across two rep counts.

Primitives (G=8 slots, b=128, 3b=384):
  0 baseline      : copy [Gb, 3b] VMEM value (read+write)
  1 bt3d          : batched per-slot transpose [G, b, b] axes (0,2,1)
  2 mxu_tr        : batched vector transpose via MXU ([b, G] -> [G, b])
  3 reshape_gb    : [G, b] -> [G*b, 1] reshape (row-major flatten)
  4 ind_mxu       : indicator matmul [G, G*b] @ [G*b, b]
  5 lanered       : lane reduce sum [G*b, 3b] -> [G*b, 1]
  6 bcast         : [G, b] -> broadcast [G, b, b] -> reshape [G*b, b]
  7 pass384       : one where+static-roll pass on [G*4b, 3b] (tl_shift unit)
  8 gather8       : 8 predicated copies [4b, 3b] slab gather
  9 mxu_big       : [G*b, b] @ [b, b] MXU
 10 mxu_small     : [b, b] @ [b, b] MXU (x8 to compare issue amortization)
 11 dyn3d_store   : dynamic-leading-index [8, b] store into [W8, 8, b]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

G, b = 8, 128
TB = 3 * b


def kernel(reps_ref, big_in, out_ref, big, sm, v3d, *, WHICH):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    which = WHICH
    reps = reps_ref[0]
    dt = jnp.float32
    ind = (lax.broadcasted_iota(jnp.int32, (G, G * b), 1) // b ==
           lax.broadcasted_iota(jnp.int32, (G, G * b), 0)).astype(dt)
    eye = (lax.broadcasted_iota(jnp.int32, (b, b), 0) ==
           lax.broadcasted_iota(jnp.int32, (b, b), 1)).astype(dt)

    @pl.when(pl.program_id(0) == 0)
    def _():
        big[...] = big_in[...]
        sm[...] = big_in[0:G, 0:b]
        out_ref[...] = jnp.zeros_like(out_ref)

    def run(w, body):
        if w != WHICH:
            return
        if True:
            def it(i, c):
                return body(i, c)
            acc = lax.fori_loop(0, reps, it, jnp.zeros((), dt))
            out_ref[...] = jnp.full((8, 128), acc, dt)

    # 0: copy value
    run(0, lambda i, c: c + big[0:G * b, :][0, 0])
    # 1: batched 3D transpose
    def b1(i, c):
        x = big[0:G * b, 0:b].reshape(G, b, b)
        y = jnp.swapaxes(x, 1, 2)
        big[0:G * b, 0:b] = y.reshape(G * b, b)
        return c + 1.0
    run(1, b1)
    # 2: MXU batched vector transpose
    def b2(i, c):
        x = big[0:b, 0:G]                     # [b, G]
        y = lax.dot_general(x, eye, (((0,), (0,)), ((), ())),
                            preferred_element_type=dt,
                            precision=lax.Precision.HIGHEST)  # [G, b]
        sm[...] = y
        return c + 1.0
    run(2, b2)
    # 3: [G, b] -> [G*b, 1] reshape
    def b3(i, c):
        y = sm[...].reshape(G * b, 1)
        big[0:G * b, 0:1] = y
        return c + 1.0
    run(3, b3)
    # 4: indicator matmul
    def b4(i, c):
        y = lax.dot_general(ind, big[0:G * b, 0:b],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=dt,
                            precision=lax.Precision.HIGHEST)  # [G, b]
        sm[...] = y
        return c + 1.0
    run(4, b4)
    # 5: lane reduce
    def b5(i, c):
        y = jnp.sum(big[0:G * b, :], axis=1, keepdims=True)
        big[0:G * b, 0:1] = y
        return c + 1.0
    run(5, b5)
    # 6: sublane broadcast per block
    def b6(i, c):
        y = jnp.broadcast_to(sm[...][:, None, :], (G, b, b))
        big[0:G * b, 0:b] = y.reshape(G * b, b)
        return c + 1.0
    run(6, b6)
    # 7: one tl_shift-style pass on [G*4b, 3b]
    from jax.experimental.pallas import tpu as _pt
    def b7(i, c):
        x = big[...]
        x = jnp.where(i % 2 == 0, _pt.roll(x, 16, axis=1), x)
        big[...] = x
        return c + 1.0
    run(7, b7)
    # 8: 8 copies [4b, 3b] (slab gather within VMEM)
    def b8(i, c):
        for k in range(8):
            big[k * 4 * b // 8:(k * 4 * b // 8) + 4 * b // 8, :] = \
                big[2 * b + k * 16: 2 * b + k * 16 + 4 * b // 8, :]
        return c + 1.0
    run(8, b8)
    # 9: big MXU
    def b9(i, c):
        y = lax.dot_general(big[0:G * b, 0:b], eye,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=dt,
                            precision=lax.Precision.HIGHEST)
        big[0:G * b, 0:b] = y
        return c + 1.0
    run(9, b9)
    # 10: 8x small MXU
    def b10(i, c):
        for k in range(8):
            y = lax.dot_general(big[k * b:(k + 1) * b, 0:b], eye,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=dt,
                                precision=lax.Precision.HIGHEST)
            big[k * b:(k + 1) * b, 0:b] = y
        return c + 1.0
    run(10, b10)
    # 11: dynamic-leading-index 3D store
    def b11(i, c):
        idx = lax.rem(i, 16)
        v3d[idx] = sm[...]
        return c + 1.0
    run(11, b11)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    dt = jnp.float32
    big_in = jnp.ones((G * 4 * b, TB), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((G * 4 * b, TB), dt),
                        pltpu.VMEM((G, b), dt),
                        pltpu.VMEM((16, G, b), dt)],
    )
    from functools import partial as _p
    fns = {}

    def jfn(w, r):
        if w not in fns:
            f = pl.pallas_call(
                _p(kernel, WHICH=w), grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((8, 128), dt)],
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )
            fns[w] = jax.jit(
                lambda r, f=f: f(jnp.asarray([r], jnp.int32), big_in))
        return fns[w](r)

    def timed(w, r, k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = jfn(w, r)
        o[0].ravel()[0].item()
        return time.perf_counter() - t0

    names = ["copy", "bt3d", "mxu_tr", "reshape_gb", "ind_mxu",
             "lanered", "bcast", "pass384", "gather8", "mxu_big",
             "mxu_small8", "dyn3d_store"]
    print("warm", timed(0, 4, 1), flush=True)
    for w, nm in enumerate(names):
        try:
            r_lo, r_hi = 64, 1088
            t_lo = min(timed(w, r_lo, 3) for _ in range(3))
            t_hi = min(timed(w, r_hi, 3) for _ in range(3))
            per = (t_hi - t_lo) / (r_hi - r_lo) / 3  # 3 calls per timed
            print(f"{w:2d} {nm:12s} {per*1e6:9.3f} us/op", flush=True)
        except Exception as e:
            print(f"{w:2d} {nm:12s} FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
