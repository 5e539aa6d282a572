#!/usr/bin/env python
"""Single-chip HEEV at the north-star size n = 32768 (fp32, band 128).

Memory plan (16 GB v5e): input donated after reduction (driver
donate_input), streamed D&C merge keeps peak at Q + Qn (~8.6 GB), BT
stages hold mat_hh + E (~8.6 GB) + the 2.1 GB reflector stream.
Run from the repo root on the default (TPU) environment.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from dlaf_tpu import hermitian_eigensolver
    from dlaf_tpu.matrix import util as mu
    from dlaf_tpu.matrix.matrix import DistMatrix
    from dlaf_tpu.tune import set_tune_parameters

    import sys as _s
    n = int(_s.argv[1]) if len(_s.argv) > 1 else 32768
    nb, band = (2048 if n >= 16384 else 1024), 128
    # lean settings: every stage <= ~9.5 GB so the run survives heavy
    # co-tenant HBM pressure on the shared worker (defaults peak ~10.5)
    set_tune_parameters(trace_eigensolver_stages=True, bt_group_size=128,
                        dc_stage_bytes=512 << 20, dc_lean_bytes=512 << 20,
                        dc_lean_rowblock=2048, bt_r2b_chunk_cols=1024,
                        bt_r2b_group_size=2)
    sbr = int(os.environ.get("HEEV32K_SBR", "0"))
    if sbr:
        set_tune_parameters(eigensolver_sbr_band=sbr)
        print(f"SBR enabled: b1={sbr}", flush=True)

    print(f"building input n={n} (device-side, lean)", flush=True)
    mat = mu.random_hermitian_dist(n, nb, dtype=np.float32, seed=11)
    probe_rows = np.asarray(mat.to_natural()[:64]) \
        if not os.environ.get("HEEV32K_SKIP_PROBE") else None

    # pass OWNERSHIP: the driver drops its reference after the reduction
    # (donate_input), but that only frees the buffer if this frame does
    # not also hold one — `hermitian_eigensolver(mat, ...)` would keep
    # the 4.3 GB input alive through every later stage (found the hard
    # way: SBR stage-2 OOMed at 32k with the window open)
    holder = [mat]
    del mat
    t0 = time.time()
    lam, v = hermitian_eigensolver(holder.pop(), "L", band_size=band,
                                   donate_input=True)
    lam = np.asarray(lam)
    v.data[0, 0].item()      # wait for the LAST stage, not just D&C
    t1 = time.time()
    print(f"HEEV n={n} wall {t1 - t0:.1f}s (cold, incl. compile)",
          flush=True)
    if os.environ.get("HEEV32K_WARM_REPEAT"):
        del v
        # co-tenant waves OOM individual warm solves; a cold number is
        # already banked by this point, so retry the warm one in-process
        # (each pass rebuilds the input; gc drops the dead transients)
        import gc
        warm_ok = False
        gc.collect()
        # axon relays deallocations asynchronously: give the server a
        # moment to actually release the 4.3 GB eigenvector buffer
        # before the warm input build asks for the same space (every
        # warm trial 0 was failing at the INPUT BUILD right after a
        # successful cold solve — no [stage] line ever printed)
        time.sleep(8)
        for trial in range(3):
            try:
                if trial >= 1 and sbr:
                    # last resort: the SBR stage-2 workspace (Ap 4.88 +
                    # packed 2.15 + scan temps ~ 9.5 GB at b1=1024) is
                    # the peak that keeps OOMing next to co-tenants;
                    # the one-stage path peaks ~8 GB and its warm red
                    # is only ~5 s slower at 32k
                    set_tune_parameters(eigensolver_sbr_band=band)
                    print("warm trial 2: one-stage fallback", flush=True)
                holder = [mu.random_hermitian_dist(n, nb,
                                                   dtype=np.float32,
                                                   seed=12 + trial)]
                t2 = time.time()
                lam, v = hermitian_eigensolver(holder.pop(), "L",
                                               band_size=band,
                                               donate_input=True)
                lam = np.asarray(lam)
                v.data[0, 0].item()  # wait for the LAST stage
                t3 = time.time()
                print(f"HEEV n={n} wall {t3 - t2:.1f}s "
                      f"(WARM, in-process)", flush=True)
                warm_ok = True
                break
            except Exception as exc:              # noqa: BLE001
                print(f"warm trial {trial} failed: "
                      f"{str(exc).splitlines()[0][:200]}", flush=True)
                del exc
                gc.collect()
                time.sleep(120)
        if not warm_ok:
            # cold numbers are banked in the log; a nonzero exit keeps
            # the retry loop cycling until a WARM solve lands
            print("no warm solve landed; exiting 3", flush=True)
            raise SystemExit(3)

    if os.environ.get("HEEV32K_SKIP_PROBE"):
        # the probe fetches the full 4.3 GB eigenvector matrix through
        # the ~27 MB/s tunnel (minutes); timing-only runs skip it
        print(f"lam[0]={lam[0]:.6f} lam[-1]={lam[-1]:.6f} "
              f"sorted={bool(np.all(np.diff(lam) >= -1e-3))}")
        return

    # residual on a 64-row probe: ||A[:64] V - V[:64] diag(lam)||
    vn = np.asarray(v.to_natural())
    r = probe_rows @ vn - vn[:64] * lam[None, :]
    rel = np.linalg.norm(r) / max(np.linalg.norm(probe_rows @ vn), 1e-30)
    print(f"probe residual {rel:.3e}")
    print(f"lam[0]={lam[0]:.6f} lam[-1]={lam[-1]:.6f} "
          f"sorted={bool(np.all(np.diff(lam) >= -1e-3))}")


if __name__ == "__main__":
    main()
