"""Householder bulge-chasing band -> tridiagonal reduction (hb2st-style).

Second implementation of the reference's ``band_to_tridiagonal``
(``eigensolver/band_to_tridiag/mc.h`` — CPU-only ``SweepWorker`` running
length-``b`` Householder sweeps), replacing the Givens chase in
``band_to_tridiag.py`` as the default: one reflector annihilates ``b-1``
entries, so the value stream shipped from the host chase to the device
back-transform is ``~n^2/2`` scalars instead of the Givens chase's
``~2 n^2 ln b`` — and, crucially, the back-transform becomes *blocked*
(compact-WY) reflector application: pure MXU gemms (``bt_hh.py``), the TPU
analogue of the reference's grouped HH apply
(``bt_band_to_tridiag/impl.h``, ``bt_band_to_tridiag_hh_apply_group_size``).

Algorithm (standard successive band reduction, one stage b -> 1):

* sweep ``s`` (for ``s = 0 .. n-3``) annihilates column ``s`` below the
  first subdiagonal with a length-``min(b, n-1-s)`` reflector;
* the two-sided application to the diagonal block spills a bulge into the
  off-diagonal block below, whose first column is annihilated by the next
  reflector of the sweep — positions are static: reflector ``(s, t)`` acts
  on rows ``[1+s+t*b, 1+s+t*b+l)``, ``l = min(b, n-1-s-t*b)``, and exists
  iff ``l >= 2``;
* the leftover bulge columns are picked up by the *following* sweeps (the
  interleaving invariant of bulge chasing); running sweeps sequentially is
  a valid linearization of the reference's pipelined worker DAG;
* by the LAPACK ``larfg`` convention the produced subdiagonal is real, so
  no phase diagonal is needed (unlike the Givens chase).

The value recurrence is sequential and stays on the host (the reference
keeps this stage CPU-only as well): a C++ kernel (``ops/native/
hh_chase.cpp``) with pipelined-sweep thread parallelism, with this
module's numpy implementation as reference/fallback.

Why the band is gathered rather than 1D-block distributed (the
reference's ``BandBlock<dist>`` + ``SweepWorkerDist`` P2P pipeline,
``band_to_tridiag/mc.h:173-186,569``): the reference distributes because
its band lives in rank-local tile memory and MPI ranks each own a slice —
the chase *must* pipeline across ranks.  Here the band is O(n·b) values
(17 MB at n = 32768, b = 128) against an O(n^2/D) per-device budget
measured in GB, so the single-controller host always holds it trivially;
the chase's parallelism comes from the same staggered-sweep pipeline the
reference uses across ranks, executed across host threads (sweep ``s``
step ``t`` waits on sweep ``s-1`` step ``t+2``).  The P2P primitive the
distributed variant would ride (``MeshComm.shift_p/q``) exists for the
multi-host case where host memory, not device memory, became the bound.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np


def sweep_reflector_counts(n: int, b: int) -> np.ndarray:
    """Number of chase reflectors per sweep; sweep ``s`` has reflectors
    ``t = 0 .. (n-3-s)//b`` (those with length >= 2)."""
    if n < 3 or b < 2:        # band 1 is already tridiagonal
        return np.zeros(0, np.int64)
    s = np.arange(max(n - 2, 0), dtype=np.int64)
    cnt = np.where(n - 1 - s >= 2, (n - 3 - s) // b + 1, 0)
    return cnt


@lru_cache(maxsize=8)
def hh_schedule(n: int, b: int):
    """Static reflector table: ``(offsets[s], total)`` with sweep-major
    reflector order; reflector ``r = offsets[s] + t``."""
    cnt = sweep_reflector_counts(n, b)
    off = np.zeros(len(cnt) + 1, np.int64)
    np.cumsum(cnt, out=off[1:])
    return off, int(off[-1])


def _larfg(x: np.ndarray):
    """LAPACK larfg: H = I - tau v v^H with v[0] = 1, H^H x = beta e1,
    beta real.  Returns (v, tau, beta)."""
    alpha = x[0]
    xnorm = float(np.linalg.norm(x[1:]))
    if xnorm == 0.0 and np.imag(alpha) == 0.0:
        v = np.zeros_like(x)
        v[0] = 1.0
        return v, x.dtype.type(0), np.real(alpha)
    beta = -np.sign(np.real(alpha)) * np.hypot(abs(alpha), xnorm)
    if beta == 0:
        beta = -np.hypot(abs(alpha), xnorm)
    tau = (beta - alpha) / beta
    v = x / (alpha - beta)
    v[0] = 1.0
    return v, x.dtype.type(tau), float(beta)


@dataclasses.dataclass
class HHChaseResult:
    """Tridiagonal + the reflector stream for the back-transform.

    ``Band = Q T Q^H`` with ``Q = H_1 H_2 ... H_R`` (chronological order);
    ``V[r, 0] = tau_r``, ``V[r, 1:l] = v_r[1:]`` (``v_r[0] = 1`` implied).
    The reference returns ``{tridiagonal, hh_reflectors}``
    (``band_to_tridiag/api.h``) with the same compact-copy convention
    (``mc.h`` ``compact_copy_to_tile``-equivalent layout).
    """

    d: np.ndarray        # [n] real diagonal
    e: np.ndarray        # [n-1] real nonneg subdiagonal
    V: np.ndarray        # [R, b] reflector stream, sweep-major
    n: int
    band: int
    #: complex input: unitary diagonal D with T_out = D^H T_chase D real
    #: nonnegative (the larfg convention leaves only the *last* subdiagonal
    #: complex for band >= 2, but band == 1 needs the full recurrence); the
    #: back-transform computes E <- Q (D E), i.e. scales row j by phases[j]
    #: before the reflector stream.  None for real input (e stays signed).
    phases: np.ndarray | None = None
    #: async upload pending: call :meth:`resolve_V` before using ``V``
    #: (``V`` is None until then; the upload drains behind the D&C stage)
    v_resolve: object | None = None
    #: wavefront chase: reflector stream in raw (emission-order) layout —
    #: a LIST of equal-size device segments (no single buffer > ~1 GiB,
    #: see wavefront_chase._wavefront_scan_seg) — plus the sweep-major ->
    #: raw row index map; :meth:`resolve_V` compacts,
    #: ``bt_hh_window_stream`` gathers straight to window order
    V_raw: object | None = None
    V_raw_map: object | None = None
    #: when the raw segments were COMPACTED to real rows (padding slots
    #: dropped: 4.33 -> 2.15 GB retained at n = 32768), the ascending
    #: host array of real raw indices; raw index -> compact position is
    #: ``searchsorted(V_raw_sel, idx)`` (wavefront_chase.gather_raw_rows)
    V_raw_sel: object | None = None

    def resolve_V(self):
        """Join a pending background reflector-stream upload / compact a
        raw wavefront stream (no-op if ``V`` is already materialized).

        Raises if the stream was already consumed (donated into a window
        gather) — a silent ``None`` here would surface much later as an
        opaque AttributeError inside the back-transform."""
        if self.v_resolve is not None:
            self.V = self.v_resolve()
            self.v_resolve = None
        if self.V is None and self.V_raw is not None:
            from .wavefront_chase import gather_raw_rows
            self.V = gather_raw_rows(self.V_raw, self.V_raw_map,
                                     sel=self.V_raw_sel)
            self.V_raw = self.V_raw_map = self.V_raw_sel = None
        if self.V is None:
            raise RuntimeError(
                "reflector stream already consumed (donated into "
                "bt_hh_window_stream); HHChaseResult supports one "
                "back-transform pass")
        return self.V


def hh_chase_numpy(ab2: np.ndarray, n: int, b: int) -> np.ndarray:
    """Reference/fallback chase over banded storage ``ab2[(2b+1), n]``
    (``ab2[i, j] = A[j+i, j]``), in place; returns the V stream."""
    dtype = ab2.dtype
    off, R = hh_schedule(n, b)
    V = np.zeros((R, b), dtype)

    def diag_block(j, l):
        D = np.zeros((l, l), dtype)
        for c in range(l):
            D[c:, c] = ab2[0:l - c, j + c]
        Df = D + np.tril(D, -1).conj().T
        return Df

    def put_diag_block(j, l, Df):
        for c in range(l):
            ab2[0:l - c, j + c] = Df[c:, c]

    def off_block(j, l, m):
        B = np.empty((m, l), dtype)
        for c in range(l):
            B[:, c] = ab2[l - c:l - c + m, j + c]
        return B

    def put_off_block(j, l, m, B):
        for c in range(l):
            ab2[l - c:l - c + m, j + c] = B[:, c]

    for s in range(max(n - 2, 0)):
        if n - 1 - s < 2:
            continue
        l0 = min(b, n - 1 - s)
        x = ab2[1:1 + l0, s].copy()
        v, tau, beta = _larfg(x)
        ab2[1, s] = beta
        ab2[2:1 + l0, s] = 0
        t = 0
        while True:
            j = 1 + s + t * b
            l = min(b, n - j)
            r = off[s] + t
            V[r, 0] = tau
            V[r, 1:l] = v[1:l]
            # two-sided H^H D H on the diagonal block
            D = diag_block(j, l)
            w = tau * (D @ v)
            w = w - (tau * np.vdot(w, v) / 2) * v   # (tau/2)(w^H v) v
            D = D - np.outer(w, v.conj()) - np.outer(v, w.conj())
            put_diag_block(j, l, D)
            m = min(b, n - b - j)
            if m <= 0:
                break
            B = off_block(j, l, m)
            B = B - tau * np.outer(B @ v, v.conj())
            if m > 1:
                v2, tau2, beta2 = _larfg(B[:, 0].copy())
                B[0, 0] = beta2
                B[1:, 0] = 0
                # left-apply H^H to the remaining bulge columns
                B[:, 1:] -= np.conj(tau2) * np.outer(v2,
                                                     v2.conj() @ B[:, 1:])
            put_off_block(j, l, m, B)
            if m <= 1:
                break
            v = v2          # next block size l' = min(b, n-j-b) == m
            tau = tau2
            t += 1
    return V


class _PumpHandle:
    """Background reflector-stream upload; ``join()`` waits for the last
    chunk to be handed to the device and re-raises any exception the
    pump thread hit (a silently-dead daemon pump would otherwise leave
    zero rows — tau=0 identity reflectors — and corrupt the
    back-transform without any error)."""

    def __init__(self, thread, exc_box):
        self._t = thread
        self._exc = exc_box

    def join(self):
        self._t.join()
        if self._exc[0] is not None:
            raise self._exc[0]


def _hh_chase_native(ab2: np.ndarray, n: int, b: int, chunk_cb=None,
                     detach_pump: bool = False):
    """Dispatch to the C++ kernel; None -> numpy fallback.

    ``chunk_cb(rows)``: optional — called with consecutive finished
    slices ``V[r0:r1]`` *while the chase still runs* (the ``_p`` kernel
    publishes a completed-row prefix), so the caller can overlap the
    host->device upload of the reflector stream with the remaining host
    compute.  The slices are final: the kernel release-stores the
    prefix after the rows are written.

    ``detach_pump=True``: return as soon as the *chase compute* is done
    (``ab2`` final), leaving the chunk pump running in a daemon thread;
    returns a :class:`_PumpHandle` instead of ``V``.  On the tunneled
    TPU the stream upload (~n^2/2 values at ~30 MB/s) outlasts the
    chase itself, so the caller lets it drain behind the following
    (device-bound) D&C stage and joins just before the back-transform.
    """
    import ctypes

    from ...ops.native import get_lib
    lib = get_lib()
    if lib is None:
        return None
    names = {np.dtype(np.float32): "dlaf_hh_chase_s",
             np.dtype(np.float64): "dlaf_hh_chase_d",
             np.dtype(np.complex64): "dlaf_hh_chase_c",
             np.dtype(np.complex128): "dlaf_hh_chase_z"}
    name = names.get(ab2.dtype)
    if name is None or not hasattr(lib, name):
        return None
    use_stream = (chunk_cb is not None and
                  hasattr(lib, name + "_p"))
    off, R = hh_schedule(n, b)
    V = np.zeros((R, b), ab2.dtype)
    # column-major banded storage for unit-stride column access in C++
    abf = np.asfortranarray(ab2)
    if use_stream:
        import threading
        import time as _time
        fn = getattr(lib, name + "_p")
        fn.restype = ctypes.c_int
        done = np.zeros(1, np.int64)
        rc_box = [None]

        def call():
            rc_box[0] = fn(abf.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(n), ctypes.c_int64(b),
                           V.ctypes.data_as(ctypes.c_void_p),
                           ctypes.c_int64(R),
                           done.ctypes.data_as(ctypes.c_void_p))

        th = threading.Thread(target=call)
        th.start()
        # ~32 MB chunks: big enough to amortize dispatch, small enough
        # that the wire stays busy from early in the chase
        chunk = max(1, (32 << 20) // max(V.strides[0], 1))
        exc_box = [None]
        cancel = threading.Event()

        def pump():
            try:
                sent = 0
                while not cancel.is_set():
                    alive = th.is_alive()
                    avail = int(done[0])
                    # publish whole multiples of `chunk` rows so the
                    # consumer's upload path sees ONE fixed shape (a
                    # jitted device accumulator would retrace per chunk
                    # height)
                    while avail - sent >= chunk and not cancel.is_set():
                        chunk_cb(V[sent:sent + chunk])
                        sent += chunk
                    if not alive:
                        break
                    _time.sleep(0.01)
                if rc_box[0] != 0 or cancel.is_set():
                    return
                avail = int(done[0])
                while avail - sent >= chunk:
                    chunk_cb(V[sent:sent + chunk])
                    sent += chunk
                if sent < R:
                    chunk_cb(V[sent:R])     # one odd-shaped tail
            except BaseException as e:      # noqa: BLE001 — re-raised at join
                exc_box[0] = e

        if detach_pump:
            pth = threading.Thread(target=pump, daemon=True)
            pth.start()
            th.join()                   # chase compute done, ab final
            if rc_box[0] != 0:
                # stop the pump BEFORE the caller discards its device
                # buffer, else a late chunk_cb re-allocates a full-size
                # stream buffer at a stale row offset (leak)
                cancel.set()
                pth.join()
                return None
            ab2[...] = abf
            return _PumpHandle(pth, exc_box)
        pump()
        th.join()
        if exc_box[0] is not None:
            raise exc_box[0]
        if rc_box[0] != 0:
            return None
    else:
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        rc = fn(abf.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_int64(n), ctypes.c_int64(b),
                V.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(R))
        if rc != 0:
            return None
    ab2[...] = abf
    return V


@lru_cache(maxsize=None)
def _dus_jit():
    import jax

    import jax.numpy as jnp

    return jax.jit(
        lambda buf, rows, r0: jax.lax.dynamic_update_slice(
            buf, rows, (r0, jnp.zeros((), r0.dtype))),
        donate_argnums=(0,))


def _dus_donated(buf, rows, r0):
    """In-place (donated) row write into the device stream buffer."""
    return _dus_jit()(buf, rows, r0)


def hh_band_to_tridiagonal(ab: np.ndarray, band: int,
                           force_numpy: bool = False,
                           device_stream: bool = False,
                           async_upload: bool = False) -> HHChaseResult:
    """Reduce lower-banded storage ``ab[(band+1), n]`` to real tridiagonal
    via Householder bulge chasing.

    ``force_numpy`` skips the C++ kernel.  The native and numpy chases
    differ in rounding order; the low-order-bit differences *amplify*
    through successive reflectors (observed ~1e-3 by n=300), so exact
    trajectory comparisons (e.g. the distributed-protocol tests) must
    pin one arithmetic.  Both results are valid reductions — eigenvalues
    agree to ~1e-13 regardless.

    ``device_stream=True`` returns ``V`` as a *device* array, uploaded in
    chunks while the chase still runs: on the tunneled TPU the
    host->device copy of the reflector stream (~n^2/2 values) costs more
    wall time than the chase itself, so overlapping the two (plus the
    async dispatch continuing through the following D&C stage) hides
    most of it.  Complex dtypes stay on host (the axon plugin cannot
    device_put complex64).

    ``async_upload=True`` (with ``device_stream``): return as soon as the
    chase compute finishes, with the upload still draining in a daemon
    thread — ``result.V`` is None until ``result.resolve_V()`` joins it.
    The eigensolver driver resolves after the D&C stage, hiding the
    upload tail behind ~30 s of device-bound work at n = 32768.
    """
    bp1, n = ab.shape
    if bp1 != band + 1:
        raise ValueError(f"ab rows {bp1} != band+1 {band + 1}")
    dtype = ab.dtype

    stream_ok = device_stream and not np.iscomplexobj(ab)
    state: dict = {"buf": None, "row": 0}
    cb = None
    if stream_ok:
        import jax
        import jax.numpy as jnp

        _, R_total = hh_schedule(n, band)

        # Accumulate into ONE preallocated device buffer via donated
        # dynamic-update-slices: concatenating a chunk list at the end
        # would briefly hold the stream twice (2 x 2.1 GB at n = 32768)
        # right when the D&C stage needs the memory.  The native kernel
        # publishes fixed-size chunks (plus one tail), so this jit traces
        # twice.
        def cb(rows):
            if state["buf"] is None:
                state["buf"] = jnp.zeros((R_total, band), ab.dtype)
            r0 = state["row"]
            state["row"] = r0 + rows.shape[0]
            state["buf"] = _dus_donated(state["buf"], jax.device_put(rows),
                                        np.int32(r0))

    ab2 = np.zeros((2 * band + 1, n), dtype)
    ab2[: band + 1] = ab
    v_resolve = None
    if n > 2 and band > 1:
        V = None if force_numpy else _hh_chase_native(
            ab2, n, band, chunk_cb=cb,
            detach_pump=stream_ok and async_upload)
        if V is None:
            state["buf"] = None         # discard any partial upload
            V = hh_chase_numpy(ab2, n, band)
        elif isinstance(V, _PumpHandle):
            handle = V
            V = None

            def v_resolve(handle=handle, state=state):
                handle.join()
                _, R_exp = hh_schedule(n, band)
                if state["row"] != R_exp:
                    raise RuntimeError(
                        f"reflector upload incomplete: {state['row']} of "
                        f"{R_exp} rows reached the device")
                return state["buf"]
        elif state["buf"] is not None:
            V = state["buf"]
        elif stream_ok:
            import jax
            V = jax.device_put(V)       # small streams: one async put
    else:
        _, R = hh_schedule(n, band)
        V = np.zeros((R, band), dtype)

    d = np.asarray(ab2[0, :].real, np.float64)
    e_c = ab2[1, : max(n - 1, 0)]
    phases = None
    if np.iscomplexobj(ab2):
        # D^H T D with D[j+1] = D[j] * (e_j / |e_j|) makes e real nonneg
        phases = np.ones(n, dtype)
        e_c = e_c.copy()
        for j in range(n - 1):
            mag = abs(e_c[j])
            ph = e_c[j] / mag if mag != 0.0 else 1.0
            phases[j + 1] = phases[j] * ph
            e_c[j] = mag
    e = np.asarray(e_c.real, np.float64)
    return HHChaseResult(d, e, V, n, band, phases, v_resolve)
