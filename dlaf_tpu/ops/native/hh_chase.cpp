// Householder bulge-chase kernel for band -> tridiagonal reduction.
//
// Native counterpart of hh_chase.py::hh_chase_numpy (hb2st-style successive
// band reduction; the reference keeps this stage CPU-only as well,
// eth-cscs/DLA-Future eigensolver/band_to_tridiag/mc.h SweepWorker).  The
// value recurrence is sequential per sweep; sweeps are pipelined across
// threads with the classic staggered schedule: step t of sweep s may run
// once step t+2 of sweep s-1 has completed (their row ranges are disjoint
// from then on).
//
// Storage: column-major banded, ld = 2b+1, ab[i + j*ld] = A[j+i, j]
// (unit-stride columns).  Output stream V[R, b] row-major, sweep-major
// order: V[r*b + 0] = tau_r, V[r*b + 1 .. ] = v_r[1:], v_r[0] = 1 implied.

#include <atomic>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

template <typename T> struct RealOf { using type = T; };
template <typename R> struct RealOf<std::complex<R>> { using type = R; };

template <typename T> inline typename RealOf<T>::type abs2(T x) {
  return std::norm(x);
}
template <> inline float abs2<float>(float x) { return x * x; }
template <> inline double abs2<double>(double x) { return x * x; }

template <typename T> inline T conj_(T x) { return x; }
template <typename R> inline std::complex<R> conj_(std::complex<R> x) {
  return std::conj(x);
}
template <typename T> inline typename RealOf<T>::type real_(T x) { return x; }
template <typename R> inline R real_(std::complex<R> x) { return x.real(); }
template <typename T> inline typename RealOf<T>::type imag_(T) { return 0; }
template <typename R> inline R imag_(std::complex<R> x) { return x.imag(); }

// conj(a) . b with 4x16 independent accumulator lanes: the naive
// single-accumulator loop cannot vectorize (FP reduction reassociation),
// and a single 16-lane accumulator leaves the FMA units latency-bound
// (one zmm in flight, ~4-cycle dependency chain); these dots are ~40%
// of the chase flops.
template <typename T>
inline T cdot(const T* __restrict__ a, const T* __restrict__ b,
              int64_t len) {
  T a0[16] = {}, a1[16] = {}, a2[16] = {}, a3[16] = {};
  int64_t i = 0;
  for (; i + 64 <= len; i += 64) {
    for (int k = 0; k < 16; ++k) a0[k] += conj_(a[i + k]) * b[i + k];
    for (int k = 0; k < 16; ++k)
      a1[k] += conj_(a[i + 16 + k]) * b[i + 16 + k];
    for (int k = 0; k < 16; ++k)
      a2[k] += conj_(a[i + 32 + k]) * b[i + 32 + k];
    for (int k = 0; k < 16; ++k)
      a3[k] += conj_(a[i + 48 + k]) * b[i + 48 + k];
  }
  for (; i + 16 <= len; i += 16)
    for (int k = 0; k < 16; ++k) a0[k] += conj_(a[i + k]) * b[i + k];
  T s = T(0);
  for (int k = 0; k < 16; ++k) s += (a0[k] + a1[k]) + (a2[k] + a3[k]);
  for (; i < len; ++i) s += conj_(a[i]) * b[i];
  return s;
}

template <typename T>
inline typename RealOf<T>::type norm2v(const T* __restrict__ x,
                                       int64_t len) {
  using R = typename RealOf<T>::type;
  R a0[16] = {}, a1[16] = {};
  int64_t i = 0;
  for (; i + 32 <= len; i += 32) {
    for (int k = 0; k < 16; ++k) a0[k] += abs2(x[i + k]);
    for (int k = 0; k < 16; ++k) a1[k] += abs2(x[i + 16 + k]);
  }
  for (; i + 16 <= len; i += 16)
    for (int k = 0; k < 16; ++k) a0[k] += abs2(x[i + k]);
  R s = R(0);
  for (int k = 0; k < 16; ++k) s += a0[k] + a1[k];
  for (; i < len; ++i) s += abs2(x[i]);
  return s;
}

// LAPACK larfg: H = I - tau v v^H, v[0] = 1, H^H x = beta e1 (beta real).
// x (length l) is overwritten with v[1:] in x[1:]; returns tau; beta -> x[0].
template <typename T>
inline T larfg(int64_t l, T* x) {
  using R = typename RealOf<T>::type;
  R xnorm2 = norm2v(x + 1, l - 1);
  T alpha = x[0];
  if (xnorm2 == R(0) && imag_(alpha) == R(0)) {
    x[0] = alpha;
    return T(0);
  }
  R anorm = std::sqrt(abs2(alpha) + xnorm2);
  R beta = (real_(alpha) >= R(0)) ? -anorm : anorm;
  T tau = (T(beta) - alpha) / T(beta);
  T scale = T(1) / (alpha - T(beta));
  for (int64_t i = 1; i < l; ++i) x[i] *= scale;
  x[0] = T(beta);
  return tau;
}

// One chase step of sweep s at position j with reflector (v, tau) of
// length l.  Applies the two-sided update to the diagonal block, the right
// update to the off-diagonal block (m rows), and if m > 1 computes the next
// reflector (into v/tau) and left-applies it to the bulge columns.
// Returns m (<= 1 means sweep finished).
template <typename T>
inline int64_t chase_step(T* ab, int64_t ld, int64_t n, int64_t b, int64_t j,
                          T* v, T& tau, T* w) {
  const int64_t l = (b < n - j) ? b : n - j;

  // ---- w = tau * D v on the Hermitian diagonal block (lower stored) ----
  // split into a saxpy pass and a dot pass so both vectorize (the fused
  // two-output loop compiles to scalar FMAs)
  for (int64_t c = 0; c < l; ++c) w[c] = T(0);
  for (int64_t c = 0; c < l; ++c) {
    const T* __restrict__ col = ab + (j + c) * ld;
    const T vc = v[c];
    T* __restrict__ wc = w + c;
    for (int64_t i = 1; i < l - c; ++i) wc[i] += col[i] * vc;
    w[c] += col[0] * vc + cdot(col + 1, v + c + 1, l - c - 1);
  }
  // w = tau*Dv - (tau/2)(w^H v) v  with w currently = D v
  T whv = T(0);
  for (int64_t c = 0; c < l; ++c) whv += conj_(tau * w[c]) * v[c];
  T corr = tau * whv / T(2);
  for (int64_t c = 0; c < l; ++c) w[c] = tau * w[c] - corr * v[c];
  // her2: D -= w v^H + v w^H
  for (int64_t c = 0; c < l; ++c) {
    T* col = ab + (j + c) * ld;
    T cw = conj_(w[c]);
    T cv = conj_(v[c]);
    for (int64_t i = 0; i < l - c; ++i)
      col[i] -= w[c + i] * cv + v[c + i] * cw;
  }

  const int64_t m0 = n - b - j;
  const int64_t m = (b < m0) ? b : m0;
  if (m <= 0) return m;

  // ---- right-apply to B (m x l, rows j+l..): B -= tau (B v) v^H ----
  // B[r, c] = ab[(j+c)*ld + (l - c) + r]
  T* y = w;  // reuse workspace (length >= m)
  for (int64_t r = 0; r < m; ++r) y[r] = T(0);
  for (int64_t c = 0; c < l; ++c) {
    T* col = ab + (j + c) * ld + (l - c);
    T vc = v[c];
    for (int64_t r = 0; r < m; ++r) y[r] += col[r] * vc;
  }
  for (int64_t c = 0; c < l; ++c) {
    T* col = ab + (j + c) * ld + (l - c);
    T tvc = tau * conj_(v[c]);
    for (int64_t r = 0; r < m; ++r) col[r] -= tvc * y[r];
  }

  if (m > 1) {
    // next reflector from B's first column
    T* bcol0 = ab + j * ld + l;
    tau = larfg(m, bcol0);
    for (int64_t r = 1; r < m; ++r) {
      v[r] = bcol0[r];
      bcol0[r] = T(0);
    }
    v[0] = T(1);
    // left-apply H^H to bulge columns 1..l-1:
    // B[:,c] -= conj(tau) v (v^H B[:,c])
    T ct = conj_(tau);
    for (int64_t c = 1; c < l; ++c) {
      T* col = ab + (j + c) * ld + (l - c);
      T z = ct * cdot(v, col, m);
      for (int64_t r = 0; r < m; ++r) col[r] -= v[r] * z;
    }
  }
  return m;
}

template <typename T>
void run_sweep(T* ab, int64_t ld, int64_t n, int64_t b, int64_t s,
               T* V, const int64_t* off, T* v, T* w,
               std::atomic<int32_t>* progress) {
  const int64_t l0 = (b < n - 1 - s) ? b : n - 1 - s;
  if (l0 < 2) {
    progress[s].store(INT32_MAX, std::memory_order_release);
    return;
  }
  auto wait_prev = [&](int64_t t) {
    if (s == 0) return;
    int32_t need = static_cast<int32_t>(t) + 3;
    while (progress[s - 1].load(std::memory_order_acquire) < need)
      std::this_thread::yield();
  };

  wait_prev(0);
  // start: reflector annihilating column s below the first subdiagonal
  T* col_s = ab + s * ld + 1;
  T tau = larfg(l0, col_s);
  v[0] = T(1);
  for (int64_t i = 1; i < l0; ++i) {
    v[i] = col_s[i];
    col_s[i] = T(0);
  }

  int64_t t = 0;
  while (true) {
    if (t > 0) wait_prev(t);
    const int64_t j = 1 + s + t * b;
    const int64_t l = (b < n - j) ? b : n - j;
    T* vr = V + (off[s] + t) * b;
    vr[0] = tau;
    for (int64_t i = 1; i < l; ++i) vr[i] = v[i];
    int64_t m = chase_step(ab, ld, n, b, j, v, tau, w);
    progress[s].store(static_cast<int32_t>(t) + 1,
                      std::memory_order_release);
    if (m <= 1) break;
    ++t;
  }
  progress[s].store(INT32_MAX, std::memory_order_release);
}

// ---------------------------------------------------------------------------
// Region-parallel driver: threads own contiguous COLUMN regions (the
// reference's SweepWorkerDist rank decomposition, mc.h:569, collapsed to
// shared memory).  A sweep starts in region 0 and is handed across
// boundaries as (v, tau); thread k runs sweep s through its region while
// thread k+1 runs sweep s-1 through the next one.  Each thread's working
// set is its own region -> cache-resident, unlike the sweep-pipelined
// driver where every thread streams the whole band.  Regions are
// re-partitioned every round of S sweeps because the active band shrinks
// (sweep s only touches columns >= s).
// ---------------------------------------------------------------------------

template <typename T>
struct HandoffSlot {
  std::atomic<int64_t> seq{-1};   // sweep index published in this slot
  int64_t ended;                  // sweep finished before this boundary
  T tau;
  std::vector<T> v;
};

template <typename T>
void run_region(T* ab, int64_t ld, int64_t n, int64_t b,
                int64_t s0, int64_t s1, int64_t nsweeps,
                int64_t Lk, int64_t Rk, bool first, bool last,
                std::vector<HandoffSlot<T>>* in,   // boundary k (null if first)
                std::vector<HandoffSlot<T>>* out,  // boundary k+1 (null if last)
                T* V, const int64_t* off,
                std::atomic<int32_t>* progress,
                std::atomic<int64_t>* consumed_in,
                std::atomic<int64_t>* consumed_out) {
  const int64_t D = in ? static_cast<int64_t>(in->size()) : 0;
  const int64_t Do = out ? static_cast<int64_t>(out->size()) : 0;
  std::vector<T> v(b), w(2 * b);

  auto wait_prev = [&](int64_t s, int64_t t) {
    if (s == 0) return;
    int32_t need = static_cast<int32_t>(t) + 3;
    while (progress[s - 1].load(std::memory_order_acquire) < need)
      std::this_thread::yield();
  };

  for (int64_t s = s0; s < s1 && s < nsweeps; ++s) {
    T tau;
    int64_t t;
    bool ended = false;
    if (first) {
      // prologue: reflector annihilating column s below the subdiagonal
      const int64_t l0 = (b < n - 1 - s) ? b : n - 1 - s;
      if (l0 < 2) {
        progress[s].store(INT32_MAX, std::memory_order_release);
        ended = true;
        tau = T(0);
        t = 0;
      } else {
        wait_prev(s, 0);
        T* col_s = ab + s * ld + 1;
        tau = larfg(l0, col_s);
        v[0] = T(1);
        for (int64_t i = 1; i < l0; ++i) {
          v[i] = col_s[i];
          col_s[i] = T(0);
        }
        t = 0;
      }
    } else {
      // consume handoff for sweep s from the upstream boundary
      HandoffSlot<T>& slot = (*in)[static_cast<size_t>(s % D)];
      while (slot.seq.load(std::memory_order_acquire) != s)
        std::this_thread::yield();
      ended = slot.ended != 0;
      if (!ended) {
        tau = slot.tau;
        std::memcpy(v.data(), slot.v.data(), sizeof(T) * b);
      }
      consumed_in->store(s, std::memory_order_release);
      // first step of this region: smallest t with 1 + s + t*b >= Lk
      int64_t num = Lk - 1 - s;
      t = num <= 0 ? 0 : (num + b - 1) / b;
    }

    if (!ended) {
      while (true) {
        const int64_t j = 1 + s + t * b;
        if (j >= Rk && !last) break;            // hand off downstream
        if (j >= n - 1) {                        // nothing left
          progress[s].store(INT32_MAX, std::memory_order_release);
          ended = true;
          break;
        }
        if (t > 0 || !first) wait_prev(s, t);
        const int64_t l = (b < n - j) ? b : n - j;
        T* vr = V + (off[s] + t) * b;
        vr[0] = tau;
        for (int64_t i = 1; i < l; ++i) vr[i] = v[i];
        int64_t m = chase_step(ab, ld, n, b, j, v.data(), tau, w.data());
        progress[s].store(static_cast<int32_t>(t) + 1,
                          std::memory_order_release);
        if (m <= 1) {
          progress[s].store(INT32_MAX, std::memory_order_release);
          ended = true;
          break;
        }
        ++t;
      }
    }

    if (!last) {
      HandoffSlot<T>& slot = (*out)[static_cast<size_t>(s % Do)];
      // wait until the downstream thread consumed the slot's old sweep
      while (consumed_out->load(std::memory_order_acquire) < s - Do)
        std::this_thread::yield();
      slot.ended = ended ? 1 : 0;
      if (!ended) {
        slot.tau = tau;
        std::memcpy(slot.v.data(), v.data(), sizeof(T) * b);
      }
      slot.seq.store(s, std::memory_order_release);
    }
  }
}

template <typename T>
int hh_chase_regions(T* ab, int64_t n, int64_t b, T* V, int64_t R,
                     int64_t nthreads, const std::vector<int64_t>& off,
                     std::atomic<int32_t>* progress,
                     int64_t* done_rows) {
  const int64_t ld = 2 * b + 1;
  const int64_t nsweeps = n - 2;
  const int64_t Wmin = 4 * b;     // >= 3b for the stagger + slack

  std::atomic<int64_t> done_sweeps{0};
  auto publish = [&]() {
    if (!done_rows) return;
    int64_t ds = done_sweeps.load(std::memory_order_acquire);
    while (ds < nsweeps &&
           progress[ds].load(std::memory_order_acquire) == INT32_MAX) {
      if (done_sweeps.compare_exchange_weak(ds, ds + 1,
                                            std::memory_order_acq_rel))
        __atomic_store_n(done_rows, off[ds + 1], __ATOMIC_RELEASE);
    }
  };

  int64_t s0 = 0;
  while (s0 < nsweeps) {
    const int64_t width = n - s0;
    int64_t T_r = width / Wmin;
    if (T_r > nthreads) T_r = nthreads;
    if (T_r < 1) T_r = 1;
    const int64_t W = width / T_r;
    // all round sweeps must start inside region 0
    int64_t S = 2 * width / b;             // ~2 full transits per round
    if (S > W - 1) S = W - 1;
    if (S < 1) S = 1;
    const int64_t s1 = (s0 + S < nsweeps) ? s0 + S : nsweeps;

    if (T_r == 1) {
      std::vector<T> v(b), w(2 * b);
      for (int64_t s = s0; s < s1; ++s) {
        run_sweep(ab, ld, n, b, s, V, off.data(), v.data(), w.data(),
                  progress);
        publish();
      }
    } else {
      const int64_t D = 8;                 // handoff ring depth per boundary
      std::vector<std::vector<HandoffSlot<T>>> rings(
          static_cast<size_t>(T_r - 1));
      for (auto& ring : rings) {
        ring = std::vector<HandoffSlot<T>>(static_cast<size_t>(D));
        for (auto& slot : ring) slot.v.resize(static_cast<size_t>(b));
      }
      std::vector<std::atomic<int64_t>> consumed(
          static_cast<size_t>(T_r - 1));
      for (auto& c : consumed) c.store(s0 - 1, std::memory_order_relaxed);

      std::vector<std::thread> threads;
      threads.reserve(static_cast<size_t>(T_r));
      for (int64_t k = 0; k < T_r; ++k) {
        const int64_t Lk = s0 + k * W;
        const int64_t Rk = (k == T_r - 1) ? n : s0 + (k + 1) * W;
        auto* in = k > 0 ? &rings[static_cast<size_t>(k - 1)] : nullptr;
        auto* out = k + 1 < T_r ? &rings[static_cast<size_t>(k)] : nullptr;
        auto* ci = k > 0 ? &consumed[static_cast<size_t>(k - 1)] : nullptr;
        auto* co = k + 1 < T_r ? &consumed[static_cast<size_t>(k)] : nullptr;
        threads.emplace_back([=, &off]() {
          run_region(ab, ld, n, b, s0, s1, nsweeps, Lk, Rk,
                     k == 0, k == T_r - 1, in, out, V, off.data(),
                     progress, ci, co);
        });
      }
      // main thread drives the streaming publish while workers run
      if (done_rows) {
        bool alive = true;
        while (alive) {
          publish();
          alive = done_sweeps.load(std::memory_order_acquire) <
                  ((s1 == nsweeps) ? nsweeps : s1);
          std::this_thread::sleep_for(std::chrono::milliseconds(2));
        }
      }
      for (auto& th : threads) th.join();
      publish();
    }
    s0 = s1;
  }
  if (done_rows) __atomic_store_n(done_rows, R, __ATOMIC_RELEASE);
  return 0;
}

template <typename T>
int hh_chase(T* ab, int64_t n, int64_t b, T* V, int64_t R,
             int64_t* done_rows = nullptr) {
  if (n < 3 || b < 2) {
    if (done_rows) __atomic_store_n(done_rows, R, __ATOMIC_RELEASE);
    return 0;
  }
  const int64_t ld = 2 * b + 1;
  const int64_t nsweeps = n - 2;

  // sweep-major reflector offsets: count[s] = (n-3-s)/b + 1
  std::vector<int64_t> off(nsweeps + 1, 0);
  for (int64_t s = 0; s < nsweeps; ++s) {
    int64_t cnt = (n - 1 - s >= 2) ? (n - 3 - s) / b + 1 : 0;
    off[s + 1] = off[s] + cnt;
  }
  if (off[nsweeps] != R) return 1;

  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = hw ? static_cast<int64_t>(hw) : 1;
  if (const char* env = std::getenv("DLAF_CHASE_THREADS")) {
    long v = std::atol(env);
    if (v > 0) nthreads = v;
  }
  if (nthreads > nsweeps) nthreads = nsweeps;
  if (nthreads > 16) nthreads = 16;

  std::vector<std::atomic<int32_t>> progress(nsweeps);
  for (auto& p : progress) p.store(0, std::memory_order_relaxed);

  // Optional region-parallel scheduler (threads own contiguous column
  // regions; the shared-memory analogue of the reference's
  // SweepWorkerDist decomposition).  Measured on this box (54 MB L3 —
  // the whole n=32768 band is L3-resident) it matches but does not beat
  // the sweep-pipelined default; it wins when the band exceeds LLC.
  const char* algo = std::getenv("DLAF_CHASE_SCHED");
  if (algo && std::strcmp(algo, "regions") == 0)
    return hh_chase_regions(ab, n, b, V, R, nthreads, off,
                            progress.data(), done_rows);

  // done_rows (optional, written with release semantics): V rows
  // [0, done_rows) are final — lets the caller overlap the host->device
  // upload of the reflector stream with the rest of the chase
  std::atomic<int64_t> done_sweeps{0};
  auto publish = [&]() {
    if (!done_rows) return;
    int64_t ds = done_sweeps.load(std::memory_order_acquire);
    while (ds < nsweeps &&
           progress[ds].load(std::memory_order_acquire) == INT32_MAX) {
      if (done_sweeps.compare_exchange_weak(ds, ds + 1,
                                            std::memory_order_acq_rel)) {
        __atomic_store_n(done_rows, off[ds + 1], __ATOMIC_RELEASE);
        ++ds;
      }
    }
  };

  if (nthreads <= 1) {
    std::vector<T> v(b), w(2 * b);
    for (int64_t s = 0; s < nsweeps; ++s) {
      run_sweep(ab, ld, n, b, s, V, off.data(), v.data(), w.data(),
                progress.data());
      publish();
    }
    return 0;
  }

  std::atomic<int64_t> next_sweep{0};
  auto worker = [&]() {
    std::vector<T> v(b), w(2 * b);
    while (true) {
      int64_t s = next_sweep.fetch_add(1, std::memory_order_relaxed);
      if (s >= nsweeps) break;
      run_sweep(ab, ld, n, b, s, V, off.data(), v.data(), w.data(),
                progress.data());
      publish();
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(nthreads));
  for (int64_t i = 0; i < nthreads; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  if (done_rows) __atomic_store_n(done_rows, R, __ATOMIC_RELEASE);
  return 0;
}

}  // namespace

extern "C" {

int dlaf_hh_chase_s(float* ab, int64_t n, int64_t b, float* V, int64_t R) {
  return hh_chase(ab, n, b, V, R);
}
int dlaf_hh_chase_d(double* ab, int64_t n, int64_t b, double* V, int64_t R) {
  return hh_chase(ab, n, b, V, R);
}
// _p variants publish completed V-row prefix into *done_rows (release
// stores; the poller reads it with a plain aligned int64 load)
int dlaf_hh_chase_s_p(float* ab, int64_t n, int64_t b, float* V, int64_t R,
                      int64_t* done_rows) {
  return hh_chase(ab, n, b, V, R, done_rows);
}
int dlaf_hh_chase_d_p(double* ab, int64_t n, int64_t b, double* V,
                      int64_t R, int64_t* done_rows) {
  return hh_chase(ab, n, b, V, R, done_rows);
}
int dlaf_hh_chase_c(void* ab, int64_t n, int64_t b, void* V, int64_t R) {
  return hh_chase(reinterpret_cast<std::complex<float>*>(ab), n, b,
                  reinterpret_cast<std::complex<float>*>(V), R);
}
int dlaf_hh_chase_z(void* ab, int64_t n, int64_t b, void* V, int64_t R) {
  return hh_chase(reinterpret_cast<std::complex<double>*>(ab), n, b,
                  reinterpret_cast<std::complex<double>*>(V), R);
}

}  // extern "C"
