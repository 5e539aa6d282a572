// Native bulge-chase value kernel for band -> tridiagonal reduction.
//
// C++ counterpart of the reference's CPU-only band_to_tridiag stage
// (eth-cscs/DLA-Future eigensolver/band_to_tridiag/mc.h SweepWorker loops):
// the rotation *schedule* is computed in Python (static in (n, band)); this
// kernel runs the sequential value recurrence over the banded storage and
// emits the (c, s) Givens streams consumed by the TPU-side back-transform.
// Same algorithm as the numpy fallback in
// dlaf_tpu/algorithms/eigensolver/band_to_tridiag.py::chase_values.
//
// Build: g++ -O3 -march=native -shared -fPIC chase.cpp -o libchase.so

#include <cmath>
#include <complex>
#include <cstdint>

namespace {

template <typename T> struct RealOf { using type = T; };
template <typename R> struct RealOf<std::complex<R>> { using type = R; };

template <typename T>
inline typename RealOf<T>::type abs2(T x) {
  return std::norm(x);
}
template <> inline float abs2<float>(float x) { return x * x; }
template <> inline double abs2<double>(double x) { return x * x; }

template <typename T> inline T conj_(T x) { return x; }
template <typename R> inline std::complex<R> conj_(std::complex<R> x) {
  return std::conj(x);
}

template <typename T> inline typename RealOf<T>::type real_(T x) {
  return x;
}
template <typename R> inline R real_(std::complex<R> x) { return x.real(); }

// lartg: c real, s with [c s; -conj(s) c] [f; g] = [r; 0]
template <typename T>
inline void lartg(T f, T g, typename RealOf<T>::type* c, T* s, T* r) {
  using R = typename RealOf<T>::type;
  if (g == T(0)) {
    *c = R(1);
    *s = T(0);
    *r = f;
    return;
  }
  R af = std::sqrt(abs2(f));
  if (af == R(0)) {
    R ag = std::sqrt(abs2(g));
    *c = R(0);
    *s = conj_(g) / T(ag);
    *r = T(ag);
    return;
  }
  R d = std::sqrt(abs2(f) + abs2(g));
  T sign_f = f / T(af);
  *c = af / d;
  *s = sign_f * conj_(g) / T(d);
  *r = sign_f * T(d);
}

// ab2: LAPACK-style column-major banded storage with leading dimension
// ldab = b + 2: ab2[j * ldab + i] = A[j + i, j].  Column-major makes every
// inner loop unit-stride (the row-pair loop walks down one column, the
// below-rows loop walks down two adjacent columns).
template <typename T>
int chase(T* ab2, int64_t n, int64_t b, const int32_t* ps,
          const int32_t* qs, const int32_t* ks, int64_t M,
          typename RealOf<T>::type* cs, T* ss) {
  using R = typename RealOf<T>::type;
  const int64_t ldab = b + 2;
  auto at = [&](int64_t i, int64_t j) -> T& { return ab2[j * ldab + i]; };

  for (int64_t m = 0; m < M; ++m) {
    const int64_t p = ps[m], q = qs[m], k = ks[m];
    R c;
    T s, r;
    lartg(at(p - 1 - q, q), at(p - q, q), &c, &s, &r);
    cs[m] = c;
    ss[m] = s;
    at(p - 1 - q, q) = r;
    at(p - q, q) = T(0);

    // row pair on remaining left columns
    const int64_t c_lo = (p - 1 - k) > 0 ? (p - 1 - k) : 0;
    for (int64_t col = c_lo; col < p - 1; ++col) {
      if (col == q) continue;
      T a1 = at(p - 1 - col, col);
      T a2 = at(p - col, col);
      at(p - 1 - col, col) = T(c) * a1 + s * a2;
      at(p - col, col) = -conj_(s) * a1 + T(c) * a2;
    }

    // 2x2 diagonal block: row update then column update (G B G^H)
    {
      T d1 = at(0, p - 1), off = at(1, p - 1), d2 = at(0, p);
      T r10 = T(c) * d1 + s * off;
      T r11 = T(c) * conj_(off) + s * d2;
      T r20 = -conj_(s) * d1 + T(c) * off;
      T r21 = -conj_(s) * conj_(off) + T(c) * d2;
      at(0, p - 1) = T(c) * r10 + conj_(s) * r11;
      at(1, p - 1) = T(c) * r20 + conj_(s) * r21;
      at(0, p) = -s * r20 + T(c) * r21;
    }

    // column pair for rows below
    const int64_t r_hi = (p + k < n - 1) ? (p + k) : (n - 1);
    for (int64_t row = p + 1; row <= r_hi; ++row) {
      T a1 = at(row - (p - 1), p - 1);
      T a2 = at(row - p, p);
      at(row - (p - 1), p - 1) = T(c) * a1 + conj_(s) * a2;
      at(row - p, p) = -s * a1 + T(c) * a2;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Rotation schedule (static in (n, b)): the Python/numpy builder spends
// minutes at M ~ 1e8; this is a linear fill.  Call with ps == nullptr to
// get the count.
int64_t dlaf_rotation_schedule(int64_t n, int64_t b, int32_t* ps,
                               int32_t* qs, int32_t* ks) {
  int64_t m = 0;
  for (int64_t k = b; k >= 2; --k) {
    for (int64_t j = 0; j < n - k; ++j) {
      int64_t p = j + k, q = j;
      while (p <= n - 1) {
        if (ps != nullptr) {
          ps[m] = static_cast<int32_t>(p);
          qs[m] = static_cast<int32_t>(q);
          ks[m] = static_cast<int32_t>(k);
        }
        ++m;
        q = p - 1;
        p = p + k;
      }
    }
  }
  return m;
}

// ASAP wave levels for the *reversed* rotation stream (back-transform
// order): level[m] = 1 + max(level of any later rotation sharing a row).
// Sequential recurrence -> native; the wave packing itself is vectorized in
// numpy.
int dlaf_wave_levels(const int32_t* ps, int64_t M, int64_t n,
                     int64_t* levels /* [M] */, int64_t* n_levels) {
  int64_t* last = new int64_t[n];
  for (int64_t i = 0; i < n; ++i) last[i] = -1;
  int64_t maxlv = -1;
  for (int64_t m = M - 1; m >= 0; --m) {
    const int64_t p = ps[m];
    int64_t lv = last[p - 1] > last[p] ? last[p - 1] : last[p];
    lv += 1;
    levels[m] = lv;
    last[p - 1] = lv;
    last[p] = lv;
    if (lv > maxlv) maxlv = lv;
  }
  *n_levels = maxlv + 1;
  delete[] last;
  return 0;
}

// Full wave packing in one call: compute levels of the reversed stream and
// fill the [W, R] wave tables (padding slots hold idx = -1).  Returns W;
// writes R to r_out.  Two-phase: call with p_waves == nullptr to size the
// tables first.
int64_t dlaf_wave_pack(const int32_t* ps, int64_t M, int64_t n,
                       int64_t* r_out, int32_t* p_waves,
                       int32_t* idx_waves) {
  if (M == 0) {
    *r_out = 0;
    return 0;
  }
  int32_t* levels = new int32_t[M];
  {
    int32_t* last = new int32_t[n];
    for (int64_t i = 0; i < n; ++i) last[i] = -1;
    for (int64_t m = M - 1; m >= 0; --m) {
      const int64_t p = ps[m];
      int32_t lv = last[p - 1] > last[p] ? last[p - 1] : last[p];
      lv += 1;
      levels[m] = lv;
      last[p - 1] = lv;
      last[p] = lv;
    }
    delete[] last;
  }
  int64_t W = 0;
  for (int64_t m = 0; m < M; ++m)
    if (levels[m] + 1 > W) W = levels[m] + 1;
  int64_t* counts = new int64_t[W]();
  for (int64_t m = 0; m < M; ++m) counts[levels[m]] += 1;
  int64_t R = 0;
  for (int64_t w = 0; w < W; ++w)
    if (counts[w] > R) R = counts[w];
  *r_out = R;
  if (p_waves != nullptr) {
    for (int64_t i = 0; i < W * R; ++i) {
      p_waves[i] = 0;
      idx_waves[i] = -1;
    }
    int64_t* cursor = new int64_t[W]();
    // application order = reversed m
    for (int64_t m = M - 1; m >= 0; --m) {
      const int64_t lv = levels[m];
      const int64_t slot = cursor[lv]++;
      p_waves[lv * R + slot] = ps[m];
      idx_waves[lv * R + slot] = static_cast<int32_t>(m);
    }
    delete[] cursor;
  }
  delete[] counts;
  delete[] levels;
  return W;
}

int dlaf_chase_s(float* ab2, int64_t n, int64_t b, const int32_t* ps,
                 const int32_t* qs, const int32_t* ks, int64_t M, float* cs,
                 float* ss) {
  return chase<float>(ab2, n, b, ps, qs, ks, M, cs, ss);
}

int dlaf_chase_d(double* ab2, int64_t n, int64_t b, const int32_t* ps,
                 const int32_t* qs, const int32_t* ks, int64_t M, double* cs,
                 double* ss) {
  return chase<double>(ab2, n, b, ps, qs, ks, M, cs, ss);
}

int dlaf_chase_c(void* ab2, int64_t n, int64_t b, const int32_t* ps,
                 const int32_t* qs, const int32_t* ks, int64_t M, float* cs,
                 void* ss) {
  return chase<std::complex<float>>(
      reinterpret_cast<std::complex<float>*>(ab2), n, b, ps, qs, ks, M, cs,
      reinterpret_cast<std::complex<float>*>(ss));
}

int dlaf_chase_z(void* ab2, int64_t n, int64_t b, const int32_t* ps,
                 const int32_t* qs, const int32_t* ks, int64_t M, double* cs,
                 void* ss) {
  return chase<std::complex<double>>(
      reinterpret_cast<std::complex<double>*>(ab2), n, b, ps, qs, ks, M, cs,
      reinterpret_cast<std::complex<double>*>(ss));
}
}
