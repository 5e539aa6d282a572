// Native C ABI for dlaf_tpu — implementation of api/dlaf_tpu_c.h.
//
// Equivalent of the reference's src/c_api/*.cpp (grid registry at
// src/c_api/grid.cpp:27-95, solver wrappers at
// src/c_api/eigensolver/eigensolver.cpp:1-140, init suspend/resume at
// src/c_api/utils.h:26-38): a linkable shared library C and Fortran
// callers can use without touching Python.  Internally it embeds CPython
// (the runtime of the TPU framework, as the reference embeds pika) and
// forwards raw buffer addresses to dlaf_tpu.api.c_embed, which wraps them
// zero-copy.
//
// Build: g++ -O2 -shared -fPIC dlaf_c_shim.cpp \
//          $(python3-config --includes) -lpython3.X -o libdlaf_tpu_c.so
// Runtime: set DLAF_TPU_ROOT to the repo root if dlaf_tpu is not on the
// default sys.path.

#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <string>

extern "C" {

struct DLAF_descriptor {
  int m, n, mb, nb, isrc, jsrc, i, j, ld;
};

}  // extern "C" (redeclared below for the functions)

namespace {

bool g_we_initialized = false;

void ensure_python() {
  if (Py_IsInitialized()) return;
  Py_InitializeEx(0);
  g_we_initialized = true;
  const char* root = std::getenv("DLAF_TPU_ROOT");
  if (root) {
    std::string cmd = "import sys; sys.path.insert(0, r'''";
    cmd += root;
    cmd += "''')";
    PyRun_SimpleString(cmd.c_str());
  }
}

PyObject* embed_module() {
  static PyObject* mod = nullptr;
  if (!mod) {
    mod = PyImport_ImportModule("dlaf_tpu.api.c_embed");
    if (!mod) PyErr_Print();
  }
  return mod;
}

// Call c_embed.<name>(args...) -> int rc; -128 on embedding failure.
int call_int(const char* name, const char* fmt, ...) {
  ensure_python();
  PyGILState_STATE st = PyGILState_Ensure();
  int rc = -128;
  PyObject* mod = embed_module();
  if (mod) {
    va_list ap;
    va_start(ap, fmt);
    PyObject* callable = PyObject_GetAttrString(mod, name);
    if (callable) {
      PyObject* args = Py_VaBuildValue(fmt, ap);
      if (args) {
        PyObject* res = PyObject_CallObject(callable, args);
        if (res) {
          rc = static_cast<int>(PyLong_AsLong(res));
          Py_DECREF(res);
        } else {
          PyErr_Print();
        }
        Py_DECREF(args);
      }
      Py_DECREF(callable);
    } else {
      PyErr_Print();
    }
    va_end(ap);
  }
  PyGILState_Release(st);
  return rc;
}

}  // namespace

extern "C" {

void dlaf_initialize(int, const char**) {
  call_int("initialize", "()");
}

void dlaf_finalize(void) {
  call_int("finalize", "()");
  // Python stays up: other grids/handles may still be alive in the caller
}

int dlaf_create_grid(int nprow, int npcol, char order) {
  return call_int("create_grid", "(iii)", nprow, npcol,
                  static_cast<int>(order));
}

void dlaf_free_grid(int ctx) {
  call_int("free_grid", "(i)", ctx);
}

static int chol(int ctx, char uplo, const char* typ, void* a,
                struct DLAF_descriptor d, int nop) {
  return call_int("cholesky", "(iisLiiiiiiii)", ctx, static_cast<int>(uplo),
                  typ, reinterpret_cast<long long>(a), d.m, d.n, d.mb,
                  d.nb, d.ld, d.i > 0 ? d.i : 1, d.j > 0 ? d.j : 1, nop);
}

static int chol_inv(int ctx, char uplo, const char* typ, void* a,
                    struct DLAF_descriptor d, int nop) {
  return call_int("cholesky_inverse", "(iisLiiiiiiii)", ctx,
                  static_cast<int>(uplo), typ,
                  reinterpret_cast<long long>(a), d.m, d.n, d.mb, d.nb,
                  d.ld, d.i > 0 ? d.i : 1, d.j > 0 ? d.j : 1, nop);
}

static int eig(int ctx, char uplo, const char* typ, void* a, void* w,
               void* z, struct DLAF_descriptor desca,
               struct DLAF_descriptor descz, long long n_ev) {
  return call_int("eigensolver", "(iisLLLiiiiiL)", ctx,
                  static_cast<int>(uplo), typ,
                  reinterpret_cast<long long>(a),
                  reinterpret_cast<long long>(w),
                  reinterpret_cast<long long>(z), desca.n, desca.mb,
                  desca.nb, desca.ld, descz.ld, n_ev);
}

static int gev(int ctx, char uplo, const char* typ, void* a, void* b,
               void* w, void* z, struct DLAF_descriptor desca,
               struct DLAF_descriptor descb, struct DLAF_descriptor descz,
               int factorized, long long n_ev) {
  return call_int("gen_eigensolver", "(iisLLLLiiiiiiiL)", ctx,
                  static_cast<int>(uplo), typ,
                  reinterpret_cast<long long>(a),
                  reinterpret_cast<long long>(b),
                  reinterpret_cast<long long>(w),
                  reinterpret_cast<long long>(z), desca.n, desca.mb,
                  desca.nb, desca.ld, descb.ld, descz.ld, factorized,
                  n_ev);
}

// per-type entries: reference names (dlaf_c/factorization/cholesky.h,
// dlaf_c/inverse/cholesky.h, dlaf_c/eigensolver/*.h).  CT = C scalar
// type, WT = real scalar type of the eigenvalues.
#define DLAF_SHIM_TYPED(T, CT, WT, KIND)                                      \
  int dlaf_cholesky_factorization_##T(int ctx, char uplo, CT* a,              \
                                      struct DLAF_descriptor d) {             \
    return chol(ctx, uplo, #T, a, d, 0);                                      \
  }                                                                           \
  int dlaf_cholesky_##T(int ctx, char uplo, CT* a,                            \
                        struct DLAF_descriptor d) {                           \
    return chol(ctx, uplo, #T, a, d, 0);                                      \
  }                                                                           \
  int dlaf_inverse_from_cholesky_factor_##T(int ctx, char uplo, CT* a,        \
                                            struct DLAF_descriptor d) {       \
    return chol_inv(ctx, uplo, #T, a, d, 0);                                  \
  }                                                                           \
  int dlaf_##KIND##_eigensolver_##T(int ctx, char uplo, CT* a,                \
                                    struct DLAF_descriptor desca, WT* w,      \
                                    CT* z, struct DLAF_descriptor descz) {    \
    return eig(ctx, uplo, #T, a, w, z, desca, descz, -1);                     \
  }                                                                           \
  int dlaf_##KIND##_eigensolver_partial_spectrum_##T(                         \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, WT* w,         \
      CT* z, struct DLAF_descriptor descz, long long begin,                   \
      long long end) {                                                        \
    return begin == 0 ? eig(ctx, uplo, #T, a, w, z, desca, descz, end) : -1;  \
  }                                                                           \
  int dlaf_##KIND##_generalized_eigensolver_##T(                              \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz) {                                         \
    return gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 0, -1);        \
  }                                                                           \
  int dlaf_##KIND##_generalized_eigensolver_factorized_##T(                   \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz) {                                         \
    return gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 1, -1);        \
  }                                                                           \
  int dlaf_##KIND##_generalized_eigensolver_partial_spectrum_##T(             \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz, long long begin, long long end) {         \
    return begin == 0                                                         \
               ? gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 0, end)  \
               : -1;                                                          \
  }                                                                           \
  int dlaf_##KIND##_generalized_eigensolver_partial_spectrum_factorized_##T(  \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz, long long begin, long long end) {         \
    return begin == 0                                                         \
               ? gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 1, end)  \
               : -1;                                                          \
  }

DLAF_SHIM_TYPED(s, float, float, symmetric)
DLAF_SHIM_TYPED(d, double, double, symmetric)
DLAF_SHIM_TYPED(c, float, float, hermitian)    // interleaved re/im pairs
DLAF_SHIM_TYPED(z, double, double, hermitian)

// backward-compat aliases of this build's round-1 names
int dlaf_cholesky_inverse_s(int ctx, char uplo, float* a,
                            struct DLAF_descriptor d) {
  return chol_inv(ctx, uplo, "s", a, d, 0);
}

int dlaf_cholesky_inverse_d(int ctx, char uplo, double* a,
                            struct DLAF_descriptor d) {
  return chol_inv(ctx, uplo, "d", a, d, 0);
}

// ScaLAPACK-style wrappers: ia/ja != 1 supported (operand = n x n block
// at the 1-based (ia, ja) origin), unlike the reference which requires 1.
#define DLAF_SHIM_SCA(T, CT, WT, EV, GV)                                      \
  void dlaf_p##T##potrf(char uplo, int n, CT* a, int ia, int ja,              \
                        struct DLAF_descriptor desca, int ctx, int* info) {   \
    struct DLAF_descriptor d = desca;                                         \
    d.i = ia;                                                                 \
    d.j = ja;                                                                 \
    int rc = chol(ctx, uplo, #T, a, d, n);                                    \
    if (info) *info = rc;                                                     \
  }                                                                           \
  void dlaf_p##T##potri(char uplo, int n, CT* a, int ia, int ja,              \
                        struct DLAF_descriptor desca, int ctx, int* info) {   \
    struct DLAF_descriptor d = desca;                                         \
    d.i = ia;                                                                 \
    d.j = ja;                                                                 \
    int rc = chol_inv(ctx, uplo, #T, a, d, n);                                \
    if (info) *info = rc;                                                     \
  }                                                                           \
  void dlaf_p##EV(char uplo, int n, CT* a,                                 \
                     struct DLAF_descriptor desca, WT* w, CT* z,              \
                     struct DLAF_descriptor descz, int ctx, int* info) {      \
    (void)n;                                                                  \
    int rc = eig(ctx, uplo, #T, a, w, z, desca, descz, -1);                   \
    if (info) *info = rc;                                                     \
  }                                                                           \
  void dlaf_p##EV##_partial_spectrum(                                      \
      char uplo, int n, CT* a, struct DLAF_descriptor desca, WT* w, CT* z,    \
      struct DLAF_descriptor descz, long long begin, long long end, int ctx,  \
      int* info) {                                                            \
    (void)n;                                                                  \
    int rc = begin == 0 ? eig(ctx, uplo, #T, a, w, z, desca, descz, end)      \
                        : -1;                                                 \
    if (info) *info = rc;                                                     \
  }                                                                           \
  void dlaf_p##GV(char uplo, int n, CT* a,                                 \
                     struct DLAF_descriptor desca, CT* b,                     \
                     struct DLAF_descriptor descb, WT* w, CT* z,              \
                     struct DLAF_descriptor descz, int ctx, int* info) {      \
    (void)n;                                                                  \
    int rc = gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 0, -1);      \
    if (info) *info = rc;                                                     \
  }                                                                           \
  void dlaf_p##GV##_factorized(                                            \
      char uplo, int n, CT* a, struct DLAF_descriptor desca, CT* b,           \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz, int ctx, int* info) {                     \
    (void)n;                                                                  \
    int rc = gev(ctx, uplo, #T, a, b, w, z, desca, descb, descz, 1, -1);      \
    if (info) *info = rc;                                                     \
  }

DLAF_SHIM_SCA(s, float, float, ssyevd, ssygvd)
DLAF_SHIM_SCA(d, double, double, dsyevd, dsygvd)
DLAF_SHIM_SCA(c, float, float, cheevd, chegvd)
DLAF_SHIM_SCA(z, double, double, zheevd, zhegvd)

void dlaf_free_all_grids(void) {
  call_int("free_all_grids", "()");
}

}  // extern "C"
