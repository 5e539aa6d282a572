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
                struct DLAF_descriptor d) {
  return call_int("cholesky", "(iisLiiiii)", ctx, static_cast<int>(uplo),
                  typ, reinterpret_cast<long long>(a), d.m, d.n, d.mb,
                  d.nb, d.ld);
}

int dlaf_cholesky_s(int ctx, char uplo, float* a, struct DLAF_descriptor d) {
  return chol(ctx, uplo, "s", a, d);
}

int dlaf_cholesky_d(int ctx, char uplo, double* a,
                    struct DLAF_descriptor d) {
  return chol(ctx, uplo, "d", a, d);
}

static int chol_inv(int ctx, char uplo, const char* typ, void* a,
                    struct DLAF_descriptor d) {
  return call_int("cholesky_inverse", "(iisLiiiii)", ctx,
                  static_cast<int>(uplo), typ,
                  reinterpret_cast<long long>(a), d.m, d.n, d.mb, d.nb,
                  d.ld);
}

int dlaf_cholesky_inverse_s(int ctx, char uplo, float* a,
                            struct DLAF_descriptor d) {
  return chol_inv(ctx, uplo, "s", a, d);
}

int dlaf_cholesky_inverse_d(int ctx, char uplo, double* a,
                            struct DLAF_descriptor d) {
  return chol_inv(ctx, uplo, "d", a, d);
}

static int eig(int ctx, char uplo, const char* typ, void* a, void* w,
               void* z, struct DLAF_descriptor desca,
               struct DLAF_descriptor descz) {
  return call_int("eigensolver", "(iisLLLiiiii)", ctx,
                  static_cast<int>(uplo), typ,
                  reinterpret_cast<long long>(a),
                  reinterpret_cast<long long>(w),
                  reinterpret_cast<long long>(z), desca.n, desca.mb,
                  desca.nb, desca.ld, descz.ld);
}

int dlaf_symmetric_eigensolver_s(int ctx, char uplo, float* a,
                                 struct DLAF_descriptor desca, float* w,
                                 float* z, struct DLAF_descriptor descz) {
  return eig(ctx, uplo, "s", a, w, z, desca, descz);
}

int dlaf_symmetric_eigensolver_d(int ctx, char uplo, double* a,
                                 struct DLAF_descriptor desca, double* w,
                                 double* z, struct DLAF_descriptor descz) {
  return eig(ctx, uplo, "d", a, w, z, desca, descz);
}

void dlaf_pspotrf(char uplo, int n, float* a, int ia, int ja,
                  struct DLAF_descriptor desca, int ctx, int* info) {
  (void)n;
  int rc = (ia == 1 && ja == 1) ? dlaf_cholesky_s(ctx, uplo, a, desca)
                                : -1;
  if (info) *info = rc;
}

void dlaf_pdpotrf(char uplo, int n, double* a, int ia, int ja,
                  struct DLAF_descriptor desca, int ctx, int* info) {
  (void)n;
  int rc = (ia == 1 && ja == 1) ? dlaf_cholesky_d(ctx, uplo, a, desca)
                                : -1;
  if (info) *info = rc;
}

void dlaf_pssyevd(char uplo, int n, float* a, struct DLAF_descriptor desca,
                  float* w, float* z, struct DLAF_descriptor descz,
                  int ctx, int* info) {
  (void)n;
  int rc = dlaf_symmetric_eigensolver_s(ctx, uplo, a, desca, w, z, descz);
  if (info) *info = rc;
}

void dlaf_pdsyevd(char uplo, int n, double* a, struct DLAF_descriptor desca,
                  double* w, double* z, struct DLAF_descriptor descz,
                  int ctx, int* info) {
  (void)n;
  int rc = dlaf_symmetric_eigensolver_d(ctx, uplo, a, desca, w, z, descz);
  if (info) *info = rc;
}

}  // extern "C"
