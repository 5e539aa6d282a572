/* dlaf_tpu C API — ABI mirror of the Python layer in api/c_api.py.
 *
 * Equivalent of the reference's include/dlaf_c/ headers (init.h, grid.h,
 * desc.h, and the per-type solver entry points).  The implementation of
 * record is the Python module `dlaf_tpu.api.c_api`; this header documents
 * the C-shaped contract for an embedding shim (CPython API or cffi
 * embedding) so ScaLAPACK-style C/Fortran callers can link against it.
 *
 * Conventions (identical to the reference, dlaf_c/desc.h:16):
 *   - context handles from dlaf_create_grid count down from INT_MAX;
 *   - DLAF_descriptor follows the ScaLAPACK descriptor, 1-based (i, j);
 *   - matrices are column-major local buffers; functions operate in-place;
 *   - return value 0 = success (LAPACK-style info otherwise).
 */

#ifndef DLAF_TPU_C_H
#define DLAF_TPU_C_H

#ifdef __cplusplus
extern "C" {
#endif

struct DLAF_descriptor {
  int m;     /* global rows */
  int n;     /* global cols */
  int mb;    /* row block size */
  int nb;    /* col block size */
  int isrc;  /* source process row */
  int jsrc;  /* source process col */
  int i;     /* submatrix row origin, 1-based */
  int j;     /* submatrix col origin, 1-based */
  int ld;    /* local leading dimension */
};

void dlaf_initialize(int argc_dlaf, const char** argv_dlaf);
void dlaf_finalize(void);

int dlaf_create_grid(int nprow, int npcol, char order); /* -> context */
void dlaf_free_grid(int ctx);
void dlaf_free_all_grids(void);

/* Complex scalars cross the ABI as interleaved re/im pairs (the layout
 * of C99 `float complex` / C++ std::complex). */

/* Per-type entries, reference names (dlaf_c/factorization/cholesky.h,
 * dlaf_c/inverse/cholesky.h — `a` holds the FACTOR on entry — and
 * dlaf_c/eigensolver/{eigensolver,gen_eigensolver}.h; partial-spectrum
 * variants take [begin = 0, end) and write the leading `end` columns
 * of z). T in {s: float, d: double, c: float complex, z: double
 * complex}; W is the matching real type. */
#define DLAF_TPU_DECL_TYPED(T, CT, WT, KIND)                                  \
  int dlaf_cholesky_factorization_##T(int ctx, char uplo, CT* a,              \
                                      struct DLAF_descriptor desca);          \
  int dlaf_cholesky_##T(int ctx, char uplo, CT* a, /* legacy alias */         \
                        struct DLAF_descriptor desca);                        \
  int dlaf_inverse_from_cholesky_factor_##T(int ctx, char uplo, CT* a,        \
                                            struct DLAF_descriptor desca);    \
  int dlaf_##KIND##_eigensolver_##T(int ctx, char uplo, CT* a,                \
                                    struct DLAF_descriptor desca, WT* w,      \
                                    CT* z, struct DLAF_descriptor descz);     \
  int dlaf_##KIND##_eigensolver_partial_spectrum_##T(                         \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, WT* w, CT* z,  \
      struct DLAF_descriptor descz, long long begin, long long end);          \
  int dlaf_##KIND##_generalized_eigensolver_##T(                              \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz);                                          \
  int dlaf_##KIND##_generalized_eigensolver_factorized_##T(                   \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz);                                          \
  int dlaf_##KIND##_generalized_eigensolver_partial_spectrum_##T(             \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz, long long begin, long long end);          \
  int dlaf_##KIND##_generalized_eigensolver_partial_spectrum_factorized_##T( \
      int ctx, char uplo, CT* a, struct DLAF_descriptor desca, CT* b,         \
      struct DLAF_descriptor descb, WT* w, CT* z,                             \
      struct DLAF_descriptor descz, long long begin, long long end);

DLAF_TPU_DECL_TYPED(s, float, float, symmetric)
DLAF_TPU_DECL_TYPED(d, double, double, symmetric)
DLAF_TPU_DECL_TYPED(c, float, float, hermitian)
DLAF_TPU_DECL_TYPED(z, double, double, hermitian)
#undef DLAF_TPU_DECL_TYPED

/* legacy aliases of this build's round-1 names (potri semantics) */
int dlaf_cholesky_inverse_s(int ctx, char uplo, float* a,
                            struct DLAF_descriptor desca);
int dlaf_cholesky_inverse_d(int ctx, char uplo, double* a,
                            struct DLAF_descriptor desca);

/* ScaLAPACK-style wrappers: ia/ja != 1 supported here (the reference
 * requires 1); the grid comes from the explicit ctx argument (this
 * runtime has no BLACS to resolve a descriptor ctxt from). */
#define DLAF_TPU_DECL_SCA(T, CT, WT, EV, GV)                                  \
  void dlaf_p##T##potrf(char uplo, int n, CT* a, int ia, int ja,              \
                        struct DLAF_descriptor desca, int ctx, int* info);    \
  void dlaf_p##T##potri(char uplo, int n, CT* a, int ia, int ja,              \
                        struct DLAF_descriptor desca, int ctx, int* info);    \
  void dlaf_p##EV(char uplo, int n, CT* a, struct DLAF_descriptor desca,      \
                  WT* w, CT* z, struct DLAF_descriptor descz, int ctx,        \
                  int* info);                                                 \
  void dlaf_p##EV##_partial_spectrum(                                         \
      char uplo, int n, CT* a, struct DLAF_descriptor desca, WT* w, CT* z,    \
      struct DLAF_descriptor descz, long long begin, long long end, int ctx,  \
      int* info);                                                             \
  void dlaf_p##GV(char uplo, int n, CT* a, struct DLAF_descriptor desca,      \
                  CT* b, struct DLAF_descriptor descb, WT* w, CT* z,          \
                  struct DLAF_descriptor descz, int ctx, int* info);          \
  void dlaf_p##GV##_factorized(char uplo, int n, CT* a,                       \
                               struct DLAF_descriptor desca, CT* b,           \
                               struct DLAF_descriptor descb, WT* w, CT* z,    \
                               struct DLAF_descriptor descz, int ctx,         \
                               int* info);

DLAF_TPU_DECL_SCA(s, float, float, ssyevd, ssygvd)
DLAF_TPU_DECL_SCA(d, double, double, dsyevd, dsygvd)
DLAF_TPU_DECL_SCA(c, float, float, cheevd, chegvd)
DLAF_TPU_DECL_SCA(z, double, double, zheevd, zhegvd)
#undef DLAF_TPU_DECL_SCA

#ifdef __cplusplus
}
#endif

#endif /* DLAF_TPU_C_H */
