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
  int isrc;  /* source process row (must be 0) */
  int jsrc;  /* source process col (must be 0) */
  int i;     /* submatrix row origin, 1-based (must be 1) */
  int j;     /* submatrix col origin, 1-based (must be 1) */
  int ld;    /* local leading dimension */
};

void dlaf_initialize(int argc_dlaf, const char** argv_dlaf);
void dlaf_finalize(void);

int dlaf_create_grid(int nprow, int npcol, char order); /* -> context */
void dlaf_free_grid(int ctx);

/* Cholesky factorization (reference dlaf_c/factorization/cholesky.h) */
int dlaf_cholesky_s(int ctx, char uplo, float* a,
                    struct DLAF_descriptor desca);
int dlaf_cholesky_d(int ctx, char uplo, double* a,
                    struct DLAF_descriptor desca);

/* Inverse from Cholesky (reference dlaf_c/inverse/cholesky.h) */
int dlaf_cholesky_inverse_s(int ctx, char uplo, float* a,
                            struct DLAF_descriptor desca);
int dlaf_cholesky_inverse_d(int ctx, char uplo, double* a,
                            struct DLAF_descriptor desca);

/* Symmetric/Hermitian eigensolver (reference dlaf_c/eigensolver/...) */
int dlaf_symmetric_eigensolver_s(int ctx, char uplo, float* a,
                                 struct DLAF_descriptor desca, float* w,
                                 float* z, struct DLAF_descriptor descz);
int dlaf_symmetric_eigensolver_d(int ctx, char uplo, double* a,
                                 struct DLAF_descriptor desca, double* w,
                                 double* z, struct DLAF_descriptor descz);

/* ScaLAPACK-style wrappers */
void dlaf_pspotrf(char uplo, int n, float* a, int ia, int ja,
                  struct DLAF_descriptor desca, int ctx, int* info);
void dlaf_pdpotrf(char uplo, int n, double* a, int ia, int ja,
                  struct DLAF_descriptor desca, int ctx, int* info);
void dlaf_pssyevd(char uplo, int n, float* a, struct DLAF_descriptor desca,
                  float* w, float* z, struct DLAF_descriptor descz,
                  int ctx, int* info);
void dlaf_pdsyevd(char uplo, int n, double* a, struct DLAF_descriptor desca,
                  double* w, double* z, struct DLAF_descriptor descz,
                  int ctx, int* info);

#ifdef __cplusplus
}
#endif

#endif /* DLAF_TPU_C_H */
