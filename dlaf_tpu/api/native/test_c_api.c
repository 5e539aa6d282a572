/* Round-trip test of the native dlaf_tpu C ABI (pure C, no Python).
 *
 * Mirrors the reference's test/unit/c_api round-trips: build an SPD
 * matrix, dlaf_pdpotrf it, verify L L^T = A; then dlaf_pdsyevd and verify
 * A v = lambda v.  Exit code 0 = all checks passed.
 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "../dlaf_tpu_c.h"

static double A(int i, int j, int n) {
  /* the reference miniapps' HPD recipe: dominant diagonal + smooth off */
  if (i == j) return 2.0 * n;
  return cos(0.001 * (i + 1)) * sin(0.002 * (j - i));
}

int main(void) {
  const int n = 96, nb = 32;
  int info = -7;

  dlaf_initialize(0, NULL);
  int ctx = dlaf_create_grid(1, 1, 'R');
  if (ctx <= 0) {
    fprintf(stderr, "create_grid failed: %d\n", ctx);
    return 2;
  }

  struct DLAF_descriptor desc = {n, n, nb, nb, 0, 0, 1, 1, n};

  /* ---- POTRF round trip ---- */
  double* a = malloc(sizeof(double) * n * n);
  double* a0 = malloc(sizeof(double) * n * n);
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) {
      double v = i >= j ? A(i, j, n) : A(j, i, n);
      a[j * n + i] = v; /* column-major */
      a0[j * n + i] = v;
    }

  dlaf_pdpotrf('L', n, a, 1, 1, desc, ctx, &info);
  if (info != 0) {
    fprintf(stderr, "pdpotrf info=%d\n", info);
    return 3;
  }
  double resid = 0.0, norm = 0.0;
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int k = 0; k <= (i < j ? i : j); ++k)
        s += a[k * n + i] * a[k * n + j]; /* (L L^T)_ij, lower stored */
      double d = s - a0[j * n + i];
      resid += d * d;
      norm += a0[j * n + i] * a0[j * n + i];
    }
  resid = sqrt(resid / norm);
  if (!(resid < 1e-12)) {
    fprintf(stderr, "potrf residual %g\n", resid);
    return 4;
  }
  printf("pdpotrf ok, resid %.2e\n", resid);

  /* ---- SYEVD round trip ---- */
  double* w = malloc(sizeof(double) * n);
  double* z = malloc(sizeof(double) * n * n);
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) a[j * n + i] = a0[j * n + i];

  dlaf_pdsyevd('L', n, a, desc, w, z, desc, ctx, &info);
  if (info != 0) {
    fprintf(stderr, "pdsyevd info=%d\n", info);
    return 5;
  }
  double emax = 0.0;
  for (int c = 0; c < n; ++c) {
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int k = 0; k < n; ++k) s += a0[k * n + i] * z[c * n + k];
      double d = s - w[c] * z[c * n + i];
      if (fabs(d) > emax) emax = fabs(d);
    }
  }
  if (!(emax < 1e-9 * 2 * n)) {
    fprintf(stderr, "syevd residual %g\n", emax);
    return 6;
  }
  printf("pdsyevd ok, resid %.2e\n", emax);

  /* ---- partial-spectrum round trip (first k eigenpairs) ---- */
  const long long k = 17;
  double* wp = malloc(sizeof(double) * n);
  double* zp = malloc(sizeof(double) * n * n);
  for (int j = 0; j < n; ++j)
    for (int i = 0; i < n; ++i) a[j * n + i] = a0[j * n + i];
  dlaf_pdsyevd_partial_spectrum('L', n, a, desc, wp, zp, desc, 0, k, ctx,
                                &info);
  if (info != 0) {
    fprintf(stderr, "pdsyevd_partial_spectrum info=%d\n", info);
    return 7;
  }
  double pmax = 0.0;
  for (int c = 0; c < k; ++c) {
    if (fabs(wp[c] - w[c]) > pmax) pmax = fabs(wp[c] - w[c]);
    for (int i = 0; i < n; ++i) {
      double s = 0.0;
      for (int kk = 0; kk < n; ++kk) s += a0[kk * n + i] * zp[c * n + kk];
      double d = s - wp[c] * zp[c * n + i];
      if (fabs(d) > pmax) pmax = fabs(d);
    }
  }
  if (!(pmax < 1e-9 * 2 * n)) {
    fprintf(stderr, "partial-spectrum residual %g\n", pmax);
    return 8;
  }
  printf("pdsyevd_partial_spectrum ok, resid %.2e\n", pmax);

  dlaf_free_grid(ctx);
  dlaf_finalize();
  return 0;
}
