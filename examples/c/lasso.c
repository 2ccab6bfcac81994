/* Lasso through the pogs_tpu native C ABI (counterpart of the reference's
 * examples/c/lasso.c).
 *
 * Build (after building the library with cmake):
 *   cc -I src/include examples/c/lasso.c -L build/lib -lpogs_tpu_native \
 *      -Wl,-rpath,build/lib -lm -o lasso_c && ./lasso_c
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "pogs_tpu_native.h"

static double rnd(unsigned long long *s) {
  *s ^= *s << 13; *s ^= *s >> 7; *s ^= *s << 17;
  return (double)(*s % 100003) / 100003.0 - 0.5;
}

int main(void) {
  const size_t m = 100, n = 50;
  double *A = malloc(m * n * sizeof(double));
  double *b = malloc(m * sizeof(double));
  double *x = malloc(n * sizeof(double));
  double *y = malloc(m * sizeof(double));
  int32_t *f_h = malloc(m * sizeof(int32_t));
  double *f_b = malloc(m * sizeof(double));
  int32_t *g_h = malloc(n * sizeof(int32_t));
  double *g_c = malloc(n * sizeof(double));

  unsigned long long seed = 42;
  for (size_t i = 0; i < m * n; ++i) A[i] = rnd(&seed);
  for (size_t i = 0; i < m; ++i) b[i] = rnd(&seed);

  /* f_i(y) = 1/2 (y - b_i)^2 ; g_j(x) = lambda |x| */
  double lam_max = 0.0;
  for (size_t j = 0; j < n; ++j) {
    double acc = 0.0;
    for (size_t i = 0; i < m; ++i) acc += A[i * n + j] * b[i];
    if (fabs(acc) > lam_max) lam_max = fabs(acc);
  }
  const double lam = 0.2 * lam_max;
  for (size_t i = 0; i < m; ++i) { f_h[i] = POGS_NATIVE_SQUARE; f_b[i] = b[i]; }
  for (size_t j = 0; j < n; ++j) { g_h[j] = POGS_NATIVE_ABS; g_c[j] = lam; }

  PogsNativeSettings st;
  pogs_native_settings_default(&st);
  st.abs_tol = 1e-5;
  st.rel_tol = 1e-5;

  PogsNativeInfo info;
  int32_t status = pogs_native_solve_dense_d(
      POGS_NATIVE_ROW_MAJ, m, n, A, &st,
      f_h, NULL, f_b, NULL, NULL, NULL,
      g_h, NULL, NULL, g_c, NULL, NULL,
      x, y, NULL, NULL, &info);

  size_t nnz = 0;
  for (size_t j = 0; j < n; ++j) nnz += fabs(x[j]) > 1e-5;
  printf("status=%d optval=%.6f iterations=%d nnz(x)=%zu/%zu\n",
         status, info.optval, info.final_iter, nnz, n);

  free(A); free(b); free(x); free(y);
  free(f_h); free(f_b); free(g_h); free(g_c);
  return status == POGS_NATIVE_SUCCESS ? 0 : 1;
}
