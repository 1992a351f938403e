/* Shim for gsl/gsl_matrix.h: the extracted photometry.c block reads z via
 * gsl_matrix_get and z->size1/size2 only. Same row-major layout as GSL
 * (tda == size2 for freshly allocated matrices); implementations in
 * minigsl.c. */
#ifndef SHIM_GSL_MATRIX_H
#define SHIM_GSL_MATRIX_H

#include <stdlib.h>

typedef struct {
	size_t size1;   /* rows */
	size_t size2;   /* columns */
	size_t tda;     /* row stride (== size2 here) */
	double *data;
} gsl_matrix;

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2);
gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2);
void gsl_matrix_free(gsl_matrix *m);
double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j);
void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x);
int gsl_matrix_memcpy(gsl_matrix *dst, const gsl_matrix *src);
double gsl_matrix_max(const gsl_matrix *m);
void gsl_matrix_max_index(const gsl_matrix *m, size_t *imax, size_t *jmax);

#endif
