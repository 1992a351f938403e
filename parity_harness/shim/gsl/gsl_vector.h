/* Shim for gsl/gsl_vector.h: the extracted gradient.c (background
 * extraction) uses plain dense vectors only. Implemented in minigsl.c. */
#ifndef SHIM_GSL_VECTOR_H
#define SHIM_GSL_VECTOR_H

#include <stdlib.h>

typedef struct {
	size_t size;
	double *data;
} gsl_vector;

gsl_vector *gsl_vector_alloc(size_t n);
gsl_vector *gsl_vector_calloc(size_t n);
void gsl_vector_free(gsl_vector *v);
double gsl_vector_get(const gsl_vector *v, size_t i);
void gsl_vector_set(gsl_vector *v, size_t i, double x);

#endif
