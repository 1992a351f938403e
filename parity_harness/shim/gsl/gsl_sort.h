/* Shim for gsl/gsl_sort.h: ascending in-place sort of doubles. */
#ifndef SHIM_GSL_SORT_H
#define SHIM_GSL_SORT_H

#include <stddef.h>

void gsl_sort(double *data, size_t stride, size_t n);

#endif
