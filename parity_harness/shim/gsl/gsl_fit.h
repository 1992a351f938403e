/* Mini-GSL gsl_fit_linear declaration; implemented in minigsl.c with the
 * exact algorithm of GSL fit/linear.c (recurrence means, then slope from
 * centered moments). */
#ifndef SHIM_GSL_FIT_H
#define SHIM_GSL_FIT_H

#include <stddef.h>

int gsl_fit_linear(const double *x, const size_t xstride, const double *y,
		const size_t ystride, const size_t n, double *c0, double *c1,
		double *cov00, double *cov01, double *cov11, double *sumsq);

#endif
