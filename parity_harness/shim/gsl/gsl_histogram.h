/* Mini-GSL histogram: same semantics as gsl_histogram with uniform ranges
 * (histogram/init.c make_uniform, histogram/add.c increment). Bin i covers
 * [range[i], range[i+1]); x == range[n] (the upper edge) is OUT of range and
 * silently not counted -- the "GSL upper-edge exclusion" the statistics
 * parity depends on. */
#ifndef SHIM_GSL_HISTOGRAM_H
#define SHIM_GSL_HISTOGRAM_H

#include <stddef.h>

typedef struct {
	size_t n;       /* number of bins */
	double *range;  /* n+1 edges */
	double *bin;    /* n counts */
} gsl_histogram;

gsl_histogram *gsl_histogram_alloc(size_t n);
void gsl_histogram_set_ranges_uniform(gsl_histogram *h, double xmin,
		double xmax);
int gsl_histogram_increment(gsl_histogram *h, double x);
double gsl_histogram_get(const gsl_histogram *h, size_t i);
size_t gsl_histogram_bins(const gsl_histogram *h);
void gsl_histogram_free(gsl_histogram *h);

#endif
