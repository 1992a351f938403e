/* Mini-GSL: declarations of the statistics functions the reference kernels
 * call. Implemented in minigsl.c with the exact algorithms of GSL 2.x
 * (statistics/{mean,variance,absdev,median,minmax}_source.c): recurrence
 * means in long double, (n/(n-1)) variance correction, (lhs+rhs)/2 median. */
#ifndef SHIM_GSL_STATISTICS_H
#define SHIM_GSL_STATISTICS_H

#include <stddef.h>

double gsl_stats_median_from_sorted_data(const double sorted_data[],
		size_t stride, size_t n);
double gsl_stats_sd(const double data[], size_t stride, size_t n);
double gsl_stats_ushort_median_from_sorted_data(
		const unsigned short sorted_data[], size_t stride, size_t n);
double gsl_stats_ushort_sd(const unsigned short data[], size_t stride,
		size_t n);
double gsl_stats_ushort_absdev_m(const unsigned short data[], size_t stride,
		size_t n, double mean);
void gsl_stats_ushort_minmax(unsigned short *min_out,
		unsigned short *max_out, const unsigned short data[], size_t stride,
		size_t n);

#endif
