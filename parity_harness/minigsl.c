/* Mini-GSL: bit-faithful implementations of the six GSL routines the
 * compiled reference kernels call. Each follows the exact floating-point
 * algorithm of GSL 2.x (documented per function) so that golden outputs
 * match a real GSL build:
 *   - means/variances use the recurrence  m += (x - m)/(i+1)  in long double
 *     (gsl/statistics/mean_source.c, variance_source.c)
 *   - sd applies the n/(n-1) correction then sqrt
 *   - median_from_sorted_data averages data[(n-1)/2] and data[n/2]
 *     (median_source.c)
 *   - absdev_m accumulates |x - mean| in long double (absdev_source.c)
 *   - fit_linear computes recurrence means of x,y then centered moments
 *     m_dx2, m_dxdy with the same recurrence (fit/linear.c)
 *   - the histogram uses uniform ranges range[i] = f1*xmin + f2*xmax and a
 *     binary search; x >= range[n] is out of range (histogram/init.c,
 *     find.c) -- the upper-edge exclusion statistics.c depends on.
 */
#include <math.h>
#include <stdlib.h>

#include <gsl/gsl_statistics.h>
#include <gsl/gsl_histogram.h>
#include <gsl/gsl_fit.h>

double gsl_stats_median_from_sorted_data(const double sorted_data[],
		size_t stride, size_t n) {
	if (n == 0)
		return 0.0;
	{
		const size_t lhs = (n - 1) / 2;
		const size_t rhs = n / 2;
		if (lhs == rhs)
			return sorted_data[lhs * stride];
		return (sorted_data[lhs * stride] + sorted_data[rhs * stride]) / 2.0;
	}
}

double gsl_stats_ushort_median_from_sorted_data(
		const unsigned short sorted_data[], size_t stride, size_t n) {
	if (n == 0)
		return 0.0;
	{
		const size_t lhs = (n - 1) / 2;
		const size_t rhs = n / 2;
		if (lhs == rhs)
			return (double) sorted_data[lhs * stride];
		return ((double) sorted_data[lhs * stride]
				+ (double) sorted_data[rhs * stride]) / 2.0;
	}
}

static double ushort_mean(const unsigned short data[], size_t stride,
		size_t n) {
	long double mean = 0;
	size_t i;
	for (i = 0; i < n; i++)
		mean += (data[i * stride] - mean) / (i + 1);
	return (double) mean;
}

static double ushort_variance_m(const unsigned short data[], size_t stride,
		size_t n, double mean) {
	long double variance = 0;
	size_t i;
	for (i = 0; i < n; i++) {
		const long double delta = (data[i * stride] - mean);
		variance += (delta * delta - variance) / (i + 1);
	}
	return (double) variance;
}

double gsl_stats_ushort_sd(const unsigned short data[], size_t stride,
		size_t n) {
	const double mean = ushort_mean(data, stride, n);
	const double variance = ushort_variance_m(data, stride, n, mean);
	return sqrt(variance * ((double) n / (double) (n - 1)));
}

double gsl_stats_ushort_absdev_m(const unsigned short data[], size_t stride,
		size_t n, double mean) {
	long double sum = 0;
	size_t i;
	for (i = 0; i < n; i++) {
		const long double delta = fabs((double) data[i * stride] - mean);
		sum += delta;
	}
	return (double) (sum / n);
}

void gsl_stats_ushort_minmax(unsigned short *min_out,
		unsigned short *max_out, const unsigned short data[], size_t stride,
		size_t n) {
	unsigned short mn = data[0], mx = data[0];
	size_t i;
	for (i = 0; i < n; i++) {
		unsigned short v = data[i * stride];
		if (v < mn)
			mn = v;
		if (v > mx)
			mx = v;
	}
	*min_out = mn;
	*max_out = mx;
}

int gsl_fit_linear(const double *x, const size_t xstride, const double *y,
		const size_t ystride, const size_t n, double *c0, double *c1,
		double *cov00, double *cov01, double *cov11, double *sumsq) {
	double m_x = 0, m_y = 0, m_dx2 = 0, m_dxdy = 0;
	size_t i;
	for (i = 0; i < n; i++) {
		m_x += (x[i * xstride] - m_x) / (i + 1.0);
		m_y += (y[i * ystride] - m_y) / (i + 1.0);
	}
	for (i = 0; i < n; i++) {
		const double dx = x[i * xstride] - m_x;
		const double dy = y[i * ystride] - m_y;
		m_dx2 += (dx * dx - m_dx2) / (i + 1.0);
		m_dxdy += (dx * dy - m_dxdy) / (i + 1.0);
	}
	{
		double s2 = 0, d2 = 0;
		double b = m_dxdy / m_dx2;
		double a = m_y - m_x * b;
		*c0 = a;
		*c1 = b;
		for (i = 0; i < n; i++) {
			const double dx = x[i * xstride] - m_x;
			const double dy = y[i * ystride] - m_y;
			const double d = dy - b * dx;
			d2 += d * d;
		}
		s2 = d2 / (n - 2.0);
		*cov00 = s2 * (1.0 / n) * (1 + m_x * m_x / m_dx2);
		*cov11 = s2 * 1.0 / (n * m_dx2);
		*cov01 = s2 * (-m_x) / (n * m_dx2);
		*sumsq = d2;
	}
	return 0;
}

/* ------------------------------- histogram ------------------------------ */

gsl_histogram *gsl_histogram_alloc(size_t n) {
	gsl_histogram *h = malloc(sizeof(gsl_histogram));
	size_t i;
	h->n = n;
	h->range = malloc((n + 1) * sizeof(double));
	h->bin = malloc(n * sizeof(double));
	for (i = 0; i < n; i++)
		h->bin[i] = 0.0;
	for (i = 0; i <= n; i++)
		h->range[i] = (double) i;
	return h;
}

void gsl_histogram_set_ranges_uniform(gsl_histogram *h, double xmin,
		double xmax) {
	size_t i;
	const size_t n = h->n;
	for (i = 0; i <= n; i++) {
		const double f1 = ((double) (n - i) / (double) n);
		const double f2 = ((double) i / (double) n);
		h->range[i] = f1 * xmin + f2 * xmax;
	}
	for (i = 0; i < n; i++)
		h->bin[i] = 0.0;
}

/* GSL find(): binary search for bin with range[i] <= x < range[i+1];
 * returns -1 when x < range[0] or x >= range[n]. */
static int histo_find(const gsl_histogram *h, double x, size_t *idx) {
	size_t lo = 0, hi = h->n;
	if (x < h->range[0] || x >= h->range[h->n])
		return -1;
	while (hi - lo > 1) {
		size_t mid = (lo + hi) / 2;
		if (x >= h->range[mid])
			lo = mid;
		else
			hi = mid;
	}
	*idx = lo;
	return 0;
}

int gsl_histogram_increment(gsl_histogram *h, double x) {
	size_t idx;
	if (histo_find(h, x, &idx) != 0)
		return -1; /* GSL_EDOM: silently dropped by callers */
	h->bin[idx] += 1.0;
	return 0;
}

double gsl_histogram_get(const gsl_histogram *h, size_t i) {
	return h->bin[i];
}

size_t gsl_histogram_bins(const gsl_histogram *h) {
	return h->n;
}

void gsl_histogram_free(gsl_histogram *h) {
	free(h->range);
	free(h->bin);
	free(h);
}

/* ---- gsl_matrix (matrix/init.c, matrix/getset.h semantics: row-major,
 * tda == size2 on a fresh alloc) ---- */
#include "gsl/gsl_matrix.h"

gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
	gsl_matrix *m = malloc(sizeof(gsl_matrix));
	m->size1 = n1;
	m->size2 = n2;
	m->tda = n2;
	m->data = malloc(n1 * n2 * sizeof(double));
	return m;
}

void gsl_matrix_free(gsl_matrix *m) {
	free(m->data);
	free(m);
}

double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j) {
	return m->data[i * m->tda + j];
}

void gsl_matrix_set(gsl_matrix *m, size_t i, size_t j, double x) {
	m->data[i * m->tda + j] = x;
}
