#include <stdio.h>
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

/* ---- dense vectors + sort + double sd + weighted LSQ (for gradient.c) -- */

#include "gsl/gsl_vector.h"
#include "gsl/gsl_sort.h"
#include "gsl/gsl_multifit.h"
#include <math.h>
#include <string.h>

gsl_vector *gsl_vector_alloc(size_t n) {
	gsl_vector *v = malloc(sizeof(gsl_vector));
	v->size = n;
	v->data = malloc(n * sizeof(double));
	return v;
}

gsl_vector *gsl_vector_calloc(size_t n) {
	gsl_vector *v = gsl_vector_alloc(n);
	memset(v->data, 0, n * sizeof(double));
	return v;
}

void gsl_vector_free(gsl_vector *v) {
	free(v->data);
	free(v);
}

double gsl_vector_get(const gsl_vector *v, size_t i) {
	return v->data[i];
}

void gsl_vector_set(gsl_vector *v, size_t i, double x) {
	v->data[i] = x;
}

gsl_matrix *gsl_matrix_calloc(size_t n1, size_t n2) {
	gsl_matrix *m = gsl_matrix_alloc(n1, n2);
	memset(m->data, 0, n1 * n2 * sizeof(double));
	return m;
}

static int cmp_double(const void *a, const void *b) {
	double x = *(const double *) a, y = *(const double *) b;
	return (x > y) - (x < y);
}

void gsl_sort(double *data, size_t stride, size_t n) {
	/* gradient.c always calls with stride 1 */
	(void) stride;
	qsort(data, n, sizeof(double), cmp_double);
}

double gsl_stats_sd(const double data[], size_t stride, size_t n) {
	/* GSL variance_source.c: recurrence mean then (n/(n-1)) correction */
	long double mean = 0, var = 0;
	size_t i;
	for (i = 0; i < n; i++)
		mean += (data[i * stride] - mean) / (i + 1);
	for (i = 0; i < n; i++) {
		long double d = data[i * stride] - mean;
		var += (d * d - var) / (i + 1);
	}
	return sqrt(var * ((double) n / (double) (n - 1)));
}

gsl_multifit_linear_workspace *gsl_multifit_linear_alloc(size_t n, size_t p) {
	gsl_multifit_linear_workspace *w = malloc(sizeof(*w));
	w->n = n;
	w->p = p;
	return w;
}

void gsl_multifit_linear_free(gsl_multifit_linear_workspace *w) {
	free(w);
}

/* Column-scaled Householder QR least squares (see gsl_multifit.h shim
 * header for why this replaces GSL's balanced SVD). */
int gsl_multifit_wlinear(const gsl_matrix *X, const gsl_vector *w,
		const gsl_vector *y, gsl_vector *c, gsl_matrix *cov, double *chisq,
		gsl_multifit_linear_workspace *work) {
	size_t n = X->size1, p = X->size2, i, j, k;
	double *A = malloc(n * p * sizeof(double));
	double *b = malloc(n * sizeof(double));
	double *scale = malloc(p * sizeof(double));
	(void) cov;
	(void) work;

	for (i = 0; i < n; i++) {
		double sw = sqrt(w->data[i]);
		for (j = 0; j < p; j++)
			A[i * p + j] = sw * X->data[i * X->tda + j];
		b[i] = sw * y->data[i];
	}
	for (j = 0; j < p; j++) {
		double s = 0;
		for (i = 0; i < n; i++)
			s += A[i * p + j] * A[i * p + j];
		s = sqrt(s);
		scale[j] = (s > 0) ? s : 1.0;
		for (i = 0; i < n; i++)
			A[i * p + j] /= scale[j];
	}
	/* Householder QR in place; apply reflectors to b */
	for (k = 0; k < p; k++) {
		double nrm = 0, alpha, beta;
		for (i = k; i < n; i++)
			nrm += A[i * p + k] * A[i * p + k];
		nrm = sqrt(nrm);
		if (nrm == 0)
			continue;
		alpha = (A[k * p + k] > 0) ? -nrm : nrm;
		/* v = x - alpha e_k stored in column k below diag; v_k adjusted */
		A[k * p + k] -= alpha;
		beta = -1.0 / (alpha * A[k * p + k]);   /* 2/||v||^2 */
		for (j = k + 1; j < p; j++) {
			double dot = 0;
			for (i = k; i < n; i++)
				dot += A[i * p + k] * A[i * p + j];
			dot *= beta;
			for (i = k; i < n; i++)
				A[i * p + j] -= dot * A[i * p + k];
		}
		{
			double dot = 0;
			for (i = k; i < n; i++)
				dot += A[i * p + k] * b[i];
			dot *= beta;
			for (i = k; i < n; i++)
				b[i] -= dot * A[i * p + k];
		}
		A[k * p + k] = alpha;   /* R diagonal */
	}
	/* back substitution R c = b */
	for (k = p; k-- > 0;) {
		double s = b[k];
		for (j = k + 1; j < p; j++)
			s -= A[k * p + j] * c->data[j];
		c->data[k] = (A[k * p + k] != 0) ? s / A[k * p + k] : 0.0;
	}
	for (j = 0; j < p; j++)
		c->data[j] /= scale[j];
	if (chisq) {
		double s = 0;
		for (i = p; i < n; i++)
			s += b[i] * b[i];
		*chisq = s;
	}
	free(A);
	free(b);
	free(scale);
	return 0;
}

/* ---- nonlinear LM solver + matrix helpers + rng stubs (for PSF.c) ---- */

#include "gsl/gsl_multifit_nlin.h"
#include "gsl/gsl_rng.h"

int gsl_matrix_memcpy(gsl_matrix *dst, const gsl_matrix *src) {
	memcpy(dst->data, src->data,
			src->size1 * src->size2 * sizeof(double));
	return 0;
}

double gsl_matrix_max(const gsl_matrix *m) {
	size_t i, n = m->size1 * m->size2;
	double mx = m->data[0];
	for (i = 1; i < n; i++)
		if (m->data[i] > mx)
			mx = m->data[i];
	return mx;
}

void gsl_matrix_max_index(const gsl_matrix *m, size_t *imax, size_t *jmax) {
	size_t i, n = m->size1 * m->size2, best = 0;
	for (i = 1; i < n; i++)
		if (m->data[i] > m->data[best])
			best = i;
	*imax = best / m->size2;
	*jmax = best % m->size2;
}

gsl_vector_view gsl_vector_view_array(double *base, size_t n) {
	gsl_vector_view v;
	v.vector.size = n;
	v.vector.data = base;
	return v;
}

static const gsl_rng_type rng_type_instance;
const gsl_rng_type *gsl_rng_default = &rng_type_instance;
void gsl_rng_env_setup(void) {
}
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
	(void) T;
	return malloc(sizeof(gsl_rng));
}
void gsl_rng_free(gsl_rng *r) {
	free(r);
}

static const gsl_multifit_fdfsolver_type lmsder_instance;
const gsl_multifit_fdfsolver_type *gsl_multifit_fdfsolver_lmsder =
		&lmsder_instance;

gsl_multifit_fdfsolver *gsl_multifit_fdfsolver_alloc(
		const gsl_multifit_fdfsolver_type *T, size_t n, size_t p) {
	gsl_multifit_fdfsolver *s = malloc(sizeof(*s));
	(void) T;
	s->x = gsl_vector_calloc(p);
	s->f = gsl_vector_calloc(n);
	s->dx = gsl_vector_calloc(p);
	s->J = gsl_matrix_calloc(n, p);
	s->lambda = 1e-3;
	s->fdf = NULL;
	return s;
}

int gsl_multifit_fdfsolver_set(gsl_multifit_fdfsolver *s,
		gsl_multifit_function_fdf *fdf, const gsl_vector *x) {
	s->fdf = fdf;
	memcpy(s->x->data, x->data, fdf->p * sizeof(double));
	fdf->fdf(s->x, fdf->params, s->f, s->J);
	s->lambda = 1e-3;
	return GSL_SUCCESS;
}

/* solve (A + lambda diag(A)) d = g for small p via Cholesky-ish Gauss */
static int lm_solve(double *A, double *g, double lambda, size_t p,
		double *d) {
	double M[16 * 16];
	size_t i, j, k;
	for (i = 0; i < p; i++)
		for (j = 0; j < p; j++)
			M[i * p + j] = A[i * p + j]
					+ ((i == j) ? lambda * A[i * p + i] : 0.0);
	for (i = 0; i < p; i++)
		d[i] = g[i];
	/* Gaussian elimination with partial pivoting */
	for (k = 0; k < p; k++) {
		size_t piv = k;
		double t;
		for (i = k + 1; i < p; i++)
			if (fabs(M[i * p + k]) > fabs(M[piv * p + k]))
				piv = i;
		if (M[piv * p + k] == 0.0)
			return -1;
		if (piv != k) {
			for (j = 0; j < p; j++) {
				t = M[k * p + j];
				M[k * p + j] = M[piv * p + j];
				M[piv * p + j] = t;
			}
			t = d[k];
			d[k] = d[piv];
			d[piv] = t;
		}
		for (i = k + 1; i < p; i++) {
			double fct = M[i * p + k] / M[k * p + k];
			for (j = k; j < p; j++)
				M[i * p + j] -= fct * M[k * p + j];
			d[i] -= fct * d[k];
		}
	}
	for (k = p; k-- > 0;) {
		for (j = k + 1; j < p; j++)
			d[k] -= M[k * p + j] * d[j];
		d[k] /= M[k * p + k];
	}
	return 0;
}

int gsl_multifit_fdfsolver_iterate(gsl_multifit_fdfsolver *s) {
	gsl_multifit_function_fdf *fdf = s->fdf;
	size_t n = fdf->n, p = fdf->p, i, j, k;
#ifdef LM_TRACE
	{
		static int call;
		fprintf(stderr, "LM %d x:", call++);
		for (i = 0; i < p; i++)
			fprintf(stderr, " %a", s->x->data[i]);
		fprintf(stderr, " lam=%a\n", s->lambda);
	}
#endif
	double JtJ[16 * 16], Jtf[16], d[16];
	gsl_vector *ftrial = gsl_vector_alloc(n);
	gsl_vector *xtrial = gsl_vector_alloc(p);
	double fnorm2 = 0, fnew2;
	int tries;

	for (i = 0; i < n; i++)
		fnorm2 += s->f->data[i] * s->f->data[i];
	for (i = 0; i < p; i++) {
		Jtf[i] = 0;
		for (j = 0; j < p; j++)
			JtJ[i * p + j] = 0;
	}
	for (k = 0; k < n; k++) {
		for (i = 0; i < p; i++) {
			double Jki = s->J->data[k * p + i];
			Jtf[i] += Jki * s->f->data[k];
			for (j = i; j < p; j++)
				JtJ[i * p + j] += Jki * s->J->data[k * p + j];
		}
	}
	for (i = 0; i < p; i++)
		for (j = 0; j < i; j++)
			JtJ[i * p + j] = JtJ[j * p + i];

	for (tries = 0; tries < 16; tries++) {
		if (lm_solve(JtJ, Jtf, s->lambda, p, d) != 0) {
			s->lambda *= 10.0;
			continue;
		}
		for (i = 0; i < p; i++)
			xtrial->data[i] = s->x->data[i] - d[i];
		fdf->f(xtrial, fdf->params, ftrial);
		fnew2 = 0;
		for (i = 0; i < n; i++)
			fnew2 += ftrial->data[i] * ftrial->data[i];
		if (fnew2 < fnorm2) {
			for (i = 0; i < p; i++) {
				s->dx->data[i] = xtrial->data[i] - s->x->data[i];
				s->x->data[i] = xtrial->data[i];
			}
			memcpy(s->f->data, ftrial->data, n * sizeof(double));
			fdf->fdf(s->x, fdf->params, s->f, s->J);
			s->lambda = (s->lambda > 1e-12) ? s->lambda * 0.1 : 1e-12;
			gsl_vector_free(ftrial);
			gsl_vector_free(xtrial);
			return GSL_SUCCESS;
		}
		s->lambda *= 10.0;
		if (s->lambda > 1e12)
			break;
	}
	gsl_vector_free(ftrial);
	gsl_vector_free(xtrial);
	return GSL_ENOPROG;
}

int gsl_multifit_fdfsolver_jac(gsl_multifit_fdfsolver *s, gsl_matrix *J) {
	memcpy(J->data, s->J->data,
			s->J->size1 * s->J->size2 * sizeof(double));
	return GSL_SUCCESS;
}

void gsl_multifit_fdfsolver_free(gsl_multifit_fdfsolver *s) {
	gsl_vector_free(s->x);
	gsl_vector_free(s->f);
	gsl_vector_free(s->dx);
	gsl_matrix_free(s->J);
	free(s);
}

int gsl_multifit_test_delta(const gsl_vector *dx, const gsl_vector *x,
		double epsabs, double epsrel) {
	/* exact GSL semantics (multifit/convergence.c) */
	size_t i;
	int ok = 1;
	for (i = 0; i < dx->size; i++) {
		double tol = epsabs + epsrel * fabs(x->data[i]);
		if (fabs(dx->data[i]) >= tol)
			ok = 0;
	}
	return ok ? GSL_SUCCESS : GSL_CONTINUE;
}

int gsl_multifit_covar(const gsl_matrix *J, double epsrel,
		gsl_matrix *covar) {
	/* covar = (J^T J)^-1 via Gauss-Jordan (errors are reported at
	 * tolerance only) */
	size_t n = J->size1, p = J->size2, i, j, k;
	double A[16 * 32];
	(void) epsrel;
	for (i = 0; i < p; i++) {
		for (j = 0; j < p; j++) {
			double s = 0;
			for (k = 0; k < n; k++)
				s += J->data[k * p + i] * J->data[k * p + j];
			A[i * 2 * p + j] = s;
		}
		for (j = 0; j < p; j++)
			A[i * 2 * p + p + j] = (i == j) ? 1.0 : 0.0;
	}
	for (k = 0; k < p; k++) {
		size_t piv = k;
		double t;
		for (i = k + 1; i < p; i++)
			if (fabs(A[i * 2 * p + k]) > fabs(A[piv * 2 * p + k]))
				piv = i;
		if (A[piv * 2 * p + k] == 0.0)
			continue;
		if (piv != k)
			for (j = 0; j < 2 * p; j++) {
				t = A[k * 2 * p + j];
				A[k * 2 * p + j] = A[piv * 2 * p + j];
				A[piv * 2 * p + j] = t;
			}
		t = A[k * 2 * p + k];
		for (j = 0; j < 2 * p; j++)
			A[k * 2 * p + j] /= t;
		for (i = 0; i < p; i++) {
			if (i == k)
				continue;
			t = A[i * 2 * p + k];
			for (j = 0; j < 2 * p; j++)
				A[i * 2 * p + j] -= t * A[k * 2 * p + j];
		}
	}
	for (i = 0; i < p; i++)
		for (j = 0; j < p; j++)
			covar->data[i * p + j] = A[i * 2 * p + p + j];
	return GSL_SUCCESS;
}
