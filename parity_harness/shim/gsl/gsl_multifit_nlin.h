/* Shim for gsl/gsl_multifit_nlin.h: the nonlinear least-squares solver
 * API PSF.c drives (lmsder).
 *
 * minigsl implements a classic damped Levenberg-Marquardt (Marquardt
 * diag(JtJ) scaling, adaptive lambda) rather than transcribing GSL's
 * trust-region lmsder. For fits that CONVERGE under the reference's
 * gsl_multifit_test_delta(1e-4, 1e-4) within its 10-iteration cap, both
 * solvers sit at the same minimum of the same objective to ~1e-8 — the
 * golden generator only emits fixtures it verified converged, and the
 * Python comparison runs at tolerance, so the solver path difference is
 * immaterial. */
#ifndef SHIM_GSL_MULTIFIT_NLIN_H
#define SHIM_GSL_MULTIFIT_NLIN_H

#include "gsl/gsl_matrix.h"
#include "gsl/gsl_vector.h"

#define GSL_SUCCESS  0
#define GSL_CONTINUE (-2)
#define GSL_ENOPROG  27

typedef struct {
	int (*f)(const gsl_vector *x, void *params, gsl_vector *f);
	int (*df)(const gsl_vector *x, void *params, gsl_matrix *J);
	int (*fdf)(const gsl_vector *x, void *params, gsl_vector *f,
			gsl_matrix *J);
	size_t n;
	size_t p;
	void *params;
} gsl_multifit_function_fdf;

typedef struct {
	int dummy;
} gsl_multifit_fdfsolver_type;

typedef struct {
	gsl_multifit_function_fdf *fdf;
	gsl_vector *x;
	gsl_vector *f;
	gsl_vector *dx;
	gsl_matrix *J;
	double lambda;
} gsl_multifit_fdfsolver;

extern const gsl_multifit_fdfsolver_type *gsl_multifit_fdfsolver_lmsder;

gsl_multifit_fdfsolver *gsl_multifit_fdfsolver_alloc(
		const gsl_multifit_fdfsolver_type *T, size_t n, size_t p);
int gsl_multifit_fdfsolver_set(gsl_multifit_fdfsolver *s,
		gsl_multifit_function_fdf *fdf, const gsl_vector *x);
int gsl_multifit_fdfsolver_iterate(gsl_multifit_fdfsolver *s);
int gsl_multifit_fdfsolver_jac(gsl_multifit_fdfsolver *s, gsl_matrix *J);
void gsl_multifit_fdfsolver_free(gsl_multifit_fdfsolver *s);
int gsl_multifit_test_delta(const gsl_vector *dx, const gsl_vector *x,
		double epsabs, double epsrel);
int gsl_multifit_covar(const gsl_matrix *J, double epsrel, gsl_matrix *covar);

/* gsl_vector_view, as used by gsl_vector_view_array in PSF.c */
typedef struct {
	gsl_vector vector;
} gsl_vector_view;

gsl_vector_view gsl_vector_view_array(double *base, size_t n);

#endif
