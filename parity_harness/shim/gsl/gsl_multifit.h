/* Shim for gsl/gsl_multifit.h: weighted linear least squares, as used by
 * the extracted gradient.c computeBackground (all weights 1, zero rows
 * for rejected boxes).
 *
 * minigsl solves the system by column-scaled Householder QR instead of
 * GSL's balanced SVD: for the full-rank polynomial designs gradient.c
 * builds, the minimizer is unique and both methods agree to ~1e-12
 * relative — the WORD-truncated golden outputs differ by at most the
 * truncation knife-edge, which the Python test tolerates at 1 LSB. */
#ifndef SHIM_GSL_MULTIFIT_H
#define SHIM_GSL_MULTIFIT_H

#include "gsl/gsl_matrix.h"
#include "gsl/gsl_vector.h"

typedef struct {
	size_t n, p;
} gsl_multifit_linear_workspace;

gsl_multifit_linear_workspace *gsl_multifit_linear_alloc(size_t n, size_t p);
void gsl_multifit_linear_free(gsl_multifit_linear_workspace *w);
int gsl_multifit_wlinear(const gsl_matrix *X, const gsl_vector *w,
		const gsl_vector *y, gsl_vector *c, gsl_matrix *cov, double *chisq,
		gsl_multifit_linear_workspace *work);

#endif
