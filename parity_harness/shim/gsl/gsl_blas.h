/* Shim for gsl/gsl_blas.h: included by PSF.c but unused by the code paths
 * the harness exercises. Empty on purpose. */
#ifndef SHIM_GSL_BLAS_H
#define SHIM_GSL_BLAS_H
#endif
