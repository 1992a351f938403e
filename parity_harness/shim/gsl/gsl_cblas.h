/* Shim for gsl/gsl_cblas.h: included by PSF.c but unused by the code paths
 * the harness exercises. Empty on purpose. */
#ifndef SHIM_GSL_CBLAS_H
#define SHIM_GSL_CBLAS_H
#endif
