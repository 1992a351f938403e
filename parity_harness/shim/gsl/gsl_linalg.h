/* Shim for gsl/gsl_linalg.h: included by PSF.c but unused by the code paths
 * the harness exercises. Empty on purpose. */
#ifndef SHIM_GSL_LINALG_H
#define SHIM_GSL_LINALG_H
#endif
