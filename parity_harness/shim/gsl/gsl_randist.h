/* Shim for gsl/gsl_randist.h: included by PSF.c but unused by the code paths
 * the harness exercises. Empty on purpose. */
#ifndef SHIM_GSL_RANDIST_H
#define SHIM_GSL_RANDIST_H
#endif
