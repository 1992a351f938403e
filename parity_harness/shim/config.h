/* Shim for the autotools config.h seqfile.c includes; the harness
 * builds without ffms2/cfitsio feature flags. */
#ifndef SHIM_CONFIG_H
#define SHIM_CONFIG_H
#endif
