/* Shim for gsl/gsl_rng.h: PSF.c allocates and frees a default rng but
 * never draws from it; stubs suffice. */
#ifndef SHIM_GSL_RNG_H
#define SHIM_GSL_RNG_H

typedef struct {
	int dummy;
} gsl_rng_type;
typedef struct {
	int dummy;
} gsl_rng;

extern const gsl_rng_type *gsl_rng_default;
void gsl_rng_env_setup(void);
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_free(gsl_rng *r);

#endif
