/* Shim for gui/histogram.h: only the histogram builders statistics.c calls.
 * Implemented in support.c with the same semantics as the reference
 * (gui/histogram.c:111-150: gsl_histogram of get_normalized_value(fit)+1
 * uniform bins over [0, normvalue]). */
#ifndef SHIM_GUI_HISTOGRAM_H
#define SHIM_GUI_HISTOGRAM_H

#include "core/siril.h"
#include <gsl/gsl_histogram.h>

gsl_histogram *computeHisto(fits *fit, int layer);
gsl_histogram *computeHisto_Selection(fits *fit, int layer,
		rectangle *selection);

#endif
