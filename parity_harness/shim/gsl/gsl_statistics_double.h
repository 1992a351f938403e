/* Shim for gsl/gsl_statistics_double.h: double median on sorted data
 * (declared in gsl_statistics.h). */
#ifndef SHIM_GSL_STATISTICS_DOUBLE_H
#define SHIM_GSL_STATISTICS_DOUBLE_H
#include "gsl/gsl_statistics.h"
#endif
