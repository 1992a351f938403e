#ifndef SHIM_GSL_STATISTICS_USHORT_H
#define SHIM_GSL_STATISTICS_USHORT_H
#include <gsl/gsl_statistics.h>
#endif
