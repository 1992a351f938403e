/* Golden-fixture generator for siriltpu's C-parity anchor.
 *
 * This program links against the ACTUAL reference translation units
 * (statistics.c, quantize.c, demosaicing.c) compiled with the shim headers
 * in shim/, plus reference code blocks extracted verbatim at build time by
 * build.sh into gen/*.inc (round_to_* and quicksort_* from core/utils.c,
 * the clipping helpers and the per-pixel rejection switch from
 * stacking/stacking.c). Nothing under gen/ is committed; only the emitted
 * golden binaries in tests/goldens/ are.
 *
 * Output files (little-endian, packed): c_rounding.bin, c_rejection.bin,
 * c_statistics.bin, c_quantize.bin, c_demosaic.bin. Record layouts are
 * documented next to each suite and mirrored by tests/test_c_goldens.py.
 */
#include <assert.h>
#include <limits.h>
#include <math.h>
#include <stdint.h>
#include <stddef.h>     /* offsetof, for the .wave layout facts */
#include <unistd.h>     /* truncate, for the SER repair fixture */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>   /* struct timeval in the extracted colors.c workers */

#include "core/siril.h"
#include "core/proto.h"
#include "gsl/gsl_statistics.h"
#include "gsl/gsl_fit.h"
#include "algos/demosaicing.h"

/* ---- reference code, extracted verbatim by build.sh ---- */
#include "gen/utils_round.inc"   /* src/core/utils.c:60-91  */
#include "gen/utils_qsort.inc"   /* src/core/utils.c:488-533 */

/* rejection enum, values as stacking.h:14-21 */
typedef enum {
	NO_REJEC, PERCENTILE, SIGMA, SIGMEDIAN, WINSORIZED, LINEARFIT
} rejection;
struct rejargs {
	rejection type_of_rejection;
	double sig[2];
};
struct rejdata {
	WORD *stack;
	int *rejected;
};
#include "gen/stack_clippers.inc" /* src/stacking/stacking.c:1130-1186 */

imstats *statistics(fits *fit, int layer, rectangle *selection, int option,
		int nullcheck);

/* from quality.c (compiled as its own TU, algos/quality.h) */
double QualityEstimate(fits *fit, int layer, int qtype);

/* MTF is defined AFTER apply_mtf_to_fits inside the extracted block */
double MTF(double x, double m);
#include "gen/histo_mtf.inc"      /* src/gui/histogram.c:33-34,537-564,595-608,684-740 */

#include "algos/PSF.h"            /* reference header: full fwhm_struct */
#include "algos/photometry.h"     /* reference header: photometry struct */
#include "gen/photometry.inc"     /* src/algos/photometry.c:31-323 */

#include "algos/colors.h"         /* reference header: scnr/saturation args */
#include "gen/colors.inc"         /* src/algos/colors.c:45-284,399-470,488-548,623-656 */

#include "algos/cosmetic_correction.h"
#include "gen/cosmetic.inc"       /* src/algos/cosmetic_correction.c:34-294 */

/* wavelets: pave.c/transform.c/reconstr.c/io_wave.c compile as their own
 * TUs (they are GUI-free ESO-MIDAS code); prototypes from the reference */
#include "algos/Def_Math.h"
#include "algos/Def_Mem.h"
#include "algos/Def_Wavelet.h"

/* core/siril.c image-op blocks (soper..backgroundnoise; entropy needs the
 * histogram builders, BandingEngine needs DBL_MAX and the ushort stats) */
#include <float.h>
#include "gui/histogram.h"
#include "gsl/gsl_statistics_ushort.h"
#include "gen/imops.inc"          /* src/core/siril.c:60-61,112-719,1285-1715 */

/* gradient.c background extraction (needs the mini-GSL vector/sort/
 * multifit shims; gradient.h brings newBackground) */
#include "gsl/gsl_vector.h"
#include "gsl/gsl_sort.h"
#include "gsl/gsl_multifit.h"
#include "algos/gradient.h"
#include "gen/gradient.inc"       /* src/algos/gradient.c:34-333,378-383 */

#include "gen/fits_flip.inc"      /* src/io/image_format_fits.c:1143-1161 */
#include "gen/rgbconv.inc"        /* src/io/image_format_fits.c:1065-1139 */
#include "io/ser.h"               /* reference header: SER container */
#include "io/sequence.h"          /* shim: sequence decls for seqfile.c */
#include "gen/seq_helpers.inc"    /* utils.c:99-109, sequence.c:814-827 */

/* star_finder.c: Compute_threshold, is_star, peaker, compare/sort_stars.
 * The GTK-bound get_structure (star_finder.c:80-92 reads spin buttons)
 * is replaced by a no-op so the caller's starFinder values survive. */
#include "algos/star_finder.h"
static void get_structure(starFinder *sf) {
	(void) sf;
}
#include "gen/starfind.inc"       /* src/algos/star_finder.c:39-78,103-255,337-367 */

static WORD reject_block(struct rejdata *data, struct rejargs *args,
		int nb_frames, uint64_t crej[2]) {
	double sigma = -1.0;
	int frame;
	(void) sigma;
#include "gen/stack_reject.inc"   /* src/stacking/stacking.c:1656-1793 */
	return round_to_WORD(sum / (double) N);
}

/* ------------------------------- PRNG ----------------------------------- */

static uint64_t rng_state = 0x9E3779B97F4A7C15ULL;

static uint64_t xorshift64s(void) {
	rng_state ^= rng_state >> 12;
	rng_state ^= rng_state << 25;
	rng_state ^= rng_state >> 27;
	return rng_state * 2685821657736338717ULL;
}

static uint32_t rnd_u32(void) {
	return (uint32_t) (xorshift64s() >> 32);
}

static WORD rnd_range(unsigned lo, unsigned hi) {
	return (WORD) (lo + rnd_u32() % (hi - lo + 1));
}

static double rnd_unit(void) { /* [0,1) */
	return (double) rnd_u32() / 4294967296.0;
}

/* ------------------------------ writers --------------------------------- */

static void w_u8(FILE *f, uint8_t v)   { fwrite(&v, 1, 1, f); }
static void w_u16(FILE *f, uint16_t v) { fwrite(&v, 2, 1, f); }
static void w_i16(FILE *f, int16_t v)  { fwrite(&v, 2, 1, f); }
static void w_i32(FILE *f, int32_t v)  { fwrite(&v, 4, 1, f); }
static void w_u64(FILE *f, uint64_t v) { fwrite(&v, 8, 1, f); }
static void w_i64(FILE *f, int64_t v)  { fwrite(&v, 8, 1, f); }
static void w_f64(FILE *f, double v)   { fwrite(&v, 8, 1, f); }
static void w_u16s(FILE *f, const WORD *v, size_t n) { fwrite(v, 2, n, f); }

static FILE *open_out(const char *dir, const char *name) {
	char path[1024];
	snprintf(path, sizeof(path), "%s/%s", dir, name);
	FILE *f = fopen(path, "wb");
	if (!f) {
		perror(path);
		exit(1);
	}
	return f;
}

/* --------------------------- suite: rounding ---------------------------- */

static void emit_round(FILE *f, double x) {
	w_f64(f, x);
	w_i32(f, round_to_int(x));
	w_u16(f, round_to_WORD(x));
	w_u8(f, round_to_BYTE(x));
	w_u8(f, conv_to_BYTE(x));
}

static void suite_rounding(const char *dir) {
	FILE *f = open_out(dir, "c_rounding.bin");
	static const double fixed[] = {
		0.0, 0.4999999999999999, 0.5, 0.5000000000000001, 1.5, 2.5, 3.5,
		-0.4999999999999999, -0.5, -1.5, -2.5, 254.5, 255.0, 255.5,
		255.49999999999997, 256.5, 65534.5, 65535.0, 65534.999999999996,
		65535.5, 65536.0, 100000.0, -12345.6789, 42.25, 42.75,
		1000.4999999999999, 1000.5
	};
	size_t i;
	for (i = 0; i < sizeof(fixed) / sizeof(fixed[0]); i++)
		emit_round(f, fixed[i]);
	for (i = 0; i < 400; i++) {
		double base = rnd_range(0, 65535);
		double frac = rnd_unit();
		emit_round(f, base + frac);
		emit_round(f, base + 0.5);
	}
	fclose(f);
}

/* --------------------------- suite: rejection --------------------------- */

static void fill_vector(WORD *v, int n, int kind) {
	int i;
	switch (kind) {
	case 0: /* full-range uniform */
		for (i = 0; i < n; i++) v[i] = rnd_range(0, 65535);
		break;
	case 1: /* narrow sky band */
		for (i = 0; i < n; i++) v[i] = rnd_range(940, 1060);
		break;
	case 2: /* constant */
		{ WORD c = rnd_range(1, 60000);
		  for (i = 0; i < n; i++) v[i] = c; }
		break;
	case 3: /* constant + outliers */
		{ WORD c = rnd_range(500, 2000);
		  for (i = 0; i < n; i++) v[i] = c;
		  v[rnd_u32() % n] = rnd_range(30000, 65535);
		  if (n > 4) v[rnd_u32() % n] = rnd_range(0, 50); }
		break;
	case 4: /* near saturation incl. exact 65535 */
		for (i = 0; i < n; i++) v[i] = rnd_range(65500, 65535);
		v[rnd_u32() % n] = 65535;
		break;
	default: /* mostly zeros + narrow band: exercises median==0 quirks */
		for (i = 0; i < n; i++)
			v[i] = (rnd_unit() < 0.7) ? 0 : rnd_range(100, 300);
		break;
	}
}

static void suite_rejection(const char *dir) {
	static const int Ns[] = { 5, 8, 16, 33, 64, 128 };
	/* sig pairs; for PERCENTILE these are fractions */
	static const double sig_pct[][2] = {
		{0.2, 0.1}, {0.5, 0.5}, {0.05, 0.05}, {1.0, 1.0}
	};
	static const double sig_sig[][2] = {
		{3.0, 3.0}, {2.0, 1.5}, {1.0, 1.0}, {5.0, 5.0}
	};
	FILE *f = open_out(dir, "c_rejection.bin");
	WORD vec[128], work[128];
	int rejected[128];
	int t, s, ni, kind, rep;
	for (t = 0; t <= 5; t++) {
		for (s = 0; s < 4; s++) {
			for (ni = 0; ni < 6; ni++) {
				for (kind = 0; kind < 6; kind++) {
					for (rep = 0; rep < 3; rep++) {
						int n = Ns[ni];
						struct rejargs a;
						struct rejdata d;
						uint64_t crej[2] = { 0, 0 };
						WORD mean;
						a.type_of_rejection = (rejection) t;
						if (t == PERCENTILE) {
							a.sig[0] = sig_pct[s][0];
							a.sig[1] = sig_pct[s][1];
						} else {
							a.sig[0] = sig_sig[s][0];
							a.sig[1] = sig_sig[s][1];
						}
						fill_vector(vec, n, kind);
						memcpy(work, vec, n * sizeof(WORD));
						/* The reference reuses data->rejected across pixels
						 * of a block WITHOUT clearing, and its early-break
						 * leaves stale flags that the removal loop then
						 * reads (stacking.c:1679-1694). Cross-pixel
						 * carryover is workload-dependent; we pin the
						 * initial state to zeros so each record captures
						 * the deterministic within-pixel multi-pass
						 * semantics. */
						memset(rejected, 0, sizeof(rejected));
						d.stack = work;
						d.rejected = rejected;
						mean = reject_block(&d, &a, n, crej);
						w_u8(f, (uint8_t) t);
						w_u8(f, (uint8_t) kind);
						w_u16(f, (uint16_t) n);
						w_f64(f, a.sig[0]);
						w_f64(f, a.sig[1]);
						w_u16s(f, vec, n);
						w_u16(f, mean);
						w_u64(f, crej[0]);
						w_u64(f, crej[1]);
					}
				}
			}
		}
	}
	fclose(f);
}

/* -------------------------- suite: statistics --------------------------- */

static void fill_image(WORD *img, int nx, int ny, int kind) {
	long i, npix = (long) nx * ny;
	switch (kind) {
	case 0: /* full-range uniform */
		for (i = 0; i < npix; i++) img[i] = rnd_range(0, 65535);
		break;
	case 1: /* narrow sky */
		for (i = 0; i < npix; i++) img[i] = rnd_range(900, 1100);
		break;
	case 2: /* sky + zeros + stars */
		for (i = 0; i < npix; i++) {
			double u = rnd_unit();
			if (u < 0.05) img[i] = 0;
			else if (u < 0.07) img[i] = rnd_range(20000, 65535);
			else img[i] = rnd_range(950, 1050);
		}
		break;
	case 3: /* byte range: normValue becomes 255 */
		for (i = 0; i < npix; i++) img[i] = rnd_range(0, 255);
		break;
	case 4: /* includes exact 65535: upper-edge exclusion path */
		for (i = 0; i < npix; i++)
			img[i] = (rnd_unit() < 0.1) ? 65535 : rnd_range(30000, 65534);
		break;
	default: /* smooth gradient + noise */
		{
			long x, y, k = 0;
			for (y = 0; y < ny; y++)
				for (x = 0; x < nx; x++, k++)
					img[k] = (WORD) (500 + (3000L * x) / nx
							+ (2000L * y) / ny + rnd_range(0, 60));
		}
		break;
	}
}

static void suite_statistics(const char *dir) {
	static const int sizes[][2] = { {64, 64}, {96, 48} };
	FILE *f = open_out(dir, "c_statistics.bin");
	int sz, kind, nullcheck, selflag;
	for (sz = 0; sz < 2; sz++) {
		for (kind = 0; kind < 6; kind++) {
			for (nullcheck = 0; nullcheck < 2; nullcheck++) {
				for (selflag = 0; selflag < 2; selflag++) {
					int nx = sizes[sz][0], ny = sizes[sz][1];
					long npix = (long) nx * ny;
					WORD *img = malloc(npix * sizeof(WORD));
					fits fit;
					rectangle sel = { 13, 7, 30, 22 };
					imstats *st;
					fill_image(img, nx, ny, kind);
					memset(&fit, 0, sizeof(fit));
					fit.rx = nx;
					fit.ry = ny;
					fit.naxis = 2;
					fit.naxes[0] = nx;
					fit.naxes[1] = ny;
					fit.naxes[2] = 1;
					fit.data = img;
					fit.pdata[0] = img;
					fit.pdata[1] = img;
					fit.pdata[2] = img;
					st = statistics(&fit, 0,
							selflag ? &sel : NULL,
							STATS_BASIC | STATS_AVGDEV | STATS_MAD
									| STATS_BWMV | STATS_IKSS, nullcheck);
					w_u16(f, (uint16_t) nx);
					w_u16(f, (uint16_t) ny);
					w_u8(f, (uint8_t) nullcheck);
					w_u8(f, (uint8_t) selflag);
					w_i16(f, (int16_t) sel.x);
					w_i16(f, (int16_t) sel.y);
					w_i16(f, (int16_t) sel.w);
					w_i16(f, (int16_t) sel.h);
					w_u16s(f, img, npix);
					if (!st) {
						w_u8(f, 0);
					} else {
						w_u8(f, 1);
						w_i64(f, st->total);
						w_i64(f, st->ngoodpix);
						w_f64(f, st->mean);
						w_f64(f, st->avgDev);
						w_f64(f, st->mad);
						w_f64(f, st->median);
						w_f64(f, st->sigma);
						w_f64(f, st->bgnoise);
						w_f64(f, st->min);
						w_f64(f, st->max);
						w_f64(f, st->sqrtbwmv);
						w_f64(f, st->location);
						w_f64(f, st->scale);
						w_f64(f, st->normValue);
						free(st);
					}
					free(img);
				}
			}
		}
	}
	fclose(f);
}

/* ---------------------------- suite: quantize ---------------------------- */

static void suite_quantize(const char *dir) {
	static const int sizes[][2] = { {64, 64}, {128, 32}, {9, 9}, {4, 4} };
	FILE *f = open_out(dir, "c_quantize.bin");
	int sz, kind, nullcheck;
	for (sz = 0; sz < 4; sz++) {
		for (kind = 0; kind < 3; kind++) {
			for (nullcheck = 0; nullcheck < 2; nullcheck++) {
				int nx = sizes[sz][0], ny = sizes[sz][1];
				long npix = (long) nx * ny;
				WORD *img = malloc(npix * sizeof(WORD));
				long ngoodpix = 0;
				WORD minv = 0, maxv = 0;
				double mean = 0, sigma = 0, n1 = 0, n2 = 0, n3 = 0, n5 = 0;
				int status = 0;
				fill_image(img, nx, ny, kind == 0 ? 1 : (kind == 1 ? 2 : 5));
				fits_img_stats_ushort(img, nx, ny, nullcheck, 0, &ngoodpix,
						&minv, &maxv, &mean, &sigma, &n1, &n2, &n3, &n5,
						&status);
				w_u16(f, (uint16_t) nx);
				w_u16(f, (uint16_t) ny);
				w_u8(f, (uint8_t) nullcheck);
				w_u8(f, (uint8_t) kind);
				w_u16s(f, img, npix);
				w_i32(f, status);
				w_i64(f, ngoodpix);
				w_u16(f, minv);
				w_u16(f, maxv);
				w_f64(f, mean);
				w_f64(f, sigma);
				w_f64(f, n1);
				w_f64(f, n2);
				w_f64(f, n3);
				w_f64(f, n5);
				free(img);
			}
		}
	}
	fclose(f);
}

/* ---------------------------- suite: demosaic ---------------------------- */

static void suite_demosaic(const char *dir) {
	static const int sizes[][2] = { {32, 32}, {33, 31}, {64, 48} };
	FILE *f = open_out(dir, "c_demosaic.bin");
	int sz, method, pattern;
	for (method = 0; method <= 4; method++) {
		for (pattern = 0; pattern <= 3; pattern++) {
			for (sz = 0; sz < 3; sz++) {
				int w = sizes[sz][0], h = sizes[sz][1];
				int ow = w, oh = h;
				long npix = (long) w * h;
				WORD *img = malloc(npix * sizeof(WORD));
				WORD *out;
				long i;
				for (i = 0; i < npix; i++)
					img[i] = rnd_range(0, 65535);
				out = debayer_buffer(img, &ow, &oh,
						(interpolation_method) method,
						(sensor_pattern) pattern);
				w_u16(f, (uint16_t) w);
				w_u16(f, (uint16_t) h);
				w_u8(f, (uint8_t) method);
				w_u8(f, (uint8_t) pattern);
				w_u16s(f, img, npix);
				w_u16(f, (uint16_t) ow);
				w_u16(f, (uint16_t) oh);
				w_u16s(f, out, 3L * ow * oh);
				free(out);
				free(img);
			}
		}
	}
	fclose(f);
}

/* ---------------------------- suite: quality ----------------------------- */

static void fill_quality_image(WORD *img, int nx, int ny, int kind) {
	long x, y, k = 0;
	double cx = nx / 2.0, cy = ny / 2.0;
	switch (kind) {
	case 0: /* full-range uniform */
		for (k = 0; k < (long) nx * ny; k++) img[k] = rnd_range(0, 65535);
		break;
	case 1: /* narrow sky band */
		for (k = 0; k < (long) nx * ny; k++) img[k] = rnd_range(940, 1060);
		break;
	case 2: /* planetary disk: bright disk + noise (the intended workload) */
		for (y = 0; y < ny; y++)
			for (x = 0; x < nx; x++, k++) {
				double r = (x - cx) * (x - cx) / (0.09 * nx * nx)
						+ (y - cy) * (y - cy) / (0.09 * ny * ny);
				img[k] = (r < 1.0) ? rnd_range(30000, 42000)
						: rnd_range(200, 600);
			}
		break;
	default: /* gradient + specks near saturation (hits the <65530 guard) */
		for (y = 0; y < ny; y++)
			for (x = 0; x < nx; x++, k++) {
				img[k] = (WORD) (1000 + (40000L * x) / nx + rnd_range(0, 900));
				if (rnd_unit() < 0.002) img[k] = rnd_range(65000, 65535);
			}
		break;
	}
}

static void suite_quality(const char *dir) {
	static const int sizes[][2] = { {64, 48}, {97, 63}, {128, 128}, {30, 29} };
	FILE *f = open_out(dir, "c_quality.bin");
	int sz, kind, qtype;
	for (sz = 0; sz < 4; sz++) {
		for (kind = 0; kind < 4; kind++) {
			for (qtype = 0; qtype <= 1; qtype++) {
				int nx = sizes[sz][0], ny = sizes[sz][1];
				long npix = (long) nx * ny;
				WORD *img = malloc(npix * sizeof(WORD));
				fits fit;
				double q;
				fill_quality_image(img, nx, ny, kind);
				memset(&fit, 0, sizeof(fit));
				fit.rx = nx;
				fit.ry = ny;
				fit.naxis = 2;
				fit.naxes[0] = nx;
				fit.naxes[1] = ny;
				fit.naxes[2] = 1;
				fit.data = img;
				fit.pdata[0] = img;
				fit.pdata[1] = img;
				fit.pdata[2] = img;
				w_u16(f, (uint16_t) nx);
				w_u16(f, (uint16_t) ny);
				w_u8(f, (uint8_t) qtype);
				w_u8(f, (uint8_t) kind);
				w_u16s(f, img, npix);
				q = QualityEstimate(&fit, 0, qtype);
				w_f64(f, q);
				free(img);
			}
		}
	}
	fclose(f);
}

/* --------------------- suite: MTF / autostretch ------------------------- */

static void suite_mtf(const char *dir) {
	/* kinds: 0 sky+stars (normal path), 1 inverted/bright image
	 * (invertedChannels path), 2 byte-range (normValue 255 path) */
	FILE *f = open_out(dir, "c_mtf.bin");
	int nchan, kind;
	for (nchan = 1; nchan <= 3; nchan += 2) {
		for (kind = 0; kind < 3; kind++) {
			int nx = 64, ny = 48, c;
			long npix = (long) nx * ny, i;
			WORD *img = malloc(nchan * npix * sizeof(WORD));
			fits fit;
			double m, lo = 0.0, hi = 0.0;
			for (c = 0; c < nchan; c++)
				for (i = 0; i < npix; i++) {
					WORD v;
					if (kind == 0)
						v = (rnd_unit() < 0.02) ? rnd_range(20000, 65535)
								: rnd_range(900 + 200 * c, 1100 + 200 * c);
					else if (kind == 1)
						v = rnd_range(50000, 65535);
					else
						v = rnd_range(0, 255);
					img[c * npix + i] = v;
				}
			memset(&fit, 0, sizeof(fit));
			fit.rx = nx;
			fit.ry = ny;
			fit.naxis = (nchan == 3) ? 3 : 2;
			fit.naxes[0] = nx;
			fit.naxes[1] = ny;
			fit.naxes[2] = nchan;
			fit.data = img;
			fit.pdata[0] = img;
			fit.pdata[1] = (nchan == 3) ? img + npix : img;
			fit.pdata[2] = (nchan == 3) ? img + 2 * npix : img;
			w_u16(f, (uint16_t) nx);
			w_u16(f, (uint16_t) ny);
			w_u8(f, (uint8_t) nchan);
			w_u8(f, (uint8_t) kind);
			w_u16s(f, img, nchan * npix);
			m = findMidtonesBalance(&fit, &lo, &hi);
			w_f64(f, m);
			w_f64(f, lo);
			w_f64(f, hi);
			/* autostretch application (gui/callbacks.c:800-801 semantics) */
			apply_mtf_to_fits(&fit, m, lo, hi);
			w_u16s(f, img, nchan * npix);
			free(img);
		}
	}
	fclose(f);
}

/* --------------------------- suite: photometry --------------------------- */

static void suite_photometry(const char *dir) {
	FILE *f = open_out(dir, "c_photometry.bin");
	static const int Ns[] = { 5, 8, 30, 200 };
	int ni, kind, rep, i;

	initializeParam();  /* com.phot_set = inner 20 / outer 30 / gain 2.3 */

	/* part A: robustmean (Hampel-psi iterated M-estimator) */
	for (ni = 0; ni < 4; ni++) {
		for (kind = 0; kind < 3; kind++) {
			for (rep = 0; rep < 3; rep++) {
				int n = Ns[ni];
				double xs[200], mean = 0.0, stdev = 0.0;
				int ret;
				for (i = 0; i < n; i++) {
					if (kind == 0) /* quasi-normal sky: sum of uniforms */
						xs[i] = 1000.0 + 20.0 * (rnd_unit() + rnd_unit()
								+ rnd_unit() + rnd_unit() - 2.0);
					else if (kind == 1) /* sky + outliers */
						xs[i] = (rnd_unit() < 0.15) ?
								rnd_range(20000, 60000) :
								950.0 + 100.0 * rnd_unit();
					else /* constant (zero scale path) */
						xs[i] = 1234.5;
				}
				w_i32(f, n);
				w_u8(f, (uint8_t) kind);
				for (i = 0; i < n; i++) w_f64(f, xs[i]);
				ret = robustmean(n, xs, &mean, &stdev);
				w_i32(f, ret);
				w_f64(f, mean);
				w_f64(f, stdev);
			}
		}
	}

	/* part B: getPhotometryData on a synthetic star + sky annulus */
	for (rep = 0; rep < 6; rep++) {
		int W = 72, H = 64;
		gsl_matrix *z = gsl_matrix_alloc(H, W);
		fitted_PSF psf;
		photometry *phot;
		double xc = 30.0 + 10.0 * rnd_unit();   /* 0-based centre */
		double yc = 28.0 + 8.0 * rnd_unit();
		double amp = 8000.0 + 30000.0 * rnd_unit();
		double s2 = 4.0 + 6.0 * rnd_unit();     /* gaussian variance */
		int x, y;
		for (y = 0; y < H; y++)
			for (x = 0; x < W; x++) {
				double r2 = (x - xc) * (x - xc) + (y - yc) * (y - yc);
				double v = 1000.0 + 40.0 * rnd_unit()
						+ amp * exp(-r2 / (2.0 * s2));
				if (rep == 5 && rnd_unit() < 0.01)
					v = 65535.0;  /* saturated pixels: hi_data exclusion */
				gsl_matrix_set(z, y, x, v);
			}
		psf.x0 = xc + 1.0;  /* reference uses 1-based PSF coordinates */
		psf.y0 = yc + 1.0;
		psf.sx = 2.0 * s2;  /* fwhm = sqrt(sx/2)*2*sqrt(2 ln 2) */
		w_i32(f, W);
		w_i32(f, H);
		w_f64(f, psf.x0);
		w_f64(f, psf.y0);
		w_f64(f, psf.sx);
		for (y = 0; y < H; y++)
			for (x = 0; x < W; x++)
				w_f64(f, gsl_matrix_get(z, y, x));
		phot = getPhotometryData(z, &psf);
		if (!phot) {
			w_u8(f, 0);
		} else {
			w_u8(f, 1);
			w_f64(f, phot->mag);
			w_f64(f, phot->s_mag);
			free(phot);
		}
		gsl_matrix_free(z);
	}
	fclose(f);
}

/* ----------------------------- suite: colors ----------------------------- */

static void make_rgb_fits(fits *fit, WORD *img, int nx, int ny) {
	long npix = (long) nx * ny;
	memset(fit, 0, sizeof(*fit));
	fit->bitpix = USHORT_IMG;
	fit->rx = nx;
	fit->ry = ny;
	fit->naxis = 3;
	fit->naxes[0] = nx;
	fit->naxes[1] = ny;
	fit->naxes[2] = 3;
	fit->data = img;
	fit->pdata[0] = img;
	fit->pdata[1] = img + npix;
	fit->pdata[2] = img + 2 * npix;
}

static void suite_colors(const char *dir) {
	FILE *f = open_out(dir, "c_colors.bin");
	int i, type, preserve, c;
	long k;

	/* part A: the 8 colorspace conversions on random + edge-case triples */
	for (i = 0; i < 300; i++) {
		double r, g, b, h, s, l, v, x, y, z, L, A, B, o1, o2, o3;
		if (i == 0)      { r = g = b = 0.0; }
		else if (i == 1) { r = g = b = 1.0; }
		else if (i == 2) { r = g = b = 0.37; }       /* grey: hue -1 paths */
		else if (i == 3) { r = 0.9; g = b = 0.1; }
		else             { r = rnd_unit(); g = rnd_unit(); b = rnd_unit(); }
		w_f64(f, r); w_f64(f, g); w_f64(f, b);
		rgb_to_hsl(r, g, b, &h, &s, &l);
		w_f64(f, h); w_f64(f, s); w_f64(f, l);
		hsl_to_rgb(h, s, l, &o1, &o2, &o3);
		w_f64(f, o1); w_f64(f, o2); w_f64(f, o3);
		rgb_to_hsv(r, g, b, &h, &s, &v);
		w_f64(f, h); w_f64(f, s); w_f64(f, v);
		hsv_to_rgb(h, s, v, &o1, &o2, &o3);
		w_f64(f, o1); w_f64(f, o2); w_f64(f, o3);
		rgb_to_xyz(r, g, b, &x, &y, &z);
		w_f64(f, x); w_f64(f, y); w_f64(f, z);
		xyz_to_LAB(x, y, z, &L, &A, &B);
		w_f64(f, L); w_f64(f, A); w_f64(f, B);
		LAB_to_xyz(L, A, B, &x, &y, &z);
		w_f64(f, x); w_f64(f, y); w_f64(f, z);
		xyz_to_rgb(x, y, z, &o1, &o2, &o3);
		w_f64(f, o1); w_f64(f, o2); w_f64(f, o3);
	}

	/* part B: SCNR, 4 types x preserve on/off */
	for (type = 0; type <= 3; type++) {
		for (preserve = 0; preserve <= 1; preserve++) {
			int nx = 24, ny = 16;
			long npix = (long) nx * ny;
			WORD *img = malloc(3 * npix * sizeof(WORD));
			fits fit;
			struct scnr_data args;
			for (k = 0; k < 3 * npix; k++)
				img[k] = rnd_range(0, 65535);
			/* green-dominant pixels so SCNR has something to remove */
			for (k = 0; k < npix; k += 3)
				img[npix + k] = rnd_range(40000, 65535);
			make_rgb_fits(&fit, img, nx, ny);
			w_u16(f, (uint16_t) nx);
			w_u16(f, (uint16_t) ny);
			w_u8(f, (uint8_t) type);
			w_u8(f, (uint8_t) preserve);
			w_f64(f, 0.8);
			w_u16s(f, img, 3 * npix);
			args.fit = &fit;
			args.type = type;
			args.amount = 0.8;
			args.preserve = preserve;
			scnr(&args);
			w_u16s(f, img, 3 * npix);
			free(img);
		}
	}

	/* part C: saturation enhancement (incl. the hue-wrap red band) */
	for (i = 0; i < 4; i++) {
		int nx = 24, ny = 16;
		long npix = (long) nx * ny;
		WORD *img = malloc(3 * npix * sizeof(WORD));
		fits fit;
		struct enhance_saturation_data args;
		static const double bands[4][2] = {
			{0.0, 360.0}, {330.0, 30.0} /* red wrap */, {80.0, 160.0},
			{200.0, 280.0}
		};
		for (k = 0; k < 3 * npix; k++)
			img[k] = rnd_range(0, 65535);
		make_rgb_fits(&fit, img, nx, ny);
		w_u16(f, (uint16_t) nx);
		w_u16(f, (uint16_t) ny);
		w_f64(f, bands[i][0]);
		w_f64(f, bands[i][1]);
		w_u8(f, (uint8_t) (i & 1));  /* preserve background on odd cases */
		w_u16s(f, img, 3 * npix);
		args.fit = &fit;
		args.coeff = 0.4;
		args.h_min = bands[i][0];
		args.h_max = bands[i][1];
		args.preserve = (i & 1);
		enhance_saturation(&args);
		w_u16s(f, img, 3 * npix);
		free(img);
	}

	/* part D: background neutralization */
	for (i = 0; i < 3; i++) {
		int nx = 48, ny = 32;
		long npix = (long) nx * ny;
		WORD *img = malloc(3 * npix * sizeof(WORD));
		fits fit;
		rectangle sel = { 4, 4, 12, 9 };
		for (c = 0; c < 3; c++)
			for (k = 0; k < npix; k++)
				img[c * npix + k] = rnd_range(800 + 400 * c, 1400 + 400 * c);
		make_rgb_fits(&fit, img, nx, ny);
		w_u16(f, (uint16_t) nx);
		w_u16(f, (uint16_t) ny);
		w_i16(f, (int16_t) sel.x);
		w_i16(f, (int16_t) sel.y);
		w_i16(f, (int16_t) sel.w);
		w_i16(f, (int16_t) sel.h);
		w_u16s(f, img, 3 * npix);
		background_neutralize(&fit, sel);
		w_u16s(f, img, 3 * npix);
		free(img);
	}
	fclose(f);
}

/* ---------------------------- suite: cosmetic ---------------------------- */

static void suite_cosmetic(const char *dir) {
	FILE *f = open_out(dir, "c_cosmetic.bin");
	static const double sigs[][2] = {
		{3.0, 3.0}, {-1.0, 3.0}, {3.0, -1.0}, {5.0, 5.0}
	};
	int si, rep, cfa;
	for (si = 0; si < 4; si++) {
		for (rep = 0; rep < 2; rep++) {
			int nx = 64, ny = 48, nd;
			long npix = (long) nx * ny, k;
			WORD *img = malloc(npix * sizeof(WORD));
			WORD *work = malloc(npix * sizeof(WORD));
			fits fit;
			double sig[2] = { sigs[si][0], sigs[si][1] };
			long icold = 0, ihot = 0;
			deviant_pixel *devs;
			/* synthetic master dark: sky + hot + cold pixels */
			for (k = 0; k < npix; k++)
				img[k] = rnd_range(950, 1050);
			for (k = 0; k < 40; k++)
				img[rnd_u32() % npix] = rnd_range(30000, 65535);
			for (k = 0; k < 25; k++)
				img[rnd_u32() % npix] = rnd_range(0, 20);
			memset(&fit, 0, sizeof(fit));
			fit.rx = nx;
			fit.ry = ny;
			fit.naxis = 2;
			fit.naxes[0] = nx;
			fit.naxes[1] = ny;
			fit.naxes[2] = 1;
			fit.data = img;
			fit.pdata[0] = img;
			fit.pdata[1] = img;
			fit.pdata[2] = img;
			w_u16(f, (uint16_t) nx);
			w_u16(f, (uint16_t) ny);
			w_f64(f, sig[0]);
			w_f64(f, sig[1]);
			w_u16s(f, img, npix);
			devs = find_deviant_pixels(&fit, sig, &icold, &ihot);
			nd = (int) (icold + ihot);
			w_i64(f, icold);
			w_i64(f, ihot);
			if (!devs)
				nd = 0;
			w_i32(f, nd);
			for (k = 0; k < nd; k++) {
				w_f64(f, devs[k].p.x);
				w_f64(f, devs[k].p.y);
				w_u8(f, (uint8_t) devs[k].type);
			}
			/* apply the correction, both CFA modes, each from the
			 * ORIGINAL image */
			for (cfa = 0; cfa <= 1; cfa++) {
				memcpy(work, img, npix * sizeof(WORD));
				fit.data = work;
				fit.pdata[0] = work;
				fit.pdata[1] = work;
				fit.pdata[2] = work;
				if (devs)
					cosmeticCorrection(&fit, devs, nd, cfa);
				w_u16s(f, work, npix);
			}
			if (devs)
				free(devs);
			free(img);
			free(work);
		}
	}
	fclose(f);
}

/* --------------------------- suite: gradient ----------------------------- */

static void make_mono_fits(fits *fit, WORD *img, int nx, int ny);

static void suite_gradient(const char *dir) {
	FILE *f = open_out(dir, "c_gradient.bin");
	/* (w, h, box, interval, order) — orders 1, 2 and 4; box is the GUI
	 * spin value * 2 (always even, bkgExtractBackground gradient.c:396) */
	/* grids dense enough that the fit stays overdetermined after box
	 * rejection (an order-4 fit from <15 surviving boxes would be GSL
	 * min-norm territory the mini-GSL QR does not reproduce) */
	static const int cases[][5] = {
		{ 128,  96, 20, 10, POLY_1 },
		{ 160, 120, 20,  6, POLY_2 },
		{ 200, 150, 20,  5, POLY_4 },
	};
	int ci;
	size_t i;

	for (ci = 0; ci < 3; ci++) {
		const int w = cases[ci][0], h = cases[ci][1];
		const int box = cases[ci][2], interval = cases[ci][3];
		const long npix = (long) w * h;
		newBackground bkg;
		WORD *img = malloc(npix * 2);
		fits fit, out;
		long k;

		/* smooth gradient + noise + a sprinkling of stars */
		for (k = 0; k < npix; k++) {
			long y = k / w, x = k % w;
			double v = 3000.0 + 4.0 * x + 6.5 * y + 0.01 * x * y
					+ (rnd_unit() - 0.5) * 300.0;
			if (rnd_unit() < 0.002)
				v += 30000.0;
			img[k] = round_to_WORD(v);
		}
		make_mono_fits(&fit, img, w, h);
		memset(&out, 0, sizeof out);

		bkg.order = (poly_order) cases[ci][4];
		bkg.box = box;
		bkg.row = h;
		bkg.col = w;
		bkg.layer = 0;
		bkg.tolerance = 2.0;
		bkg.deviation = 1.0;
		bkg.unbalance = 0.8;
		bkg.boxPerRow = (size_t) ((double) w / ((double) box + interval - 1));
		bkg.boxPerCol = (size_t) ((double) h / ((double) box + interval - 1));

		w_u16(f, (uint16_t) w);
		w_u16(f, (uint16_t) h);
		w_u16(f, (uint16_t) box);
		w_u8(f, (uint8_t) cases[ci][4]);
		w_u16(f, (uint16_t) bkg.boxPerRow);
		w_u16(f, (uint16_t) bkg.boxPerCol);
		w_u16s(f, img, npix);

		if (extractBackgroundAuto(&fit, &out, &bkg)) {
			fprintf(stderr, "extractBackgroundAuto failed\n");
			exit(1);
		}
		/* post-rejection samples survive in com.grad */
		for (i = 0; i < bkg.boxPerRow * bkg.boxPerCol; i++) {
			w_f64(f, com.grad[i].centre.x);
			w_f64(f, com.grad[i].centre.y);
			w_f64(f, com.grad[i].boxvalue[0]);
		}
		w_u16s(f, out.data, npix);
		clearSamples();
		clearfits(&out);
		free(img);
	}
	fclose(f);
}

/* ----------------------------- suite: imops ------------------------------ */

static void make_mono_fits(fits *fit, WORD *img, int nx, int ny) {
	memset(fit, 0, sizeof(*fit));
	fit->bitpix = USHORT_IMG;
	fit->rx = nx;
	fit->ry = ny;
	fit->naxis = 2;
	fit->naxes[0] = nx;
	fit->naxes[1] = ny;
	fit->naxes[2] = 1;
	fit->data = img;
	fit->pdata[0] = img;
	fit->pdata[1] = img;
	fit->pdata[2] = img;
}

static void suite_imops(const char *dir) {
	FILE *f = open_out(dir, "c_imops.bin");
	const int nx = 31, ny = 17;
	const long npix = (long) nx * ny;
	int rep, li, oi;

	/* part A: soper/imoper/fdiv/addmax, mono and RGB, incl. saturation */
	for (rep = 0; rep < 2; rep++) {
		for (li = 0; li < 2; li++) {
			int nl = li ? 3 : 1;
			long n = npix * nl, i;
			WORD *a = malloc(n * 2), *b = malloc(n * 2);
			WORD *wa = malloc(n * 2), *wb = malloc(n * 2);
			fits fa, fb;
			double scalar = (rep == 0) ? 1234.56 : -789.25;
			float coef = (rep == 0) ? 1.0f : 2.5f;
			for (i = 0; i < n; i++) {
				a[i] = (rnd_unit() < 0.05) ? rnd_range(65000, 65535)
				                           : rnd_range(0, 40000);
				b[i] = rnd_range(1, 50000);   /* no 0s: imoper 'd' is C
				                                 integer division (UB on 0) */
			}
			w_u8(f, (uint8_t) nl);
			w_f64(f, scalar);
			fwrite(&coef, 4, 1, f);
			w_u16s(f, a, n);
			w_u16s(f, b, n);
			for (oi = 0; oi < 4; oi++) {
				char op = "asmd"[oi];
				memcpy(wa, a, n * 2);
				(nl == 3 ? make_rgb_fits : make_mono_fits)(&fa, wa, nx, ny);
				soper(&fa, scalar, op);
				w_u16s(f, wa, n);
				memcpy(wa, a, n * 2);
				memcpy(wb, b, n * 2);
				(nl == 3 ? make_rgb_fits : make_mono_fits)(&fa, wa, nx, ny);
				(nl == 3 ? make_rgb_fits : make_mono_fits)(&fb, wb, nx, ny);
				imoper(&fa, &fb, op);
				w_u16s(f, wa, n);
			}
			memcpy(wa, a, n * 2);
			memcpy(wb, b, n * 2);
			(nl == 3 ? make_rgb_fits : make_mono_fits)(&fa, wa, nx, ny);
			(nl == 3 ? make_rgb_fits : make_mono_fits)(&fb, wb, nx, ny);
			w_u8(f, (uint8_t) fdiv(&fa, &fb, coef));
			w_u16s(f, wa, n);
			memcpy(wa, a, n * 2);
			memcpy(wb, b, n * 2);
			(nl == 3 ? make_rgb_fits : make_mono_fits)(&fa, wa, nx, ny);
			(nl == 3 ? make_rgb_fits : make_mono_fits)(&fb, wb, nx, ny);
			addmax(&fa, &fb);
			w_u16s(f, wa, n);
			free(a); free(b); free(wa); free(wb);
		}
	}

	/* part B: entropy — plain, with selection, and with the stats
	 * threshold (note the reference compares histogram COUNTS against a
	 * pixel-value threshold; the golden captures that as compiled) */
	{
		WORD *img = malloc(npix * 2);
		long i;
		fits fit;
		rectangle area = { 5, 3, 20, 11 };
		imstats *st;
		for (i = 0; i < npix; i++)
			img[i] = (rnd_unit() < 0.3) ? rnd_range(0, 200)
			                            : rnd_range(0, 65535);
		make_mono_fits(&fit, img, nx, ny);
		w_u16s(f, img, npix);
		w_f64(f, entropy(&fit, 0, NULL, NULL));
		w_f64(f, entropy(&fit, 0, &area, NULL));
		st = statistics(&fit, 0, NULL, STATS_BASIC, STATS_ZERO_NONE);
		w_f64(f, st->median);
		w_f64(f, st->sigma);
		w_f64(f, entropy(&fit, 0, NULL, st));
		free(st);
		free(img);
	}

	/* part C: loglut both directions (the EXP direction truncation-casts
	 * doubles that can exceed WORD range — compiled x86 behavior) */
	{
		WORD *img = malloc(npix * 2);
		WORD *w = malloc(npix * 2);
		long i;
		fits fit;
		for (i = 0; i < npix; i++)
			img[i] = rnd_range(0, 65535);
		w_u16s(f, img, npix);
		memcpy(w, img, npix * 2);
		make_mono_fits(&fit, w, nx, ny);
		loglut(&fit, LOG);
		w_u16s(f, w, npix);
		loglut(&fit, EXP);    /* round-trip through the log image */
		w_u16s(f, w, npix);
		free(img); free(w);
	}

	/* part D: contrast with empty and non-empty com.selection */
	{
		WORD *img = malloc(npix * 2);
		long i;
		fits fit;
		for (i = 0; i < npix; i++)
			img[i] = rnd_range(100, 30000);
		make_mono_fits(&fit, img, nx, ny);
		w_u16s(f, img, npix);
		memset(&com.selection, 0, sizeof com.selection);
		w_f64(f, contrast(&fit, 0));
		com.selection.x = 4; com.selection.y = 2;
		com.selection.w = 12; com.selection.h = 9;
		w_f64(f, contrast(&fit, 0));
		memset(&com.selection, 0, sizeof com.selection);
		free(img);
	}

	/* part E: fill (explicit rect + com.selection fallback) and off */
	{
		WORD *img = malloc(npix * 2);
		WORD *w = malloc(npix * 2);
		long i;
		fits fit;
		rectangle area = { 7, 2, 13, 8 };
		for (i = 0; i < npix; i++)
			img[i] = rnd_range(0, 65535);
		w_u16s(f, img, npix);
		memcpy(w, img, npix * 2);
		make_mono_fits(&fit, w, nx, ny);
		fill(&fit, 4242, &area);
		w_u16s(f, w, npix);
		memcpy(w, img, npix * 2);
		off(&fit, 20000);
		w_u16s(f, w, npix);
		memcpy(w, img, npix * 2);
		off(&fit, -20000);
		w_u16s(f, w, npix);
		free(img); free(w);
	}

	/* part F: BandingEngine — row-banded data, 4 parameter combos */
	{
		const int bx = 64, by = 48;
		const long bn = (long) bx * by;
		static const double sigs[2] = { 1.0, 3.0 };
		static const double amts[2] = { 0.7, 1.0 };
		int ci;
		for (ci = 0; ci < 4; ci++) {
			WORD *img = malloc(bn * 2);
			long i;
			fits fit;
			for (i = 0; i < bn; i++) {
				long row = i / bx;
				double band = 300.0 * ((row % 4 == 0) ? 1.0 : 0.0);
				double v = 8000.0 + band + (rnd_unit() - 0.5) * 400.0
						+ ((rnd_unit() < 0.01) ? 40000.0 : 0.0);
				img[i] = round_to_WORD(v);
			}
			w_u16s(f, img, bn);
			w_f64(f, sigs[ci & 1]);
			w_f64(f, amts[ci >> 1]);
			w_u8(f, (uint8_t) (ci & 1));       /* protect_highlights */
			make_mono_fits(&fit, img, bx, by);
			if (BandingEngine(&fit, sigs[ci & 1], amts[ci >> 1],
					(ci & 1), FALSE)) {
				fprintf(stderr, "BandingEngine failed\n");
				exit(1);
			}
			w_u16s(f, img, bn);
			free(img);
		}
	}

	/* part H: threshlo/threshhi/nozero */
	{
		WORD *img = malloc(npix * 2);
		WORD *w = malloc(npix * 2);
		long i;
		fits fit;
		for (i = 0; i < npix; i++)
			img[i] = rnd_range(0, 65535);
		w_u16s(f, img, npix);
		memcpy(w, img, npix * 2);
		make_mono_fits(&fit, w, nx, ny);
		threshlo(&fit, 12000);
		w_u16s(f, w, npix);
		memcpy(w, img, npix * 2);
		threshhi(&fit, 50000);
		w_u16s(f, w, npix);
		memcpy(w, img, npix * 2);
		nozero(&fit, 777);
		w_u16s(f, w, npix);
		free(img);
		free(w);
	}

	/* part I: shift() — operates on the global gfit; exercises the
	 * ii > 0 source-skip quirk and zero fill on all four sign combos */
	{
		static const int sh[][2] = { {3, 2}, {-4, 5}, {6, -3}, {-2, -7} };
		WORD *img = malloc(npix * 2);
		long i;
		int ci;
		for (i = 0; i < npix; i++)
			img[i] = rnd_range(1, 65535);
		w_u16s(f, img, npix);
		for (ci = 0; ci < 4; ci++) {
			WORD *w = malloc(npix * 2);
			memcpy(w, img, npix * 2);
			make_mono_fits(&gfit, w, nx, ny);
			shift(sh[ci][0], sh[ci][1]);
			w_u16(f, (uint16_t) (sh[ci][0] & 0xFFFF));
			w_u16(f, (uint16_t) (sh[ci][1] & 0xFFFF));
			w_u16s(f, w, npix);
			free(w);
		}
		free(img);
	}

	/* part G: backgroundnoise (wavelet finest-scale sigma-clip estimator) */
	{
		const int bx = 96, by = 80;
		const long bn = (long) bx * by;
		WORD *img = malloc(bn * 2);
		double sigma[3] = { 0, 0, 0 };
		long i;
		fits fit;
		for (i = 0; i < bn; i++) {
			double v = 2000.0 + (rnd_unit() + rnd_unit() + rnd_unit()
					+ rnd_unit() - 2.0) * 120.0;
			if (rnd_unit() < 0.0005)
				v = 30000.0;  /* a couple of stars; more would inflate the
				                 loop's FIXED mean past the clipped body and
				                 the reference itself reports "no data" */
			img[i] = round_to_WORD(v);
		}
		w_u16s(f, img, bn);
		make_mono_fits(&fit, img, bx, by);
#ifdef DBG_BGNOISE
		{
			fits wv;
			imstats *st;
			memset(&wv, 0, sizeof wv);
			copyfits(&fit, &wv, CP_ALLOC | CP_FORMAT | CP_COPYA, 0);
			if (get_wavelet_layers(&wv, 4, 0, TO_PAVE_BSPLINE, -1))
				fprintf(stderr, "DBG gwl fail\n");
			st = statistics(&wv, 0, NULL, STATS_BASIC, STATS_ZERO_NULLCHECK);
			if (st)
				fprintf(stderr, "DBG plane0 mean=%f sigma=%f norm=%f\n",
						st->mean, st->sigma, st->normValue);
			else
				fprintf(stderr, "DBG stats NULL\n");
			{
				long zz, nz = 0;
				for (zz = 0; zz < bn; zz++)
					if (wv.pdata[0][zz])
						nz++;
				fprintf(stderr, "DBG nonzero=%ld max=%u\n", nz,
						(unsigned) 0);
			}
		}
#endif
		if (backgroundnoise(&fit, sigma)) {
			fprintf(stderr, "backgroundnoise failed\n");
			exit(1);
		}
		w_f64(f, sigma[0]);
		free(img);
	}

	fclose(f);
}

/* ------------------------------ suite: psf ------------------------------- */

static void w_psf(FILE *f, const fitted_PSF *r) {
	w_f64(f, r->B);
	w_f64(f, r->A);
	w_f64(f, r->x0);
	w_f64(f, r->y0);
	w_f64(f, r->sx);
	w_f64(f, r->sy);
	w_f64(f, r->fwhmx);
	w_f64(f, r->fwhmy);
	w_f64(f, r->angle);
	w_f64(f, r->mag);
	w_f64(f, r->rmse);
}

static void suite_psf(const char *dir) {
	FILE *f = open_out(dir, "c_psf.bin");
	/* (boxsize, A, SX, SY, angle_deg, fit_angle) */
	static const double cases[][6] = {
		{ 20, 20000, 9.0, 9.0, 0, 1 },     /* symmetric: no angle stage */
		{ 20, 30000, 14.0, 7.0, 25, 1 },   /* elongated + angle refit  */
		{ 20, 30000, 14.0, 7.0, 25, 0 },   /* starfinder mode: no angle */
		{ 24, 8000, 6.0, 10.0, -40, 1 },   /* sy > sx: symmetry fold   */
		{ 16, 50000, 5.0, 4.0, 10, 1 },    /* bright, small box        */
	};
	int ci;

	for (ci = 0; ci < 5; ci++) {
		const int bs = (int) cases[ci][0];
		const double A = cases[ci][1], SX = cases[ci][2], SY = cases[ci][3];
		const double ang = cases[ci][4] * M_PI / 180.0;
		const int fit_angle = (int) cases[ci][5];
		const double B = 1200.0;
		const double x0 = bs / 2.0 + 0.3 + 0.1 * ci;
		const double y0 = bs / 2.0 - 0.2 + 0.07 * ci;
		long npix = (long) bs * bs, k;
		WORD *img = malloc(npix * 2);
		fits ffx;
		gsl_matrix *z = gsl_matrix_alloc(bs, bs);
		fitted_PSF *r;
		int i, j;

		for (i = 0; i < bs; i++) {
			for (j = 0; j < bs; j++) {
				/* the reference model addresses the grid 1-based
				 * (PSF.c:175-177) and rotates about the centroid */
				double tx = cos(ang) * (j + 1 - x0) - sin(ang) * (i + 1 - y0);
				double ty = sin(ang) * (j + 1 - x0) + cos(ang) * (i + 1 - y0);
				double v = B + A * exp(-(tx * tx / SX + ty * ty / SY))
						+ (rnd_unit() - 0.5) * 40.0;
				img[i * bs + j] = round_to_WORD(v);
			}
		}
		make_mono_fits(&ffx, img, bs, bs);
		gfit = ffx;    /* psf_global_minimisation normalizes by gfit */
		for (i = 0; i < bs; i++)
			for (j = 0; j < bs; j++)
				gsl_matrix_set(z, i, j, (double) img[i * bs + j]);

		{
			double bg = background(&ffx, 0, NULL);
			double norm = 65535.0;
			r = psf_global_minimisation(z, bg, 0, fit_angle, FALSE);
			if (!r) {
				fprintf(stderr, "psf fit %d returned NULL\n", ci);
				exit(1);
			}
			/* emit only fits that CONVERGED to the planted truth: at a
			 * shared minimum any correct LM (GSL's lmsder included)
			 * lands on the same parameters, which is what makes the
			 * mini-GSL solver substitution valid (gsl_multifit_nlin.h) */
			/* rmse is bounded by 3% of the amplitude: case 2 fits a
			 * rotated star with the no-angle model, so its minimum has
			 * a large but legitimate model-mismatch residual */
			if (fabs(r->x0 - x0) > 0.05 || fabs(r->y0 - y0) > 0.05
					|| fabs(r->A * norm - A) / A > 0.02
					|| fabs(r->B * norm - B) / B > 0.05
					|| r->rmse * norm > 0.03 * A) {
				fprintf(stderr,
						"psf fit %d did not converge to truth: "
						"x0 %f/%f y0 %f/%f A %f/%f rmse %f\n", ci,
						r->x0, x0, r->y0, y0, r->A * norm, A,
						r->rmse * norm);
				exit(1);
			}
			w_u16(f, (uint16_t) bs);
			w_u8(f, (uint8_t) fit_angle);
			w_u16s(f, img, npix);
			w_f64(f, bg);
			w_psf(f, r);
			free(r);
		}
		gsl_matrix_free(z);
		free(img);
	}
	fclose(f);
}

/* ---------------------------- suite: starfind ---------------------------- */

static void suite_starfind(const char *dir) {
	FILE *f = open_out(dir, "c_starfind.bin");
	const int w = 300, h = 220, nstars = 25;
	const long npix = (long) w * h;
	WORD *img = malloc(npix * 2);
	double *sx_ = malloc(nstars * sizeof(double));
	double *sy_ = malloc(nstars * sizeof(double));
	double *px = malloc(nstars * sizeof(double));
	double *py = malloc(nstars * sizeof(double));
	double *amp = malloc(nstars * sizeof(double));
	fits fit;
	starFinder sf = { 10, 1.0, 0.5, 0 };
	fitted_PSF **stars;
	long k;
	int s, i, j, n;

	for (s = 0; s < nstars; s++) {
		px[s] = 25.0 + rnd_unit() * (w - 50);
		py[s] = 25.0 + rnd_unit() * (h - 50);
		amp[s] = 3000.0 + rnd_unit() * 30000.0;
		sx_[s] = 6.0 + rnd_unit() * 4.0;
		sy_[s] = sx_[s] * (0.8 + rnd_unit() * 0.2);
	}
	for (i = 0; i < h; i++) {
		for (j = 0; j < w; j++) {
			double v = 1000.0 + (rnd_unit() + rnd_unit() - 1.0) * 30.0;
			for (s = 0; s < nstars; s++) {
				double dx = j - px[s], dy = i - py[s];
				if (fabs(dx) < 30 && fabs(dy) < 30)
					v += amp[s] * exp(-(dx * dx / sx_[s]
							+ dy * dy / sy_[s]));
			}
			img[i * w + j] = round_to_WORD(v);
		}
	}
	make_mono_fits(&fit, img, w, h);
	gfit = fit;        /* peaker's fits normalize B/A by gfit */

	w_u16(f, (uint16_t) w);
	w_u16(f, (uint16_t) h);
	w_u16(f, (uint16_t) sf.radius);
	w_f64(f, sf.sigma);
	w_f64(f, sf.roundness);
	w_u16s(f, img, npix);

	stars = peaker(&fit, 0, &sf, NULL);
	if (!stars) {
		fprintf(stderr, "peaker found nothing\n");
		exit(1);
	}
	for (n = 0; stars[n]; n++)
		;
	w_i32(f, n);
	for (k = 0; k < n; k++) {
		w_f64(f, stars[k]->xpos);
		w_f64(f, stars[k]->ypos);
		w_psf(f, stars[k]);
		free(stars[k]);
	}
	free(stars);
	free(img);
	free(sx_); free(sy_); free(px); free(py); free(amp);
	fclose(f);
}

/* ------------------------------ suite: ser ------------------------------- */

static void w_file(FILE *f, const char *path) {
	FILE *in = fopen(path, "rb");
	long sz;
	unsigned char *buf;
	fseek(in, 0, SEEK_END);
	sz = ftell(in);
	fseek(in, 0, SEEK_SET);
	buf = malloc(sz);
	if (fread(buf, 1, sz, in) != (size_t) sz)
		exit(1);
	fclose(in);
	w_i64(f, sz);
	fwrite(buf, 1, sz, f);
	free(buf);
}

static void suite_ser(const char *dir) {
	FILE *f = open_out(dir, "c_ser.bin");
	const char *tmp_mono = "/tmp/ph_mono.ser";
	const char *tmp_rgb = "/tmp/ph_rgb.ser";
	const char *tmp_bayer = "/tmp/ph_bayer.ser";
	const int w = 40, h = 30;
	const long npix = (long) w * h;
	int fr, i;

	com.debayer.open_debayer = 0;
	com.debayer.use_bayer_header = 1;
	com.debayer.bayer_pattern = BAYER_FILTER_RGGB;
	com.debayer.bayer_inter = BAYER_VNG;

	/* part A: create/write/close a mono SER, then reopen + read back */
	{
		struct ser_struct ser;
		fits fit;
		WORD *img = malloc(npix * 2);
		ser_init_struct(&ser);
		if (ser_create_file(tmp_mono, &ser, TRUE, NULL)) exit(1);
		for (fr = 0; fr < 3; fr++) {
			for (i = 0; i < npix; i++)
				img[i] = rnd_range(0, 65535);
			make_mono_fits(&fit, img, w, h);
			w_u16s(f, img, npix);             /* fits-side input */
			if (ser_write_frame_from_fit(&ser, &fit, fr)) exit(1);
		}
		if (ser_write_and_close(&ser)) exit(1);
		w_file(f, tmp_mono);                  /* exact file bytes */

		ser_init_struct(&ser);
		if (ser_open_file((char *) tmp_mono, &ser)) exit(1);
		w_i32(f, ser.color_id);
		w_i32(f, ser.little_endian);
		w_i32(f, ser.image_width);
		w_i32(f, ser.image_height);
		w_i32(f, ser.bit_pixel_depth);
		w_i32(f, (int32_t) ser.frame_count);
		for (fr = 0; fr < 3; fr++) {
			fits rfit;
			memset(&rfit, 0, sizeof rfit);
			if (ser_read_frame(&ser, fr, &rfit)) exit(1);
			w_u16s(f, rfit.data, npix);       /* after flip to bottom-up */
			free(rfit.data);
		}
		/* partial region read (mono, layer 0).  NOTE: the C's mono/RGB
		 * partial read is a CONTIGUOUS run from the area origin, not a
		 * rectangle (ser.c:797-817) — every in-tree caller passes
		 * full-width row blocks where both are identical, so the
		 * fixture does too (divergence documented in PARITY.md). */
		{
			rectangle area = { 0, 5, 40, 11 };
			WORD *buf = malloc((long) area.w * area.h * 2);
			if (ser_read_opened_partial(&ser, 0, 1, buf, &area)) exit(1);
			w_u16s(f, buf, (long) area.w * area.h);
			free(buf);
		}
		ser_close_file(&ser);
		free(img);
	}

	/* part B: RGB (SER v3) round-trip + partial per layer */
	{
		struct ser_struct ser;
		fits fit;
		WORD *img = malloc(npix * 3 * 2);
		ser_init_struct(&ser);
		if (ser_create_file(tmp_rgb, &ser, TRUE, NULL)) exit(1);
		for (fr = 0; fr < 2; fr++) {
			for (i = 0; i < npix * 3; i++)
				img[i] = rnd_range(0, 65535);
			make_rgb_fits(&fit, img, w, h);
			w_u16s(f, img, npix * 3);
			if (ser_write_frame_from_fit(&ser, &fit, fr)) exit(1);
		}
		if (ser_write_and_close(&ser)) exit(1);
		w_file(f, tmp_rgb);

		ser_init_struct(&ser);
		if (ser_open_file((char *) tmp_rgb, &ser)) exit(1);
		w_i32(f, ser.color_id);
		for (fr = 0; fr < 2; fr++) {
			fits rfit;
			memset(&rfit, 0, sizeof rfit);
			if (ser_read_frame(&ser, fr, &rfit)) exit(1);
			w_u16s(f, rfit.data, npix * 3);
			free(rfit.data);
		}
		{
			rectangle area = { 0, 2, 40, 9 };
			WORD *buf = malloc((long) area.w * area.h * 2);
			int layer;
			for (layer = 0; layer < 3; layer++) {
				if (ser_read_opened_partial(&ser, layer, 0, buf, &area))
					exit(1);
				w_u16s(f, buf, (long) area.w * area.h);
			}
			free(buf);
		}
		ser_close_file(&ser);
		free(img);
	}

	/* part C: Bayer RGGB file fabricated raw (incl. the INVERTED
	 * endianness convention: header flag 1 = big-endian data), read
	 * with open_debayer on (VNG) and off, partial read with the
	 * demosaic-window expansion, then truncation repair */
	{
		unsigned char header[SER_HEADER_LEN];
		FILE *sf = fopen(tmp_bayer, "wb");
		WORD *cfa = malloc(npix * 2);
		int32_t v;
		struct ser_struct ser;
		fits rfit;

		memset(header, 0, sizeof header);
		memcpy(header, "LUCAM-RECORDER", 14);
		v = 8;  memcpy(header + 18, &v, 4);         /* SER_BAYER_RGGB */
		v = 1;  memcpy(header + 22, &v, 4);         /* "LittleEndian"=1
		                                               -> BIG endian data
		                                               (inverted quirk) */
		v = w;  memcpy(header + 26, &v, 4);
		v = h;  memcpy(header + 30, &v, 4);
		v = 16; memcpy(header + 34, &v, 4);
		v = 2;  memcpy(header + 38, &v, 4);         /* 2 frames */
		fwrite(header, 1, sizeof header, sf);
		for (fr = 0; fr < 2; fr++) {
			for (i = 0; i < npix; i++) {
				WORD px = rnd_range(0, 65535);
				unsigned char be[2] = { (unsigned char) (px >> 8),
						(unsigned char) (px & 0xFF) };
				cfa[i] = px;
				fwrite(be, 1, 2, sf);
			}
			w_u16s(f, cfa, npix);                   /* logical CFA values */
		}
		fclose(sf);

		com.debayer.open_debayer = 1;
		ser_init_struct(&ser);
		if (ser_open_file((char *) tmp_bayer, &ser)) exit(1);
		memset(&rfit, 0, sizeof rfit);
		if (ser_read_frame(&ser, 0, &rfit)) exit(1);  /* debayered RGB */
		w_u16s(f, rfit.data, npix * 3);
		free(rfit.data);
		/* partial read on the Bayer file (window expansion + debayer).
		 * Full-width again: the debayer-area read is also a contiguous
		 * run (ser.c:858-881), rectangular only at full width. */
		{
			rectangle area = { 0, 6, 40, 10 };
			WORD *buf = malloc((long) area.w * area.h * 2);
			int layer;
			for (layer = 0; layer < 3; layer++) {
				if (ser_read_opened_partial(&ser, layer, 1, buf, &area))
					exit(1);
				w_u16s(f, buf, (long) area.w * area.h);
			}
			free(buf);
		}
		com.debayer.open_debayer = 0;
		memset(&rfit, 0, sizeof rfit);
		if (ser_read_frame(&ser, 0, &rfit)) exit(1);  /* CFA as mono */
		w_u16s(f, rfit.data, npix);
		free(rfit.data);
		ser_close_file(&ser);

		/* crashed-capture repair: the reference fixes the count ONLY
		 * when the header says 0 frames (ser.c:337-344); truncate
		 * mid-frame AND zero the header count, reopen -> repaired to 1
		 * whole frame and the header is rewritten on disk */
		if (truncate(tmp_bayer, SER_HEADER_LEN + npix * 2 + npix) != 0)
			exit(1);
		{
			FILE *fz = fopen(tmp_bayer, "r+b");
			int32_t zero = 0;
			fseek(fz, 38, SEEK_SET);
			fwrite(&zero, 4, 1, fz);
			fclose(fz);
		}
		ser_init_struct(&ser);
		if (ser_open_file((char *) tmp_bayer, &ser)) exit(1);
		w_i32(f, (int32_t) ser.frame_count);
		w_file(f, tmp_bayer);        /* the repaired file bytes */
		ser_close_file(&ser);
		free(cfa);
	}

	remove(tmp_mono);
	remove(tmp_rgb);
	remove(tmp_bayer);
	fclose(f);
}

/* ---------------------------- suite: seqfile ----------------------------- */

/* ---------------------------- suite: formats ----------------------------- */
/* internal image formats (image_formats_internal.c compiled whole):
 * readbmp/savebmp, import_pnm_to_fits, saveppm/savepgm, readpic.
 * Record layout (all little-endian):
 *   part A (x4): blob(bmp file) | i32 rv | i32 rx | i32 ry | i32 nchan |
 *                i32 bitpix | u16[rx*ry*nchan] planes
 *   part B (x2): i32 w | i32 h | i32 nchan | blob(graybuf R) | blob(G) |
 *                blob(B) | blob(bmp file written)
 *   part C: i32 w | i32 h | u16[w*h*3] planes | blob(ppm file) then
 *           i32 w | i32 h | u16[w*h] plane | blob(pgm file)
 *   part D (x6): blob(pnm file) | i32 rv | if rv>0: i32 rx | i32 ry |
 *                i32 nchan | i32 bitpix | u16[rx*ry*nchan] planes
 *   part E (x2): blob(pic file) | i32 rv | i32 rx | i32 ry | i32 binx |
 *                i32 biny | u16 hi | u16 lo | u16[rx*ry*nchan] planes
 * blob = i64 length + raw bytes. */

static void w_blob(FILE *f, const void *buf, long n) {
	w_i64(f, n);
	fwrite(buf, 1, n, f);
}

static void write_tmp_file(const char *path, const unsigned char *buf, long n) {
	FILE *out = fopen(path, "wb");
	if (!out || fwrite(buf, 1, n, out) != (size_t) n)
		exit(1);
	fclose(out);
}

/* build a BMP byte stream the way readbmp consumes it: dims at header
 * bytes 18/22 (2 bytes each read), bit depth at 28, data offset at BYTE
 * 10 only (readbmp:66 reads header[10], not the LE32 field), alpha
 * position flag at 30. 8-bit files carry a 1024-byte palette at the
 * offset, pixels after it (readbmp:69-76). */
static long build_bmp(unsigned char *out, int w, int h, int bpp,
		int alpha_first) {
	int nbplane = bpp / 8;
	int padsize = (4 - (w * nbplane) % 4) % 4;
	long nbdata = (long) w * h * nbplane + (long) h * padsize;
	long off = 54 + (nbplane == 1 ? 1024 : 0);
	long total = off + nbdata, i;
	memset(out, 0, 54);
	out[0] = 'B'; out[1] = 'M';
	out[2] = (unsigned char) total;
	out[3] = (unsigned char) (total >> 8);
	out[10] = 54;           /* readbmp seeks here; palette follows for 8-bit */
	out[14] = 40;
	out[18] = (unsigned char) w;
	out[19] = (unsigned char) (w >> 8);
	out[22] = (unsigned char) h;
	out[23] = (unsigned char) (h >> 8);
	out[26] = 1;
	out[28] = (unsigned char) bpp;
	out[30] = (unsigned char) (alpha_first ? 3 : 0);
	for (i = 54; i < off; i++)      /* grayscale palette bytes */
		out[i] = (unsigned char) (((i - 54) / 4) & 0xFF);
	for (i = off; i < total; i++)
		out[i] = (unsigned char) (rnd_u32() & 0xFF);
	return total;
}

static void suite_formats(const char *dir) {
	FILE *f = open_out(dir, "c_formats.bin");
	const char *tmp = "/tmp/ph_fmt.bin";
	unsigned char filebuf[65536];
	fits fit;
	int c, i;

	/* part A: readbmp on 8/24/32-bit (+32-bit alpha-first) files */
	{
		const int cases[4][3] = {     /* w, h, bpp */
			{ 7, 5, 8 }, { 5, 4, 24 }, { 4, 3, 32 }, { 4, 3, 32 }
		};
		for (c = 0; c < 4; c++) {
			long n = build_bmp(filebuf, cases[c][0], cases[c][1],
					cases[c][2], c == 3);
			int rv;
			write_tmp_file(tmp, filebuf, n);
			w_blob(f, filebuf, n);
			memset(&fit, 0, sizeof fit);
			rv = readbmp(tmp, &fit);
			w_i32(f, rv);
			w_i32(f, fit.rx);
			w_i32(f, fit.ry);
			w_i32(f, (int) fit.naxes[2]);
			w_i32(f, fit.bitpix);
			w_u16s(f, fit.data, (long) fit.rx * fit.ry * fit.naxes[2]);
			free(fit.data);
		}
	}

	/* part B: savebmp serializes the display graybufs (BGR bottom-up,
	 * 4-byte stride source, pad byte '0'); widths chosen so padsize<=1
	 * (the reference pads from a 2-byte string literal — padsize>=2
	 * reads past it, which is not a semantics worth anchoring) */
	{
		const int cases[2][3] = { { 4, 3, 1 }, { 9, 2, 3 } }; /* w,h,nchan */
		for (c = 0; c < 2; c++) {
			int w = cases[c][0], h = cases[c][1], nchan = cases[c][2];
			long nbytes = (long) w * h * 4;
			unsigned char *bufs[3];
			w_i32(f, w);
			w_i32(f, h);
			w_i32(f, nchan);
			for (i = 0; i < 3; i++) {
				long k;
				bufs[i] = malloc(nbytes);
				for (k = 0; k < nbytes; k++)
					bufs[i][k] = (unsigned char) (rnd_u32() & 0xFF);
				com.graybuf[i] = bufs[i];
				w_blob(f, bufs[i], nbytes);
			}
			memset(&fit, 0, sizeof fit);
			fit.rx = w;
			fit.ry = h;
			fit.naxis = nchan == 3 ? 3 : 2;
			fit.naxes[2] = nchan;
			if (savebmp(tmp, &fit)) exit(1);
			{
				FILE *in = fopen(tmp, "rb");
				long n = fread(filebuf, 1, sizeof filebuf, in);
				fclose(in);
				w_blob(f, filebuf, n);
			}
			for (i = 0; i < 3; i++) {
				free(bufs[i]);
				com.graybuf[i] = NULL;
			}
		}
	}

	/* part C: saveppm (RGB, big-endian u16, CREATOR comment) and
	 * savepgm (mono) */
	{
		const int w = 4, h = 3;
		long npix = (long) w * h, k;
		WORD *img = malloc(npix * 3 * 2);
		for (k = 0; k < npix * 3; k++)
			img[k] = rnd_range(0, 65535);
		make_rgb_fits(&fit, img, w, h);
		w_i32(f, w);
		w_i32(f, h);
		w_u16s(f, img, npix * 3);
		if (saveppm(tmp, &fit)) exit(1);
		{
			FILE *in = fopen(tmp, "rb");
			long n = fread(filebuf, 1, sizeof filebuf, in);
			fclose(in);
			w_blob(f, filebuf, n);
		}
		free(img);
	}
	{
		const int w = 5, h = 3;
		long npix = (long) w * h, k;
		WORD *img = malloc(npix * 2);
		for (k = 0; k < npix; k++)
			img[k] = rnd_range(0, 65535);
		make_mono_fits(&fit, img, w, h);
		w_i32(f, w);
		w_i32(f, h);
		w_u16s(f, img, npix);
		if (savepgm(tmp, &fit)) exit(1);
		{
			FILE *in = fopen(tmp, "rb");
			long n = fread(filebuf, 1, sizeof filebuf, in);
			fclose(in);
			w_blob(f, filebuf, n);
		}
		free(img);
	}

	/* part D: import_pnm_to_fits across the accepted maxvals (255 /
	 * 32767 / 65535, import_pnm_to_fits:407-447) plus one rejection */
	{
		const struct { const char *magic; int w, h, maxval; } cases[6] = {
			{ "P5", 6, 4, 255 }, { "P5", 5, 3, 65535 },
			{ "P5", 4, 2, 32767 }, { "P6", 5, 3, 255 },
			{ "P6", 4, 4, 65535 }, { "P5", 4, 2, 1000 },
		};
		for (c = 0; c < 6; c++) {
			int w = cases[c].w, h = cases[c].h, chans, depth, rv;
			long n, k, nvals;
			chans = cases[c].magic[1] == '6' ? 3 : 1;
			depth = cases[c].maxval > 255 ? 2 : 1;
			n = snprintf((char *) filebuf, sizeof filebuf,
					"%s\n# parity fixture\n%d %d\n%d\n",
					cases[c].magic, w, h, cases[c].maxval);
			nvals = (long) w * h * chans;
			for (k = 0; k < nvals; k++) {
				WORD v = rnd_range(0, cases[c].maxval > 255 ? 65535 : 255);
				if (depth == 2) {
					filebuf[n++] = (unsigned char) (v >> 8); /* big-endian */
					filebuf[n++] = (unsigned char) (v & 0xFF);
				} else {
					filebuf[n++] = (unsigned char) v;
				}
			}
			write_tmp_file(tmp, filebuf, n);
			w_blob(f, filebuf, n);
			memset(&fit, 0, sizeof fit);
			rv = import_pnm_to_fits(tmp, &fit);
			w_i32(f, rv);
			if (rv > 0) {
				w_i32(f, fit.rx);
				w_i32(f, fit.ry);
				w_i32(f, (int) fit.naxes[2]);
				w_i32(f, fit.bitpix);
				w_u16s(f, fit.data, (long) fit.rx * fit.ry * fit.naxes[2]);
			}
			free(fit.data);
		}
	}

	/* part E: readpic (IRIS PIC, 290-byte header, LE u16 planes) */
	{
		const int cases[2][3] = { { 6, 4, 1 }, { 3, 2, 3 } }; /* w,h,planes */
		for (c = 0; c < 2; c++) {
			int w = cases[c][0], h = cases[c][1], planes = cases[c][2], rv;
			long n = 290, k, nvals = (long) w * h * planes;
			memset(filebuf, 0, 290);
			filebuf[0] = 0xfc; filebuf[1] = 0x31;   /* magic LE */
			filebuf[2] = 0x22; filebuf[3] = 0x01;
			filebuf[68] = (unsigned char) w;
			filebuf[70] = (unsigned char) h;
			for (i = 0; i < 6; i++)                  /* bin[0..5] */
				filebuf[80 + 2 * i] = (unsigned char) (i + 1);
			filebuf[92] = (unsigned char) planes;
			memcpy(filebuf + 94, " 2017-06-1", 10);  /* date, strchug'd */
			memcpy(filebuf + 104, "23:59:59.00 ", 12);
			filebuf[118] = 0x10; filebuf[119] = 0x27; /* hi = 10000 */
			filebuf[120] = 0x64;                      /* lo = 100 */
			for (k = 0; k < nvals; k++) {
				WORD v = rnd_range(0, 65535);
				filebuf[n++] = (unsigned char) (v & 0xFF);
				filebuf[n++] = (unsigned char) (v >> 8);
			}
			write_tmp_file(tmp, filebuf, n);
			w_blob(f, filebuf, n);
			memset(&fit, 0, sizeof fit);
			rv = readpic(tmp, &fit);
			w_i32(f, rv);
			w_i32(f, fit.rx);
			w_i32(f, fit.ry);
			w_i32(f, fit.binning_x);
			w_i32(f, fit.binning_y);
			w_u16(f, fit.hi);
			w_u16(f, fit.lo);
			w_u16s(f, fit.data, nvals);
			free(fit.data);
		}
	}
	fclose(f);
}

static void suite_seqfile(const char *dir) {
	FILE *f = open_out(dir, "c_seqfile.bin");
	const char *base = "/tmp/ph_seqtest";
	sequence seq;
	imstats st[5];
	imgdata imgs[5];
	regdata reg[5];
	regdata *regp[1] = { reg };
	sequence *rd;
	int i;

	/* a 5-image mono sequence: stats cached on images 0/2/4, reg data
	 * with negative shifts/fractional quality, image 3 deselected */
	memset(&seq, 0, sizeof seq);
	initialize_sequence(&seq, TRUE);
	seq.seqname = (char *) base;
	seq.beg = 1;
	seq.number = 5;
	seq.selnum = 4;
	seq.fixed = 5;
	seq.nb_layers = 1;
	seq.reference_image = 2;
	seq.type = SEQ_REGULAR;
	seq.imgparam = imgs;
	seq.regparam = regp;
	memset(imgs, 0, sizeof imgs);
	memset(reg, 0, sizeof reg);
	memset(st, 0, sizeof st);
	for (i = 0; i < 5; i++) {
		imgs[i].filenum = i + 1;
		imgs[i].incl = (i != 3);
		if ((i % 2) == 0) {
			st[i].mean = 1234.5678901 + i;
			st[i].median = 1200.0 + i;
			st[i].sigma = 56.789 + i;
			st[i].avgDev = 43.21 + i;
			st[i].mad = 40.5 + i;
			st[i].sqrtbwmv = 41.25 + i;
			st[i].location = 0.0183105 + i * 1e-4;
			st[i].scale = 0.00087 + i * 1e-5;
			st[i].min = 12.0;
			st[i].max = 65535.0;
			imgs[i].stats = &st[i];
		}
		reg[i].shiftx = (i - 2) * 3;
		reg[i].shifty = 2 - i;
		reg[i].rot_centre_x = 512.25f;
		reg[i].rot_centre_y = 384.75f;
		reg[i].angle = 0.125f * i;
		reg[i].fwhm = 3.5f + 0.25f * i;
		reg[i].quality = 0.912345678 - 0.01 * i;
	}
	if (writeseqfile(&seq)) {
		fprintf(stderr, "writeseqfile failed\n");
		exit(1);
	}
	{
		char path[64];
		snprintf(path, sizeof path, "%s.seq", base);
		w_file(f, path);                      /* exact text bytes */
	}

	/* read it back through the compiled parser and emit what it parsed */
	rd = readseqfile(base);
	if (!rd) {
		fprintf(stderr, "readseqfile failed\n");
		exit(1);
	}
	w_i32(f, rd->beg);
	w_i32(f, rd->number);
	w_i32(f, rd->selnum);
	w_i32(f, rd->fixed);
	w_i32(f, rd->reference_image);
	w_i32(f, rd->nb_layers);
	w_i32(f, rd->end);
	for (i = 0; i < rd->number; i++) {
		w_i32(f, rd->imgparam[i].filenum);
		w_i32(f, rd->imgparam[i].incl);
		w_u8(f, rd->imgparam[i].stats != NULL);
		if (rd->imgparam[i].stats) {
			w_f64(f, rd->imgparam[i].stats->mean);
			w_f64(f, rd->imgparam[i].stats->median);
			w_f64(f, rd->imgparam[i].stats->sigma);
			w_f64(f, rd->imgparam[i].stats->location);
			w_f64(f, rd->imgparam[i].stats->scale);
		}
	}
	for (i = 0; i < rd->number; i++) {
		w_i32(f, rd->regparam[0][i].shiftx);
		w_i32(f, rd->regparam[0][i].shifty);
		w_f64(f, rd->regparam[0][i].angle);
		w_f64(f, rd->regparam[0][i].fwhm);
		w_f64(f, rd->regparam[0][i].quality);
	}
	{
		char path[64];
		snprintf(path, sizeof path, "%s.seq", base);
		remove(path);
	}
	fclose(f);
}

/* ----------------------------- suite: match ------------------------------ */

/* match.h gates on HAVE_OPENCV, which must stay OFF for the imops.inc
 * block in this TU (it selects the reference's non-OpenCV wavelet path
 * in backgroundnoise) — declare the entry point directly instead */
int new_star_match(fitted_PSF **s1, fitted_PSF **s2, int n, Homography *H);
extern int h_captured_n;
extern double h_captured[4096][4];

static void suite_match(const char *dir) {
	FILE *f = open_out(dir, "c_match.bin");
	/* (angle_deg, scale, tx, ty, n_drop) */
	static const double cases[][5] = {
		{  2.5, 1.00,  25.5, -12.3, 0 },
		{ -7.0, 1.06, -80.0,  40.0, 4 },
		{  0.0, 0.97,   3.2,   5.9, 6 },
	};
	const int n = 30;
	int ci, s, i;

	for (ci = 0; ci < 3; ci++) {
		const double th = cases[ci][0] * M_PI / 180.0;
		const double sc = cases[ci][1];
		const double tx = cases[ci][2], ty = cases[ci][3];
		const int ndrop = (int) cases[ci][4];
		fitted_PSF *a = calloc(n, sizeof(fitted_PSF));
		fitted_PSF *b = calloc(n, sizeof(fitted_PSF));
		fitted_PSF **pa = malloc(n * sizeof(void *));
		fitted_PSF **pb = malloc(n * sizeof(void *));
		Homography H;

		for (s = 0; s < n; s++) {
			a[s].xpos = 50.0 + rnd_unit() * 1900.0;
			a[s].ypos = 50.0 + rnd_unit() * 1400.0;
			a[s].mag = -16.0 + 0.25 * s;   /* sorted brightest-first */
			pa[s] = &a[s];
		}
		for (s = 0; s < n; s++) {
			if (s < n - ndrop) {
				/* true counterpart + 0.2 px jitter */
				b[s].xpos = sc * (cos(th) * a[s].xpos - sin(th) * a[s].ypos)
						+ tx + (rnd_unit() - 0.5) * 0.4;
				b[s].ypos = sc * (sin(th) * a[s].xpos + cos(th) * a[s].ypos)
						+ ty + (rnd_unit() - 0.5) * 0.4;
			} else {
				/* spurious detection, no counterpart */
				b[s].xpos = 50.0 + rnd_unit() * 1900.0;
				b[s].ypos = 50.0 + rnd_unit() * 1400.0;
			}
			b[s].mag = a[s].mag + (rnd_unit() - 0.5) * 0.05;
			pb[s] = &b[s];
		}

		h_captured_n = 0;
		if (new_star_match(pa, pb, n, &H)) {
			fprintf(stderr, "new_star_match failed (case %d)\n", ci);
			exit(1);
		}
		w_u16(f, (uint16_t) n);
		w_f64(f, cases[ci][0]);
		w_f64(f, sc);
		w_f64(f, tx);
		w_f64(f, ty);
		for (s = 0; s < n; s++) {
			w_f64(f, a[s].xpos);
			w_f64(f, a[s].ypos);
			w_f64(f, a[s].mag);
		}
		for (s = 0; s < n; s++) {
			w_f64(f, b[s].xpos);
			w_f64(f, b[s].ypos);
			w_f64(f, b[s].mag);
		}
		w_i32(f, h_captured_n);
		for (i = 0; i < h_captured_n; i++) {
			w_f64(f, h_captured[i][0]);
			w_f64(f, h_captured[i][1]);
			w_f64(f, h_captured[i][2]);
			w_f64(f, h_captured[i][3]);
		}
		free(a); free(b); free(pa); free(pb);
	}
	fclose(f);
}

/* ---------------------------- suite: wavelets ---------------------------- */

static void suite_wavelets(const char *dir) {
	FILE *f = open_out(dir, "c_wavelets.bin");
	static const int geos[][2] = { {33, 41}, {64, 64}, {96, 67} };
	int g, type, plan;

	/* struct layout facts the Python .wave reader/writer assume */
	w_i32(f, (int32_t) sizeof(wave_transf_des));
	w_i32(f, (int32_t) offsetof(wave_transf_des, Nbr_Ligne));

	for (g = 0; g < 3; g++) {
		int Nl = geos[g][0], Nc = geos[g][1];
		long npix = (long) Nl * Nc, i;
		int nplanes = (g == 0) ? 3 : 4;
		WORD *img = malloc(npix * 2);
		for (i = 0; i < npix; i++)
			img[i] = (rnd_unit() < 0.02) ? rnd_range(50000, 65535)
			                             : rnd_range(0, 20000);
		for (type = TO_PAVE_LINEAR; type <= TO_PAVE_BSPLINE; type++) {
			wave_transf_des W;
			float *Imag = f_vector_alloc(npix);
			WORD *out = malloc(npix * 2);
			float coef[8];
			memset(&W, 0, sizeof W);
			w_u16(f, (uint16_t) Nl);
			w_u16(f, (uint16_t) Nc);
			w_u8(f, (uint8_t) type);
			w_u8(f, (uint8_t) nplanes);
			w_u16s(f, img, npix);
			prepare_rawdata(Imag, Nl, Nc, img);
			if (wavelet_transform_data(Imag, Nl, Nc, &W, type, nplanes)) {
				fprintf(stderr, "wavelet transform failed\n");
				exit(1);
			}
			fwrite(W.Pave.Data, sizeof(float), npix * nplanes, f);
			/* get_wavelet_layers path: extract plane -> reget_rawdata */
			for (plan = 0; plan < nplanes; plan++) {
				pave_2d_extract_plan(W.Pave.Data, Imag, Nl, Nc, plan);
				reget_rawdata(Imag, Nl, Nc, out);
				w_u16s(f, out, npix);
			}
			/* wrecons path: weighted reconstruction -> WORD */
			for (i = 0; i < nplanes; i++)
				coef[i] = (float) (rnd_unit() * 2.0);
			fwrite(coef, sizeof(float), nplanes, f);
			wavelet_reconstruct_data(&W, Imag, coef);
			reget_rawdata(Imag, Nl, Nc, out);
			w_u16s(f, out, npix);
			/* .wave on-disk bytes as the reference writes them, with the
			 * leaked heap-pointer/padding regions zeroed so the golden
			 * is deterministic (wave_io_read never reads those bytes:
			 * io_wave.c:156-211).  Also prove the reference READER
			 * accepts the zeroed form (what siriltpu writes). */
			{
				char path[64];
				long fsize;
				FILE *wf;
				unsigned char *bytes;
				wave_transf_des R;
				snprintf(path, sizeof path, "/tmp/ph_%d_%d.wave", g, type);
				if (wave_io_write(path, &W)) exit(1);
				wf = fopen(path, "rb");
				fseek(wf, 0, SEEK_END);
				fsize = ftell(wf);
				fseek(wf, 0, SEEK_SET);
				bytes = malloc(fsize);
				if (fread(bytes, 1, fsize, wf) != (size_t) fsize) exit(1);
				fclose(wf);
				/* zero: tail-of-name..Pyramid.Data, Pave, Mallat */
				memset(bytes + offsetof(wave_transf_des, Pyramid), 0,
						sizeof(wave_transf_des)
								- offsetof(wave_transf_des, Pyramid));
				memset(bytes + offsetof(wave_transf_des, Type_Wave_Transform)
						+ sizeof(int), 0,
						offsetof(wave_transf_des, Pyramid)
								- offsetof(wave_transf_des, Type_Wave_Transform)
								- sizeof(int));
				wf = fopen(path, "wb");
				fwrite(bytes, 1, fsize, wf);
				fclose(wf);
				memset(&R, 0, sizeof R);
				if (wave_io_read(path, &R)) {
					fprintf(stderr, "reference reader rejected zeroed hdr\n");
					exit(1);
				}
				if (R.Nbr_Ligne != Nl || R.Nbr_Col != Nc
						|| memcmp(R.Pave.Data, W.Pave.Data,
								npix * nplanes * sizeof(float)) != 0) {
					fprintf(stderr, "zeroed-header re-read mismatch\n");
					exit(1);
				}
				wave_io_free(&R);
				remove(path);
				w_i64(f, fsize);
				fwrite(bytes, 1, fsize, f);
				free(bytes);
			}
			wave_io_free(&W);
			free(Imag);
			free(out);
		}
		free(img);
	}

	/* reget_rawdata rescale path: floats above USHRT_MAX and negatives */
	{
		enum { NPIX = 63 };
		float im[NPIX];
		WORD out[NPIX];
		int i;
		for (i = 0; i < NPIX; i++)
			im[i] = (float) (rnd_unit() * 200000.0 - 20000.0);
		fwrite(im, sizeof(float), NPIX, f);
		reget_rawdata(im, 7, 9, out);
		w_u16s(f, out, NPIX);
	}
	fclose(f);
}

/* ----------------------------- suite: dftreg ----------------------------- */
/* register_shift_dft bookkeeping (registration.c:163-176,317-324,337-354),
 * driven with PRECOMPUTED correlation surfaces so FFTW is not needed:
 * the argmax + wraparound peak decode, the q_min/q_max/q_index tracking,
 * and normalizeQualityData's selective normalization. <complex.h> is
 * included HERE (not at the top) so its `I` macro cannot leak into the
 * suites above; fftw_complex is C99 double complex, exactly FFTW's ABI. */
#include <complex.h>
#include <sys/time.h>
typedef double complex fftw_complex;
typedef int opencv_interpolation;
static int get_thread_run(void) { return 1; }

#include "gen/dftreg_args.inc"   /* src/registration/registration.h:8-9,12-32 */
#include "gen/dftreg_norm.inc"   /* src/registration/registration.c:163-176 */

static void c_dft_peak_block(fftw_complex *out2, int size,
		regdata *current_regdata, int frame) {
	int sqsize = size * size;
	int x;
	(void) sqsize;
#include "gen/dftreg_peak.inc"   /* src/registration/registration.c:337-354 */
}

static void c_dft_qmax_block(regdata *current_regdata, int frame,
		double *pq_max, double *pq_min, int *pq_index) {
	double q_max = *pq_max, q_min = *pq_min;
	int q_index = *pq_index;
#include "gen/dftreg_qmax.inc"   /* src/registration/registration.c:317-324 */
	*pq_max = q_max; *pq_min = q_min; *pq_index = q_index;
}

static void suite_dftreg(const char *dir) {
	FILE *f = open_out(dir, "c_dftreg.bin");
	static const int sizes[] = { 16, 32, 64 };
	int si, c, x, frame;

	/* part 1: peak decode on 12 surfaces per size — random, planted
	 * wraparound peaks (all four quadrants), ties (first max wins),
	 * all-negative, and constant surfaces */
	for (si = 0; si < 3; si++) {
		int size = sizes[si], sqsize = size * size;
		fftw_complex *out2 = malloc(sizeof(fftw_complex) * sqsize);
		for (c = 0; c < 12; c++) {
			for (x = 0; x < sqsize; x++)
				out2[x] = (rnd_unit() * 2000.0 - 1000.0)
						+ (rnd_unit() - 0.5) * I;
			if (c >= 2 && c < 8) {
				/* plant a strict peak at a corner-ish offset */
				int py = (c & 1) ? size - 1 - (c >> 1) : (c >> 1);
				int px = (c & 2) ? size - 2 : 1;
				out2[py * size + px] += 5000.0;
			} else if (c == 8) {       /* tie: both hold the max */
				out2[3 * size + 5] = 7777.0;
				out2[9 * size + 2] = 7777.0;
			} else if (c == 9) {       /* all negative */
				for (x = 0; x < sqsize; x++)
					out2[x] = -1000.0 - rnd_unit() * 500.0;
			} else if (c == 10) {      /* constant */
				for (x = 0; x < sqsize; x++)
					out2[x] = 42.0;
			} else if (c == 11) {      /* peak at index 0 */
				out2[0] += 9000.0;
			}
			{
				regdata rd;
				memset(&rd, 0, sizeof rd);
				c_dft_peak_block(out2, size, &rd, 0);
				w_u16(f, (uint16_t) size);
				for (x = 0; x < sqsize; x++)
					w_f64(f, creal(out2[x]));
				w_i32(f, rd.shiftx);
				w_i32(f, rd.shifty);
			}
		}
		free(out2);
	}

	/* part 2: q tracking + normalizeQualityData over 3 scenarios:
	 * all frames, selective-with-exclusions, duplicate maxima */
	for (c = 0; c < 3; c++) {
		enum { NF = 12 };
		sequence seq;
		regdata *rp = calloc(NF, sizeof(regdata));
		regdata *rparr[1] = { rp };
		imgdata *ip = calloc(NF, sizeof(imgdata));
		struct registration_args args;
		double q_max = 0, q_min = DBL_MAX;
		int q_index = -1;

		memset(&seq, 0, sizeof seq);
		memset(&args, 0, sizeof args);
		seq.number = NF;
		seq.regparam = rparr;
		seq.imgparam = ip;
		args.seq = &seq;
		args.layer = 0;
		args.process_all_frames = (c == 0);
		args.run_in_thread = FALSE;

		for (frame = 0; frame < NF; frame++) {
			ip[frame].incl = (c == 0) ? TRUE : (frame % 3 != 1);
			rp[frame].quality = rnd_unit() * 100.0;
			if (c == 2 && (frame == 4 || frame == 7))
				rp[frame].quality = 250.0;   /* duplicate max: first wins */
			/* the C tracks q only for processed frames */
			if (args.process_all_frames || ip[frame].incl)
				c_dft_qmax_block(rp, frame, &q_max, &q_min, &q_index);
		}
		w_u16(f, (uint16_t) NF);
		w_u16(f, (uint16_t) (args.process_all_frames ? 1 : 0));
		for (frame = 0; frame < NF; frame++) {
			w_u16(f, (uint16_t) (ip[frame].incl ? 1 : 0));
			w_f64(f, rp[frame].quality);
		}
		normalizeQualityData(&args, q_min, q_max);
		w_f64(f, q_min);
		w_f64(f, q_max);
		w_i32(f, q_index);
		for (frame = 0; frame < NF; frame++)
			w_f64(f, rp[frame].quality);
		free(rp); free(ip);
	}
	fclose(f);
}

int main(int argc, char **argv) {
	const char *dir = (argc > 1) ? argv[1] : ".";
	rng_state = 0x9E3779B97F4A7C15ULL;
	suite_rounding(dir);
	rng_state = 0xC0FFEE1234567890ULL;
	suite_rejection(dir);
	rng_state = 0xDEADBEEFCAFEF00DULL;
	suite_statistics(dir);
	rng_state = 0x1234567890ABCDEFULL;
	suite_quantize(dir);
	rng_state = 0xA5A5A5A55A5A5A5AULL;
	suite_demosaic(dir);
	rng_state = 0xBADC0FFEE0DDF00DULL;
	suite_quality(dir);
	rng_state = 0xFEEDFACE8BADF00DULL;
	suite_mtf(dir);
	rng_state = 0x0123456789ABCDEFULL;
	suite_photometry(dir);
	rng_state = 0x5EED5EED5EED5EEDULL;
	suite_colors(dir);
	rng_state = 0x7E57C0DE7E57C0DEULL;
	suite_cosmetic(dir);
	rng_state = 0x1CEB00DA1CEB00DAULL;
	suite_wavelets(dir);
	rng_state = 0xF00DFACEF00DFACEULL;
	suite_imops(dir);
	rng_state = 0xB16B00B5B16B00B5ULL;
	suite_gradient(dir);
	rng_state = 0xCAFED00DCAFED00DULL;
	suite_psf(dir);
	rng_state = 0x0DDBA11C0DDBA11CULL;
	suite_starfind(dir);
	rng_state = 0x7A1A61357A1A6135ULL;
	suite_match(dir);
	rng_state = 0xD47263A1D47263A1ULL;
	suite_dftreg(dir);
	rng_state = 0x5E55E55E55E55E55ULL;
	suite_ser(dir);
	suite_seqfile(dir);   /* fully deterministic, no rng */
	rng_state = 0xF0FA7A11F0FA7A11ULL;
	suite_formats(dir);
	printf("goldens written to %s\n", dir);
	return 0;
}
