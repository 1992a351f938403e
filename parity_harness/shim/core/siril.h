/* Minimal stand-in for the reference's core/siril.h, written for the parity
 * harness. It defines ONLY the types/constants the compiled kernels touch
 * (statistics.c, quantize.c, demosaicing.c and the extracted utils/stacking
 * blocks), with the same names and values as the reference declares
 * (src/core/siril.h:42-43,34-38,70-76,149-160 sensor enums :249-272,
 * struct ffit :391-442, struct image_stats :600-605). The struct here keeps
 * only the fields those kernels read -- all harness code compiles against
 * this header, so layout compatibility with the real siril.h is not needed.
 */
#ifndef SHIM_SIRIL_H
#define SHIM_SIRIL_H

#include <assert.h>
#include <limits.h>
#include <stdint.h>
#include <stdio.h>    /* several reference TUs call printf without it */
#include <stdlib.h>
#include <time.h>     /* struct tm, for ser.c's date conversion */

#define g_assert assert

/* cfitsio image-type codes (fitsio.h), used by ser.c's fit geometry */
#define BYTE_IMG    8
#define SHORT_IMG   16
#define USHORT_IMG  20
#define LONG_IMG    32
#define FLOAT_IMG  (-32)
#define DOUBLE_IMG (-64)

typedef unsigned char BYTE;
typedef unsigned char guchar;
typedef unsigned short WORD;
typedef int gboolean;
typedef char gchar;
typedef void *gpointer;
#ifndef TRUE
#define TRUE 1
#define FALSE 0
#endif
#define GINT_TO_POINTER(i) ((gpointer)(long)(i))

#define SQR(x) ((x)*(x))

/* GNU statement-expression min/max, same as siril.h:23-33 (the extracted
 * scnr/enhance_saturation workers use them) */
#undef max
#define max(a,b) \
   ({ __typeof__ (a) _a = (a); \
       __typeof__ (b) _b = (b); \
     _a > _b ? _a : _b; })
#undef min
#define min(a,b) \
   ({ __typeof__ (a) _a = (a); \
       __typeof__ (b) _b = (b); \
     _a < _b ? _a : _b; })

/* point (siril.h:481-483), used by cosmetic_correction's deviant_pixel */
typedef struct {
	double x, y;
} point;

/* Homography (siril.h:607-613), filled by the cvCalculH capture stub */
typedef struct Homo {
	double h00, h01, h02;
	double h10, h11, h12;
	double h20, h21, h22;
	int pair_matched;
	int Inliers;
} Homography;

/* background-extraction sample box (siril.h:485-488) + polynomial order
 * (siril.h:210-215), used by the extracted gradient.c */
typedef struct {
	point centre;
	double boxvalue[3];
} gradient;

typedef enum {
	POLY_1,
	POLY_2,
	POLY_3,
	POLY_4,
} poly_order;

/* cfitsio error code used by quantize.c (fitsio.h) */
#define MEMORY_ALLOCATION 113

/* glib's MIN/MAX, used by demosaicing.c */
#ifndef MIN
#define MIN(a, b) (((a) < (b)) ? (a) : (b))
#endif
#ifndef MAX
#define MAX(a, b) (((a) > (b)) ? (a) : (b))
#endif
#define USHRT_MAX_DOUBLE ((double)USHRT_MAX)
#define UCHAR_MAX_DOUBLE ((double)UCHAR_MAX)

/* statistic option flags (siril.h:70-76) */
#define STATS_BASIC   (1 << 1)
#define STATS_AVGDEV  (1 << 2)
#define STATS_MAD     (1 << 3)
#define STATS_BWMV    (1 << 5)
#define STATS_MAIN    STATS_BASIC | STATS_AVGDEV | STATS_MAD | STATS_BWMV
#define STATS_IKSS    (1 << 6)
#define STATS_EXTRA   STATS_MAIN | STATS_IKSS

#define STATS_ZERO_NONE 0
#define STATS_ZERO_NULLCHECK (!STATS_ZERO_NONE)

typedef enum {
	BAYER_BILINEAR,
	BAYER_NEARESNEIGHBOR,
	BAYER_VNG,
	BAYER_AHD,
	BAYER_SUPER_PIXEL
} interpolation_method;

typedef enum {
	BAYER_FILTER_RGGB,
	BAYER_FILTER_BGGR,
	BAYER_FILTER_GBRG,
	BAYER_FILTER_GRBG,
	BAYER_FILTER_NONE = -1
} sensor_pattern;
#define BAYER_FILTER_MIN BAYER_FILTER_RGGB
#define BAYER_FILTER_MAX BAYER_FILTER_GRBG

typedef struct {
	int x, y, w, h;
} rectangle;

#define RLAYER 0
#define GLAYER 1
#define BLAYER 2
#define BW_LAYER 0

/* image-op constants for the extracted core/siril.c blocks
 * (siril.h:58-62,146-152,166-169,180-181) */
#define LOW_BOUND  0.00002
#define HIGH_BOUND 0.99998
#define SIGMA_PER_FWHM 2.35482
#define CP_INIT    0x01
#define CP_ALLOC   0x02
#define CP_COPYA   0x04
#define CP_FORMAT  0x08
#define CP_EXTRACT 0x10
#define CP_EXPAND  0x20
#define OPER_ADD 'a'
#define OPER_SUB 's'
#define OPER_MUL 'm'
#define OPER_DIV 'd'
#define LOG 1
#define EXP -1
typedef double gdouble;
typedef int gint;

/* MAD -> sigma normalization constant (siril.h:64), used by the extracted
 * findMidtonesBalance */
#define MAD_NORM 1.4826

/* photometry config (siril.h:456-460) */
struct phot_config {
	double gain;
	double inner;
	double outer;
};

/* fitted_PSF: the real typedef (siril.h:205); struct fwhm_struct body
 * comes from the reference's algos/PSF.h, included by the harness */
typedef struct fwhm_struct fitted_PSF;

#define MAX_STARS 50000
#define g_snprintf snprintf

/* reduced cominfo: demosaicing.c's fits-level debayer() reads
 * com.debayer.bayer_pattern (the harness never calls it, but the TU must
 * compile); the extracted photometry block reads com.phot_set. */
typedef struct {
	struct {
		gboolean open_debayer;
		gboolean use_bayer_header;
		sensor_pattern bayer_pattern;
		interpolation_method bayer_inter;
	} debayer;
	struct phot_config phot_set;
	rectangle selection;   /* the extracted contrast() reads com.selection */
	gradient *grad;        /* background-extraction samples (gradient.c) */
	int grad_nb_boxes, grad_size_boxes;
	double magOffset;      /* psf_display_result */
	int max_thread;
	/* display buffers savebmp serializes (siril.h:509, 4 bytes/px) */
	guchar *graybuf[3];
} cominfo;
extern cominfo com;

/* reduced ffit: just the fields statistics.c / demosaicing.c / the shim
 * computeHisto read (rx, ry, naxis, naxes, maxi, data, pdata). */
typedef struct ffit {
	unsigned int rx;
	unsigned int ry;
	int bitpix;
	int naxis;
	long naxes[3];
	unsigned short maxi;
	unsigned short mini;
	WORD hi, lo;           /* display cutoffs readpic restores (siril.h:404) */
	WORD min[3], max[3];   /* per-layer extrema (image_find_minmax) */
	/* optics metadata psf_update_units reads (zero = unknown) */
	double focal_length;
	double pixel_size_x, pixel_size_y;
	unsigned int binning_x, binning_y;
	/* header strings ser.c copies to/from SER headers (FLEN_VALUE=71) */
	char date_obs[71];
	char date[71];
	char instrume[71];
	char telescop[71];
	char observer[71];
	char bayer_pattern[71];
	WORD *data;
	WORD *pdata[3];
} fits;

/* reconstr.c's reget_rawdata writes gfit.rx/ry (a reference-global side
 * effect the harness ignores); defined in support.c */
extern fits gfit;

struct image_stats {
	long total, ngoodpix;
	double mean, avgDev, median, sigma, bgnoise, min, max, normValue, mad,
			sqrtbwmv, location, scale;
	char layername[6];
};
typedef struct image_stats imstats;

/* ---- sequence model, for the compiled seqfile.c (siril.h:189-374;
 * ffms2 fields omitted exactly as the reference omits them when built
 * without film support) ---- */
#define PREVIEW_NB 2
#define MAX_SEQPSF 7

typedef enum { NORMAL_DISPLAY } display_mode;

typedef struct {
	char *name;
	double wavelength;
	WORD lo, hi;
	gboolean cut_over, cut_under;
	display_mode rendering_mode;
} layer_info;

typedef enum { SEQ_REGULAR, SEQ_SER, SEQ_INTERNAL } sequence_type;

typedef struct imdata {
	int filenum;
	gboolean incl;
	imstats *stats;
	char *date_obs;
} imgdata;

typedef struct registration_data {
	int shiftx, shifty;
	float rot_centre_x, rot_centre_y;
	float angle;
	fitted_PSF *fwhm_data;
	float fwhm;
	double quality;
} regdata;

typedef void fitsfile;   /* cfitsio handle, opaque here */

/* glib singly-linked list (ser.h's timestamp API) */
typedef struct _GSList {
	void *data;
	struct _GSList *next;
} GSList;

/* file-type sniffing enum (siril.h:95-112) + default include flag */
typedef enum {
	TYPEUNDEF = 0,
	TYPEFITS = (1 << 2),
	TYPESER = (1 << 5),
} image_type;
#define SEQUENCE_DEFAULT_INCLUDE TRUE

typedef struct sequ {
	char *seqname;
	int number;
	int selnum;
	int fixed;
	int nb_layers;
	unsigned int rx, ry;
	layer_info *layers;
	int reference_image;
	imgdata *imgparam;
	regdata **regparam;
	int beg, end;
	double exposure;
	int previewX[PREVIEW_NB], previewY[PREVIEW_NB];
	int previewW[PREVIEW_NB], previewH[PREVIEW_NB];
	sequence_type type;
	struct ser_struct *ser_file;
	fits **internal_fits;
	fitsfile **fptr;
	fits *offset, *dark, *flat;
	char *ppprefix;
	int current;
	gboolean needs_saving;
	fitted_PSF **photometry[MAX_SEQPSF];
	int reference_star;
	double reference_mag;
	double photometry_colors[MAX_SEQPSF][3];
} sequence;

#endif
