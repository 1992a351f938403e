/* Shim for core/proto.h: declarations for the few cross-file symbols the
 * compiled reference kernels call. Implementations come from the extracted
 * utils blocks (round_to_*, quicksort_*), quantize.c (fits_img_stats_ushort)
 * and support.c (get_normalized_value). */
#ifndef SHIM_PROTO_H
#define SHIM_PROTO_H

#include "core/siril.h"

int round_to_int(double x);
void swap_param(double *a, double *b);
WORD round_to_WORD(double x);
BYTE round_to_BYTE(double x);
BYTE conv_to_BYTE(double x);
void quicksort_d(double *a, int n);
void quicksort_s(WORD *a, int n);
WORD get_normalized_value(fits *fit);
float computePente(WORD *lo, WORD *hi);

int fits_img_stats_ushort(WORD *array, long nx, long ny, int nullcheck,
		WORD nullvalue, long *ngoodpix, WORD *minvalue, WORD *maxvalue,
		double *mean, double *sigma, double *noise1, double *noise2,
		double *noise3, double *noise5, int *status);

/* gettext passthrough + logging/undo stubs for the extracted histogram.c /
 * photometry.c blocks (implemented in support.c; the real ones print to the
 * GTK console / write swap files, which the harness has no use for). */
#ifndef _
#define _(String) (String)
#endif
char *siril_log_message(const char *format, ...);
int undo_save_state(const char *message, ...);

/* the extracted colors.c workers call these GTK-side helpers; none of them
 * affects pixel output, so they are no-op'd at the preprocessor (this also
 * drops the references to the un-extracted end_* idle callbacks). */
#define siril_log_color_message(...) ((void) 0)
#define show_time(a, b) ((void) 0)
#define gdk_threads_add_idle(fn, p) ((void) (p))
gboolean isrgb(fits *fit);

/* glib path helpers + minimal fits lifecycle for the extracted
 * core/siril.c image-op blocks (implemented in support.c; the real
 * copyfits/new_fit_image live in cfitsio-bound image_format_fits.c) */
const char *g_get_tmp_dir(void);
gchar *g_build_filename(const char *a, const char *b, void *end);
void g_free(void *p);
int copyfits(fits *from, fits *to, unsigned char oper, int layer);
int new_fit_image(fits *fit, int width, int height, int nblayer);
void clearfits(fits *fit);

/* defined by the extracted core/siril.c block (gen/imops.inc, linked
 * from the harness TU); PSF.c calls it for the fit-box background */
double background(fits *fit, int reqlayer, rectangle *selection);
int threshlo(fits *fit, int level);
int threshhi(fits *fit, int level);
int nozero(fits *fit, int level);
int shift(int sx, int sy);

/* for ser.c: the FITS row flip (extracted from image_format_fits.c),
 * glib string/list shims, and the date parser stub (support.c) */
void fits_flip_top_to_bottom(fits *fit);
gchar *g_strndup(const char *s, size_t n);

/* ---- internal image formats TU (image_formats_internal.c), compiled
 * whole; pic_struct copied from the reference proto.h:56-69 ---- */
struct pic_struct {
	unsigned short magic[2];
	unsigned short width;
	unsigned short height;
	unsigned short bin[6];
	unsigned short nbplane;
	unsigned short hi;
	unsigned short lo;
	char *date;
	char *time;
	int fd;
};
int readbmp(const char *name, fits *fit);
int savebmp(const char *name, fits *fit);
int bmp8tofits(unsigned char *rgb, int rx, int ry, fits *fit);
int bmp24tofits48(unsigned char *rvb, int rx, int ry, fits *fit);
int bmp32tofits48(unsigned char *rvb, int rx, int ry, fits *fit,
		gboolean inverted);
int import_pnm_to_fits(const char *filename, fits *fit);
int saveppm(const char *name, fits *fit);
int savepgm(const char *name, fits *fit);
int readpic(const char *name, fits *fit);
int pictofit(WORD *buf, fits *fit);
int pictofitrgb(WORD *buf, fits *fit);
/* 8/24/48-bit buffer converters (image_format_fits.c:1065-1139,
 * extracted to gen/rgbconv.inc) */
void rgb24bit_to_fits48bit(unsigned char *rgbbuf, fits *fit, gboolean inverted);
void rgb8bit_to_fits16bit(unsigned char *graybuf, fits *fit);
void rgb48bit_to_fits48bit(WORD *rgbbuf, fits *fit, gboolean inverted,
		gboolean change_endian);
/* GUI/glib helpers the formats TU calls (stubs in support.c) */
void show_dialog(const char *text, const char *title, const char *icon);
gchar *g_path_get_basename(const char *file_name);
gchar *g_strchug(gchar *string);
int stat_file(const char *filename, image_type *type, char **realname);
void get_possible_image_filename(sequence *seq, int image_number,
		char *name_buffer);
/* GSList typedef lives in the siril.h shim (ser.h needs it) */

#endif
