/* Harness support: the two histogram builders statistics.c calls (same
 * semantics as the reference's gui/histogram.c:111-150, re-stated here
 * because that file is GTK-bound), get_normalized_value (utils.c:454-459
 * via image_find_minmax), and the `com` global demosaicing.c's unused
 * fits-level path references. */
#include <stdio.h>

#include "core/siril.h"
#include "core/proto.h"
#include "gui/histogram.h"

cominfo com;
fits gfit;   /* reget_rawdata (reconstr.c:126-127) stores Nl/Nc here */

#include "gen/minmax.inc"      /* io/single_image.c:220-251, utils.c:454-459 */

#include "gen/histo_build.inc"  /* src/gui/histogram.c:110-149 */

/* Logging/undo stubs for the extracted histogram.c / photometry.c blocks.
 * The reference versions write to the GTK console / swap undo files; the
 * harness only needs the calls to compile and be side-effect free. */
#include <stdarg.h>

char *siril_log_message(const char *format, ...) {
	va_list ap;
	va_start(ap, format);
	vfprintf(stderr, format, ap);
	va_end(ap);
	return NULL;
}

int undo_save_state(const char *message, ...) {
	(void) message;
	return 0;
}

/* utils.c:94-96: an image is RGB when naxis == 3 */
gboolean isrgb(fits *fit) {
	return (fit->naxis == 3);
}

/* glib path helpers for the extracted get_wavelet_layers */
#include <stdio.h>
#include <string.h>

const char *g_get_tmp_dir(void) {
	return "/tmp";
}

gchar *g_build_filename(const char *a, const char *b, void *end) {
	size_t n = strlen(a) + strlen(b) + 2;
	char *s = malloc(n);
	(void) end;
	snprintf(s, n, "%s/%s", a, b);
	return s;
}

void g_free(void *p) {
	free(p);
}

/* Minimal fits lifecycle for the extracted BandingEngine/backgroundnoise
 * (the reference's copyfits/new_fit_image, image_format_fits.c:958,1194,
 * do cfitsio bookkeeping the harness doesn't need; only the flag combo
 * CP_ALLOC|CP_FORMAT|CP_COPYA is exercised). */
static void fits_alloc(fits *f, int rx, int ry, int nlayers) {
	long npix = (long) rx * ry;
	int l;
	f->rx = rx;
	f->ry = ry;
	f->naxis = (nlayers == 3) ? 3 : 2;
	f->naxes[0] = rx;
	f->naxes[1] = ry;
	f->naxes[2] = nlayers;
	f->data = realloc(f->data, npix * nlayers * sizeof(WORD));
	for (l = 0; l < 3; l++)
		f->pdata[l] = f->data + npix * ((l < nlayers) ? l : 0);
}

int copyfits(fits *from, fits *to, unsigned char oper, int layer) {
	(void) layer;
	if (oper & (CP_ALLOC | CP_FORMAT)) {
		fits_alloc(to, from->rx, from->ry, (int) from->naxes[2]);
		if (!(oper & CP_COPYA))
			/* the reference leaves fresh CP_ALLOC data uninitialized;
			 * in practice a fresh large malloc is zeroed mmap memory
			 * (what shift()'s uncovered pixels observably contain) —
			 * pin that so the goldens are deterministic */
			memset(to->data, 0, (long) from->rx * from->ry
					* from->naxes[2] * sizeof(WORD));
	}
	if (oper & CP_COPYA)
		memcpy(to->data, from->data,
				(long) from->rx * from->ry * from->naxes[2] * sizeof(WORD));
	if (oper & CP_INIT)
		memset(to->data, 0,
				(long) from->rx * from->ry * from->naxes[2] * sizeof(WORD));
	return 0;
}

int new_fit_image(fits *fit, int width, int height, int nblayer) {
	fits_alloc(fit, width, height, nblayer);
	memset(fit->data, 0,
			(long) width * height * nblayer * sizeof(WORD));
	return 0;
}

void clearfits(fits *fit) {
	free(fit->data);
	fit->data = NULL;
}

/* cvCalculH capture stub (see shim/opencv/opencv.h): records the final
 * matched star pairs new_star_match feeds to the RANSAC homography —
 * that correspondence set is the matcher's golden output. */
#define HAVE_OPENCV 1   /* atpmatch.h gates its content behind this;
                           no OpenCV code is pulled in (capture stub) */
#include "registration/matching/misc.h"    /* TRANS, used by atpmatch.h */
#include "registration/matching/atpmatch.h"
#include "opencv/opencv.h"

int h_captured_n = 0;
double h_captured[4096][4];

int cvCalculH(s_star *star_array_img, struct s_star *star_array_ref,
		int n, Homography *H) {
	int i;
	h_captured_n = (n > 4096) ? 4096 : n;
	for (i = 0; i < h_captured_n; i++) {
		h_captured[i][0] = star_array_img[i].x;
		h_captured[i][1] = star_array_img[i].y;
		h_captured[i][2] = star_array_ref[i].x;
		h_captured[i][3] = star_array_ref[i].y;
	}
	H->h00 = 1; H->h01 = 0; H->h02 = 0;
	H->h10 = 0; H->h11 = 1; H->h12 = 0;
	H->h20 = 0; H->h21 = 0; H->h22 = 1;
	H->Inliers = n;
	return 0;
}

/* glib string dup for ser.c */
gchar *g_strndup(const char *s, size_t n) {
	char *out = malloc(n + 1);
	memcpy(out, s, n);
	out[n] = '\0';
	return out;
}

/* GTK memory-display stub for the compiled seqfile.c */
void update_used_memory(void) {
}

/* GTK dialog stub for the compiled image_formats_internal.c */
void show_dialog(const char *text, const char *title, const char *icon) {
	(void) text;
	(void) title;
	(void) icon;
}

/* glib basename (last '/' component, dup'd) for the formats TU's logs */
gchar *g_path_get_basename(const char *file_name) {
	const char *slash = strrchr(file_name, '/');
	return g_strndup(slash ? slash + 1 : file_name,
			strlen(slash ? slash + 1 : file_name));
}

/* glib left-trim-in-place (g_strchug moves the string down) */
gchar *g_strchug(gchar *string) {
	char *start = string;
	while (*start == ' ' || *start == '\t' || *start == '\n'
			|| *start == '\r' || *start == '\f' || *start == '\v')
		start++;
	memmove(string, start, strlen(start) + 1);
	return string;
}

/* linkage stubs for the compiled seqfile.c's buildseqfile path (the
 * harness goldens exercise read/writeseqfile only) */
int stat_file(const char *filename, image_type *type, char **realname) {
	(void) filename;
	(void) realname;
	*type = TYPEFITS;
	return 0;
}

void get_possible_image_filename(sequence *seq, int image_number,
		char *name_buffer) {
	sprintf(name_buffer, "%s%.*d.fit", seq->seqname, seq->fixed,
			image_number);
}
