/* Harness support: the two histogram builders statistics.c calls (same
 * semantics as the reference's gui/histogram.c:111-150, re-stated here
 * because that file is GTK-bound), get_normalized_value (utils.c:454-459
 * via image_find_minmax), and the `com` global demosaicing.c's unused
 * fits-level path references. */
#include "core/siril.h"
#include "core/proto.h"
#include "gui/histogram.h"

cominfo com;
fits gfit;   /* reget_rawdata (reconstr.c:126-127) stores Nl/Nc here */

WORD get_normalized_value(fits *fit) {
	/* image_find_minmax over all layers, then UCHAR_MAX if maxi <= 255 */
	unsigned short maxi = 0;
	int nlayers = (fit->naxis == 3) ? 3 : 1;
	long npix = (long) fit->rx * fit->ry;
	int l;
	long i;
	for (l = 0; l < nlayers; l++)
		for (i = 0; i < npix; i++)
			if (fit->pdata[l][i] > maxi)
				maxi = fit->pdata[l][i];
	fit->maxi = maxi;
	if (fit->maxi <= UCHAR_MAX)
		return UCHAR_MAX;
	return USHRT_MAX;
}

gsl_histogram *computeHisto(fits *fit, int layer) {
	size_t i, ndata, size;
	WORD *buf;
	size = (size_t) get_normalized_value(fit);
	gsl_histogram *histo = gsl_histogram_alloc(size + 1);
	gsl_histogram_set_ranges_uniform(histo, 0, size);
	buf = fit->pdata[layer];
	ndata = (size_t) fit->rx * fit->ry;
	for (i = 0; i < ndata; i++)
		gsl_histogram_increment(histo, (double) buf[i]);
	return histo;
}

gsl_histogram *computeHisto_Selection(fits *fit, int layer,
		rectangle *selection) {
	WORD *from;
	size_t stridefrom, i, j, size;
	size = (size_t) get_normalized_value(fit);
	gsl_histogram *histo = gsl_histogram_alloc(size + 1);
	gsl_histogram_set_ranges_uniform(histo, 0, size);
	from = fit->pdata[layer]
			+ (fit->ry - selection->y - selection->h) * fit->rx + selection->x;
	stridefrom = fit->rx - selection->w;
	for (i = 0; i < (size_t) selection->h; i++) {
		for (j = 0; j < (size_t) selection->w; j++) {
			gsl_histogram_increment(histo, (double) *from);
			from++;
		}
		from += stridefrom;
	}
	return histo;
}

/* Logging/undo stubs for the extracted histogram.c / photometry.c blocks.
 * The reference versions write to the GTK console / swap undo files; the
 * harness only needs the calls to compile and be side-effect free. */
#include <stdarg.h>

char *siril_log_message(const char *format, ...) {
	(void) format;
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
