/* Golden suite 23: the reference's OWN MP4/WEBM exporter, compiled.
 *
 * src/io/mp4_output.c (mp4_create :403, mp4_add_frame :495, mp4_close
 * :508) builds whole-TU against the shim headers and the system
 * libavformat/libavcodec — exactly the stack the reference links when
 * HAVE_FFMPEG is set. The harness feeds deterministic WORD fits frames
 * through it and embeds the resulting H.264 MP4 and VP9/VP8 WEBM files
 * in the golden, alongside the input frames, so the Python side can
 * (a) decode the reference's own output with siriltpu's film decoder
 * and (b) prove siriltpu's FilmEncoder produces an equivalent stream
 * (same geometry/frame count/fps/codec family, comparable fidelity).
 *
 * Helpers the TU links against (normally from core/utils.c and the
 * GUI): round_to_BYTE, computePente — re-implemented here with the
 * documented default cutoffs lo=0 / hi=65535 (fresh layers,
 * core/siril.h layer defaults), the state a scripted export sees.
 *
 * Output format (little-endian):
 *   magic "MP4G"
 *   u32 nframes, nlayers, height, width; f64 fps; u32 quality
 *   frames: nframes x nlayers*height*width u16 (fits order:
 *           channel-planar, bottom-up rows)
 *   u32 mp4_size;  mp4 bytes   (H.264, from the compiled reference)
 *   u32 webm_size; webm bytes  (VP9/VP8, from the compiled reference)
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "core/siril.h"
#include "core/proto.h"
#include "io/mp4_output.h"

/* ---- reference helpers the TU calls ---- */

BYTE round_to_BYTE(double x) {
	if (x <= 0.0)
		return (BYTE)0;
	if (x > UCHAR_MAX)
		return UCHAR_MAX;
	return (BYTE)(x + 0.5);
}

float computePente(WORD *lo, WORD *hi) {
	*hi = 65535;
	*lo = 0;
	return 255.0f / 65535.0f;
}

char *siril_log_message(const char *format, ...) {
	return NULL;
}

/* removed from ffmpeg 5 (no-op since ffmpeg 4); the 2017-era TU calls it */
void av_register_all(void) {}

/* ---- fixtures ---- */

static void fill_frame(fits *fit, int idx, int nlayers, int h, int w) {
	memset(fit, 0, sizeof(*fit));
	fit->rx = w;
	fit->ry = h;
	fit->naxes[0] = w;
	fit->naxes[1] = h;
	fit->naxes[2] = nlayers;
	fit->naxis = nlayers == 3 ? 3 : 2;
	fit->data = calloc((size_t)w * h * nlayers, sizeof(WORD));
	for (int c = 0; c < nlayers; c++) {
		fit->pdata[c] = fit->data + (size_t)c * w * h;
	}
	if (nlayers == 1) {
		fit->pdata[1] = fit->pdata[2] = fit->pdata[0];
	}
	for (int c = 0; c < nlayers; c++) {
		for (int y = 0; y < h; y++) {
			for (int x = 0; x < w; x++) {
				double v = 20000.0
					+ 15000.0 * sin(0.13 * x + 0.21 * y + idx * 0.5 + c)
					+ 12000.0 * cos(0.07 * x - 0.11 * y + c * 2.0);
				if (((x + idx) % 19 == 3) && (y % 17 == 5)) v += 30000.0;
				if (v < 0) v = 0;
				if (v > 65535) v = 65535;
				fit->pdata[c][(size_t)y * w + x] = (WORD)(v + 0.5);
			}
		}
	}
}

static void w32(FILE *f, uint32_t v) { fwrite(&v, 4, 1, f); }

static int embed_file(FILE *out, const char *path) {
	FILE *f = fopen(path, "rb");
	if (!f) { w32(out, 0); return 1; }
	fseek(f, 0, SEEK_END);
	long n = ftell(f);
	fseek(f, 0, SEEK_SET);
	uint8_t *buf = malloc(n);
	if (fread(buf, 1, n, f) != (size_t)n) { fclose(f); free(buf); return 1; }
	fclose(f);
	w32(out, (uint32_t)n);
	fwrite(buf, 1, n, out);
	free(buf);
	return 0;
}

int main(int argc, char **argv) {
	if (argc < 2) {
		fprintf(stderr, "usage: %s out.bin\n", argv[0]);
		return 1;
	}
	const int NF = 8, NL = 3, H = 64, W = 96, FPS = 10, QUAL = 3;
	fits frames[8];
	for (int i = 0; i < NF; i++)
		fill_frame(&frames[i], i, NL, H, W);

	const char *mp4_path = "build/ref_out.mp4";
	const char *webm_path = "build/ref_out.webm";
	struct mp4_struct *m;

	m = mp4_create(mp4_path, W, H, FPS, NL, QUAL, W, H);
	if (!m) { fprintf(stderr, "mp4_create failed\n"); return 1; }
	for (int i = 0; i < NF; i++)
		if (mp4_add_frame(m, &frames[i]) < 0) {
			fprintf(stderr, "mp4_add_frame %d failed\n", i);
			return 1;
		}
	mp4_close(m);

	m = mp4_create(webm_path, W, H, FPS, NL, QUAL, W, H);
	if (!m) { fprintf(stderr, "webm mp4_create failed\n"); return 1; }
	for (int i = 0; i < NF; i++)
		if (mp4_add_frame(m, &frames[i]) < 0) {
			fprintf(stderr, "webm add_frame %d failed\n", i);
			return 1;
		}
	mp4_close(m);

	FILE *out = fopen(argv[1], "wb");
	fwrite("MP4G", 1, 4, out);
	w32(out, NF); w32(out, NL); w32(out, H); w32(out, W);
	double fps = FPS;
	fwrite(&fps, 8, 1, out);
	w32(out, QUAL);
	for (int i = 0; i < NF; i++)
		fwrite(frames[i].data, sizeof(WORD), (size_t)NL * H * W, out);
	if (embed_file(out, mp4_path)) { fprintf(stderr, "embed mp4\n"); return 1; }
	if (embed_file(out, webm_path)) { fprintf(stderr, "embed webm\n"); return 1; }
	fclose(out);
	printf("c_mp4: %d frames, reference H.264+WEBM embedded\n", NF);
	return 0;
}
