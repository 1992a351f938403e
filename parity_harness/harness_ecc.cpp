/* Golden generator for the reference's bundled ECC aligner (the 21st
 * anchor suite — the VERDICT round-2 item 6 stretch).
 *
 * Compiles src/opencv/ecc/ecc.cpp VERBATIM (whole TU, -DHAVE_OPENCV)
 * against the mini cv::Mat shim (shim/opencv2/core/core.hpp): the
 * Evangelidis–Psarakis iteration — 5x5 fixed Gaussian, [-.5 0 .5]
 * gradients, masked zero-means, illumination lambda, Gauss-Newton
 * update, the 50-iteration/1e-3 termination, and the Siril entry
 * findTransform (ecc.cpp:556) including its CV_16U -> CV_8U SATURATING
 * convert (pixels > 255 clip) and translation-only mode.
 *
 * Fixtures: u16 planet-style templates (soft disk + surface detail +
 * noise, values kept in 8-bit range so the saturating convert leaves
 * signal, like real captures the reference aligns) and inputs sampled
 * at known sub-pixel translations.
 *
 * Record (tests/goldens/c_ecc.bin, little endian):
 *   i32 h, w; f64 true_dx, true_dy;
 *   u16 ref[h*w]; u16 img[h*w];
 *   i32 retvalue; f32 dx, dy
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <vector>

#include "core/siril.h"
#include "opencv/ecc/ecc.h"

static uint64_t st = 0x9E3779B97F4A7C15ull;
static double frnd(void) {
    st ^= st << 13; st ^= st >> 7; st ^= st << 17;
    return (double)(st >> 11) / (double)(1ull << 53);
}
static double gauss(void) {
    double u1 = frnd(), u2 = frnd();
    if (u1 < 1e-300) u1 = 1e-300;
    return sqrt(-2.0 * log(u1)) * cos(2 * M_PI * u2);
}

/* smooth planet-like scene, f64, values ~[10, 230] */
static void make_scene(std::vector<double>& base, int h, int w) {
    base.assign((size_t)h * w, 0.0);
    double cx = w * 0.5 + 7.3, cy = h * 0.5 - 4.1, R = 0.33 * (h < w ? h : w);
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
            double r = sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy));
            double disk = 200.0 / (1.0 + exp((r - R) * 0.8));
            double bands = 25.0 * sin(0.12 * (y - cy)) * (r < R ? 1.0 : 0.0);
            double spots = 18.0 * sin(0.33 * x) * cos(0.21 * y)
                           * (r < 0.8 * R ? 1.0 : 0.0);
            base[(size_t)y * w + x] = 12.0 + disk + bands + spots;
        }
}

static double sample(const std::vector<double>& b, int h, int w, double x,
                     double y) {
    int x0 = (int)floor(x), y0 = (int)floor(y);
    double fx = x - x0, fy = y - y0;
    double acc = 0;
    for (int dy = 0; dy < 2; dy++)
        for (int dx = 0; dx < 2; dx++) {
            int xx = x0 + dx, yy = y0 + dy;
            double v = (xx >= 0 && xx < w && yy >= 0 && yy < h)
                           ? b[(size_t)yy * w + xx]
                           : 12.0;
            acc += (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy) * v;
        }
    return acc;
}

int main(int argc, char** argv) {
    const char* out = argc > 1 ? argv[1] : "../tests/goldens/c_ecc.bin";
    FILE* f = fopen(out, "wb");
    if (!f) { perror(out); return 1; }

    const int h = 240, w = 320;
    std::vector<double> base;
    make_scene(base, h, w);

    static const double shifts[][2] = {
        {0.0, 0.0},   {3.0, -2.0},  {-5.0, 4.0},  {1.5, 2.25},
        {-0.75, -3.5}, {7.25, 0.5}, {0.0, -6.75}, {9.5, 8.25},
        {-8.0, -7.5}, {2.125, -4.875},
    };
    const int ncase = sizeof(shifts) / sizeof(shifts[0]);

    for (int t = 0; t < ncase; t++) {
        double dx = shifts[t][0], dy = shifts[t][1];
        std::vector<WORD> ref((size_t)h * w), img((size_t)h * w);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                double rv = base[(size_t)y * w + x] + 2.0 * gauss();
                double iv = sample(base, h, w, x + dx, y + dy) + 2.0 * gauss();
                ref[(size_t)y * w + x] =
                    (WORD)(rv < 0 ? 0 : rv > 65535 ? 65535 : rv + 0.5);
                img[(size_t)y * w + x] =
                    (WORD)(iv < 0 ? 0 : iv > 65535 ? 65535 : iv + 0.5);
            }

        fits fref, fim;
        memset(&fref, 0, sizeof fref);
        memset(&fim, 0, sizeof fim);
        fref.rx = w; fref.ry = h; fref.naxes[2] = 1;
        fim.rx = w; fim.ry = h; fim.naxes[2] = 1;
        fref.data = ref.data();
        fref.pdata[0] = fref.pdata[1] = fref.pdata[2] = ref.data();
        fim.data = img.data();
        fim.pdata[0] = fim.pdata[1] = fim.pdata[2] = img.data();

        reg_ecc rp;
        memset(&rp, 0, sizeof rp);
        int ret = findTransform(&fref, &fim, 0, &rp);

        int32_t v;
        v = h; fwrite(&v, 4, 1, f);
        v = w; fwrite(&v, 4, 1, f);
        fwrite(&dx, 8, 1, f);
        fwrite(&dy, 8, 1, f);
        fwrite(ref.data(), 2, ref.size(), f);
        fwrite(img.data(), 2, img.size(), f);
        v = ret; fwrite(&v, 4, 1, f);
        fwrite(&rp.dx, 4, 1, f);
        fwrite(&rp.dy, 4, 1, f);
        fprintf(stderr, "case %d: true=(%.3f, %.3f) ret=%d ecc dx=%.4f dy=%.4f\n",
                t, dx, dy, ret, rp.dx, rp.dy);
    }
    fclose(f);
    return 0;
}
