/* Golden generator for the reference's BUNDLED RANSAC findHomography
 * (the 20th anchor suite, VERDICT round-2 Missing #3).
 *
 * Compiles, VERBATIM, the homography path of the bundled OpenCV-2
 * calib3d sources the reference links into registration
 * (src/opencv/findHomography/):
 *   - fundam.cpp:48-291      icvCompressPoints, CvHomographyEstimator
 *                            (runKernel DLT + Hartley normalization,
 *                            computeReprojError, LM refine),
 *                            cvFindHomography
 *   - modelest.cpp:54-361    CvModelEstimator2 (runRANSAC incl. the
 *                            adaptive-iteration rule, runLMeDS,
 *                            getSubset with the exact OpenCV MWC RNG,
 *                            degenerate-subset check)
 *   - calibration.cpp:61-300 CvLevMarq (the damped-normal-equations
 *                            solver refine() drives)
 * against shim/opencv/cvcore.hpp (CvMat + the exact cvRandInt MWC RNG +
 * symmetric Jacobi eigen/SVD — see that header's notes).
 *
 * The reference's call is cvCalculH (src/opencv/opencv.cpp:207-240):
 * findHomography(img, ref, CV_RANSAC, 3.0, mask) on up to 2000 star
 * pairs; this driver reproduces exactly that entry (C API form, points
 * already 64FC2 like the Point2f vectors after promotion).
 *
 * Output record (tests/goldens/c_homography.bin, little endian):
 *   i32 n, f64 noise, f64 outlier_frac,
 *   f64 src[n*2], f64 dst[n*2],
 *   i32 ret, f64 H[9], u8 mask[n], i32 inliers
 */

#include "shim/opencv/cvcore.hpp"

#include "gen/modelest_decl.inc"   /* _modelest.h:51-81  */
#include "gen/levmarq_decl.inc"    /* calib3d.hpp:376-410 */

using namespace cv;

CV_IMPL int cvRANSACUpdateNumIters(double p, double ep, int model_points,
                                   int max_iters);
CV_IMPL int cvFindHomography(const CvMat* objectPoints,
                             const CvMat* imagePoints, CvMat* __H,
                             int method, double ransacReprojThreshold,
                             CvMat* mask);

#include "gen/levmarq_body.inc"    /* calibration.cpp:61-300 */
#include "gen/modelest_body.inc"   /* modelest.cpp:54-361 */
#include "gen/fundam_homography.inc" /* fundam.cpp:48-291 */

/* ------------------------------------------------------ fixture driver */

static uint64_t fx_state = 0x243F6A8885A308D3ull;
static double fx_uniform(void) {
    fx_state ^= fx_state << 13;
    fx_state ^= fx_state >> 7;
    fx_state ^= fx_state << 17;
    return (double)(fx_state >> 11) / (double)(1ull << 53);
}
static double fx_gauss(void) {
    double u1 = fx_uniform(), u2 = fx_uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}

static void apply_h(const double H[9], double x, double y,
                    double* ox, double* oy) {
    double w = H[6] * x + H[7] * y + H[8];
    *ox = (H[0] * x + H[1] * y + H[2]) / w;
    *oy = (H[3] * x + H[4] * y + H[5]) / w;
}

static void emit_case(FILE* f, int n, double angle_deg, double scale,
                      double tx, double ty, double persp,
                      double noise, double outlier_frac) {
    std::vector<double> src(n * 2), dst(n * 2);
    double a = angle_deg * M_PI / 180.0;
    double H[9] = {scale * cos(a), -scale * sin(a), tx,
                   scale * sin(a),  scale * cos(a), ty,
                   persp, -persp, 1.0};
    int nout = (int)(outlier_frac * n + 0.5);
    for (int i = 0; i < n; i++) {
        double x = 16 + fx_uniform() * 2016, y = 16 + fx_uniform() * 2016;
        src[2 * i] = x;
        src[2 * i + 1] = y;
        double ox, oy;
        apply_h(H, x, y, &ox, &oy);
        if (i < nout) {
            /* far outlier: >= 25 px from the true projection */
            double dx, dy;
            do {
                dx = 16 + fx_uniform() * 2016 - ox;
                dy = 16 + fx_uniform() * 2016 - oy;
            } while (dx * dx + dy * dy < 25 * 25);
            dst[2 * i] = ox + dx;
            dst[2 * i + 1] = oy + dy;
        } else {
            dst[2 * i] = ox + noise * fx_gauss();
            dst[2 * i + 1] = oy + noise * fx_gauss();
        }
    }

    CvMat matSrc = cvMat(1, n, CV_64FC2, src.data());
    CvMat matDst = cvMat(1, n, CV_64FC2, dst.data());
    double Hout[9];
    memset(Hout, 0, sizeof Hout);
    CvMat matH = cvMat(3, 3, CV_64FC1, Hout);
    std::vector<uchar> mask(n, 0);
    CvMat matMask = cvMat(1, n, CV_8UC1, mask.data());

    /* exactly cvCalculH's call: src=img stars, dst=ref stars, RANSAC,
     * reprojection threshold 3 px (opencv.cpp:47,221) */
    int ret = cvFindHomography(&matSrc, &matDst, &matH, CV_RANSAC, 3.0,
                               &matMask);

    int inliers = 0;
    for (int i = 0; i < n; i++) inliers += mask[i] != 0;

    int32_t n32 = n;
    fwrite(&n32, 4, 1, f);
    fwrite(&noise, 8, 1, f);
    fwrite(&outlier_frac, 8, 1, f);
    fwrite(src.data(), 8, src.size(), f);
    fwrite(dst.data(), 8, dst.size(), f);
    int32_t r32 = ret;
    fwrite(&r32, 4, 1, f);
    fwrite(Hout, 8, 9, f);
    fwrite(mask.data(), 1, n, f);
    int32_t in32 = inliers;
    fwrite(&in32, 4, 1, f);
}

int main(int argc, char** argv) {
    const char* out = argc > 1 ? argv[1] : "../tests/goldens/c_homography.bin";
    FILE* f = fopen(out, "wb");
    if (!f) { perror(out); return 1; }

    static const int ns[] = {10, 20, 50, 200, 500};
    static const double outs[] = {0.0, 0.2, 0.4};
    static const double noises[] = {0.0, 0.3};
    int rec = 0;
    for (int ni = 0; ni < 5; ni++)
        for (int oi = 0; oi < 3; oi++)
            for (int si = 0; si < 2; si++) {
                /* two geometry flavors per config: pure affine and mild
                 * perspective (the reference fits full homographies) */
                emit_case(f, ns[ni], 2.0 + 0.5 * rec, 1.0 + 0.002 * (rec % 7),
                          12.5, -7.25, 0.0, noises[si], outs[oi]);
                rec++;
                emit_case(f, ns[ni], -1.5 - 0.3 * (rec % 5), 0.995,
                          -20.0, 31.0, 1e-6, noises[si], outs[oi]);
                rec++;
            }
    fclose(f);
    fprintf(stderr, "c_homography.bin: %d records\n", rec);
    return 0;
}
