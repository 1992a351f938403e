// Golden suite 22: the REAL system OpenCV as the anchor for the
// geometric kernels the reference delegates to cv::resize /
// cv::warpPerspective / cv::warpAffine (src/opencv/opencv.cpp:
// cvResizeGaussian :80, cvRotateImage :131, cvTransformImage :242 —
// all CV_16UC?, default BORDER_CONSTANT 0).
//
// The reference links the distro's OpenCV for these three entry points
// (only findHomography and ECC are bundled in-tree, and suites 20/21
// anchor those); this suite runs the distro OpenCV (4.6 here) on
// deterministic fixtures and records input+output so
// tests/test_cv_goldens.py can diff siriltpu's float32 samplers
// against the genuine fixed-point OpenCV results.
//
// Output format (little-endian), documented for the Python reader:
//   magic  "CVG1"
//   u32 nrecords
//   per record:
//     u32 op           0 = resize, 1 = warpPerspective, 2 = warpAffine
//     i32 interp       the reference's enum 0..4 (== cv::INTER_*)
//     u32 in_h, in_w, out_h, out_w
//     f64 params[9]    op 1: the FORWARD H (row-major) as the reference
//                      passes it; op 2: rows of the 2x3 affine M in
//                      [0..5] + angle in [6]; op 0: unused (zeros)
//     u16 input [in_h * in_w]
//     u16 output[out_h * out_w]

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

namespace {

FILE *out_fp = nullptr;
uint32_t nrecords = 0;

void w32(uint32_t v) { fwrite(&v, 4, 1, out_fp); }
void wf64(double v) { fwrite(&v, 8, 1, out_fp); }

// deterministic fixture image: smooth 2-D waves + a grid of bright
// point sources (so every interpolation kernel sees both band-limited
// and impulsive content), full 16-bit range
cv::Mat fixture(int h, int w, int variant) {
    cv::Mat m(h, w, CV_16UC1);
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            double v = 12000.0
                + 9000.0 * std::sin(0.11 * x + 0.07 * y + variant)
                + 7000.0 * std::cos(0.23 * x - 0.05 * y)
                + 4000.0 * std::sin(0.02 * x * y / (1.0 + variant));
            if ((x % 17 == 5) && (y % 13 == 7)) v += 48000.0;
            if (v < 0) v = 0;
            if (v > 65535) v = 65535;
            m.at<uint16_t>(y, x) = (uint16_t)(v + 0.5);
        }
    }
    return m;
}

void emit(uint32_t op, int interp, const cv::Mat &in, const cv::Mat &out,
          const double *params9) {
    w32(op);
    int32_t ip = interp;
    fwrite(&ip, 4, 1, out_fp);
    w32(in.rows); w32(in.cols); w32(out.rows); w32(out.cols);
    for (int i = 0; i < 9; i++) wf64(params9 ? params9[i] : 0.0);
    for (int y = 0; y < in.rows; y++)
        fwrite(in.ptr<uint16_t>(y), 2, in.cols, out_fp);
    for (int y = 0; y < out.rows; y++)
        fwrite(out.ptr<uint16_t>(y), 2, out.cols, out_fp);
    nrecords++;
}

}  // namespace

int main(int argc, char **argv) {
    if (argc < 2) { std::fprintf(stderr, "usage: %s out.bin\n", argv[0]);
                    return 1; }
    out_fp = std::fopen(argv[1], "wb");
    std::fwrite("CVG1", 1, 4, out_fp);
    long nrec_pos = std::ftell(out_fp);
    w32(0);  // patched at the end

    cv::Mat imgA = fixture(64, 96, 0);
    cv::Mat imgB = fixture(37, 53, 1);

    // ---- op 0: cv::resize, every enum value 0..4, up/down/odd scales
    struct RS { const cv::Mat *src; int w, h; };
    const RS rs[] = {
        {&imgA, 192, 128}, {&imgA, 48, 32}, {&imgA, 40, 23},
        {&imgA, 80, 96},   {&imgB, 106, 74}, {&imgB, 27, 19},
    };
    for (const RS &r : rs) {
        for (int interp = 0; interp <= 4; interp++) {
            cv::Mat dst;
            cv::resize(*r.src, dst, cv::Size(r.w, r.h), 0, 0, interp);
            emit(0, interp, *r.src, dst, nullptr);
        }
    }

    // ---- op 1: cv::warpPerspective with the FORWARD matrix, same-size
    // output, constant-0 border (cvTransformImage semantics)
    const double Hs[][9] = {
        // pure fractional translation (no half-pixel knife edges)
        {1, 0, 2.3,   0, 1, -1.7,  0, 0, 1},
        // rotation 10 deg + scale 0.95 about the image center
        {0, 0, 0,  0, 0, 0,  0, 0, 0},  // filled below
        // mild true perspective
        {1.01, 0.02, -1.2,  -0.015, 0.99, 2.4,  1.1e-4, -6e-5, 1},
    };
    double Hrot[9];
    {
        double a = 10.0 * CV_PI / 180.0, s = 0.95;
        double cx = 96 / 2.0, cy = 64 / 2.0;
        double c = s * std::cos(a), sn = s * std::sin(a);
        Hrot[0] = c;  Hrot[1] = -sn; Hrot[2] = cx - c * cx + sn * cy;
        Hrot[3] = sn; Hrot[4] = c;   Hrot[5] = cy - sn * cx - c * cy;
        Hrot[6] = 0;  Hrot[7] = 0;   Hrot[8] = 1;
    }
    for (int k = 0; k < 3; k++) {
        const double *H = (k == 1) ? Hrot : Hs[k];
        cv::Mat M(3, 3, CV_64FC1);
        for (int i = 0; i < 9; i++) M.at<double>(i / 3, i % 3) = H[i];
        for (int interp = 0; interp <= 4; interp++) {
            cv::Mat dst;
            cv::warpPerspective(imgA, dst, M, imgA.size(), interp);
            emit(1, interp, imgA, dst, H);
        }
    }

    // ---- op 3: cvUnsharpFilter (opencv.cpp:311-335) — GaussianBlur
    // with automatic kernel size (Size() -> round(4*sigma)*2+1 for
    // 16U) + the MatExpr blend in*(1+amount) - blur*amount.
    // params[0] = sigma, params[1] = amount.
    {
        const double cases[][2] = {
            {1.0, 0.0}, {2.5, 0.0}, {3.0, 1.3}, {0.8, 0.5}, {5.0, 2.0}};
        for (const double *sa : cases) {
            cv::Mat blur, outm;
            cv::GaussianBlur(imgA, blur, cv::Size(), sa[0]);
            if (std::fabs(sa[1]) > 0.0) {
                cv::Mat sharpened = imgA * (1 + sa[1]) + blur * (-sa[1]);
                outm = sharpened.clone();
            } else {
                outm = blur;
            }
            double p[9] = {sa[0], sa[1], 0, 0, 0, 0, 0, 0, 0};
            emit(3, 0, imgA, outm, p);
        }
    }

    // ---- op 2: cv::warpAffine rotation about the center, cropped
    // (cvRotateImage's getRotationMatrix2D path, opencv.cpp:151-153)
    for (double angle : {10.0, -37.0}) {
        cv::Point2f pt(imgA.cols / 2.0f, imgA.rows / 2.0f);
        cv::Mat r = cv::getRotationMatrix2D(pt, angle, 1.0);
        double p[9] = {r.at<double>(0, 0), r.at<double>(0, 1),
                       r.at<double>(0, 2), r.at<double>(1, 0),
                       r.at<double>(1, 1), r.at<double>(1, 2), angle, 0, 0};
        for (int interp = 0; interp <= 4; interp++) {
            cv::Mat dst;
            cv::warpAffine(imgA, dst, r, imgA.size(), interp);
            emit(2, interp, imgA, dst, p);
        }
    }

    std::fseek(out_fp, nrec_pos, SEEK_SET);
    w32(nrecords);
    std::fclose(out_fp);
    std::fprintf(stdout, "c_cvgeom: %u records (OpenCV %s)\n", nrecords,
                 CV_VERSION);
    return 0;
}
