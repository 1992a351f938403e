/* Mini cv::Mat shim for compiling the reference's bundled ECC aligner
 * (src/opencv/ecc/ecc.cpp) VERBATIM without OpenCV — the ECC analog of
 * shim/opencv/cvcore.hpp (findHomography) and shim/gsl (minigsl).
 *
 * Scope: exactly the API ecc.cpp touches — single-channel f32/u8/u16
 * Mats with column-range views, eager elementwise/matrix operators,
 * the fixed 5x5 Gaussian, [-.5 0 .5] derivative filters, inverse-map
 * bilinear/nearest warps with constant-0 borders, masked meanStdDev /
 * subtract (including OpenCV's leave-unmasked-pixels-unchanged
 * semantics), and a small-matrix LU inverse.
 *
 * Known numeric deltas vs real OpenCV (documented in PARITY.md): warps
 * interpolate with float weights instead of OpenCV's 1/32-quantized
 * fixed-point tables; reductions (dot/norm/mean) accumulate in double
 * like OpenCV's f32 paths.
 */
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

#define CV_8U 0
#define CV_16U 2
#define CV_32F 5
#define CV_8UC1 CV_8U
#define CV_16UC1 CV_16U
#define CV_32FC1 CV_32F

enum { INTER_NEAREST = 0, INTER_LINEAR = 1, WARP_INVERSE_MAP = 16,
       THRESH_BINARY = 0 };

static inline int cvIsNaN(double v) { return v != v; }

namespace cv {

struct Size {
    int width = 0, height = 0;
    Size() {}
    Size(int w, int h) : width(w), height(h) {}
    bool operator==(const Size& o) const {
        return width == o.width && height == o.height;
    }
};

struct Scalar {
    double val[4] = {0, 0, 0, 0};
    Scalar() {}
    Scalar(double v) { val[0] = v; }
};

struct TermCriteria {
    enum { COUNT = 1, MAX_ITER = COUNT, EPS = 2 };
    int type = 0;
    int maxCount = 0;
    double epsilon = 0;
    TermCriteria() {}
    TermCriteria(int t, int c, double e) : type(t), maxCount(c), epsilon(e) {}
};

static inline int elem_size(int typ) {
    return typ == CV_32F ? 4 : (typ == CV_16U ? 2 : 1);
}

class Mat {
public:
    int rows = 0, cols = 0;
    int typ = CV_32FC1;
    size_t step = 0;  /* ELEMENTS per parent row */
    uint8_t* data = nullptr;
    std::shared_ptr<std::vector<uint8_t>> buf;
    bool is_view = false;

    Mat() {}
    Mat(int r, int c, int t) { create(r, c, t); }
    Mat(int r, int c, int t, void* external) {
        rows = r; cols = c; typ = t; step = c;
        data = (uint8_t*)external;
    }
    void create(int r, int c, int t) {
        rows = r; cols = c; typ = t; step = c; is_view = false;
        buf = std::make_shared<std::vector<uint8_t>>(
            (size_t)r * c * elem_size(t), 0);
        data = buf->data();
    }

    /* OpenCV semantics: Mat-to-Mat assignment REBINDS the header
     * (a plain header copy); only MatExpr assignment writes through —
     * that is what lets `dst.colRange(a,b) = x.mul(y)` fill a block
     * while `mat = Mat(src.colRange(...))` re-points a scratch header
     * (the hessian loop in ecc.cpp does both). */
    Mat(const Mat&) = default;
    Mat& operator=(const Mat& o) = default;
    inline Mat(const struct MatExpr& e);
    inline Mat& operator=(const struct MatExpr& e);

    bool empty() const { return data == nullptr || rows == 0; }
    Size size() const { return Size(cols, rows); }
    int type() const { return typ; }
    bool isContinuous() const { return step == (size_t)cols; }
    void release() { buf.reset(); data = nullptr; rows = cols = 0; }

    template <typename T> T* ptr(int r = 0) const {
        return (T*)(data + (size_t)r * step * elem_size(typ)) ;
    }
    template <typename T> T& at(int r, int c) const {
        return ((T*)(data + (size_t)r * step * elem_size(typ)))[c];
    }
    float fv(int r, int c) const { return at<float>(r, c); }

    Mat colRange(int c0, int c1) const {
        Mat v = *this;
        v.is_view = true;
        v.cols = c1 - c0;
        v.data = data + (size_t)c0 * elem_size(typ);
        return v;
    }
    Mat rowRange(int r0, int r1) const {
        Mat v = *this;
        v.is_view = true;
        v.rows = r1 - r0;
        v.data = data + (size_t)r0 * step * elem_size(typ);
        return v;
    }

    void copyTo(Mat& dst) const {
        if (dst.empty() || dst.rows != rows || dst.cols != cols ||
            dst.typ != typ) {
            if (dst.is_view) assert(!"copyTo size mismatch into view");
            dst.create(rows, cols, typ);
        }
        for (int r = 0; r < rows; r++)
            std::memcpy(dst.data + (size_t)r * dst.step * elem_size(typ),
                        data + (size_t)r * step * elem_size(typ),
                        (size_t)cols * elem_size(typ));
    }
    void copyTo(Mat&& dst) const {  /* copyTo(x.colRange(...)) */
        Mat& d = dst;
        assert(d.rows == rows && d.cols == cols);
        copyTo(d);
    }

    void convertTo(Mat& dst, int t, double alpha = 1, double beta = 0) const {
        Mat out;  /* handle aliasing (a.convertTo(a, ...)) */
        out.create(rows, cols, t);
        for (int r = 0; r < rows; r++)
            for (int c = 0; c < cols; c++) {
                double v;
                if (typ == CV_32F) v = at<float>(r, c);
                else if (typ == CV_16U) v = at<uint16_t>(r, c);
                else v = at<uint8_t>(r, c);
                v = v * alpha + beta;
                if (t == CV_32F) out.at<float>(r, c) = (float)v;
                else if (t == CV_16U) {
                    long q = lrint(v);
                    out.at<uint16_t>(r, c) =
                        (uint16_t)(q < 0 ? 0 : q > 65535 ? 65535 : q);
                } else {
                    long q = lrint(v);
                    out.at<uint8_t>(r, c) =
                        (uint8_t)(q < 0 ? 0 : q > 255 ? 255 : q);
                }
            }
        dst = out;  /* rebind (or write through if dst is a view) */
    }

    double dot(const Mat& o) const {
        assert(rows == o.rows && cols == o.cols && typ == CV_32F);
        double s = 0;
        for (int r = 0; r < rows; r++)
            for (int c = 0; c < cols; c++)
                s += (double)at<float>(r, c) * o.at<float>(r, c);
        return s;
    }

    inline struct MatExpr mul(const Mat& o) const;

    /* LU inverse with partial pivoting, double intermediate (the ECC
     * hessian is 2x2..8x8 SPD) */
    Mat inv_() const {
        int n = rows;
        assert(cols == n && typ == CV_32F);
        std::vector<double> a(n * n), x(n * n, 0.0);
        for (int r = 0; r < n; r++)
            for (int c = 0; c < n; c++) a[r * n + c] = at<float>(r, c);
        for (int i = 0; i < n; i++) x[i * n + i] = 1.0;
        for (int col = 0; col < n; col++) {
            int piv = col;
            for (int r = col + 1; r < n; r++)
                if (std::fabs(a[r * n + col]) > std::fabs(a[piv * n + col]))
                    piv = r;
            if (std::fabs(a[piv * n + col]) < 1e-300) {
                Mat z(n, n, CV_32F);
                return z;  /* singular: zeros, like cv::invert rc=0 */
            }
            if (piv != col)
                for (int c = 0; c < n; c++) {
                    std::swap(a[piv * n + c], a[col * n + c]);
                    std::swap(x[piv * n + c], x[col * n + c]);
                }
            double d = a[col * n + col];
            for (int c = 0; c < n; c++) { a[col * n + c] /= d; x[col * n + c] /= d; }
            for (int r = 0; r < n; r++) {
                if (r == col) continue;
                double f = a[r * n + col];
                if (f == 0) continue;
                for (int c = 0; c < n; c++) {
                    a[r * n + c] -= f * a[col * n + c];
                    x[r * n + c] -= f * x[col * n + c];
                }
            }
        }
        Mat out(n, n, CV_32F);
        for (int r = 0; r < n; r++)
            for (int c = 0; c < n; c++) out.at<float>(r, c) = (float)x[r * n + c];
        return out;
    }

    inline struct MatExpr inv() const;
    inline static struct MatExpr zeros(int r, int c, int t);
    inline static struct MatExpr ones(int r, int c, int t);
    static Mat zeros_(int r, int c, int t) { return Mat(r, c, t); }
    static Mat ones_(int r, int c, int t) {
        Mat m(r, c, t);
        for (int i = 0; i < r; i++)
            for (int j = 0; j < c; j++) {
                if (t == CV_32F) m.at<float>(i, j) = 1.0f;
                else if (t == CV_16U) m.at<uint16_t>(i, j) = 1;
                else m.at<uint8_t>(i, j) = 1;
            }
        return m;
    }
};

/* eagerly-evaluated expression result: assigning a MatExpr to a Mat
 * WRITES THROUGH when the destination already has matching storage
 * (views and preallocated mats), else rebinds — cv::MatExpr assignment
 * semantics, which differ from plain Mat header assignment. */
struct MatExpr {
    Mat m;
    MatExpr() {}
    explicit MatExpr(const Mat& mm) : m(mm) {}
    operator const Mat&() const { return m; }
};

inline Mat::Mat(const MatExpr& e) { *(Mat*)this = e.m; }
inline Mat& Mat::operator=(const MatExpr& e) {
    const Mat& o = e.m;
    if (data && rows == o.rows && cols == o.cols && typ == o.typ) {
        for (int r = 0; r < rows; r++)
            std::memcpy(data + (size_t)r * step * elem_size(typ),
                        o.data + (size_t)r * o.step * elem_size(typ),
                        (size_t)cols * elem_size(typ));
        return *this;
    }
    *this = o;  /* rebind */
    return *this;
}
inline MatExpr Mat::mul(const Mat& o) const {
    assert(rows == o.rows && cols == o.cols);
    Mat out(rows, cols, CV_32F);
    for (int r = 0; r < rows; r++)
        for (int c = 0; c < cols; c++)
            out.at<float>(r, c) = at<float>(r, c) * o.at<float>(r, c);
    return MatExpr(out);
}
inline MatExpr Mat::inv() const { return MatExpr(inv_()); }
inline MatExpr Mat::zeros(int r, int c, int t) { return MatExpr(zeros_(r, c, t)); }
inline MatExpr Mat::ones(int r, int c, int t) { return MatExpr(ones_(r, c, t)); }

/* ------------------------------------------------ eager Mat operators */

inline MatExpr operator*(const Mat& a, double s) {
    Mat out(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++)
            out.at<float>(r, c) = (float)(a.at<float>(r, c) * s);
    return MatExpr(out);
}
inline MatExpr operator*(double s, const Mat& a) { return a * s; }

inline MatExpr operator*(const Mat& a, const Mat& b) {  /* MATRIX multiply */
    assert(a.cols == b.rows && a.typ == CV_32F && b.typ == CV_32F);
    Mat out(a.rows, b.cols, CV_32F);
    for (int i = 0; i < a.rows; i++)
        for (int j = 0; j < b.cols; j++) {
            double s = 0;
            for (int k = 0; k < a.cols; k++)
                s += (double)a.at<float>(i, k) * b.at<float>(k, j);
            out.at<float>(i, j) = (float)s;
        }
    return MatExpr(out);
}

inline MatExpr operator+(const Mat& a, const Mat& b) {
    assert(a.rows == b.rows && a.cols == b.cols);
    Mat out(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++)
            out.at<float>(r, c) = a.at<float>(r, c) + b.at<float>(r, c);
    return MatExpr(out);
}
inline MatExpr operator-(const Mat& a, const Mat& b) {
    assert(a.rows == b.rows && a.cols == b.cols);
    Mat out(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++)
            out.at<float>(r, c) = a.at<float>(r, c) - b.at<float>(r, c);
    return MatExpr(out);
}
inline MatExpr operator+(const Mat& a, double s) {
    Mat out(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++)
            out.at<float>(r, c) = (float)(a.at<float>(r, c) + s);
    return MatExpr(out);
}
inline MatExpr operator-(const Mat& a, double s) { return a + (-s); }
inline MatExpr operator-(const Mat& a) { return a * -1.0; }
inline Mat& operator*=(Mat& a, double s) {
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++)
            a.at<float>(r, c) = (float)(a.at<float>(r, c) * s);
    return a;
}

/* ------------------------------------------------------- small matx */

struct Matx31f;
struct Matx13f {
    float v[3];
    Matx13f(float a, float b, float c) { v[0] = a; v[1] = b; v[2] = c; }
    Matx31f t() const;
};
struct Matx31f {
    float v[3];
    Matx31f(float a, float b, float c) { v[0] = a; v[1] = b; v[2] = c; }
};
inline Matx31f Matx13f::t() const { return Matx31f(v[0], v[1], v[2]); }

/* ------------------------------------------------- InputArray shims */

class _InputArray {
public:
    const Mat* m = nullptr;
    Mat* wm = nullptr;
    _InputArray() {}
    _InputArray(const Mat& mat) : m(&mat) {}
    _InputArray(Mat& mat) : m(&mat), wm(&mat) {}
    Mat getMat() const { return m ? *m : Mat(); }
    bool empty() const { return !m || m->empty(); }
};
typedef const _InputArray& InputArray;
typedef const _InputArray& InputOutputArray;
inline _InputArray noArray() { return _InputArray(); }

/* ------------------------------------------------ imgproc functions */

inline void divide(const Mat& a, const Mat& b, Mat& dst) {
    Mat out(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++) {
            float d = b.at<float>(r, c);
            /* cv::divide: division by zero yields 0 */
            out.at<float>(r, c) = d != 0.0f ? a.at<float>(r, c) / d : 0.0f;
        }
    dst = out;
}

inline void subtract(const Mat& a, const Scalar& s, Mat& dst,
                     const Mat& mask = Mat()) {
    /* OpenCV subtract-with-mask: unmasked DST pixels keep their
     * previous values (ecc.cpp relies on this for imageWarped) */
    if (dst.empty() || dst.rows != a.rows || dst.cols != a.cols)
        dst.create(a.rows, a.cols, CV_32F);
    for (int r = 0; r < a.rows; r++)
        for (int c = 0; c < a.cols; c++) {
            if (!mask.empty() && mask.at<uint8_t>(r, c) == 0) continue;
            dst.at<float>(r, c) = (float)(a.at<float>(r, c) - s.val[0]);
        }
}

inline void meanStdDev(const Mat& src, Scalar& mean, Scalar& stddev,
                       const Mat& mask = Mat()) {
    double s = 0, s2 = 0;
    long n = 0;
    for (int r = 0; r < src.rows; r++)
        for (int c = 0; c < src.cols; c++) {
            if (!mask.empty() && mask.at<uint8_t>(r, c) == 0) continue;
            double v = src.at<float>(r, c);
            s += v; s2 += v * v; n++;
        }
    double m = n ? s / n : 0;
    mean = Scalar(m);
    double var = n ? s2 / n - m * m : 0;
    stddev = Scalar(std::sqrt(var > 0 ? var : 0));
}

inline int countNonZero(const Mat& m) {
    int n = 0;
    for (int r = 0; r < m.rows; r++)
        for (int c = 0; c < m.cols; c++) {
            if (m.typ == CV_8U) n += m.at<uint8_t>(r, c) != 0;
            else n += m.at<float>(r, c) != 0.0f;
        }
    return n;
}

inline double norm(const Mat& m) {
    double s = 0;
    for (int r = 0; r < m.rows; r++)
        for (int c = 0; c < m.cols; c++) {
            double v = m.at<float>(r, c);
            s += v * v;
        }
    return std::sqrt(s);
}

inline void repeat(const Mat& src, int ny, int nx, Mat& dst) {
    assert(dst.rows == src.rows * ny && dst.cols == src.cols * nx);
    for (int r = 0; r < dst.rows; r++)
        for (int c = 0; c < dst.cols; c++)
            dst.at<float>(r, c) = src.at<float>(r % src.rows, c % src.cols);
}

inline void setIdentity(Mat& m, double s = 1.0) {
    for (int r = 0; r < m.rows; r++)
        for (int c = 0; c < m.cols; c++)
            m.at<float>(r, c) = (r == c) ? (float)s : 0.0f;
}

inline void threshold(InputArray src, Mat& dst, double thr, double maxval,
                      int type) {
    (void)type;  /* THRESH_BINARY only */
    Mat s = src.getMat();
    dst.create(s.rows, s.cols, CV_8U);
    for (int r = 0; r < s.rows; r++)
        for (int c = 0; c < s.cols; c++) {
            double v = s.typ == CV_8U ? s.at<uint8_t>(r, c)
                                      : s.at<float>(r, c);
            dst.at<uint8_t>(r, c) = v > thr ? (uint8_t)maxval : 0;
        }
}

/* reflect-101 index */
inline int refl101(int i, int n) {
    if (n == 1) return 0;
    while (i < 0 || i >= n) {
        if (i < 0) i = -i;
        if (i >= n) i = 2 * n - 2 - i;
    }
    return i;
}

/* GaussianBlur(Size(5,5), 0): OpenCV's fixed small kernel
 * [1 4 6 4 1]/16, border reflect-101 */
inline void GaussianBlur(const Mat& src, Mat& dst, Size ks, double s1,
                         double s2) {
    (void)s1; (void)s2;
    assert(ks.width == 5 && ks.height == 5 && src.typ == CV_32F);
    static const double k[5] = {1 / 16.0, 4 / 16.0, 6 / 16.0, 4 / 16.0,
                                1 / 16.0};
    int h = src.rows, w = src.cols;
    Mat tmp(h, w, CV_32F), out(h, w, CV_32F);
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++) {
            double s = 0;
            for (int t = -2; t <= 2; t++)
                s += k[t + 2] * src.at<float>(r, refl101(c + t, w));
            tmp.at<float>(r, c) = (float)s;
        }
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++) {
            double s = 0;
            for (int t = -2; t <= 2; t++)
                s += k[t + 2] * tmp.at<float>(refl101(r + t, h), c);
            out.at<float>(r, c) = (float)s;
        }
    dst = out;
}

/* filter2D with a 1x3 / 3x1 kernel (correlation, reflect-101) */
inline void filter2D(const Mat& src, Mat& dst, int ddepth,
                     const Matx13f& k) {
    (void)ddepth;
    Mat out(src.rows, src.cols, CV_32F);
    for (int r = 0; r < src.rows; r++)
        for (int c = 0; c < src.cols; c++) {
            double s = 0;
            for (int t = -1; t <= 1; t++)
                s += k.v[t + 1] * src.at<float>(r, refl101(c + t, src.cols));
            out.at<float>(r, c) = (float)s;
        }
    dst = out;
}
inline void filter2D(const Mat& src, Mat& dst, int ddepth,
                     const Matx31f& k) {
    (void)ddepth;
    Mat out(src.rows, src.cols, CV_32F);
    for (int r = 0; r < src.rows; r++)
        for (int c = 0; c < src.cols; c++) {
            double s = 0;
            for (int t = -1; t <= 1; t++)
                s += k.v[t + 1] * src.at<float>(refl101(r + t, src.rows), c);
            out.at<float>(r, c) = (float)s;
        }
    dst = out;
}

/* inverse-map warps, BORDER_CONSTANT(0). Only the WARP_INVERSE_MAP
 * flag form ecc.cpp uses. Float-weight bilinear (OpenCV quantizes
 * coordinates to 1/32 — documented delta). */
inline void warp_generic(const Mat& src, Mat& dst, const Mat& M, Size dsize,
                         int flags, bool perspective) {
    assert(flags & WARP_INVERSE_MAP);
    int interp = flags & 7;
    Mat out(dsize.height, dsize.width, src.typ);
    for (int y = 0; y < dsize.height; y++)
        for (int x = 0; x < dsize.width; x++) {
            double sx = M.at<float>(0, 0) * x + M.at<float>(0, 1) * y +
                        M.at<float>(0, 2);
            double sy = M.at<float>(1, 0) * x + M.at<float>(1, 1) * y +
                        M.at<float>(1, 2);
            if (perspective) {
                double w = M.at<float>(2, 0) * x + M.at<float>(2, 1) * y +
                           M.at<float>(2, 2);
                if (w != 0) { sx /= w; sy /= w; }
            }
            if (interp == INTER_NEAREST) {
                int ix = (int)lrint(sx), iy = (int)lrint(sy);
                bool in = ix >= 0 && ix < src.cols && iy >= 0 && iy < src.rows;
                if (src.typ == CV_8U)
                    out.at<uint8_t>(y, x) = in ? src.at<uint8_t>(iy, ix) : 0;
                else
                    out.at<float>(y, x) = in ? src.at<float>(iy, ix) : 0.0f;
            } else {
                int x0 = (int)std::floor(sx), y0 = (int)std::floor(sy);
                double fx = sx - x0, fy = sy - y0;
                double acc = 0;
                for (int dy = 0; dy < 2; dy++)
                    for (int dx = 0; dx < 2; dx++) {
                        int xx = x0 + dx, yy = y0 + dy;
                        double wgt = (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy);
                        double v = (xx >= 0 && xx < src.cols && yy >= 0 &&
                                    yy < src.rows)
                                       ? (src.typ == CV_8U
                                              ? src.at<uint8_t>(yy, xx)
                                              : src.at<float>(yy, xx))
                                       : 0.0;
                        acc += wgt * v;
                    }
                if (src.typ == CV_8U) {
                    long q = lrint(acc);
                    out.at<uint8_t>(y, x) =
                        (uint8_t)(q < 0 ? 0 : q > 255 ? 255 : q);
                } else {
                    out.at<float>(y, x) = (float)acc;
                }
            }
        }
    dst = out;
}

inline void warpAffine(const Mat& src, Mat& dst, const Mat& M, Size dsize,
                       int flags) {
    warp_generic(src, dst, M, dsize, flags, false);
}
inline void warpPerspective(const Mat& src, Mat& dst, const Mat& M,
                            Size dsize, int flags) {
    warp_generic(src, dst, M, dsize, flags, true);
}

}  // namespace cv
