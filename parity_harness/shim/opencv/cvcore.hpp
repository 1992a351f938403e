/* OpenCV-2 core shim for compiling the reference's BUNDLED findHomography
 * stack (src/opencv/findHomography/{fundam,modelest}.cpp + the CvLevMarq
 * solver from calibration.cpp) without OpenCV installed — the same shim
 * technique the harness already uses for GSL/GTK (minigsl.c, shim/gsl).
 *
 * Semantics notes:
 *  - cvRandInt is the EXACT OpenCV multiply-with-carry RNG
 *    (CV_RNG_COEFF = 4164903690), so the RANSAC subset sequence is
 *    bit-identical to OpenCV 2.x with the same cvRNG(-1) seed.
 *  - cvEigenVV / cvSVD are cyclic-Jacobi implementations for the
 *    SYMMETRIC matrices the extracted code uses (the 9x9 normal matrix
 *    LtL in the homography kernel, the damped 8x8 JtJN in CvLevMarq).
 *    They agree with OpenCV's Jacobi solvers to solver ulps; fixtures
 *    keep clear inlier margins so solver ulps cannot flip RANSAC
 *    decisions (same policy as minigsl's LM note in the README).
 *  - Only the API actually referenced by the extracted ranges exists.
 */
#ifndef SIRILTPU_CVCORE_SHIM_HPP
#define SIRILTPU_CVCORE_SHIM_HPP

#include <assert.h>
#include <float.h>
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <algorithm>
#include <utility>
#include <vector>

typedef unsigned char uchar;
typedef uint64_t uint64;
typedef int64_t int64;
typedef uint64_t CvRNG;

#define CV_EXPORTS
#define CV_IMPL
#define CVAPI(rettype) rettype
#define CV_DEFAULT(val) = val
#define CV_INLINE static inline

#ifndef MIN
#define MIN(a, b) ((a) < (b) ? (a) : (b))
#endif
#ifndef MAX
#define MAX(a, b) ((a) > (b) ? (a) : (b))
#endif

/* ---- error handling (the bundle renamed CV_Error to siril_CV_Error) */
#define CV_StsOutOfRange 1
#define CV_StsBadArg 2
#ifndef siril_CV_Error
#define siril_CV_Error(code, msg) \
    do { fprintf(stderr, "CV_Error %d: %s\n", (int)(code), (msg)); abort(); } while (0)
#endif

/* ---------------------------------------------------------- type codes */
#define CV_8U 0
#define CV_8S 1
#define CV_16U 2
#define CV_16S 3
#define CV_32S 4
#define CV_32F 5
#define CV_64F 6
#define CV_CN_SHIFT 3
#define CV_MAT_DEPTH(t) ((t) & 7)
#define CV_MAKETYPE(d, cn) ((d) + (((cn) - 1) << CV_CN_SHIFT))
#define CV_8UC1 CV_MAKETYPE(CV_8U, 1)
#define CV_32FC1 CV_MAKETYPE(CV_32F, 1)
#define CV_64FC1 CV_MAKETYPE(CV_64F, 1)
#define CV_64FC2 CV_MAKETYPE(CV_64F, 2)
#define CV_MAT_TYPE(t) ((t) & 511)
#define CV_MAT_CN(t) ((((t) >> CV_CN_SHIFT) & 63) + 1)

static inline int CV_ELEM_SIZE(int type) {
    static const int esz[7] = {1, 1, 2, 2, 4, 4, 8};
    return esz[CV_MAT_DEPTH(type)] * CV_MAT_CN(type);
}

/* permissive validity macros: the driver controls every input */
#define CV_IS_MAT(m) ((m) != NULL)
#define CV_IS_MASK_ARR(m) 1
#define CV_IS_MAT_CONT(t) 1
#define CV_ARE_SIZES_EQ(a, b) ((a)->rows == (b)->rows && (a)->cols == (b)->cols)
#define CV_ARE_TYPES_EQ(a, b) (CV_MAT_TYPE((a)->type) == CV_MAT_TYPE((b)->type))

#define CV_RANSAC 8
#define CV_LMEDS 4
#define CV_TERMCRIT_ITER 1
#define CV_TERMCRIT_EPS 2
#define CV_SVD_MODIFY_A 1
#define CV_SVD_U_T 2
#define CV_SVD_V_T 4
#define CV_L2 4
#define CV_RELATIVE_L2 (8 | CV_L2)
#define CV_GEMM_A_T 1

/* ------------------------------------------------------------- structs */
typedef struct CvSize { int width, height; } CvSize;
CV_INLINE CvSize cvSize(int w, int h) { CvSize s; s.width = w; s.height = h; return s; }

typedef struct CvPoint2D64f { double x, y; } CvPoint2D64f;
typedef struct CvPoint2D32f { float x, y; } CvPoint2D32f;
typedef struct CvPoint3D32f { float x, y, z; } CvPoint3D32f;

typedef struct CvTermCriteria { int type; int max_iter; double epsilon; } CvTermCriteria;
CV_INLINE CvTermCriteria cvTermCriteria(int type, int max_iter, double epsilon) {
    CvTermCriteria t; t.type = type; t.max_iter = max_iter; t.epsilon = epsilon; return t;
}

typedef struct CvScalar { double val[4]; } CvScalar;
CV_INLINE CvScalar cvScalarAll(double v) {
    CvScalar s; s.val[0] = s.val[1] = s.val[2] = s.val[3] = v; return s;
}
CV_INLINE CvScalar cvRealScalar(double v) {
    CvScalar s; s.val[0] = v; s.val[1] = s.val[2] = s.val[3] = 0; return s;
}

typedef struct CvMat {
    int type;
    int step;  /* bytes per row */
    int rows, cols;
    union { uchar* ptr; short* s; int* i; float* fl; double* db; } data;
    int owned; /* shim-private: data buffer owned by this header */
} CvMat;

CV_INLINE CvMat cvMat(int rows, int cols, int type, void* data) {
    CvMat m; m.type = type; m.rows = rows; m.cols = cols;
    m.step = cols * CV_ELEM_SIZE(type);
    m.data.ptr = (uchar*)data; m.owned = 0;
    return m;
}

CV_INLINE CvMat* cvCreateMat(int rows, int cols, int type) {
    CvMat* m = (CvMat*)calloc(1, sizeof(CvMat));
    *m = cvMat(rows, cols, type, calloc((size_t)rows * cols, CV_ELEM_SIZE(type)));
    m->owned = 1;
    return m;
}

CV_INLINE void cvReleaseMat(CvMat** m) {
    if (m && *m) {
        if ((*m)->owned) free((*m)->data.ptr);
        free(*m);
        *m = NULL;
    }
}

CV_INLINE void cvCopy(const CvMat* src, CvMat* dst) {
    assert(CV_ARE_SIZES_EQ(src, dst) && CV_ARE_TYPES_EQ(src, dst));
    int rowbytes = src->cols * CV_ELEM_SIZE(src->type);
    for (int r = 0; r < src->rows; r++)
        memcpy(dst->data.ptr + (size_t)r * dst->step,
               src->data.ptr + (size_t)r * src->step, rowbytes);
}

CV_INLINE CvMat* cvCloneMat(const CvMat* src) {
    CvMat* m = cvCreateMat(src->rows, src->cols, src->type);
    cvCopy(src, m);
    return m;
}

CV_INLINE void cvZero(CvMat* m) {
    for (int r = 0; r < m->rows; r++)
        memset(m->data.ptr + (size_t)r * m->step, 0,
               (size_t)m->cols * CV_ELEM_SIZE(m->type));
}

CV_INLINE void cvSet(CvMat* m, CvScalar s) {
    int cn = CV_MAT_CN(m->type), depth = CV_MAT_DEPTH(m->type);
    for (int r = 0; r < m->rows; r++)
        for (int c = 0; c < m->cols; c++)
            for (int k = 0; k < cn; k++) {
                double v = s.val[k];
                uchar* p = m->data.ptr + (size_t)r * m->step
                           + ((size_t)c * cn + k) * (CV_ELEM_SIZE(m->type) / cn);
                if (depth == CV_8U) *p = (uchar)v;
                else if (depth == CV_32F) *(float*)p = (float)v;
                else *(double*)p = v;
            }
}

CV_INLINE void cvSetIdentity(CvMat* m, CvScalar s) {
    cvZero(m);
    int n = MIN(m->rows, m->cols);
    for (int i = 0; i < n; i++)
        ((double*)(m->data.ptr + (size_t)i * m->step))[i] = s.val[0];
}

CV_INLINE void cvGetRows(const CvMat* src, CvMat* hdr, int r0, int r1) {
    *hdr = *src;
    hdr->owned = 0;
    hdr->rows = r1 - r0;
    hdr->data.ptr = src->data.ptr + (size_t)r0 * src->step;
}

CV_INLINE double* cv_row(const CvMat* m, int r) {
    return (double*)(m->data.ptr + (size_t)r * m->step);
}

CV_INLINE void cvConvertScale(const CvMat* src, CvMat* dst,
                              double scale CV_DEFAULT(1), double shift CV_DEFAULT(0)) {
    assert(CV_ARE_SIZES_EQ(src, dst));
    int cn = CV_MAT_CN(src->type);
    assert(cn == CV_MAT_CN(dst->type));
    int sd = CV_MAT_DEPTH(src->type), dd = CV_MAT_DEPTH(dst->type);
    for (int r = 0; r < src->rows; r++)
        for (int c = 0; c < src->cols * cn; c++) {
            double v;
            if (sd == CV_64F) v = ((double*)(src->data.ptr + (size_t)r * src->step))[c];
            else if (sd == CV_32F) v = ((float*)(src->data.ptr + (size_t)r * src->step))[c];
            else v = (src->data.ptr + (size_t)r * src->step)[c];
            v = v * scale + shift;
            if (dd == CV_64F) ((double*)(dst->data.ptr + (size_t)r * dst->step))[c] = v;
            else if (dd == CV_32F) ((float*)(dst->data.ptr + (size_t)r * dst->step))[c] = (float)v;
            else (dst->data.ptr + (size_t)r * dst->step)[c] = (uchar)v;
        }
}
#define cvConvert(src, dst) cvConvertScale((src), (dst), 1, 0)

CV_INLINE void cvTranspose(const CvMat* src, CvMat* dst) {
    assert(src->rows == dst->cols && src->cols == dst->rows &&
           CV_ARE_TYPES_EQ(src, dst));
    int esz = CV_ELEM_SIZE(src->type);
    for (int r = 0; r < src->rows; r++)
        for (int c = 0; c < src->cols; c++)
            memcpy(dst->data.ptr + (size_t)c * dst->step + (size_t)r * esz,
                   src->data.ptr + (size_t)r * src->step + (size_t)c * esz, esz);
}

/* copies the UPPER triangle into the lower when LtoR == 0 (OpenCV
 * completeSymm(lowerToUpper=false)); the extracted kernels fill j<=k. */
CV_INLINE void cvCompleteSymm(CvMat* m, int LtoR CV_DEFAULT(0)) {
    assert(m->rows == m->cols && CV_MAT_DEPTH(m->type) == CV_64F);
    int n = m->rows;
    for (int r = 1; r < n; r++)
        for (int c = 0; c < r; c++) {
            if (LtoR) cv_row(m, c)[r] = cv_row(m, r)[c];
            else cv_row(m, r)[c] = cv_row(m, c)[r];
        }
}

CV_INLINE void cvMatMul(const CvMat* a, const CvMat* b, CvMat* c) {
    assert(a->cols == b->rows && c->rows == a->rows && c->cols == b->cols);
    for (int i = 0; i < a->rows; i++)
        for (int j = 0; j < b->cols; j++) {
            double s = 0;
            for (int k = 0; k < a->cols; k++)
                s += cv_row(a, i)[k] * cv_row(b, k)[j];
            cv_row(c, i)[j] = s;
        }
}

CV_INLINE void cvGEMM(const CvMat* a, const CvMat* b, double alpha,
                      const CvMat* c, double beta, CvMat* d,
                      int flags CV_DEFAULT(0)) {
    int at = flags & CV_GEMM_A_T;
    int m = at ? a->cols : a->rows;
    int kk = at ? a->rows : a->cols;
    assert(kk == b->rows && d->rows == m && d->cols == b->cols);
    for (int i = 0; i < m; i++)
        for (int j = 0; j < b->cols; j++) {
            double s = 0;
            for (int k = 0; k < kk; k++) {
                double av = at ? cv_row(a, k)[i] : cv_row(a, i)[k];
                s += av * cv_row(b, k)[j];
            }
            cv_row(d, i)[j] = alpha * s + (c ? beta * cv_row(c, i)[j] : 0);
        }
}

CV_INLINE void cvMulTransposed(const CvMat* a, CvMat* dst, int order,
                               const CvMat* delta CV_DEFAULT(0),
                               double scale CV_DEFAULT(1)) {
    assert(!delta);
    if (order) { /* dst = aT * a */
        assert(dst->rows == a->cols && dst->cols == a->cols);
        for (int i = 0; i < a->cols; i++)
            for (int j = 0; j < a->cols; j++) {
                double s = 0;
                for (int k = 0; k < a->rows; k++)
                    s += cv_row(a, k)[i] * cv_row(a, k)[j];
                cv_row(dst, i)[j] = s * scale;
            }
    } else { /* dst = a * aT */
        assert(dst->rows == a->rows && dst->cols == a->rows);
        for (int i = 0; i < a->rows; i++)
            for (int j = 0; j < a->rows; j++) {
                double s = 0;
                for (int k = 0; k < a->cols; k++)
                    s += cv_row(a, i)[k] * cv_row(a, j)[k];
                cv_row(dst, i)[j] = s * scale;
            }
    }
}

CV_INLINE void cvAdd(const CvMat* a, const CvMat* b, CvMat* c) {
    assert(CV_ARE_SIZES_EQ(a, b) && CV_ARE_SIZES_EQ(a, c));
    for (int r = 0; r < a->rows; r++)
        for (int j = 0; j < a->cols; j++)
            cv_row(c, r)[j] = cv_row(a, r)[j] + cv_row(b, r)[j];
}

CV_INLINE double cvNorm(const CvMat* a, const CvMat* b, int type CV_DEFAULT(CV_L2)) {
    double s = 0, sb = 0;
    for (int r = 0; r < a->rows; r++)
        for (int j = 0; j < a->cols; j++) {
            double av = cv_row(a, r)[j];
            double bv = b ? cv_row(b, r)[j] : 0;
            double d = av - bv;
            s += d * d;
            sb += bv * bv;
        }
    if (type == CV_RELATIVE_L2) return sqrt(s) / (sqrt(sb) + DBL_EPSILON);
    return sqrt(s);
}

/* ------------------------------------------------------------------ RNG */
#define CV_RNG_COEFF 4164903690U
CV_INLINE CvRNG cvRNG(int64 seed CV_DEFAULT(-1)) {
    CvRNG rng = seed ? (uint64)seed : (uint64)(int64)-1;
    return rng;
}
CV_INLINE unsigned cvRandInt(CvRNG* rng) {
    uint64 temp = *rng;
    temp = (uint64)(unsigned)temp * CV_RNG_COEFF + (temp >> 32);
    *rng = temp;
    return (unsigned)temp;
}

CV_INLINE int cvRound(double v) { return (int)lrint(v); }

/* --------------------------------------------- symmetric Jacobi solvers */
/* cyclic Jacobi eigen decomposition of a symmetric n x n double matrix.
 * evals descending; eigenvectors returned as ROWS of V (matching
 * cvEigenVV / the CV_SVD_V_T convention the extracted code relies on). */
CV_INLINE void siril_jacobi_eigen(double* A, int n, double* w, double* V) {
    for (int i = 0; i < n; i++)
        for (int j = 0; j < n; j++) V[i * n + j] = (i == j);
    for (int sweep = 0; sweep < 100; sweep++) {
        double off = 0;
        for (int p = 0; p < n; p++)
            for (int q = p + 1; q < n; q++) off += fabs(A[p * n + q]);
        if (off < 1e-300) break;
        for (int p = 0; p < n; p++)
            for (int q = p + 1; q < n; q++) {
                double apq = A[p * n + q];
                if (fabs(apq) < 1e-300) continue;
                double app = A[p * n + p], aqq = A[q * n + q];
                double theta = (aqq - app) / (2 * apq);
                double t = (theta >= 0 ? 1.0 : -1.0)
                           / (fabs(theta) + sqrt(theta * theta + 1));
                double c = 1 / sqrt(t * t + 1), s = t * c;
                for (int k = 0; k < n; k++) {
                    double akp = A[k * n + p], akq = A[k * n + q];
                    A[k * n + p] = c * akp - s * akq;
                    A[k * n + q] = s * akp + c * akq;
                }
                for (int k = 0; k < n; k++) {
                    double apk = A[p * n + k], aqk = A[q * n + k];
                    A[p * n + k] = c * apk - s * aqk;
                    A[q * n + k] = s * apk + c * aqk;
                }
                for (int k = 0; k < n; k++) {
                    double vpk = V[p * n + k], vqk = V[q * n + k];
                    V[p * n + k] = c * vpk - s * vqk;
                    V[q * n + k] = s * vpk + c * vqk;
                }
            }
    }
    for (int i = 0; i < n; i++) w[i] = A[i * n + i];
    /* sort descending (selection sort, swapping V rows along) */
    for (int i = 0; i < n - 1; i++) {
        int m = i;
        for (int j = i + 1; j < n; j++)
            if (w[j] > w[m]) m = j;
        if (m != i) {
            double t = w[i]; w[i] = w[m]; w[m] = t;
            for (int k = 0; k < n; k++) {
                double tv = V[i * n + k]; V[i * n + k] = V[m * n + k]; V[m * n + k] = tv;
            }
        }
    }
}

CV_INLINE void cvEigenVV(CvMat* A, CvMat* evects, CvMat* evals,
                         double eps CV_DEFAULT(0), int low CV_DEFAULT(-1),
                         int high CV_DEFAULT(-1)) {
    (void)eps; (void)low; (void)high;
    int n = A->rows;
    assert(A->cols == n && evects->rows == n && evects->cols == n);
    std::vector<double> a(n * n), V(n * n), w(n);
    for (int r = 0; r < n; r++)
        memcpy(&a[r * n], cv_row(A, r), n * sizeof(double));
    siril_jacobi_eigen(a.data(), n, w.data(), V.data());
    for (int r = 0; r < n; r++) {
        memcpy(cv_row(evects, r), &V[r * n], n * sizeof(double));
        if (evals->cols == 1) cv_row(evals, r)[0] = w[r];
        else cv_row(evals, 0)[r] = w[r];
    }
}

/* SVD of a SYMMETRIC square matrix (all the extracted code needs): via
 * Jacobi eigen; w = |e| descending, V rows = right singular vectors
 * (CV_SVD_V_T storage), U rows = sign(e) * v (CV_SVD_U_T storage). */
CV_INLINE void cvSVD(CvMat* A, CvMat* W, CvMat* U CV_DEFAULT(0),
                     CvMat* V CV_DEFAULT(0), int flags CV_DEFAULT(0)) {
    (void)flags;
    int n = A->rows;
    assert(A->cols == n);
    std::vector<double> a(n * n), Vv(n * n), w(n);
    for (int r = 0; r < n; r++)
        memcpy(&a[r * n], cv_row(A, r), n * sizeof(double));
    /* symmetry check: the homography/LM paths only ever pass normal
     * matrices; refuse silently-wrong generality */
    for (int r = 0; r < n; r++)
        for (int c = 0; c < n; c++)
            assert(fabs(a[r * n + c] - a[c * n + r]) <=
                   1e-8 * (1 + fabs(a[r * n + c])));
    siril_jacobi_eigen(a.data(), n, w.data(), Vv.data());
    std::vector<int> order(n);
    for (int i = 0; i < n; i++) order[i] = i;
    std::sort(order.begin(), order.end(),
              [&](int x, int y) { return fabs(w[x]) > fabs(w[y]); });
    for (int i = 0; i < n; i++) {
        int src = order[i];
        double ev = w[src], sgn = ev < 0 ? -1.0 : 1.0;
        if (W->cols == 1) cv_row(W, i)[0] = fabs(ev);
        else cv_row(W, 0)[i] = fabs(ev);
        if (V) memcpy(cv_row(V, i), &Vv[src * n], n * sizeof(double));
        if (U)
            for (int k = 0; k < n; k++)
                cv_row(U, i)[k] = sgn * Vv[src * n + k];
    }
}

/* back substitution: x = sum_i v_i (u_i . b) / w_i  (U, V row-stored per
 * CV_SVD_U_T|CV_SVD_V_T; the CvLevMarq call passes V for both). */
CV_INLINE void cvSVBkSb(const CvMat* W, const CvMat* U, const CvMat* V,
                        const CvMat* B, CvMat* X, int flags CV_DEFAULT(0)) {
    (void)flags;
    int n = X->rows;
    double w0 = (W->cols == 1) ? cv_row(W, 0)[0] : cv_row(W, 0)[0];
    double thresh = DBL_EPSILON * 2 * n * (w0 > 0 ? w0 : 1);
    for (int i = 0; i < n; i++) cv_row(X, i)[0] = 0;
    for (int i = 0; i < n; i++) {
        double wi = (W->cols == 1) ? cv_row(W, i)[0] : cv_row(W, 0)[i];
        if (wi <= thresh) continue;
        double ub = 0;
        for (int k = 0; k < n; k++) ub += cv_row(U, i)[k] * cv_row(B, k)[0];
        ub /= wi;
        for (int k = 0; k < n; k++) cv_row(X, k)[0] += cv_row(V, i)[k] * ub;
    }
}

/* only the 64FC2 -> 64FC2 passthrough cvFindHomography needs: the
 * harness always feeds already-2D double points */
CV_INLINE void cvConvertPointsHomogeneous(const CvMat* src, CvMat* dst) {
    assert(CV_MAT_TYPE(src->type) == CV_64FC2 && CV_MAT_TYPE(dst->type) == CV_64FC2);
    assert(src->rows * src->cols == dst->rows * dst->cols);
    memcpy(dst->data.ptr, src->data.ptr,
           (size_t)src->rows * src->cols * sizeof(CvPoint2D64f));
}

/* ------------------------------------------------- OpenCV qsort macro */
#define CV_LT(a, b) ((a) < (b))
#define CV_IMPLEMENT_QSORT(func_name, T, LT)                         \
    void func_name(T* array, size_t total, int unused) {             \
        (void)unused;                                                \
        std::sort(array, array + total,                              \
                  [](const T& a, const T& b) { return LT(a, b); });  \
    }

/* --------------------------------------------------------- cv:: bits */
namespace cv {

template <typename T> class Ptr {
public:
    T* obj;
    int* refcount;
    Ptr() : obj(0), refcount(0) {}
    Ptr(T* o) : obj(o), refcount(o ? new int(1) : 0) {}
    Ptr(const Ptr& p) : obj(p.obj), refcount(p.refcount) {
        if (refcount) ++*refcount;
    }
    Ptr& operator=(const Ptr& p) {
        if (this != &p) {
            T* po = p.obj; int* pr = p.refcount;
            if (pr) ++*pr;
            release_();
            obj = po; refcount = pr;
        }
        return *this;
    }
    Ptr& operator=(T* o) {
        release_();
        obj = o; refcount = o ? new int(1) : 0;
        return *this;
    }
    ~Ptr() { release_(); }
    void release() { release_(); }
    bool empty() const { return obj == 0; }
    bool operator!() const { return obj == 0; }
    operator T*() const { return obj; }
    T* operator->() const { return obj; }
private:
    void release_() {
        if (refcount && --*refcount == 0) {
            delete refcount;
            CvMat* m = (CvMat*)obj;
            cvReleaseMat(&m);
        } else if (!refcount) {
        }
        obj = 0; refcount = 0;
    }
};

template <typename T> class AutoBuffer {
public:
    T* buf;
    AutoBuffer(size_t n) : buf(new T[n]) {}
    ~AutoBuffer() { delete[] buf; }
    operator T*() { return buf; }
};

}  // namespace cv

#endif /* SIRILTPU_CVCORE_SHIM_HPP */
