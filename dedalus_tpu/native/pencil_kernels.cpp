// Native host kernels for the TPU-native spectral framework.
//
// Parity targets (role, not code): the reference's compiled layer —
// dedalus/tools/linalg.pyx (CSR factor/solve kernels wrapping SuperLU) and
// dedalus/libraries/dedalus_sphere/jacobi.py's longdouble internals. Here the
// per-pencil factorizations that feed the device's batched solves are done
// natively via LAPACK, and the Jacobi three-term recurrences run in 80-bit
// long double for spectrally-accurate transform setup.
//
// Build: g++ -O3 -march=native -shared -fPIC pencil_kernels.cpp -o
//        libpencil_kernels.so -llapack
// Loaded via ctypes (no pybind11 dependency).

#include <cmath>
#include <cstring>
#include <vector>
#include <dlfcn.h>

// LAPACK routines are resolved at runtime (system LAPACK or scipy's bundled
// OpenBLAS, whose symbols carry a scipy_ prefix), so we always use the
// fastest library present without a link-time dependency.
typedef void (*dgetrf_t)(const int*, const int*, double*, const int*, int*, int*);
typedef void (*dgetri_t)(const int*, double*, const int*, const int*, double*,
                         const int*, int*);
static dgetrf_t dgetrf_ = nullptr;
static dgetri_t dgetri_ = nullptr;

extern "C" {

// Load LAPACK from the given shared library path; returns 0 on success.
int init_lapack(const char* path) {
    void* h = dlopen(path, RTLD_NOW | RTLD_GLOBAL);
    if (!h) return 1;
    dgetrf_ = (dgetrf_t)dlsym(h, "scipy_dgetrf_");
    if (!dgetrf_) dgetrf_ = (dgetrf_t)dlsym(h, "dgetrf_");
    dgetri_ = (dgetri_t)dlsym(h, "scipy_dgetri_");
    if (!dgetri_) dgetri_ = (dgetri_t)dlsym(h, "dgetri_");
    return (dgetrf_ && dgetri_) ? 0 : 2;
}

// Batched LU factorization of G row-major (P x P) matrices.
// A: (G, P, P) row-major, overwritten with LU factors (of A^T in LAPACK's
// column-major view; callers treating output as row-major factors of A must
// account for the transpose). perm: (G, P) output permutation vectors such
// that solving uses rows perm[g] of the RHS.
// Returns 0 on success, or the 1-based index of the first singular group.
int batched_lu_factor(double* A, int G, int P, int* perm) {
    int first_bad = 0;
    std::vector<int> ipiv(P);
    for (int g = 0; g < G; ++g) {
        double* Ag = A + (size_t)g * P * P;
        int info = 0;
        // LAPACK is column-major: factoring the row-major buffer factors A^T.
        dgetrf_(&P, &P, Ag, &P, ipiv.data(), &info);
        if (info != 0 && first_bad == 0) first_bad = g + 1;
        // Convert LAPACK pivots (1-based swaps) to a permutation vector
        int* pg = perm + (size_t)g * P;
        for (int i = 0; i < P; ++i) pg[i] = i;
        for (int i = 0; i < P; ++i) {
            int j = ipiv[i] - 1;
            int tmp = pg[i]; pg[i] = pg[j]; pg[j] = tmp;
        }
    }
    return first_bad;
}

// Batched inversion of G row-major (P x P) matrices in place.
// (inv(A^T) = inv(A)^T, so a column-major inversion of the row-major buffer
// yields the row-major inverse directly.)
int batched_inverse(double* A, int G, int P) {
    int first_bad = 0;
    std::vector<int> ipiv(P);
    int lwork = P * 64;
    std::vector<double> work(lwork);
    for (int g = 0; g < G; ++g) {
        double* Ag = A + (size_t)g * P * P;
        int info = 0;
        dgetrf_(&P, &P, Ag, &P, ipiv.data(), &info);
        if (info != 0) { if (!first_bad) first_bad = g + 1; continue; }
        dgetri_(&P, Ag, &P, ipiv.data(), work.data(), &lwork, &info);
        if (info != 0 && !first_bad) first_bad = g + 1;
    }
    return first_bad;
}

// Orthonormal Jacobi polynomial recurrence in 80-bit long double:
// out[(k, i)] = p_k(z_i) for k < nmax, given precomputed recurrence
// coefficients alpha[0..nmax], c[0..nmax] (c[0] unused) and init values.
void jacobi_recurrence_ld(int nmax, int npts, const double* z,
                          const double* alpha, const double* c,
                          const double* init, double* out) {
    std::vector<long double> pm1(npts), p0(npts), zl(npts);
    for (int i = 0; i < npts; ++i) {
        zl[i] = (long double)z[i];
        p0[i] = (long double)init[i];
        out[i] = (double)p0[i];
    }
    if (nmax < 2) return;
    std::vector<long double> p1(npts);
    for (int i = 0; i < npts; ++i) {
        p1[i] = (zl[i] - (long double)alpha[0]) * p0[i] / (long double)c[1];
        out[npts + i] = (double)p1[i];
    }
    pm1 = p0; p0 = p1;
    for (int k = 2; k < nmax; ++k) {
        long double ak = (long double)alpha[k - 1];
        long double ckm = (long double)c[k - 1];
        long double ck = (long double)c[k];
        for (int i = 0; i < npts; ++i) {
            long double pk = ((zl[i] - ak) * p0[i] - ckm * pm1[i]) / ck;
            out[(size_t)k * npts + i] = (double)pk;
            pm1[i] = p0[i];
            p0[i] = pk;
        }
    }
}

}  // extern "C"
