// Native host-side kernels for dgp_tpu.
//
// The reference delegates nearest-neighbour search to FAISS and runs its
// sequential Vecchia sampling loops in Numba (dgpsi/vecchia.py:20-140).
// dgp_tpu's default path keeps everything on the TPU, but two operations
// have a sequential/host-friendly structure where a native CPU
// implementation wins at very large n:
//
//   * ordered nearest-neighbour construction (each point's m nearest
//     PREDECESSORS in the Vecchia ordering) -- OpenMP-parallel partial
//     selection; avoids materialising the O(n^2) device distance tiles,
//   * ancestral sampling given precomputed conditional weights -- an
//     inherently sequential O(n*m) recursion that is latency-bound as a
//     device loop but runs in microseconds natively.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Ordered NN: for each i, the indices {i and its m nearest predecessors}
// sorted by DESCENDING index, padded with -1 (reference NNarray layout).
// X: (n, d) row-major. out: (n, m+1) int64.
void nn_ordered(const double* X, int64_t n, int64_t d, int64_t m,
                int64_t* out) {
#pragma omp parallel
    {
        std::vector<std::pair<double, int64_t>> cand;
#pragma omp for schedule(dynamic, 64)
        for (int64_t i = 0; i < n; ++i) {
            const int64_t k = std::min(m + 1, i + 1);
            cand.clear();
            cand.reserve(i + 1);
            const double* xi = X + i * d;
            for (int64_t j = 0; j <= i; ++j) {
                const double* xj = X + j * d;
                double dist = 0.0;
                for (int64_t t = 0; t < d; ++t) {
                    const double diff = xi[t] - xj[t];
                    dist += diff * diff;
                }
                cand.emplace_back(dist, j);
            }
            std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
            std::vector<int64_t> idx(k);
            for (int64_t t = 0; t < k; ++t) idx[t] = cand[t].second;
            std::sort(idx.begin(), idx.end(), std::greater<int64_t>());
            int64_t* row = out + i * (m + 1);
            for (int64_t t = 0; t < m + 1; ++t)
                row[t] = (t < k) ? idx[t] : -1;
        }
    }
}

// Unconstrained m-NN of each query among x, nearest first.
// query: (nq, d), x: (n, d), out: (nq, m) int64.
void pred_nn(const double* query, int64_t nq, const double* x, int64_t n,
             int64_t d, int64_t m, int64_t* out) {
#pragma omp parallel
    {
        std::vector<std::pair<double, int64_t>> cand(n);
#pragma omp for schedule(dynamic, 64)
        for (int64_t i = 0; i < nq; ++i) {
            const double* qi = query + i * d;
            for (int64_t j = 0; j < n; ++j) {
                const double* xj = x + j * d;
                double dist = 0.0;
                for (int64_t t = 0; t < d; ++t) {
                    const double diff = qi[t] - xj[t];
                    dist += diff * diff;
                }
                cand[j] = {dist, j};
            }
            const int64_t k = std::min(m, n);
            std::partial_sort(cand.begin(), cand.begin() + k, cand.end());
            int64_t* row = out + i * m;
            for (int64_t t = 0; t < m; ++t)
                row[t] = (t < k) ? cand[t].second : -1;
        }
    }
}

// Ancestral Vecchia sampling given precomputed conditional weights:
//   x[i] = sum_j w[i, j] * x[idx[i, j]] + eps[i]
// w: (n, m), idx: (n, m) with entries < i (0 for padded lanes, whose w is 0),
// eps: (n,) pre-scaled noise. out: (n,).
void ancestral_sample(const double* w, const int64_t* idx, const double* eps,
                      int64_t n, int64_t m, double* out) {
    for (int64_t i = 0; i < n; ++i) {
        double acc = eps[i];
        const double* wi = w + i * m;
        const int64_t* ii = idx + i * m;
        for (int64_t j = 0; j < m; ++j) acc += wi[j] * out[ii[j]];
        out[i] = acc;
    }
}

}  // extern "C"
