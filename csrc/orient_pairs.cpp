// Per-pair mash orientation decisions — native fast path for sparse
// pair sets at large n, where neither the (n, n) decision matrix
// (O(n^2) memory/work) nor the device membership matmul (2n x U int8,
// over budget once U ~ 2e7 hashes) is viable.
//
// Inputs are the per-sequence stranded sketch SETS (sorted unique
// uint64 hashes, np.unique output) concatenated with CSR-style offsets:
// fwd sets in fcat/foff, reverse-complement sets in rcat/roff. For each
// requested pair (q, t) the intersection sizes fi = |F_q ∩ F_t| and
// ri = |R_q ∩ F_t| come from a two-pointer merge, and:
//
//   decision (reverse-complement q?)  =  !(fwd_j >= rev_j)
//
// compared EXACTLY over integers as fi*max(ru,1) >= ri*max(fu,1) —
// the same cross-multiplication the device path uses, proven equal to
// the float64 Jaccard compare in orientation.py:_decision_matrix_device
// (counts <= sketch_size spaces candidate rationals ~9 orders of
// magnitude wider than one f64 ulp). Distances (band-width hints only)
// use the reference mash formula (mash.rs:59-74) in double precision;
// libm log may differ from NumPy's by <= 1 ulp, which only perturbs a
// heuristic hint, never a score or CIGAR.
//
// Build: make -C csrc

#include <cstdint>
#include <cmath>

namespace {

inline int64_t intersect_count(const uint64_t* a, int64_t na,
                               const uint64_t* b, int64_t nb) {
  int64_t i = 0, j = 0, c = 0;
  while (i < na && j < nb) {
    const uint64_t x = a[i], y = b[j];
    c += (x == y);
    i += (x <= y);
    j += (y <= x);
  }
  return c;
}

}  // namespace

extern "C" {

void orient_pairs(const uint64_t* fcat, const int64_t* foff,
                  const uint64_t* rcat, const int64_t* roff,
                  const int64_t* qi, const int64_t* ti, int64_t m,
                  int32_t kmer, uint8_t* out_dec, double* out_dist) {
  for (int64_t p = 0; p < m; ++p) {
    const int64_t q = qi[p], t = ti[p];
    const uint64_t* fq = fcat + foff[q];
    const int64_t nfq = foff[q + 1] - foff[q];
    const uint64_t* rq = rcat + roff[q];
    const int64_t nrq = roff[q + 1] - roff[q];
    const uint64_t* ft = fcat + foff[t];
    const int64_t nft = foff[t + 1] - foff[t];

    const int64_t fi = intersect_count(fq, nfq, ft, nft);
    const int64_t ri = intersect_count(rq, nrq, ft, nft);
    const int64_t fu = nfq + nft - fi;
    const int64_t ru = nrq + nft - ri;
    const int64_t fu1 = fu > 1 ? fu : 1;
    const int64_t ru1 = ru > 1 ? ru : 1;
    out_dec[p] = (fi * ru1 >= ri * fu1) ? 0 : 1;

    const double fwd_j =
        fu > 0 ? static_cast<double>(fi) / static_cast<double>(fu1) : 0.0;
    const double rev_j =
        ru > 0 ? static_cast<double>(ri) / static_cast<double>(ru1) : 0.0;
    const double bj = fwd_j > rev_j ? fwd_j : rev_j;
    double d = 1.0;
    if (bj > 0.0) {
      double x = 2.0 * bj / (1.0 + bj);
      if (x < 1e-300) x = 1e-300;
      d = -std::log(x) / static_cast<double>(kmer);
      if (d > 1.0) d = 1.0;
    }
    out_dist[p] = d;
  }
}

}  // extern "C"
