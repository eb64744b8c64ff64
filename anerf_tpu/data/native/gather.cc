// Native data-loader core: fused pixel gather + dtype convert.
//
// The TPU-side step consumes ~19 ms/batch (BASELINE.md); the host
// loader must assemble a 2048-ray batch well under that.  numpy's
// row[idxs].astype(f32)*scale is two passes plus a temporary; this is
// the one-pass fused version (OpenMP across pixels for patch batches),
// called through ctypes (anerf_tpu/data/native/__init__.py).  It plays
// the role of the reference's torch-DataLoader C++ worker core
// (reference core/load_data.py:71-84 relies on torch's native loader;
// we have no torch on the host path).
//
// Build: scripts/build_native.py (g++ -O3 -fopenmp -shared -fPIC).
#include <cstdint>
#include <unordered_map>

extern "C" {

// out[i, :] = base[idxs[i], :] * scale   (base: uint8 rows of c channels)
void gather_u8_f32(const uint8_t* base, const int64_t* idxs, int64_t n,
                   int64_t c, float scale, float* out) {
#pragma omp parallel for if (n > 4096) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src = base + idxs[i] * c;
    float* dst = out + i * c;
    for (int64_t j = 0; j < c; ++j) dst[j] = static_cast<float>(src[j]) * scale;
  }
}

// Indices of nonzero bytes; returns the count (<= n).
int64_t nonzero_u8(const uint8_t* mask, int64_t n, int64_t* out) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (mask[i]) out[k++] = i;
  }
  return k;
}

// Batched distinct draw: for each row r, pick k distinct positions from
// [0, lens[r]) by a virtual partial Fisher-Yates (hash map stands in
// for the length-L permutation array, so cost is O(k) per row, not
// O(L)), driven by caller-supplied uniforms u[r*k .. r*k+k) so the
// draw is reproducible from a numpy Generator.  Output values are
// mapped through the row's valid-pixel list valid[r].  This is the
// vectorized core of BaseH5Dataset.get_batch (per-image
// rng.choice(replace=False) is ~0.1 ms of Python/numpy overhead per
// image; 128 images/batch).
// Deliberately single-threaded: the whole batch is ~2k hash-map ops
// (~0.05 ms); a GOMP parallel region costs ~8 ms on a 2-core host
// (measured) — 150x the work itself.
void sample_distinct(const int32_t* const* valid, const int64_t* lens,
                     const double* u, int64_t rows, int64_t k,
                     int32_t* out) {
  for (int64_t r = 0; r < rows; ++r) {
    std::unordered_map<int64_t, int64_t> swap;
    swap.reserve(2 * k);
    const int64_t L = lens[r];
    const double* ur = u + r * k;
    int32_t* dst = out + r * k;
    for (int64_t i = 0; i < k; ++i) {
      int64_t j = i + static_cast<int64_t>(ur[i] * static_cast<double>(L - i));
      if (j >= L) j = L - 1;  // guard u == 1.0 edge
      auto it_j = swap.find(j);
      int64_t pick = (it_j == swap.end()) ? j : it_j->second;
      auto it_i = swap.find(i);
      int64_t vi = (it_i == swap.end()) ? i : it_i->second;
      swap[j] = vi;
      dst[i] = valid[r][pick];
    }
  }
}

}  // extern "C"
