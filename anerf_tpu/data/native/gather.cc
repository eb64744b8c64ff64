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

}  // extern "C"
