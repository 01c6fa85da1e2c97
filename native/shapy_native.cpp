// shapy_native: host-side native kernels for the shapy_tpu runtime.
//
// The reference's only native component is a CUDA mesh-intersection
// extension (replaced on TPU by XLA/Pallas ops). The host runtime around
// the TPU still has hot CPU paths, implemented here:
//   * batched exact 2D convex-hull perimeters (monotone chain) — the
//     evaluator's bit-exact parity path (replacing per-item scipy calls,
//     reference body_measurements.py:160-179);
//   * bilinear affine image warp — the data-loader crop
//     (transf_utils.py:51-100 semantics via a single affine map);
//   * OpenMP-free std::thread batch warp for multi-image prefetch.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact convex hull perimeter (Andrew monotone chain).
// points: (n, 2) float64; returns perimeter; writes hull size to hull_n.
double convex_hull_perimeter(const double* points, int64_t n,
                             int64_t* hull_n) {
  if (n < 3) {
    if (hull_n) *hull_n = n < 0 ? 0 : n;
    return 0.0;
  }
  std::vector<std::pair<double, double>> pts(n);
  for (int64_t i = 0; i < n; ++i) pts[i] = {points[2 * i], points[2 * i + 1]};
  std::sort(pts.begin(), pts.end());
  pts.erase(std::unique(pts.begin(), pts.end()), pts.end());
  const int64_t m = static_cast<int64_t>(pts.size());
  if (m < 3) {
    if (hull_n) *hull_n = m;
    return 0.0;
  }
  auto cross = [](const std::pair<double, double>& o,
                  const std::pair<double, double>& a,
                  const std::pair<double, double>& b) {
    return (a.first - o.first) * (b.second - o.second) -
           (a.second - o.second) * (b.first - o.first);
  };
  std::vector<std::pair<double, double>> hull(2 * m);
  int64_t k = 0;
  for (int64_t i = 0; i < m; ++i) {  // lower
    while (k >= 2 && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  for (int64_t i = m - 2, t = k + 1; i >= 0; --i) {  // upper
    while (k >= t && cross(hull[k - 2], hull[k - 1], pts[i]) <= 0) --k;
    hull[k++] = pts[i];
  }
  k--;  // last point == first point
  if (hull_n) *hull_n = k;
  double per = 0.0;
  for (int64_t i = 0; i < k; ++i) {
    const auto& a = hull[i];
    const auto& b = hull[(i + 1) % k];
    per += std::hypot(b.first - a.first, b.second - a.second);
  }
  return per;
}

// Batched variant with per-item validity masks.
// points: (batch, n, 2); mask: (batch, n) uint8 (NULL = all valid);
// out: (batch,) perimeters.
void convex_hull_perimeter_batch(const double* points, const uint8_t* mask,
                                 int64_t batch, int64_t n, double* out) {
  std::vector<double> buf(2 * n);
  for (int64_t b = 0; b < batch; ++b) {
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (mask == nullptr || mask[b * n + i]) {
        buf[2 * cnt] = points[(b * n + i) * 2];
        buf[2 * cnt + 1] = points[(b * n + i) * 2 + 1];
        ++cnt;
      }
    }
    out[b] = convex_hull_perimeter(buf.data(), cnt, nullptr);
  }
}

// ---------------------------------------------------------------------------
// Bilinear affine warp: out(y, x) = img(A . (x, y, 1)), zero padding.
// img: (H, W, C) float32 row-major; affine: 6 doubles [a00 a01 a02; a10
// a11 a12] mapping OUTPUT pixel coords to INPUT coords.
void affine_warp_bilinear(const float* img, int64_t H, int64_t W, int64_t C,
                          const double* affine, float* out, int64_t outH,
                          int64_t outW) {
  for (int64_t y = 0; y < outH; ++y) {
    for (int64_t x = 0; x < outW; ++x) {
      const double sx = affine[0] * x + affine[1] * y + affine[2];
      const double sy = affine[3] * x + affine[4] * y + affine[5];
      const int64_t x0 = static_cast<int64_t>(std::floor(sx));
      const int64_t y0 = static_cast<int64_t>(std::floor(sy));
      const double wx = sx - x0;
      const double wy = sy - y0;
      float* dst = out + (y * outW + x) * C;
      for (int64_t c = 0; c < C; ++c) {
        double acc = 0.0;
        for (int dy = 0; dy <= 1; ++dy) {
          for (int dx = 0; dx <= 1; ++dx) {
            const int64_t xi = x0 + dx;
            const int64_t yi = y0 + dy;
            if (xi < 0 || xi >= W || yi < 0 || yi >= H) continue;
            const double w =
                (dx ? wx : 1.0 - wx) * (dy ? wy : 1.0 - wy);
            acc += w * img[(yi * W + xi) * C + c];
          }
        }
        dst[c] = static_cast<float>(acc);
      }
    }
  }
}

// Threaded batch warp: one affine per image.
void affine_warp_bilinear_batch(const float* imgs, int64_t B, int64_t H,
                                int64_t W, int64_t C, const double* affines,
                                float* out, int64_t outH, int64_t outW,
                                int64_t num_threads) {
  if (num_threads <= 1 || B == 1) {
    for (int64_t b = 0; b < B; ++b) {
      affine_warp_bilinear(imgs + b * H * W * C, H, W, C, affines + b * 6,
                           out + b * outH * outW * C, outH, outW);
    }
    return;
  }
  std::vector<std::thread> threads;
  const int64_t nt = std::min<int64_t>(num_threads, B);
  for (int64_t t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      for (int64_t b = t; b < B; b += nt) {
        affine_warp_bilinear(imgs + b * H * W * C, H, W, C,
                             affines + b * 6, out + b * outH * outW * C,
                             outH, outW);
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
