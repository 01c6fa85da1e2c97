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
#include <limits>
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

// ---------------------------------------------------------------------------
// Z-buffered triangle rasterization geometry pass (the renderer's hot
// loop; shading stays in Python where it is cheap per covered pixel).
// Same fragment semantics as the numpy path in
// shapy_tpu/render/rasterizer.py:_raster_fragments: per-face clipped
// pixel bbox, inclusive barycentric inside test (w >= 0), nearest
// fragment per pixel wins.
//
// pts: (V, 2) float32 screen coords; z: (V,) float32 camera depths;
// faces: (F, 3) int32. Outputs (dense, caller-allocated):
//   face_id: (H*W,) int32, -1 where empty
//   bary:    (H*W, 3) float32
//   depth:   (H*W,) float32, +inf where empty
// Threads partition image rows into contiguous bands (race-free: each
// pixel belongs to exactly one band); every thread scans all faces and
// skips those whose bbox misses its band.
static void rasterize_band(const float* pts, const float* z,
                           const int32_t* faces, int64_t F, int64_t H,
                           int64_t W, int64_t y0, int64_t y1,
                           int32_t* face_id, float* bary, float* depth) {
  for (int64_t fi = 0; fi < F; ++fi) {
    const int32_t i0 = faces[3 * fi], i1 = faces[3 * fi + 1],
                  i2 = faces[3 * fi + 2];
    const float x0f = pts[2 * i0], y0f = pts[2 * i0 + 1];
    const float x1f = pts[2 * i1], y1f = pts[2 * i1 + 1];
    const float x2f = pts[2 * i2], y2f = pts[2 * i2 + 1];
    const float d = (y1f - y2f) * (x0f - x2f) + (x2f - x1f) * (y0f - y2f);
    if (std::fabs(d) <= 1e-12f) continue;
    int64_t xmin = static_cast<int64_t>(
        std::floor(std::min(x0f, std::min(x1f, x2f))));
    int64_t xmax = static_cast<int64_t>(
        std::ceil(std::max(x0f, std::max(x1f, x2f)))) + 1;
    int64_t ymin = static_cast<int64_t>(
        std::floor(std::min(y0f, std::min(y1f, y2f))));
    int64_t ymax = static_cast<int64_t>(
        std::ceil(std::max(y0f, std::max(y1f, y2f)))) + 1;
    xmin = std::max<int64_t>(xmin, 0);
    xmax = std::min<int64_t>(xmax, W);
    ymin = std::max<int64_t>(ymin, y0);
    ymax = std::min<int64_t>(ymax, y1);
    if (xmin >= xmax || ymin >= ymax) continue;
    const float inv_d = 1.0f / d;
    const float z0 = z[i0], z1 = z[i1], z2 = z[i2];
    for (int64_t y = ymin; y < ymax; ++y) {
      const float ey = static_cast<float>(y) - y2f;
      for (int64_t x = xmin; x < xmax; ++x) {
        const float ex = static_cast<float>(x) - x2f;
        const float w0 = ((y1f - y2f) * ex + (x2f - x1f) * ey) * inv_d;
        if (w0 < 0.0f) continue;
        const float w1 = ((y2f - y0f) * ex + (x0f - x2f) * ey) * inv_d;
        if (w1 < 0.0f) continue;
        const float w2 = 1.0f - w0 - w1;
        if (w2 < 0.0f) continue;
        const float zf = w0 * z0 + w1 * z1 + w2 * z2;
        const int64_t p = y * W + x;
        if (zf < depth[p]) {
          depth[p] = zf;
          face_id[p] = static_cast<int32_t>(fi);
          bary[3 * p] = w0;
          bary[3 * p + 1] = w1;
          bary[3 * p + 2] = w2;
        }
      }
    }
  }
}

// Blinn-Phong shading of covered fragments (matches the numpy
// _blinn_phong + per-pixel normal interpolation in
// shapy_tpu/render/rasterizer.py). Two-sided: normals are flipped
// toward the viewer (SKIP_CULL_FACES semantics). Perspective view rays
// from the pixel position, or the constant (0, 0, -1) when ortho != 0.
//
// pix: (N,) flat pixel ids; fid: (N,) face ids; bary: (N, 3);
// vnormals: (V, 3) unit vertex normals; faces: (F, 3);
// base: (N, 3) per-fragment diffuse base color (caller broadcasts the
// material color or interpolates vertex colors);
// lights: (L, 4) rows [dx, dy, dz, intensity] (direction of travel,
// unit length); spec_color: (3,); out rgb: (N, 3).
static void shade_band(const int64_t* pix, const int32_t* fid,
                       const float* bary, int64_t n0, int64_t n1,
                       const float* vnormals, const int32_t* faces,
                       const float* base, const float* lights, int64_t L,
                       const float* spec_color, float shininess,
                       float ambient, float fx, float fy, float cx,
                       float cy, int64_t W, int ortho, float* rgb) {
  for (int64_t i = n0; i < n1; ++i) {
    const int32_t f = fid[i];
    const int32_t a = faces[3 * f], b = faces[3 * f + 1],
                  c = faces[3 * f + 2];
    const float w0 = bary[3 * i], w1 = bary[3 * i + 1],
                w2 = bary[3 * i + 2];
    float nx = w0 * vnormals[3 * a] + w1 * vnormals[3 * b] +
               w2 * vnormals[3 * c];
    float ny = w0 * vnormals[3 * a + 1] + w1 * vnormals[3 * b + 1] +
               w2 * vnormals[3 * c + 1];
    float nz = w0 * vnormals[3 * a + 2] + w1 * vnormals[3 * b + 2] +
               w2 * vnormals[3 * c + 2];
    float nn = std::sqrt(nx * nx + ny * ny + nz * nz);
    nn = nn > 1e-12f ? 1.0f / nn : 0.0f;
    nx *= nn; ny *= nn; nz *= nn;
    // view: unit direction pixel -> camera
    float vx = 0.0f, vy = 0.0f, vz = -1.0f;
    if (!ortho) {
      const int64_t gy = pix[i] / W, gx = pix[i] % W;
      vx = -(static_cast<float>(gx) - cx) / fx;
      vy = -(static_cast<float>(gy) - cy) / fy;
      const float vn =
          1.0f / std::sqrt(vx * vx + vy * vy + 1.0f);
      vx *= vn; vy *= vn; vz = -vn;
    }
    const float ndotv = nx * vx + ny * vy + nz * vz;
    if (ndotv < 0.0f) { nx = -nx; ny = -ny; nz = -nz; }
    float diff = ambient;
    float sr = 0.0f, sg = 0.0f, sb = 0.0f;
    for (int64_t l = 0; l < L; ++l) {
      const float lx = -lights[4 * l], ly = -lights[4 * l + 1],
                  lz = -lights[4 * l + 2];
      const float inten = lights[4 * l + 3];
      float ndotl = nx * lx + ny * ly + nz * lz;
      if (ndotl < 0.0f) ndotl = 0.0f;
      diff += inten * ndotl;
      if (ndotl > 0.0f) {
        float hx = lx + vx, hy = ly + vy, hz = lz + vz;
        const float hn =
            std::sqrt(hx * hx + hy * hy + hz * hz);
        if (hn > 1e-12f) { hx /= hn; hy /= hn; hz /= hn; }
        float ndoth = nx * hx + ny * hy + nz * hz;
        if (ndoth < 0.0f) ndoth = 0.0f;
        const float s = inten * std::pow(ndoth, shininess);
        sr += s * spec_color[0];
        sg += s * spec_color[1];
        sb += s * spec_color[2];
      }
    }
    if (diff > 1.0f) diff = 1.0f;
    float r = base[3 * i] * diff + sr;
    float g = base[3 * i + 1] * diff + sg;
    float bl = base[3 * i + 2] * diff + sb;
    rgb[3 * i] = r < 0.0f ? 0.0f : (r > 1.0f ? 1.0f : r);
    rgb[3 * i + 1] = g < 0.0f ? 0.0f : (g > 1.0f ? 1.0f : g);
    rgb[3 * i + 2] = bl < 0.0f ? 0.0f : (bl > 1.0f ? 1.0f : bl);
  }
}

void shade_fragments(const int64_t* pix, const int32_t* fid,
                     const float* bary, int64_t N, const float* vnormals,
                     const int32_t* faces, const float* base,
                     const float* lights, int64_t L,
                     const float* spec_color, float shininess,
                     float ambient, float fx, float fy, float cx, float cy,
                     int64_t W, int32_t ortho, float* rgb,
                     int64_t num_threads) {
  const int64_t nt =
      std::max<int64_t>(1, std::min<int64_t>(num_threads, N ? N : 1));
  if (nt == 1 || N < 16384) {
    shade_band(pix, fid, bary, 0, N, vnormals, faces, base, lights, L,
               spec_color, shininess, ambient, fx, fy, cx, cy, W, ortho,
               rgb);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (N + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t n0 = t * chunk;
    const int64_t n1 = std::min<int64_t>(n0 + chunk, N);
    if (n0 >= n1) break;
    threads.emplace_back([=]() {
      shade_band(pix, fid, bary, n0, n1, vnormals, faces, base, lights, L,
                 spec_color, shininess, ambient, fx, fy, cx, cy, W, ortho,
                 rgb);
    });
  }
  for (auto& th : threads) th.join();
}

void rasterize_fragments(const float* pts, const float* z,
                         const int32_t* faces, int64_t F, int64_t H,
                         int64_t W, int32_t* face_id, float* bary,
                         float* depth, int64_t num_threads) {
  const int64_t n = H * W;
  const float inf = std::numeric_limits<float>::infinity();
  for (int64_t p = 0; p < n; ++p) {
    face_id[p] = -1;
    depth[p] = inf;
  }
  std::memset(bary, 0, sizeof(float) * 3 * n);
  const int64_t nt =
      std::max<int64_t>(1, std::min<int64_t>(num_threads, H));
  if (nt == 1) {
    rasterize_band(pts, z, faces, F, H, W, 0, H, face_id, bary, depth);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t rows = (H + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t y0 = t * rows;
    const int64_t y1 = std::min<int64_t>(y0 + rows, H);
    if (y0 >= y1) break;
    threads.emplace_back([=]() {
      rasterize_band(pts, z, faces, F, H, W, y0, y1, face_id, bary, depth);
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
