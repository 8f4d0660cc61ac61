// gd3d native host runtime: hot host-side ops for the data pipeline.
//
// The reference's only native component is a CUDA kernel (cuRoPE2D); the TPU
// rebuild moves that to Pallas (gd3d/kernels/rope2d.py) and instead spends
// native code where a TPU deployment actually needs it: the HOST data path
// that has to keep up with the device step (image normalization/resize,
// depth rasterization, batch collation). Exposed as a plain C ABI for
// ctypes — no pybind11 dependency.
//
// Build: ./build.sh  (g++ -O3 -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

// Run fn(begin, end) over [0, total) split across threads.
template <typename F>
void parallel_for(int64_t total, F fn) {
  int nt = std::min<int64_t>(hw_threads(), total);
  if (nt <= 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (total + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min<int64_t>(b + chunk, total);
    if (b >= e) break;
    threads.emplace_back([=] { fn(b, e); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Half-pixel bilinear resize, NHWC float32 (torchvision F.resize semantics,
// antialias off). One call = one image.
void gd3d_resize_bilinear_f32(const float* src, int64_t H, int64_t W,
                              int64_t C, float* dst, int64_t OH, int64_t OW) {
  const float sy = static_cast<float>(H) / static_cast<float>(OH);
  const float sx = static_cast<float>(W) / static_cast<float>(OW);
  parallel_for(OH, [&](int64_t r0, int64_t r1) {
    for (int64_t oy = r0; oy < r1; ++oy) {
      float fy = (oy + 0.5f) * sy - 0.5f;
      int64_t y0 = static_cast<int64_t>(std::floor(fy));
      float ty = fy - y0;
      int64_t y0c = std::clamp<int64_t>(y0, 0, H - 1);
      int64_t y1c = std::clamp<int64_t>(y0 + 1, 0, H - 1);
      for (int64_t ox = 0; ox < OW; ++ox) {
        float fx = (ox + 0.5f) * sx - 0.5f;
        int64_t x0 = static_cast<int64_t>(std::floor(fx));
        float tx = fx - x0;
        int64_t x0c = std::clamp<int64_t>(x0, 0, W - 1);
        int64_t x1c = std::clamp<int64_t>(x0 + 1, 0, W - 1);
        const float* p00 = src + (y0c * W + x0c) * C;
        const float* p01 = src + (y0c * W + x1c) * C;
        const float* p10 = src + (y1c * W + x0c) * C;
        const float* p11 = src + (y1c * W + x1c) * C;
        float* out = dst + (oy * OW + ox) * C;
        for (int64_t c = 0; c < C; ++c) {
          float top = p00[c] * (1 - tx) + p01[c] * tx;
          float bot = p10[c] * (1 - tx) + p11[c] * tx;
          out[c] = top * (1 - ty) + bot * ty;
        }
      }
    }
  });
}

// uint8 HWC -> float32 HWC with scale + per-channel mean/std normalization
// (the collate hot loop: /255 then (x - mean) / std).
void gd3d_u8_to_f32_norm(const uint8_t* src, int64_t N, int64_t C,
                         const float* mean, const float* std_, float* dst) {
  parallel_for(N, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      for (int64_t c = 0; c < C; ++c) {
        float v = src[i * C + c] * (1.0f / 255.0f);
        dst[i * C + c] = (v - mean[c]) / std_[c];
      }
    }
  });
}

// Average-Z depth rasterization (utils/functions.py:218-259 CPU fast path):
// points (N, 3) camera frame, K row-major 3x3, output (h, w) zeroed by caller.
void gd3d_point_cloud_to_depth(const float* points, int64_t N, const float* K,
                               int64_t w, int64_t h, float* depth_sum,
                               int32_t* counts) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  // single-threaded scatter (atomic-free); N ~ 200k -> sub-ms
  for (int64_t i = 0; i < N; ++i) {
    float X = points[i * 3], Y = points[i * 3 + 1], Z = points[i * 3 + 2];
    if (!(Z > 0)) continue;
    int64_t u = static_cast<int64_t>(std::nearbyint(X / Z * fx + cx));
    int64_t v = static_cast<int64_t>(std::nearbyint(Y / Z * fy + cy));
    if (u < 0 || u >= w || v < 0 || v >= h) continue;
    depth_sum[v * w + u] += Z;
    counts[v * w + u] += 1;
  }
  parallel_for(h * w, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      depth_sum[i] = counts[i] > 0 ? depth_sum[i] / counts[i] : 0.0f;
    }
  });
}

// Pad/copy keypoints into a fixed-capacity slot with validity flags
// (the static-shape batching step; gd3d/data/loader.py pad_keypoints).
void gd3d_pad_keypoints(const float* kps, const float* pts3d,
                        const uint8_t* valid_in, int64_t n, int64_t capacity,
                        float* kps_out, float* pts3d_out, uint8_t* valid_out) {
  int64_t m = std::min(n, capacity);
  std::memcpy(kps_out, kps, m * 2 * sizeof(float));
  std::memcpy(pts3d_out, pts3d, m * 3 * sizeof(float));
  if (valid_in) {
    std::memcpy(valid_out, valid_in, m * sizeof(uint8_t));
  } else {
    std::memset(valid_out, 1, m);
  }
  if (m < capacity) {
    std::memset(kps_out + m * 2, 0, (capacity - m) * 2 * sizeof(float));
    std::memset(pts3d_out + m * 3, 0, (capacity - m) * 3 * sizeof(float));
    std::memset(valid_out + m, 0, capacity - m);
  }
}

// Z-buffer triangle rasterization with perspective-correct vertex-color
// interpolation — the offline-renderer hot loop
// (gd3d/data/render_synthetic.py::render_mesh numpy fallback; reference
// stage: BlenderProc, data_utils/blenderproc.py:13-87). Real Objaverse .glb
// meshes run to ~100k faces x 42 views per object, which the per-face numpy
// loop cannot sustain. Inputs: camera-space verts (V, 3) double, faces
// (F, 3) int32, vertex colors (V, 3) float, K row-major 3x3 double. Outputs
// (caller-initialized): rgb (H, W, 3) float zeroed, zbuf (H, W) float +inf.
// Sequential over faces (z-test races under threading; one 512^2 view with
// 100k faces is ~20 ms serial).
void gd3d_rasterize_mesh(const double* cam, int64_t V, const int32_t* faces,
                         int64_t F, const float* colors, const double* K,
                         int64_t H, int64_t W, float* rgb, float* zbuf) {
  const double fx = K[0], sk = K[1], cx = K[2], fy = K[4], cy = K[5];
  std::vector<double> u(V), v(V), z(V);
  parallel_for(V, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const double X = cam[i * 3], Y = cam[i * 3 + 1];
      z[i] = cam[i * 3 + 2];
      const double zi = 1.0 / std::max(z[i], 1e-8);
      u[i] = (fx * X + sk * Y + cx * z[i]) * zi;
      v[i] = (fy * Y + cy * z[i]) * zi;
    }
  });
  for (int64_t f = 0; f < F; ++f) {
    const int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    const double za = z[a], zb = z[b], zc = z[c];
    if (za <= 0.05 || zb <= 0.05 || zc <= 0.05) continue;  // near clip
    const double x0 = u[a], y0 = v[a], x1 = u[b], y1 = v[b], x2 = u[c],
                 y2 = v[c];
    const int64_t lx = std::max<int64_t>(
        0, static_cast<int64_t>(std::floor(std::min({x0, x1, x2}))));
    const int64_t ly = std::max<int64_t>(
        0, static_cast<int64_t>(std::floor(std::min({y0, y1, y2}))));
    const int64_t hx = std::min<int64_t>(
        W, static_cast<int64_t>(std::ceil(std::max({x0, x1, x2}))) + 1);
    const int64_t hy = std::min<int64_t>(
        H, static_cast<int64_t>(std::ceil(std::max({y0, y1, y2}))) + 1);
    if (hx <= lx || hy <= ly) continue;
    const double d = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2);
    if (std::abs(d) < 1e-12) continue;
    const double iza = 1.0 / za, izb = 1.0 / zb, izc = 1.0 / zc;
    for (int64_t py = ly; py < hy; ++py) {
      const double qy = py + 0.5;
      for (int64_t px = lx; px < hx; ++px) {
        const double qx = px + 0.5;
        const double w0 = ((y1 - y2) * (qx - x2) + (x2 - x1) * (qy - y2)) / d;
        const double w1 = ((y2 - y0) * (qx - x2) + (x0 - x2) * (qy - y2)) / d;
        const double w2 = 1.0 - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        const double pz = 1.0 / (w0 * iza + w1 * izb + w2 * izc);
        float* zp = zbuf + py * W + px;
        if (!(pz < *zp)) continue;
        *zp = static_cast<float>(pz);
        float* out = rgb + (py * W + px) * 3;
        const double wa = w0 * iza * pz, wb = w1 * izb * pz,
                     wc = w2 * izc * pz;
        for (int k = 0; k < 3; ++k) {
          out[k] = static_cast<float>(wa * colors[a * 3 + k] +
                                      wb * colors[b * 3 + k] +
                                      wc * colors[c * 3 + k]);
        }
      }
    }
  }
}

int gd3d_version() { return 1; }

}  // extern "C"
