// Native host-side core (SURVEY.md 2.4: the TPU-native equivalent of the
// reference stack's C++ layers -- PyTorch DataLoader workers, shapely/GEOS
// rotated-geometry, numba-jitted eval kernels).
//
// Exposed через a plain C ABI and loaded with ctypes (no pybind11 in this
// image). Everything here is host-side data-path work: the TPU compute
// path stays in XLA/Pallas.
//
// Build: see dcf/native/__init__.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Read a KITTI velodyne .bin (float32 x,y,z,intensity rows).
// Returns the number of floats written into `out` (<= max_floats), or -1.
int dcf_read_velodyne(const char* path, float* out, int64_t max_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  size_t n = fread(out, sizeof(float), (size_t)max_floats, f);
  fclose(f);
  return (int)n;
}

// ROI crop + static-shape pad (SURVEY.md D3 host half).
// roi = [x_min, x_max, y_min, y_max, z_min, z_max].
// out: [max_points, 4] zero-padded; mask: [max_points] 0/1.
// Returns number of kept points (before truncation to max_points).
int dcf_crop_pad(const float* pts, int64_t n, const double* roi,
                 int64_t max_points, int64_t stride_floats,
                 float* out, uint8_t* mask) {
  std::memset(out, 0, (size_t)max_points * 4 * sizeof(float));
  std::memset(mask, 0, (size_t)max_points);
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + i * stride_floats;
    if (p[0] >= roi[0] && p[0] < roi[1] && p[1] >= roi[2] && p[1] < roi[3] &&
        p[2] >= roi[4] && p[2] < roi[5]) {
      if (kept < max_points) {
        float* q = out + kept * 4;
        q[0] = p[0]; q[1] = p[1]; q[2] = p[2];
        q[3] = stride_floats > 3 ? p[3] : 0.f;
        mask[kept] = 1;
      }
      ++kept;
    }
  }
  return (int)std::min<int64_t>(kept, max_points);
}

namespace {

struct P2 { double x, y; };

inline double cross(const P2& o, const P2& a, const P2& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// corners of (x, y, dx, dy, yaw), CCW
inline void corners(const double* b, P2* c) {
  const double hx = b[2] * 0.5, hy = b[3] * 0.5;
  const double cs = std::cos(b[4]), sn = std::sin(b[4]);
  const double lx[4] = {hx, -hx, -hx, hx};
  const double ly[4] = {hy, hy, -hy, -hy};
  for (int k = 0; k < 4; ++k) {
    c[k].x = lx[k] * cs - ly[k] * sn + b[0];
    c[k].y = lx[k] * sn + ly[k] * cs + b[1];
  }
}

// Sutherland-Hodgman intersection area of two rotated rects.
double rect_intersection(const double* a, const double* b) {
  P2 ca[4], cb[4];
  corners(a, ca);
  corners(b, cb);
  P2 poly[16], next[16];
  int n = 4;
  for (int k = 0; k < 4; ++k) poly[k] = ca[k];
  for (int e = 0; e < 4 && n > 0; ++e) {
    const P2& p1 = cb[e];
    const P2& p2 = cb[(e + 1) & 3];
    int m = 0;
    for (int i = 0; i < n; ++i) {
      const P2& cur = poly[i];
      const P2& prev = poly[(i + n - 1) % n];
      const double dc = cross(p1, p2, cur);
      const double dp = cross(p1, p2, prev);
      if ((dc >= 0) != (dp >= 0)) {
        const double t = dp / (dp - dc);
        next[m].x = prev.x + t * (cur.x - prev.x);
        next[m].y = prev.y + t * (cur.y - prev.y);
        ++m;
      }
      if (dc >= 0) next[m++] = cur;
    }
    n = m;
    for (int i = 0; i < n; ++i) poly[i] = next[i];
  }
  if (n < 3) return 0.0;
  double area2 = 0.0;
  for (int i = 0; i < n; ++i) {
    const P2& p = poly[i];
    const P2& q = poly[(i + 1) % n];
    area2 += p.x * q.y - p.y * q.x;
  }
  return std::fabs(area2) * 0.5;
}

}  // namespace

// Pairwise rotated BEV IoU: boxes [n,5] x [m,5] (x, y, dx, dy, yaw) -> [n,m].
void dcf_rotated_iou_bev(const double* boxes_a, int64_t n,
                         const double* boxes_b, int64_t m, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* a = boxes_a + i * 5;
    const double area_a = a[2] * a[3];
    for (int64_t j = 0; j < m; ++j) {
      const double* b = boxes_b + j * 5;
      const double dx = a[0] - b[0], dy = a[1] - b[1];
      const double r = 0.5 * (std::hypot(a[2], a[3]) + std::hypot(b[2], b[3]));
      double iou = 0.0;
      if (dx * dx + dy * dy <= r * r) {
        const double inter = rect_intersection(a, b);
        const double uni = area_a + b[2] * b[3] - inter;
        iou = uni > 1e-9 ? inter / uni : 0.0;
      }
      out[i * m + j] = iou;
    }
  }
}

// Pairwise 3D IoU of box7s [n,7] x [m,7] -> [n,m].
void dcf_iou_3d(const double* boxes_a, int64_t n,
                const double* boxes_b, int64_t m, double* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* a = boxes_a + i * 7;
    const double bev_a[5] = {a[0], a[1], a[3], a[4], a[6]};
    const double vol_a = a[3] * a[4] * a[5];
    for (int64_t j = 0; j < m; ++j) {
      const double* b = boxes_b + j * 7;
      const double bev_b[5] = {b[0], b[1], b[3], b[4], b[6]};
      const double lo = std::max(a[2] - a[5] * 0.5, b[2] - b[5] * 0.5);
      const double hi = std::min(a[2] + a[5] * 0.5, b[2] + b[5] * 0.5);
      double iou = 0.0;
      if (hi > lo) {
        const double inter = rect_intersection(bev_a, bev_b) * (hi - lo);
        const double uni = vol_a + b[3] * b[4] * b[5] - inter;
        iou = uni > 1e-9 ? inter / uni : 0.0;
      }
      out[i * m + j] = iou;
    }
  }
}

}  // extern "C"
