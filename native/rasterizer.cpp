// Z-buffer triangle rasterizer (C ABI for ctypes).
//
// Hot-path backend for ossid_code_tpu.render.rasterizer: the online loop
// renders the predicted pose's depth every frame for pseudo-label visible
// masks (ref scripts/online_learning.py:485-500); BOP meshes have 10k-300k
// triangles, which the numpy fallback cannot rasterize at frame rate.
//
// Perspective-correct depth via 1/z interpolation; top-left-agnostic coverage
// (inclusive edges) matching the numpy implementation.

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <limits>

extern "C" {

// vertices: (n_verts, 3) float64 (meters, object frame)
// faces: (n_faces, 3) int32
// K: row-major 3x3; pose: row-major 4x4 (object -> camera)
// out_depth: (h, w) float32, 0 = empty (caller pre-zeroes or we overwrite)
void rasterize_depth(const double* vertices, int n_verts,
                     const int32_t* faces, int n_faces,
                     const double* K, const double* pose,
                     int h, int w, float* out_depth) {
  const double fx = K[0], cx = K[2], fy = K[4], cy = K[5];

  // transform + project all vertices
  double* u = new double[n_verts];
  double* v = new double[n_verts];
  double* z = new double[n_verts];
  for (int i = 0; i < n_verts; i++) {
    const double X = vertices[3 * i], Y = vertices[3 * i + 1], Z = vertices[3 * i + 2];
    const double xc = pose[0] * X + pose[1] * Y + pose[2] * Z + pose[3];
    const double yc = pose[4] * X + pose[5] * Y + pose[6] * Z + pose[7];
    const double zc = pose[8] * X + pose[9] * Y + pose[10] * Z + pose[11];
    z[i] = zc;
    const double zs = zc > 1e-9 ? zc : 1e-9;
    u[i] = fx * xc / zs + cx;
    v[i] = fy * yc / zs + cy;
  }

  const float INF = std::numeric_limits<float>::infinity();
  for (int p = 0; p < h * w; p++) out_depth[p] = INF;

  for (int f = 0; f < n_faces; f++) {
    const int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    if (z[a] <= 1e-6 || z[b] <= 1e-6 || z[c] <= 1e-6) continue;
    const double xa = u[a], xb = u[b], xc2 = u[c];
    const double ya = v[a], yb = v[b], yc2 = v[c];
    int x0 = (int)std::floor(std::min({xa, xb, xc2}));
    int x1 = (int)std::ceil(std::max({xa, xb, xc2}));
    int y0 = (int)std::floor(std::min({ya, yb, yc2}));
    int y1 = (int)std::ceil(std::max({ya, yb, yc2}));
    x0 = std::max(x0, 0); x1 = std::min(x1, w - 1);
    y0 = std::max(y0, 0); y1 = std::min(y1, h - 1);
    if (x1 < x0 || y1 < y0) continue;
    const double d = (xb - xa) * (yc2 - ya) - (xc2 - xa) * (yb - ya);
    if (std::fabs(d) < 1e-12) continue;
    const double inv_d = 1.0 / d;
    const double iza = 1.0 / z[a], izb = 1.0 / z[b], izc = 1.0 / z[c];
    for (int py = y0; py <= y1; py++) {
      for (int px = x0; px <= x1; px++) {
        const double l1 = ((px - xa) * (yc2 - ya) - (py - ya) * (xc2 - xa)) * inv_d;
        const double l2 = -((px - xa) * (yb - ya) - (py - ya) * (xb - xa)) * inv_d;
        const double l0 = 1.0 - l1 - l2;
        if (l0 < -1e-9 || l1 < -1e-9 || l2 < -1e-9) continue;
        const double invz = l0 * iza + l1 * izb + l2 * izc;
        const float zp = (float)(1.0 / (invz > 1e-9 ? invz : 1e-9));
        float& dst = out_depth[py * w + px];
        if (zp < dst) dst = zp;
      }
    }
  }
  for (int p = 0; p < h * w; p++)
    if (!(out_depth[p] < INF)) out_depth[p] = 0.0f;

  delete[] u; delete[] v; delete[] z;
}

}  // extern "C"
