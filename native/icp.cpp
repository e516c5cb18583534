// Point-to-point ICP with scene->model correspondences (C ABI for ctypes).
//
// Native replacement for Open3D ICP (SURVEY.md N8; zephyr.utils.icp,
// ref scripts/online_learning.py:473-480) and the refinement stage of the PPF
// matcher (Halcon's DensePoseRefinement role). Correspondences are found with
// a uniform-grid spatial hash; the rigid update is Kabsch via a Jacobi
// eigen-solver on the 3x3 covariance.
//
// Direction: for each SCENE point (a real observation), find the nearest
// transformed MODEL point — unbiased under partial visibility. The
// correspondence cap anneals from coarse_start down to max_dist.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>
#include <algorithm>

namespace {

struct V3 { double x, y, z; };

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

// Jacobi eigendecomposition of a symmetric 3x3 matrix A; returns eigenvalues
// in w and eigenvectors in columns of V (row-major V[r*3+c]).
void jacobiEig(const double A_in[9], double w[3], double V[9]) {
  double A[9];
  std::memcpy(A, A_in, sizeof(A));
  for (int i = 0; i < 9; i++) V[i] = 0.0;
  V[0] = V[4] = V[8] = 1.0;
  for (int sweep = 0; sweep < 32; sweep++) {
    double off = std::fabs(A[1]) + std::fabs(A[2]) + std::fabs(A[5]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++) {
      for (int q = p + 1; q < 3; q++) {
        double apq = A[p * 3 + q];
        if (std::fabs(apq) < 1e-18) continue;
        double app = A[p * 3 + p], aqq = A[q * 3 + q];
        double theta = 0.5 * (aqq - app) / apq;
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0);
        double s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = A[k * 3 + p], akq = A[k * 3 + q];
          A[k * 3 + p] = c * akp - s * akq;
          A[k * 3 + q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = A[p * 3 + k], aqk = A[q * 3 + k];
          A[p * 3 + k] = c * apk - s * aqk;
          A[q * 3 + k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = V[k * 3 + p], vkq = V[k * 3 + q];
          V[k * 3 + p] = c * vkp - s * vkq;
          V[k * 3 + q] = s * vkp + c * vkq;
        }
      }
    }
  }
  w[0] = A[0]; w[1] = A[4]; w[2] = A[8];
}

// Kabsch: rotation R and translation t with Q ~= R P + t.
// P, Q: arrays of n V3 pairs. Uses SVD of H = X Y^T via eig of H^T H.
bool kabsch(const std::vector<V3>& P, const std::vector<V3>& Q, double R[9], V3* t) {
  int n = (int)P.size();
  if (n < 3) return false;
  V3 pc{0, 0, 0}, qc{0, 0, 0};
  for (int i = 0; i < n; i++) {
    pc.x += P[i].x; pc.y += P[i].y; pc.z += P[i].z;
    qc.x += Q[i].x; qc.y += Q[i].y; qc.z += Q[i].z;
  }
  pc.x /= n; pc.y /= n; pc.z /= n;
  qc.x /= n; qc.y /= n; qc.z /= n;

  double H[9] = {0};  // H = sum (p - pc)(q - qc)^T
  for (int i = 0; i < n; i++) {
    V3 a = sub(P[i], pc), b = sub(Q[i], qc);
    H[0] += a.x * b.x; H[1] += a.x * b.y; H[2] += a.x * b.z;
    H[3] += a.y * b.x; H[4] += a.y * b.y; H[5] += a.y * b.z;
    H[6] += a.z * b.x; H[7] += a.z * b.y; H[8] += a.z * b.z;
  }
  // SVD via eig: H = U S V^T ; H^T H = V S^2 V^T
  double HtH[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += H[k * 3 + i] * H[k * 3 + j];
      HtH[i * 3 + j] = s;
    }
  double w[3], V[9];
  jacobiEig(HtH, w, V);
  // U columns = H v_i / sigma_i
  double U[9];
  for (int i = 0; i < 3; i++) {
    double sigma = std::sqrt(std::max(w[i], 1e-30));
    for (int r = 0; r < 3; r++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += H[r * 3 + k] * V[k * 3 + i];
      U[r * 3 + i] = s / sigma;
    }
  }
  // orthonormalize U (Gram-Schmidt; degenerate sigma guard)
  auto col = [&](double* M, int i) { return V3{M[i], M[3 + i], M[6 + i]}; };
  auto setcol = [&](double* M, int i, const V3& v) { M[i] = v.x; M[3 + i] = v.y; M[6 + i] = v.z; };
  V3 u0 = col(U, 0);
  double n0 = std::sqrt(dot(u0, u0)); if (n0 < 1e-12) return false;
  u0 = {u0.x / n0, u0.y / n0, u0.z / n0};
  V3 u1 = col(U, 1);
  double d01 = dot(u1, u0);
  u1 = {u1.x - d01 * u0.x, u1.y - d01 * u0.y, u1.z - d01 * u0.z};
  double n1 = std::sqrt(dot(u1, u1)); if (n1 < 1e-12) return false;
  u1 = {u1.x / n1, u1.y / n1, u1.z / n1};
  V3 u2 = {u0.y * u1.z - u0.z * u1.y, u0.z * u1.x - u0.x * u1.z, u0.x * u1.y - u0.y * u1.x};
  setcol(U, 0, u0); setcol(U, 1, u1); setcol(U, 2, u2);

  // R = U' V^T with det correction: here Q ~= R P so R maps P->Q: R = U V^T?
  // With H = sum p q^T (p rows): standard result R = V_svd U_svd^T where
  // H = U_svd S V_svd^T. Our U ~ U_svd, V ~ V_svd. So R = ... careful:
  // e_q = R e_p maximizing trace(R H) -> R = (H^T)^+ ... use R = Vq Ut with
  // H = U S V^T means R = V U^T maps q->p? Verify with identity: P=Q ->
  // H symmetric positive -> U=V -> R=I either way. Empirically (tested via
  // the python binding) R = U_svd V_svd^T is the map P->Q when H = sum p q^T
  // is built as above with p in rows... we build H = sum a b^T with a=p-pc
  // (rows) and b=q-qc (cols), i.e. H_ij = sum a_i b_j. trace(R H) with
  // R: P->Q wants R = argmax sum b^T R a = trace(H R) -> R = V_svd U_svd^T.
  double Rm[9];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double s = 0;
      for (int k = 0; k < 3; k++) s += V[i * 3 + k] * U[j * 3 + k];
      Rm[i * 3 + j] = s;
    }
  // det correction for reflections
  double det = Rm[0] * (Rm[4] * Rm[8] - Rm[5] * Rm[7]) -
               Rm[1] * (Rm[3] * Rm[8] - Rm[5] * Rm[6]) +
               Rm[2] * (Rm[3] * Rm[7] - Rm[4] * Rm[6]);
  if (det < 0) {
    // flip the V column with the smallest eigenvalue
    int mi = 0;
    if (w[1] < w[mi]) mi = 1;
    if (w[2] < w[mi]) mi = 2;
    for (int r = 0; r < 3; r++) V[r * 3 + mi] = -V[r * 3 + mi];
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += V[i * 3 + k] * U[j * 3 + k];
        Rm[i * 3 + j] = s;
      }
  }
  std::memcpy(R, Rm, sizeof(Rm));
  t->x = qc.x - (R[0] * pc.x + R[1] * pc.y + R[2] * pc.z);
  t->y = qc.y - (R[3] * pc.x + R[4] * pc.y + R[5] * pc.z);
  t->z = qc.z - (R[6] * pc.x + R[7] * pc.y + R[8] * pc.z);
  return true;
}

struct Grid {
  double cell;
  std::unordered_map<uint64_t, std::vector<int>> map;
  const std::vector<V3>* pts;

  static uint64_t key(int64_t x, int64_t y, int64_t z) {
    return (uint64_t)(x & 0x1FFFFF) | ((uint64_t)(y & 0x1FFFFF) << 21) |
           ((uint64_t)(z & 0x1FFFFF) << 42);
  }

  void build(const std::vector<V3>& p, double c) {
    cell = c;
    pts = &p;
    map.clear();
    for (size_t i = 0; i < p.size(); i++) {
      map[key((int64_t)std::floor(p[i].x / c), (int64_t)std::floor(p[i].y / c),
              (int64_t)std::floor(p[i].z / c))].push_back((int)i);
    }
  }

  // nearest neighbor within cap; returns index or -1
  int query(const V3& q, double cap, double* best_d2) const {
    int best = -1;
    double bd = cap * cap;
    int64_t gx = (int64_t)std::floor(q.x / cell);
    int64_t gy = (int64_t)std::floor(q.y / cell);
    int64_t gz = (int64_t)std::floor(q.z / cell);
    int reach = (int)std::ceil(cap / cell);
    for (int dx = -reach; dx <= reach; dx++)
      for (int dy = -reach; dy <= reach; dy++)
        for (int dz = -reach; dz <= reach; dz++) {
          auto it = map.find(key(gx + dx, gy + dy, gz + dz));
          if (it == map.end()) continue;
          for (int i : it->second) {
            V3 d = sub((*pts)[i], q);
            double d2 = dot(d, d);
            if (d2 < bd) { bd = d2; best = i; }
          }
        }
    *best_d2 = bd;
    return best;
  }
};

}  // namespace

extern "C" {

// pose: row-major 4x4 (in/out). Returns rms error (meters) or -1 on failure.
double icp_refine(const double* model_pts, int n_model,
                  const double* scene_pts, int n_scene,
                  double* pose, double max_dist, double coarse_start,
                  int max_iter) {
  if (n_model < 10 || n_scene < 10) return -1.0;
  std::vector<V3> model(n_model), scene(n_scene);
  for (int i = 0; i < n_model; i++)
    model[i] = {model_pts[3 * i], model_pts[3 * i + 1], model_pts[3 * i + 2]};
  for (int i = 0; i < n_scene; i++)
    scene[i] = {scene_pts[3 * i], scene_pts[3 * i + 1], scene_pts[3 * i + 2]};

  double R[9] = {pose[0], pose[1], pose[2], pose[4], pose[5], pose[6],
                 pose[8], pose[9], pose[10]};
  V3 t = {pose[3], pose[7], pose[11]};

  double start = std::max(coarse_start, max_dist);
  std::vector<V3> tm(n_model);
  Grid grid;
  std::vector<V3> P, Q;
  double err = -1.0, prev = 1e30;
  for (int it = 0; it < max_iter; it++) {
    double cap = std::max(max_dist, start * std::pow(0.7, it));
    for (int i = 0; i < n_model; i++) {
      const V3& p = model[i];
      tm[i] = {R[0] * p.x + R[1] * p.y + R[2] * p.z + t.x,
               R[3] * p.x + R[4] * p.y + R[5] * p.z + t.y,
               R[6] * p.x + R[7] * p.y + R[8] * p.z + t.z};
    }
    grid.build(tm, cap);
    P.clear(); Q.clear();
    double sse = 0;
    for (int i = 0; i < n_scene; i++) {
      double d2;
      int j = grid.query(scene[i], cap, &d2);
      if (j < 0) continue;
      P.push_back(tm[j]);
      Q.push_back(scene[i]);
      sse += d2;
    }
    if ((int)P.size() < 10) return -1.0;
    err = std::sqrt(sse / P.size());
    double dR[9]; V3 dt;
    if (!kabsch(P, Q, dR, &dt)) return -1.0;
    // compose: R <- dR R ; t <- dR t + dt
    double Rn[9];
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += dR[i * 3 + k] * R[k * 3 + j];
        Rn[i * 3 + j] = s;
      }
    V3 tn = {dR[0] * t.x + dR[1] * t.y + dR[2] * t.z + dt.x,
             dR[3] * t.x + dR[4] * t.y + dR[5] * t.z + dt.y,
             dR[6] * t.x + dR[7] * t.y + dR[8] * t.z + dt.z};
    std::memcpy(R, Rn, sizeof(R));
    t = tn;
    if (std::fabs(prev - err) < 1e-7) break;
    prev = err;
  }
  pose[0] = R[0]; pose[1] = R[1]; pose[2] = R[2]; pose[3] = t.x;
  pose[4] = R[3]; pose[5] = R[4]; pose[6] = R[5]; pose[7] = t.y;
  pose[8] = R[6]; pose[9] = R[7]; pose[10] = R[8]; pose[11] = t.z;
  return err;
}

}  // extern "C"
