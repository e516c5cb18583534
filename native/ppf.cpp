// Point-Pair-Feature surface matching (Drost et al., CVPR 2010).
//
// C++ replacement for the commercial MVTec Halcon PPF matcher the reference
// depends on (SURVEY.md N1; zephyr.utils.halcon_wrapper.PPFModel, call sites
// /root/reference/python/ossid/scripts/online_learning.py:296-301,412-447).
//
// Pipeline:
//   train:  subsample model points -> hash all point-pair features (F1..F4
//           quantized) -> table: feature -> list of (ref point, alpha_model)
//   match:  subsample scene; for each scene reference point, pair with other
//           scene points, look up matching model pairs, vote in the
//           (model point, alpha) accumulator; peak votes -> candidate poses;
//           greedy pose clustering -> averaged poses ranked by votes.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Units: everything in this file is unit-agnostic; the Python wrapper feeds
// meters. Distances are quantized relative to the model diameter.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <unordered_map>
#include <algorithm>
#include <random>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(x * x + y * y + z * z); }
  Vec3 normalized() const {
    double n = norm();
    return n > 1e-12 ? Vec3{x / n, y / n, z / n} : Vec3{0, 0, 1};
  }
};

struct Mat3 {
  double m[9];
  static Mat3 identity() { return {{1, 0, 0, 0, 1, 0, 0, 0, 1}}; }
  Vec3 apply(const Vec3& v) const {
    return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
            m[3] * v.x + m[4] * v.y + m[5] * v.z,
            m[6] * v.x + m[7] * v.y + m[8] * v.z};
  }
  Mat3 mul(const Mat3& o) const {
    Mat3 r{};
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) {
        double s = 0;
        for (int k = 0; k < 3; k++) s += m[i * 3 + k] * o.m[k * 3 + j];
        r.m[i * 3 + j] = s;
      }
    return r;
  }
  Mat3 transposed() const {
    return {{m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]}};
  }
};

// Rotation aligning vector `n` to +X axis (the PPF canonical frame).
Mat3 alignToX(const Vec3& n) {
  Vec3 x = n.normalized();
  Vec3 up = std::fabs(x.x) < 0.9 ? Vec3{1, 0, 0} : Vec3{0, 1, 0};
  // build orthonormal basis with x as first row
  Vec3 z = x.cross(up).normalized();
  Vec3 y = z.cross(x).normalized();
  // rows: the world->canonical rotation
  return {{x.x, x.y, x.z, y.x, y.y, y.z, z.x, z.y, z.z}};
}

Mat3 rotX(double a) {
  double c = std::cos(a), s = std::sin(a);
  return {{1, 0, 0, 0, c, -s, 0, s, c}};
}

struct PPFKey {
  uint64_t k;
  bool operator==(const PPFKey& o) const { return k == o.k; }
};
struct PPFHash {
  size_t operator()(const PPFKey& p) const { return std::hash<uint64_t>()(p.k); }
};

struct Entry {
  // pre-multiplied accumulator row start (ref_idx * n_angle_bins): the
  // voting inner loop adds the alpha bin and increments — no imul
  int32_t base;
  // model-side planar angle pre-quantized at EIGHTH-bin resolution
  // (offset by 8*n_angle_bins to stay positive): the inner loop bins the
  // difference with integer subtract + wrap + shift. Full-bin double
  // quantization measurably split coherent votes across adjacent bins on
  // planar shapes (box-pose test regressed); at 1/8-bin resolution ~90% of
  // entries bin identically to the exact float difference
  int32_t q8;
};

// splitmix64 finalizer — cheap, well-distributed mix for the flat table
inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

struct PPFModelImpl {
  std::vector<Vec3> pts;
  std::vector<Vec3> nrm;
  std::unordered_map<PPFKey, std::vector<Entry>, PPFHash> table;
  // flattened table (built once after training): open-addressing key probe
  // into CSR entry spans — one contiguous allocation instead of a pointer
  // chase per voting pair. Slot packs key+span in 16 B so a probe touches
  // one cache line.
  struct Slot {
    uint64_t key;                     // EMPTY = ~0
    int32_t start, len;
  };
  std::vector<Slot> flat_slots;
  std::vector<Entry> flat_entries;
  uint64_t flat_mask = 0;
  double diameter;
  double dist_step;
  double angle_step;
  int n_angle_bins;
  // acos-bin lookup: cell i covers cos in [i/512-1, (i+1)/512-1); holds the
  // angle bin when the whole cell maps to one bin, else -1 (exact fallback
  // to acos). Saves ~3 acos calls per voted pair.
  int16_t acos_bin[1025];

  void initAcosLut() {
    for (int i = 0; i < 1025; i++) {
      double c0 = std::max(-1.0, std::min(1.0, i / 512.0 - 1.0));
      double c1 = std::max(-1.0, std::min(1.0, (i + 1) / 512.0 - 1.0));
      int b0 = (int)(std::acos(c0) / angle_step);
      int b1 = (int)(std::acos(c1) / angle_step);
      acos_bin[i] = (b0 == b1) ? (int16_t)b0 : (int16_t)-1;
    }
  }

  inline uint64_t angleBin(double c) const {
    c = std::max(-1.0, std::min(1.0, c));
    int idx = (int)((c + 1.0) * 512.0);
    if (idx > 1024) idx = 1024;
    int16_t b = acos_bin[idx];
    if (b >= 0) return (uint64_t)b;
    return (uint64_t)(std::acos(c) / angle_step);
  }

  PPFKey quantize(const Vec3& d, const Vec3& n1, const Vec3& n2) const {
    double dn = d.norm();
    Vec3 du = dn > 1e-12 ? d * (1.0 / dn) : Vec3{0, 0, 1};
    uint64_t f1 = (uint64_t)(dn / dist_step);
    uint64_t f2 = angleBin(du.dot(n1));
    uint64_t f3 = angleBin(du.dot(n2));
    uint64_t f4 = angleBin(n1.dot(n2));
    return {f1 | (f2 << 16) | (f3 << 32) | (f4 << 48)};
  }

  void flatten() {
    size_t cap = 16;
    while (cap < table.size() * 2) cap <<= 1;
    flat_mask = cap - 1;
    flat_slots.assign(cap, Slot{~0ull, 0, 0});
    size_t total = 0;
    for (auto& kv : table) total += kv.second.size();
    flat_entries.clear();
    flat_entries.reserve(total);
    for (auto& kv : table) {
      uint64_t s = mix64(kv.first.k) & flat_mask;
      while (flat_slots[s].key != ~0ull) s = (s + 1) & flat_mask;
      flat_slots[s] = Slot{kv.first.k, (int32_t)flat_entries.size(),
                           (int32_t)kv.second.size()};
      flat_entries.insert(flat_entries.end(), kv.second.begin(), kv.second.end());
    }
    table.clear();
  }

  // returns (start, len) span or len=0
  inline void lookup(uint64_t k, const Entry** begin, const Entry** end) const {
    uint64_t s = mix64(k) & flat_mask;
    while (true) {
      const Slot& sl = flat_slots[s];
      if (sl.key == k) {
        *begin = flat_entries.data() + sl.start;
        *end = *begin + sl.len;
        return;
      }
      if (sl.key == ~0ull) {
        *begin = *end = nullptr;
        return;
      }
      s = (s + 1) & flat_mask;
    }
  }
};

// planar rotation angle of point p about +X after canonicalization
double alphaOf(const Mat3& R_align, const Vec3& ref, const Vec3& other) {
  Vec3 d = R_align.apply(other - ref);
  return std::atan2(-d.z, d.y);
}

std::vector<int> subsampleVoxel(const std::vector<Vec3>& pts, double voxel,
                                size_t max_points) {
  std::unordered_map<uint64_t, int> grid;
  std::vector<int> keep;
  for (size_t i = 0; i < pts.size(); i++) {
    int64_t gx = (int64_t)std::floor(pts[i].x / voxel);
    int64_t gy = (int64_t)std::floor(pts[i].y / voxel);
    int64_t gz = (int64_t)std::floor(pts[i].z / voxel);
    uint64_t key = (uint64_t)(gx & 0x1FFFFF) | ((uint64_t)(gy & 0x1FFFFF) << 21) |
                   ((uint64_t)(gz & 0x1FFFFF) << 42);
    if (grid.emplace(key, (int)i).second) keep.push_back((int)i);
  }
  if (keep.size() > max_points) {
    std::vector<int> out;
    out.reserve(max_points);
    double step = (double)keep.size() / (double)max_points;
    for (size_t i = 0; i < max_points; i++) out.push_back(keep[(size_t)(i * step)]);
    return out;
  }
  return keep;
}

// estimate normals for a cloud via local PCA over k nearest (grid-accelerated)
void estimateNormals(const std::vector<Vec3>& pts, double radius,
                     std::vector<Vec3>* out) {
  out->assign(pts.size(), Vec3{0, 0, 1});
  // spatial hash
  double cell = radius;
  std::unordered_map<uint64_t, std::vector<int>> grid;
  auto keyOf = [&](const Vec3& p) {
    int64_t gx = (int64_t)std::floor(p.x / cell);
    int64_t gy = (int64_t)std::floor(p.y / cell);
    int64_t gz = (int64_t)std::floor(p.z / cell);
    return (uint64_t)(gx & 0x1FFFFF) | ((uint64_t)(gy & 0x1FFFFF) << 21) |
           ((uint64_t)(gz & 0x1FFFFF) << 42);
  };
  for (size_t i = 0; i < pts.size(); i++) grid[keyOf(pts[i])].push_back((int)i);

  for (size_t i = 0; i < pts.size(); i++) {
    // gather neighbors
    Vec3 mean{0, 0, 0};
    std::vector<int> nbr;
    const Vec3& p = pts[i];
    for (int dx = -1; dx <= 1; dx++)
      for (int dy = -1; dy <= 1; dy++)
        for (int dz = -1; dz <= 1; dz++) {
          Vec3 q{p.x + dx * cell, p.y + dy * cell, p.z + dz * cell};
          auto it = grid.find(keyOf(q));
          if (it == grid.end()) continue;
          for (int j : it->second) {
            if ((pts[j] - p).norm() <= radius) {
              nbr.push_back(j);
              mean = mean + pts[j];
            }
          }
        }
    if (nbr.size() < 3) continue;
    mean = mean * (1.0 / nbr.size());
    double c[6] = {0, 0, 0, 0, 0, 0};  // xx xy xz yy yz zz
    for (int j : nbr) {
      Vec3 d = pts[j] - mean;
      c[0] += d.x * d.x; c[1] += d.x * d.y; c[2] += d.x * d.z;
      c[3] += d.y * d.y; c[4] += d.y * d.z; c[5] += d.z * d.z;
    }
    // smallest eigenvector by inverse power iteration on (C + eps I)^-1 ~ use
    // simple fixed iteration of cross products: find eigvec of smallest eigval
    // via Jacobi-free approach: try the three axis-aligned seeds, pick the
    // one minimizing Rayleigh quotient after a few iterations of deflation.
    auto applyC = [&](const Vec3& v) {
      return Vec3{c[0] * v.x + c[1] * v.y + c[2] * v.z,
                  c[1] * v.x + c[3] * v.y + c[4] * v.z,
                  c[2] * v.x + c[4] * v.y + c[5] * v.z};
    };
    double tr = c[0] + c[3] + c[5];
    // shift-invert power iteration: (tr*I - C) has the smallest eigvec of C
    // as its largest
    Vec3 v{1, 1, 1};
    for (int it2 = 0; it2 < 12; it2++) {
      Vec3 w = v * tr - applyC(v);
      double n = w.norm();
      if (n < 1e-15) break;
      v = w * (1.0 / n);
    }
    // orient toward origin (camera at 0 for scenes; arbitrary for models)
    if (v.dot(p) > 0) v = v * -1.0;
    (*out)[i] = v.normalized();
  }
}

struct PoseVote {
  Mat3 R;
  Vec3 t;
  double votes;
};

}  // namespace

extern "C" {

void* ppf_create(const double* points, const double* normals, int n_points,
                 double sampling_rel, double angle_step_deg) {
  auto* impl = new PPFModelImpl();
  std::vector<Vec3> raw(n_points);
  for (int i = 0; i < n_points; i++)
    raw[i] = {points[3 * i], points[3 * i + 1], points[3 * i + 2]};

  // diameter (bounding box diagonal)
  Vec3 lo = raw[0], hi = raw[0];
  for (auto& p : raw) {
    lo = {std::min(lo.x, p.x), std::min(lo.y, p.y), std::min(lo.z, p.z)};
    hi = {std::max(hi.x, p.x), std::max(hi.y, p.y), std::max(hi.z, p.z)};
  }
  impl->diameter = (hi - lo).norm();
  impl->dist_step = std::max(impl->diameter * sampling_rel, 1e-9);
  impl->angle_step = angle_step_deg * M_PI / 180.0;
  impl->n_angle_bins = (int)std::round(2 * M_PI / impl->angle_step);
  impl->initAcosLut();

  std::vector<Vec3> nrm_raw(n_points);
  if (normals) {
    for (int i = 0; i < n_points; i++)
      nrm_raw[i] = Vec3{normals[3 * i], normals[3 * i + 1], normals[3 * i + 2]}.normalized();
  } else {
    estimateNormals(raw, impl->dist_step * 2.0, &nrm_raw);
  }

  auto keep = subsampleVoxel(raw, impl->dist_step, 400);
  for (int i : keep) {
    impl->pts.push_back(raw[i]);
    impl->nrm.push_back(nrm_raw[i]);
  }

  int n = (int)impl->pts.size();
  int nab = impl->n_angle_bins;
  double alpha_scale = nab / (2 * M_PI);
  for (int i = 0; i < n; i++) {
    Mat3 Ra = alignToX(impl->nrm[i]);
    for (int j = 0; j < n; j++) {
      if (i == j) continue;
      Vec3 d = impl->pts[j] - impl->pts[i];
      PPFKey key = impl->quantize(d, impl->nrm[i], impl->nrm[j]);
      auto& bucket = impl->table[key];
      // cap bucket size: degenerate (planar/symmetric) surfaces produce huge
      // buckets of identical features, blowing up voting cost quadratically
      if (bucket.size() < 128) {
        // alpha in [-pi, pi] at eighth-bin resolution, offset positive
        int q8 = (int)(alphaOf(Ra, impl->pts[i], impl->pts[j]) * alpha_scale * 8.0
                       + 8 * nab);
        bucket.push_back({i * nab, q8});
      }
    }
  }
  impl->flatten();
  return impl;
}

void ppf_destroy(void* handle) { delete (PPFModelImpl*)handle; }

// Match the trained model in a scene cloud. Returns the number of poses
// written (<= max_poses). out_poses: row-major 4x4 per pose; out_scores.
int ppf_match(void* handle, const double* scene_points, int n_scene,
              double scene_sampling_rel, double ref_point_rate,
              int max_poses, double* out_poses, double* out_scores) {
  auto* impl = (PPFModelImpl*)handle;
  if (n_scene < 10) return 0;
  const bool dbg = std::getenv("PPF_DEBUG_TIMING") != nullptr;
  auto now = [] { return std::chrono::steady_clock::now(); };
  auto ms = [](auto a, auto b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };
  auto t0 = now();
  std::vector<Vec3> raw(n_scene);
  for (int i = 0; i < n_scene; i++)
    raw[i] = {scene_points[3 * i], scene_points[3 * i + 1], scene_points[3 * i + 2]};

  double voxel = std::max(impl->diameter * scene_sampling_rel, 1e-9);
  auto keep = subsampleVoxel(raw, voxel, 600);
  std::vector<Vec3> spts;
  spts.reserve(keep.size());
  for (int i : keep) spts.push_back(raw[i]);
  std::vector<Vec3> snrm;
  auto t1 = now();
  estimateNormals(spts, voxel * 2.0, &snrm);
  auto t2 = now();

  int ns = (int)spts.size();
  int nm = (int)impl->pts.size();
  int nab = impl->n_angle_bins;
  int ref_stride = std::max(1, (int)std::round(1.0 / std::max(ref_point_rate, 1e-3)));

  std::vector<int> ref_ids;
  for (int si = 0; si < ns; si += ref_stride) ref_ids.push_back(si);
  std::vector<PoseVote> candidates(ref_ids.size(), {Mat3::identity(), {0, 0, 0}, 0.0});

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> acc(nm * nab);
#ifdef _OPENMP
#pragma omp for schedule(dynamic, 4)
#endif
    for (int ri = 0; ri < (int)ref_ids.size(); ri++) {
      int si = ref_ids[ri];
      std::fill(acc.begin(), acc.end(), 0);
      Mat3 Rs = alignToX(snrm[si]);
      const Vec3& sr = spts[si];
      const double max_d = impl->diameter * 1.05;
      const double max_d2 = max_d * max_d;
      const double alpha_scale = nab / (2 * M_PI);
      for (int sj = 0; sj < ns; sj++) {
        if (sj == si) continue;
        Vec3 d = spts[sj] - sr;
        double d2 = d.dot(d);
        if (d2 > max_d2 || d2 < 1e-18) continue;
        PPFKey key = impl->quantize(d, snrm[si], snrm[sj]);
        const Entry *eb, *ee;
        impl->lookup(key.k, &eb, &ee);
        if (eb == ee) continue;
        // scene planar angle quantized once per pair at eighth-bin
        // resolution; entries carry the model side likewise plus a
        // pre-multiplied accumulator base, so the hot loop is integer
        // subtract + wrap + shift + increment per entry
        int as_q8 = (int)(alphaOf(Rs, sr, spts[sj]) * alpha_scale * 8.0 + 8 * nab);
        int nab8 = nab << 3;
        for (const Entry* e = eb; e != ee; e++) {
          int d8 = as_q8 - e->q8;            // in (-nab8, nab8)
          d8 += (d8 >> 31) & nab8;           // wrap negatives into [0, nab8)
          int ab = d8 >> 3;
          acc[e->base + ab]++;
        }
      }
      // take the accumulator peak for this reference point
      int best = 0;
      for (int i = 1; i < nm * nab; i++)
        if (acc[i] > acc[best]) best = i;
      if (acc[best] < 3) continue;
      int mi = best / nab;
      double alpha = (best % nab + 0.5) * 2 * M_PI / nab;

      // pose: scene_ref frame -> model_ref frame composition
      // T = Ts^-1 * RotX(alpha) * Tm, applied to model points
      Mat3 Rm = alignToX(impl->nrm[mi]);
      Mat3 R = Rs.transposed().mul(rotX(alpha)).mul(Rm);
      Vec3 t = sr - R.apply(impl->pts[mi]);
      candidates[ri] = {R, t, (double)acc[best]};
    }
  }
  auto t3 = now();
  candidates.erase(
      std::remove_if(candidates.begin(), candidates.end(),
                     [](const PoseVote& c) { return c.votes <= 0; }),
      candidates.end());

  if (dbg) {
    // one serial re-count of the voting composition (debug only)
    long pairs = 0, hits = 0, entries = 0;
    for (int ri = 0; ri < (int)ref_ids.size(); ri++) {
      int si = ref_ids[ri];
      for (int sj = 0; sj < ns; sj++) {
        if (sj == si) continue;
        Vec3 d = spts[sj] - spts[si];
        double d2 = d.dot(d);
        if (d2 > impl->diameter * 1.05 * impl->diameter * 1.05 || d2 < 1e-18) continue;
        pairs++;
        PPFKey key = impl->quantize(d, snrm[si], snrm[sj]);
        const Entry *eb, *ee;
        impl->lookup(key.k, &eb, &ee);
        if (eb != ee) { hits++; entries += (long)(ee - eb); }
      }
    }
    fprintf(stderr,
            "[ppf] subsample %.2fms normals %.2fms vote %.2fms (ns=%d refs=%zu "
            "pairs=%ld hits=%ld entries=%ld)\n",
            ms(t0, t1), ms(t1, t2), ms(t2, t3), ns, ref_ids.size(),
            pairs, hits, entries);
  }
  if (candidates.empty()) return 0;
  std::sort(candidates.begin(), candidates.end(),
            [](const PoseVote& a, const PoseVote& b) { return a.votes > b.votes; });

  // greedy clustering: merge candidates with nearby translation + rotation
  double t_th = impl->diameter * 0.1;
  double r_th = 15.0 * M_PI / 180.0;
  std::vector<PoseVote> clusters;
  std::vector<double> cluster_votes;
  for (const auto& c : candidates) {
    bool merged = false;
    for (size_t k = 0; k < clusters.size(); k++) {
      const auto& cl = clusters[k];
      if ((cl.t - c.t).norm() > t_th) continue;
      // rotation distance via trace
      Mat3 Rd = cl.R.transposed().mul(c.R);
      double tr = Rd.m[0] + Rd.m[4] + Rd.m[8];
      double ang = std::acos(std::max(-1.0, std::min(1.0, (tr - 1) / 2)));
      if (ang < r_th) {
        cluster_votes[k] += c.votes;
        merged = true;
        break;
      }
    }
    if (!merged && (int)clusters.size() < max_poses * 4) {
      clusters.push_back(c);
      cluster_votes.push_back(c.votes);
    }
  }
  // order clusters by accumulated votes
  std::vector<int> order(clusters.size());
  for (size_t i = 0; i < order.size(); i++) order[i] = (int)i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return cluster_votes[a] > cluster_votes[b]; });

  int n_out = std::min((int)clusters.size(), max_poses);
  for (int oi = 0; oi < n_out; oi++) {
    const auto& c = clusters[order[oi]];
    double* P = out_poses + oi * 16;
    P[0] = c.R.m[0]; P[1] = c.R.m[1]; P[2] = c.R.m[2]; P[3] = c.t.x;
    P[4] = c.R.m[3]; P[5] = c.R.m[4]; P[6] = c.R.m[5]; P[7] = c.t.y;
    P[8] = c.R.m[6]; P[9] = c.R.m[7]; P[10] = c.R.m[8]; P[11] = c.t.z;
    P[12] = 0; P[13] = 0; P[14] = 0; P[15] = 1;
    out_scores[oi] = cluster_votes[order[oi]];
  }
  return n_out;
}

}  // extern "C"
