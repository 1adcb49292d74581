// Host-side native runtime: voxel dedup, radius search, local PCA.
//
// The TPU compute path is JAX/XLA; this is the native tier the
// reference implements in MinkowskiEngine C++ (hash-map coordinate
// dedup, src/coordinate_map_cpu.hpp:285-712; neighbor search the
// reference delegates to open3d KD-trees). Exposed as extern "C" for
// ctypes binding (yoho_tpu/native/__init__.py); pure standard C++17,
// no external deps.
//
// All search structures are open-addressing spatial hash grids keyed
// on integer cells — the same flat-hash design robin_hood.h provides
// for the reference, specialized for 3-D points.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

inline uint64_t hash_cell(int64_t x, int64_t y, int64_t z) {
  uint64_t h = (uint64_t)(x * 73856093LL) ^ (uint64_t)(y * 19349669LL) ^
               (uint64_t)(z * 83492791LL);
  h ^= h >> 33;
  h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33;
  return h;
}

// Open-addressing map from voxel cell -> first point index.
struct CellMap {
  std::vector<uint64_t> keys;   // packed cell key + 1 (0 = empty)
  std::vector<int64_t> vals;
  uint64_t mask;

  explicit CellMap(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, 0);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static uint64_t pack(int64_t x, int64_t y, int64_t z) {
    // 21 bits per axis, offset to non-negative
    const uint64_t off = 1ULL << 20;
    return (((uint64_t)(x + off) & 0x1FFFFF) << 42) |
           (((uint64_t)(y + off) & 0x1FFFFF) << 21) |
           ((uint64_t)(z + off) & 0x1FFFFF);
  }

  // insert if absent; returns true if inserted
  bool insert(int64_t x, int64_t y, int64_t z, int64_t val) {
    uint64_t k = pack(x, y, z) + 1;
    uint64_t slot = hash_cell(x, y, z) & mask;
    while (true) {
      if (keys[slot] == 0) {
        keys[slot] = k;
        vals[slot] = val;
        return true;
      }
      if (keys[slot] == k) return false;
      slot = (slot + 1) & mask;
    }
  }

  int64_t find(int64_t x, int64_t y, int64_t z) const {
    uint64_t k = pack(x, y, z) + 1;
    uint64_t slot = hash_cell(x, y, z) & mask;
    while (true) {
      if (keys[slot] == 0) return -1;
      if (keys[slot] == k) return vals[slot];
      slot = (slot + 1) & mask;
    }
  }
};

// Spatial bucket grid: cell -> [start, end) into a sorted point-index
// array; built in O(n).
struct BucketGrid {
  float cell;
  CellMap map;
  std::vector<int64_t> order;   // point indices grouped by cell
  std::vector<int64_t> starts;  // per distinct cell: offset into order
  std::vector<int64_t> counts;

  BucketGrid(const float* pts, int64_t n, float cell_size)
      : cell(cell_size), map((size_t)n) {
    std::vector<uint64_t> cell_of(n);
    std::vector<int64_t> head;  // distinct-cell ids per point via map
    std::vector<int64_t> cell_id(n);
    int64_t n_cells = 0;
    counts.reserve(1024);
    for (int64_t i = 0; i < n; i++) {
      int64_t cx = (int64_t)std::floor(pts[i * 3 + 0] / cell);
      int64_t cy = (int64_t)std::floor(pts[i * 3 + 1] / cell);
      int64_t cz = (int64_t)std::floor(pts[i * 3 + 2] / cell);
      int64_t id = map.find(cx, cy, cz);
      if (id < 0) {
        id = n_cells++;
        map.insert(cx, cy, cz, id);
        counts.push_back(0);
      }
      cell_id[i] = id;
      counts[id]++;
    }
    starts.assign(n_cells + 1, 0);
    for (int64_t c = 0; c < n_cells; c++) starts[c + 1] = starts[c] + counts[c];
    order.assign(n, 0);
    std::vector<int64_t> cursor(starts.begin(), starts.end() - 1);
    for (int64_t i = 0; i < n; i++) order[cursor[cell_id[i]]++] = i;
  }

  template <typename F>
  void for_neighbors(const float* pts, float x, float y, float z, F&& fn) const {
    int64_t cx = (int64_t)std::floor(x / cell);
    int64_t cy = (int64_t)std::floor(y / cell);
    int64_t cz = (int64_t)std::floor(z / cell);
    for (int64_t dx = -1; dx <= 1; dx++)
      for (int64_t dy = -1; dy <= 1; dy++)
        for (int64_t dz = -1; dz <= 1; dz++) {
          int64_t id = map.find(cx + dx, cy + dy, cz + dz);
          if (id < 0) continue;
          for (int64_t s = starts[id]; s < starts[id + 1]; s++) fn(order[s]);
        }
  }
};

}  // namespace

extern "C" {

// Voxel dedup: writes first-occurrence point indices; returns count.
int64_t yoho_prevoxelize(const float* pts, int64_t n, float voxel_size,
                         int64_t* out_idx, int64_t max_out) {
  CellMap map((size_t)n);
  int64_t m = 0;
  for (int64_t i = 0; i < n && m < max_out; i++) {
    int64_t x = (int64_t)std::floor(pts[i * 3 + 0] / voxel_size);
    int64_t y = (int64_t)std::floor(pts[i * 3 + 1] / voxel_size);
    int64_t z = (int64_t)std::floor(pts[i * 3 + 2] / voxel_size);
    if (map.insert(x, y, z, i)) out_idx[m++] = i;
  }
  return m;
}

// 1-NN within `dist` from pc0[sel] into pc1; writes (sel_i, j) pairs.
int64_t yoho_mine_pairs(const float* pc0, const int64_t* sel, int64_t n_sel,
                        const float* pc1, int64_t n1, float dist,
                        int64_t* out_pairs, int64_t max_pairs) {
  BucketGrid grid(pc1, n1, dist);
  const float d2max = dist * dist;
  int64_t m = 0;
  for (int64_t s = 0; s < n_sel && m < max_pairs; s++) {
    int64_t i = sel[s];
    float x = pc0[i * 3], y = pc0[i * 3 + 1], z = pc0[i * 3 + 2];
    int64_t best = -1;
    float best_d2 = d2max;
    grid.for_neighbors(pc1, x, y, z, [&](int64_t j) {
      float dx = pc1[j * 3] - x, dy = pc1[j * 3 + 1] - y, dz = pc1[j * 3 + 2] - z;
      float d2 = dx * dx + dy * dy + dz * dz;
      if (d2 < best_d2) {
        best_d2 = d2;
        best = j;
      }
    });
    if (best >= 0) {
      out_pairs[m * 2] = i;
      out_pairs[m * 2 + 1] = best;
      m++;
    }
  }
  return m;
}

// Local PCA surface variation (lambda_min / trace) per key.
void yoho_pca_sigma(const float* pts, int64_t n, const float* keys, int64_t k,
                    float radius, float* out_sigma) {
  BucketGrid grid(pts, n, radius);
  const float r2 = radius * radius;
  for (int64_t q = 0; q < k; q++) {
    float x = keys[q * 3], y = keys[q * 3 + 1], z = keys[q * 3 + 2];
    double sum[3] = {0, 0, 0}, cov[6] = {0, 0, 0, 0, 0, 0};
    int64_t cnt = 0;
    grid.for_neighbors(pts, x, y, z, [&](int64_t j) {
      float dx = pts[j * 3] - x, dy = pts[j * 3 + 1] - y, dz = pts[j * 3 + 2] - z;
      if (dx * dx + dy * dy + dz * dz > r2) return;
      sum[0] += pts[j * 3];
      sum[1] += pts[j * 3 + 1];
      sum[2] += pts[j * 3 + 2];
      cnt++;
    });
    if (cnt < 8) {
      out_sigma[q] = 0.f;
      continue;
    }
    double mx = sum[0] / cnt, my = sum[1] / cnt, mz = sum[2] / cnt;
    grid.for_neighbors(pts, x, y, z, [&](int64_t j) {
      float dx0 = pts[j * 3] - x, dy0 = pts[j * 3 + 1] - y, dz0 = pts[j * 3 + 2] - z;
      if (dx0 * dx0 + dy0 * dy0 + dz0 * dz0 > r2) return;
      double a = pts[j * 3] - mx, b = pts[j * 3 + 1] - my, c = pts[j * 3 + 2] - mz;
      cov[0] += a * a;
      cov[1] += a * b;
      cov[2] += a * c;
      cov[3] += b * b;
      cov[4] += b * c;
      cov[5] += c * c;
    });
    for (double& v : cov) v /= cnt;
    // smallest eigenvalue of symmetric 3x3 via characteristic cubic
    double A = cov[0], B = cov[3], C = cov[5], D = cov[1], E = cov[4], F = cov[2];
    double p1 = D * D + E * E + F * F;
    double tr = A + B + C;
    double lmin;
    if (p1 < 1e-24) {
      lmin = std::min({A, B, C});
    } else {
      double qm = tr / 3.0;
      double p2 = (A - qm) * (A - qm) + (B - qm) * (B - qm) + (C - qm) * (C - qm) + 2 * p1;
      double p = std::sqrt(p2 / 6.0);
      double b00 = (A - qm) / p, b11 = (B - qm) / p, b22 = (C - qm) / p;
      double b01 = D / p, b12 = E / p, b02 = F / p;
      double detB = b00 * (b11 * b22 - b12 * b12) - b01 * (b01 * b22 - b12 * b02) +
                    b02 * (b01 * b12 - b11 * b02);
      double r = std::min(1.0, std::max(-1.0, detB / 2.0));
      double phi = std::acos(r) / 3.0;
      double l1 = qm + 2 * p * std::cos(phi);
      double l3 = qm + 2 * p * std::cos(phi + 2.0943951023931953);  // +2pi/3
      double l2 = tr - l1 - l3;
      lmin = std::min({l1, l2, l3});
    }
    double denom = tr > 1e-24 ? tr : 1e-24;
    out_sigma[q] = (float)std::max(0.0, lmin / denom);
  }
}

// Radius-pair mining for keypoint gt pairs: all (i, j) with
// |k0_i - k1_j| < dist (reference YOHO_Trainset.py:59-62).
int64_t yoho_radius_pairs(const float* k0, int64_t n0, const float* k1,
                          int64_t n1, float dist, int64_t* out_pairs,
                          int64_t max_pairs) {
  BucketGrid grid(k1, n1, dist);
  const float d2max = dist * dist;
  int64_t m = 0;
  for (int64_t i = 0; i < n0; i++) {
    float x = k0[i * 3], y = k0[i * 3 + 1], z = k0[i * 3 + 2];
    grid.for_neighbors(k1, x, y, z, [&](int64_t j) {
      if (m >= max_pairs) return;
      float dx = k1[j * 3] - x, dy = k1[j * 3 + 1] - y, dz = k1[j * 3 + 2] - z;
      if (dx * dx + dy * dy + dz * dz < d2max) {
        out_pairs[m * 2] = i;
        out_pairs[m * 2 + 1] = j;
        m++;
      }
    });
    if (m >= max_pairs) break;
  }
  return m;
}

}  // extern "C"
