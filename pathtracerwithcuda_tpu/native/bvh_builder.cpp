// Host BVH builder (bucketed SAH) — native fast path.
//
// Same algorithm and output contract as the Python builder
// (pathtracerwithcuda_tpu/bvh/build_sah.py): preorder skip-link flatten,
// leaf-contiguous triangle permutation (slots hold consecutive new indices),
// degenerate AABBs inflated.  Fills the role of the reference's C++ builders
// (reference Bvh/bvh.cpp) at interactive rebuild speed — the Python builder
// takes ~12 s on a 66k-triangle mesh, this takes milliseconds.
//
// C ABI for ctypes; handle-based two-phase (build, then fill caller buffers).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

static inline float surface_metric(const Vec3& lo, const Vec3& hi) {
  float dx = std::max(hi.x - lo.x, 0.0f);
  float dy = std::max(hi.y - lo.y, 0.0f);
  float dz = std::max(hi.z - lo.z, 0.0f);
  return dx * dy + dy * dz + dz * dx;
}

struct Node {
  Vec3 lo, hi;
  int32_t next = -1;       // skip link (preorder index past subtree)
  int32_t tri_start = -1;  // first slot in the permuted triangle order
  int32_t tri_count = 0;
};

struct Builder {
  int leaf_size = 4;
  int buckets = 12;
  std::vector<Vec3> lo, hi, centroid;
  std::vector<Node> nodes;
  std::vector<int64_t> perm;  // new position -> original triangle index

  void build(const float* tris, int64_t t) {
    lo.resize(t);
    hi.resize(t);
    centroid.resize(t);
    for (int64_t i = 0; i < t; ++i) {
      const float* p = tris + i * 9;
      Vec3 a{p[0], p[1], p[2]}, b{p[3], p[4], p[5]}, c{p[6], p[7], p[8]};
      lo[i] = vmin(vmin(a, b), c);
      hi[i] = vmax(vmax(a, b), c);
      centroid[i] = {0.5f * (lo[i].x + hi[i].x), 0.5f * (lo[i].y + hi[i].y),
                     0.5f * (lo[i].z + hi[i].z)};
    }
    std::vector<int64_t> ids(t);
    for (int64_t i = 0; i < t; ++i) ids[i] = i;
    nodes.reserve(2 * t / std::max(1, leaf_size) + 4);
    perm.reserve(t);
    recurse(ids.data(), t);
    // inflate degenerate extents so 1/direction slab tests stay finite
    for (auto& n : nodes) {
      auto inflate = [](float& a, float& b) {
        if (b - a <= 0.0f) {
          float eps = 1e-6f * std::max(1.0f, std::fabs(a));
          a -= eps;
          b += eps;
        }
      };
      inflate(n.lo.x, n.hi.x);
      inflate(n.lo.y, n.hi.y);
      inflate(n.lo.z, n.hi.z);
    }
  }

  // returns the node's preorder index; sets skip links on the way out
  int32_t recurse(int64_t* ids, int64_t n) {
    int32_t me = (int32_t)nodes.size();
    nodes.emplace_back();
    Vec3 blo = lo[ids[0]], bhi = hi[ids[0]];
    for (int64_t i = 1; i < n; ++i) {
      blo = vmin(blo, lo[ids[i]]);
      bhi = vmax(bhi, hi[ids[i]]);
    }
    nodes[me].lo = blo;
    nodes[me].hi = bhi;

    if (n <= leaf_size) {
      nodes[me].tri_start = (int32_t)perm.size();
      nodes[me].tri_count = (int32_t)n;
      for (int64_t i = 0; i < n; ++i) perm.push_back(ids[i]);
      nodes[me].next = me + 1;
      return me;
    }

    Vec3 clo = centroid[ids[0]], chi = centroid[ids[0]];
    for (int64_t i = 1; i < n; ++i) {
      clo = vmin(clo, centroid[ids[i]]);
      chi = vmax(chi, centroid[ids[i]]);
    }
    float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};

    int best_axis = -1;
    float best_cost = std::numeric_limits<float>::infinity();
    float best_split = 0.0f;
    int b = std::min<int64_t>(buckets, std::max<int64_t>(2, n));

    for (int axis = 0; axis < 3; ++axis) {
      if (ext[axis] <= 0.0f) continue;
      float base = axis == 0 ? clo.x : axis == 1 ? clo.y : clo.z;
      std::vector<int64_t> count(b, 0);
      std::vector<Vec3> bl(b, Vec3{1e30f, 1e30f, 1e30f});
      std::vector<Vec3> bh(b, Vec3{-1e30f, -1e30f, -1e30f});
      for (int64_t i = 0; i < n; ++i) {
        const Vec3& c = centroid[ids[i]];
        float v = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        int bi = std::min((int)((v - base) / ext[axis] * b), b - 1);
        count[bi]++;
        bl[bi] = vmin(bl[bi], lo[ids[i]]);
        bh[bi] = vmax(bh[bi], hi[ids[i]]);
      }
      int nonzero = 0;
      for (int i = 0; i < b; ++i) nonzero += count[i] > 0;
      if (nonzero < 2) continue;
      // prefix/suffix sweeps
      std::vector<Vec3> plo(b), phi(b), slo(b), shi(b);
      std::vector<int64_t> pc(b);
      Vec3 acc_lo = bl[0], acc_hi = bh[0];
      int64_t acc_c = count[0];
      for (int i = 0; i < b; ++i) {
        if (i) {
          acc_lo = vmin(acc_lo, bl[i]);
          acc_hi = vmax(acc_hi, bh[i]);
          acc_c += count[i];
        }
        plo[i] = acc_lo;
        phi[i] = acc_hi;
        pc[i] = acc_c;
      }
      acc_lo = bl[b - 1];
      acc_hi = bh[b - 1];
      for (int i = b - 1; i >= 0; --i) {
        if (i < b - 1) {
          acc_lo = vmin(acc_lo, bl[i]);
          acc_hi = vmax(acc_hi, bh[i]);
        }
        slo[i] = acc_lo;
        shi[i] = acc_hi;
      }
      for (int j = 0; j < b - 1; ++j) {
        int64_t nl = pc[j], nr = n - nl;
        if (nl == 0 || nr == 0) continue;
        float cost = surface_metric(plo[j], phi[j]) * nl +
                     surface_metric(slo[j + 1], shi[j + 1]) * nr;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_split = base + ext[axis] * (j + 1) / b;
        }
      }
    }

    int64_t mid;
    if (best_axis < 0) {
      mid = n / 2;  // all centroids coincide: median split
    } else {
      int axis = best_axis;
      auto pred = [&](int64_t id) {
        const Vec3& c = centroid[id];
        float v = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        return v < best_split;
      };
      mid = std::partition(ids, ids + n, pred) - ids;
      if (mid == 0 || mid == n) mid = n / 2;
    }

    recurse(ids, mid);
    recurse(ids + mid, n - mid);
    nodes[me].next = (int32_t)nodes.size();
    return me;
  }
};

}  // namespace

extern "C" {

void* ptc_bvh_build(const float* tris, int64_t num_tris, int leaf_size,
                    int num_buckets) {
  if (num_tris <= 0) return nullptr;
  auto* b = new Builder();
  b->leaf_size = std::max(1, leaf_size);
  b->buckets = std::max(2, num_buckets);
  b->build(tris, num_tris);
  return b;
}

int64_t ptc_bvh_num_nodes(void* h) {
  return h ? (int64_t)((Builder*)h)->nodes.size() : 0;
}

void ptc_bvh_fill(void* h, float* node_min, float* node_max, int32_t* next,
                  int32_t* tri_start, int32_t* tri_count, int64_t* perm) {
  auto* b = (Builder*)h;
  for (size_t i = 0; i < b->nodes.size(); ++i) {
    const Node& n = b->nodes[i];
    node_min[i * 3 + 0] = n.lo.x;
    node_min[i * 3 + 1] = n.lo.y;
    node_min[i * 3 + 2] = n.lo.z;
    node_max[i * 3 + 0] = n.hi.x;
    node_max[i * 3 + 1] = n.hi.y;
    node_max[i * 3 + 2] = n.hi.z;
    next[i] = n.next;
    tri_start[i] = n.tri_start;
    tri_count[i] = n.tri_count;
  }
  std::memcpy(perm, b->perm.data(), b->perm.size() * sizeof(int64_t));
}

void ptc_bvh_free(void* h) { delete (Builder*)h; }
}
