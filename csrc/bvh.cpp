// Native acceleration-structure builder.
//
// TPU-native replacement for the driver-side BLAS/TLAS build the reference
// delegates to `vkCmdBuildAccelerationStructuresKHR`
// (VKT/ray_tracing__before/hello_vulkan.cpp:662,686). The Pallas trace
// kernel culls fixed-size triangle clusters by AABB, so the structure we
// need is not a pointer tree but a *partition*: a binned-SAH BVH is built
// top-down and its leaves (<= max_leaf prims) become the clusters. SAH
// leaves are spatially much tighter than raw Morton chunks, which directly
// reduces the number of quartic/Woop evaluations the kernel cannot skip.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Aabb {
  float lo[3] = {3e38f, 3e38f, 3e38f};
  float hi[3] = {-3e38f, -3e38f, -3e38f};

  void grow(const float* l, const float* h) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], l[k]);
      hi[k] = std::max(hi[k], h[k]);
    }
  }
  void grow(const Aabb& o) { grow(o.lo, o.hi); }
  float half_area() const {
    float dx = std::max(hi[0] - lo[0], 0.f);
    float dy = std::max(hi[1] - lo[1], 0.f);
    float dz = std::max(hi[2] - lo[2], 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const float* lo;
  const float* hi;
  std::vector<float> centroid;
  std::vector<int32_t> order;
  std::vector<int64_t> leaf_start;
  std::vector<int64_t> leaf_count;
  int max_leaf;

  static constexpr int kBins = 16;

  void build(int64_t n) {
    centroid.resize(n * 3);
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) {
      order[i] = static_cast<int32_t>(i);
      for (int k = 0; k < 3; ++k)
        centroid[i * 3 + k] = 0.5f * (lo[i * 3 + k] + hi[i * 3 + k]);
    }
    recurse(0, n);
  }

  void recurse(int64_t begin, int64_t end) {
    int64_t n = end - begin;
    if (n <= max_leaf) {
      leaf_start.push_back(begin);
      leaf_count.push_back(n);
      return;
    }

    // centroid bounds pick the split axis
    Aabb cb;
    for (int64_t i = begin; i < end; ++i) {
      const float* c = &centroid[order[i] * 3];
      cb.grow(c, c);
    }
    int axis = 0;
    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = cb.hi[k] - cb.lo[k];
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int64_t mid;
    if (ext[axis] <= 1e-12f) {
      mid = begin + n / 2;  // degenerate spread: median split
    } else {
      // binned SAH
      Aabb bin_box[kBins];
      int64_t bin_cnt[kBins] = {0};
      float scale = kBins / ext[axis];
      auto bin_of = [&](int32_t p) {
        int b = static_cast<int>((centroid[p * 3 + axis] - cb.lo[axis]) * scale);
        return std::min(std::max(b, 0), kBins - 1);
      };
      for (int64_t i = begin; i < end; ++i) {
        int32_t p = order[i];
        int b = bin_of(p);
        bin_cnt[b]++;
        bin_box[b].grow(&lo[p * 3], &hi[p * 3]);
      }
      // sweep for the cheapest split
      Aabb right_acc[kBins];
      Aabb acc;
      for (int b = kBins - 1; b > 0; --b) {
        acc.grow(bin_box[b]);
        right_acc[b] = acc;
      }
      float best_cost = 3e38f;
      int best_split = -1;
      Aabb left;
      int64_t left_n = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        left.grow(bin_box[b]);
        left_n += bin_cnt[b];
        int64_t right_n = n - left_n;
        if (left_n == 0 || right_n == 0) continue;
        float cost = left.half_area() * left_n +
                     right_acc[b + 1].half_area() * right_n;
        if (cost < best_cost) {
          best_cost = cost;
          best_split = b;
        }
      }
      if (best_split < 0) {
        mid = begin + n / 2;
        std::nth_element(order.begin() + begin, order.begin() + mid,
                         order.begin() + end, [&](int32_t a, int32_t b2) {
                           return centroid[a * 3 + axis] <
                                  centroid[b2 * 3 + axis];
                         });
      } else {
        auto it = std::partition(order.begin() + begin, order.begin() + end,
                                 [&](int32_t p) {
                                   return bin_of(p) <= best_split;
                                 });
        mid = it - order.begin();
        if (mid == begin || mid == end) mid = begin + n / 2;
      }
    }
    if (ext[0] <= 1e-12f && ext[1] <= 1e-12f && ext[2] <= 1e-12f) {
      // all centroids identical: force chunking to bound recursion
      while (begin < end) {
        int64_t c = std::min<int64_t>(max_leaf, end - begin);
        leaf_start.push_back(begin);
        leaf_count.push_back(c);
        begin += c;
      }
      return;
    }
    recurse(begin, mid);
    recurse(mid, end);
  }
};

Builder* g_last = nullptr;

}  // namespace

extern "C" {

// Build SAH clusters over n primitive AABBs (lo/hi: n*3 floats).
// Fills order (n int32) with the primitive permutation. Returns the number
// of leaves; leaf extents are fetched with trt_sah_leaves(). Negative on
// error.
int64_t trt_build_sah_clusters(const float* lo, const float* hi, int64_t n,
                               int max_leaf, int32_t* order_out) {
  if (n <= 0 || max_leaf <= 0) return -1;
  delete g_last;
  g_last = new Builder();
  g_last->lo = lo;
  g_last->hi = hi;
  g_last->max_leaf = max_leaf;
  g_last->build(n);
  std::memcpy(order_out, g_last->order.data(), n * sizeof(int32_t));
  return static_cast<int64_t>(g_last->leaf_start.size());
}

// Copy the (start, count) arrays of the last build.
int trt_sah_leaves(int64_t* starts, int64_t* counts, int64_t cap) {
  if (!g_last) return -1;
  int64_t m = static_cast<int64_t>(g_last->leaf_start.size());
  if (m > cap) return -2;
  std::memcpy(starts, g_last->leaf_start.data(), m * sizeof(int64_t));
  std::memcpy(counts, g_last->leaf_count.data(), m * sizeof(int64_t));
  delete g_last;
  g_last = nullptr;
  return 0;
}

}  // extern "C"
