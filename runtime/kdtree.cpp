// 2-D k-d tree with radius and k-nearest queries.
//
// Native runtime component of mba_vo_tpu (reference parity:
// src/core/kd_tree/KDTree.{h,cpp} — used for feature-match support
// queries). Exposed through a C ABI consumed from Python via ctypes
// (runtime/bindings.py). Median-split build over an index array, iterative
// stack traversal (no recursion depth limits, no per-node allocation).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
  int32_t point;    // index into the points array
  int32_t left;     // node index or -1
  int32_t right;    // node index or -1
  uint8_t axis;     // split axis, 0 = x, 1 = y
};

struct KDTree {
  std::vector<float> pts;   // interleaved x,y
  std::vector<Node> nodes;
  int32_t root = -1;

  float coord(int32_t p, int axis) const { return pts[2 * p + axis]; }

  int32_t build(int32_t* idx, int n, int depth) {
    if (n <= 0) return -1;
    const int axis = depth & 1;
    int32_t* mid = idx + n / 2;
    std::nth_element(idx, mid, idx + n, [&](int32_t a, int32_t b) {
      return pts[2 * a + axis] < pts[2 * b + axis];
    });
    Node node;
    node.point = *mid;
    node.axis = static_cast<uint8_t>(axis);
    const int32_t self = static_cast<int32_t>(nodes.size());
    nodes.push_back(node);
    const int32_t left = build(idx, static_cast<int>(mid - idx), depth + 1);
    const int32_t right =
        build(mid + 1, static_cast<int>(idx + n - mid - 1), depth + 1);
    nodes[self].left = left;
    nodes[self].right = right;
    return self;
  }
};

inline float sq(float v) { return v * v; }

}  // namespace

extern "C" {

// Build a tree over n (x, y) points. Returns an opaque handle.
void* mbavo_kdtree_build(const float* xy, int32_t n) {
  KDTree* t = new KDTree();
  t->pts.assign(xy, xy + 2 * n);
  t->nodes.reserve(n);
  std::vector<int32_t> idx(n);
  for (int32_t i = 0; i < n; ++i) idx[i] = i;
  t->root = t->build(idx.data(), n, 0);
  return t;
}

void mbavo_kdtree_free(void* handle) { delete static_cast<KDTree*>(handle); }

// Indices of all points within radius r of (x, y). Returns the number of
// neighbors found (clamped to max_out).
int32_t mbavo_kdtree_radius(void* handle, float x, float y, float r,
                            int32_t* out, int32_t max_out) {
  const KDTree* t = static_cast<const KDTree*>(handle);
  if (t->root < 0) return 0;
  const float r2 = r * r;
  int32_t count = 0;
  std::vector<int32_t> stack;
  stack.push_back(t->root);
  while (!stack.empty()) {
    const Node& nd = t->nodes[stack.back()];
    stack.pop_back();
    const float px = t->coord(nd.point, 0);
    const float py = t->coord(nd.point, 1);
    if (sq(px - x) + sq(py - y) <= r2) {
      if (count < max_out) out[count] = nd.point;
      ++count;
    }
    const float q = nd.axis == 0 ? x : y;
    const float c = nd.axis == 0 ? px : py;
    const float d = q - c;
    const int32_t near = d <= 0 ? nd.left : nd.right;
    const int32_t far = d <= 0 ? nd.right : nd.left;
    if (near >= 0) stack.push_back(near);
    if (far >= 0 && sq(d) <= r2) stack.push_back(far);
  }
  return count < max_out ? count : max_out;
}

// k nearest neighbors of (x, y); writes indices (nearest first) and squared
// distances. Returns the number written (min(k, n)).
int32_t mbavo_kdtree_knn(void* handle, float x, float y, int32_t k,
                         int32_t* out_idx, float* out_d2) {
  const KDTree* t = static_cast<const KDTree*>(handle);
  if (t->root < 0 || k <= 0) return 0;
  using Entry = std::pair<float, int32_t>;  // (d2, point)
  std::priority_queue<Entry> heap;          // max-heap on d2
  std::vector<int32_t> stack;
  stack.push_back(t->root);
  while (!stack.empty()) {
    const Node& nd = t->nodes[stack.back()];
    stack.pop_back();
    const float px = t->coord(nd.point, 0);
    const float py = t->coord(nd.point, 1);
    const float d2 = sq(px - x) + sq(py - y);
    if (static_cast<int32_t>(heap.size()) < k) {
      heap.emplace(d2, nd.point);
    } else if (d2 < heap.top().first) {
      heap.pop();
      heap.emplace(d2, nd.point);
    }
    const float q = nd.axis == 0 ? x : y;
    const float c = nd.axis == 0 ? px : py;
    const float d = q - c;
    const int32_t near = d <= 0 ? nd.left : nd.right;
    const int32_t far = d <= 0 ? nd.right : nd.left;
    if (near >= 0) stack.push_back(near);
    const bool heap_full = static_cast<int32_t>(heap.size()) >= k;
    if (far >= 0 && (!heap_full || sq(d) < heap.top().first)) {
      stack.push_back(far);
    }
  }
  const int32_t m = static_cast<int32_t>(heap.size());
  for (int32_t i = m - 1; i >= 0; --i) {
    out_idx[i] = heap.top().second;
    out_d2[i] = heap.top().first;
    heap.pop();
  }
  return m;
}

}  // extern "C"
