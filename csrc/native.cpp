// mrg_slam_tpu native runtime: host-side spatial kernels in C++.
//
// The reference's runtime layer is C++ (PCL kd-trees, voxel grids); the TPU
// framework keeps its *compute* path in XLA but ships these native host
// kernels for (a) golden-reference testing of the device kernels, (b) fast
// host-side dataset preprocessing in the replay/data-loader pipeline where
// shipping tiny ragged clouds to the device would waste transfers.
//
// Plain C ABI, loaded via ctypes (mrg_slam_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct KdNode {
    int32_t left = -1, right = -1;
    int32_t point = -1;  // leaf payload
    int32_t axis = 0;
    float split = 0.f;
};

struct KdTree {
    std::vector<KdNode> nodes;
    std::vector<float> pts;  // (n, 3) row-major
    int32_t n = 0;

    int32_t build(std::vector<int32_t>& idx, int lo, int hi) {
        if (lo >= hi) return -1;
        if (hi - lo == 1) {
            KdNode leaf;
            leaf.point = idx[lo];
            nodes.push_back(leaf);
            return static_cast<int32_t>(nodes.size()) - 1;
        }
        // pick widest axis
        float mins[3] = {1e30f, 1e30f, 1e30f}, maxs[3] = {-1e30f, -1e30f, -1e30f};
        for (int i = lo; i < hi; ++i) {
            const float* p = &pts[3 * idx[i]];
            for (int a = 0; a < 3; ++a) {
                mins[a] = std::min(mins[a], p[a]);
                maxs[a] = std::max(maxs[a], p[a]);
            }
        }
        int axis = 0;
        float w = maxs[0] - mins[0];
        for (int a = 1; a < 3; ++a)
            if (maxs[a] - mins[a] > w) { w = maxs[a] - mins[a]; axis = a; }
        int mid = (lo + hi) / 2;
        std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                         [&](int32_t a, int32_t b) {
                             return pts[3 * a + axis] < pts[3 * b + axis];
                         });
        KdNode node;
        node.axis = axis;
        node.split = pts[3 * idx[mid] + axis];
        int32_t self = static_cast<int32_t>(nodes.size());
        nodes.push_back(node);
        int32_t l = build(idx, lo, mid);
        int32_t r = build(idx, mid, hi);
        nodes[self].left = l;
        nodes[self].right = r;
        return self;
    }

    void knn(const float* q, int k, float max_r2,
             std::priority_queue<std::pair<float, int32_t>>& heap,
             int32_t node_id) const {
        if (node_id < 0) return;
        const KdNode& nd = nodes[node_id];
        if (nd.point >= 0) {
            const float* p = &pts[3 * nd.point];
            float d2 = 0;
            for (int a = 0; a < 3; ++a) {
                float d = p[a] - q[a];
                d2 += d * d;
            }
            if (d2 <= max_r2) {
                if (static_cast<int>(heap.size()) < k)
                    heap.emplace(d2, nd.point);
                else if (d2 < heap.top().first) {
                    heap.pop();
                    heap.emplace(d2, nd.point);
                }
            }
            return;
        }
        float delta = q[nd.axis] - nd.split;
        int32_t near = delta <= 0 ? nd.left : nd.right;
        int32_t far = delta <= 0 ? nd.right : nd.left;
        knn(q, k, max_r2, heap, near);
        float bound = (static_cast<int>(heap.size()) < k) ? max_r2
                                                          : heap.top().first;
        if (delta * delta <= bound) knn(q, k, max_r2, heap, far);
    }
};

}  // namespace

extern "C" {

// Build a kd-tree over (n,3) float32 points. Returns an opaque handle.
void* kdtree_build(const float* points, int32_t n) {
    auto* tree = new KdTree();
    tree->n = n;
    tree->pts.assign(points, points + 3 * static_cast<size_t>(n));
    if (n > 0) {
        std::vector<int32_t> idx(n);
        std::iota(idx.begin(), idx.end(), 0);
        tree->nodes.reserve(2 * static_cast<size_t>(n));
        tree->build(idx, 0, n);
    }
    return tree;
}

void kdtree_free(void* handle) { delete static_cast<KdTree*>(handle); }

// k-NN for m query points; writes (m,k) indices (-1 pad) and sq dists (inf).
void kdtree_knn(void* handle, const float* queries, int32_t m, int32_t k,
                int32_t* out_idx, float* out_d2) {
    auto* tree = static_cast<KdTree*>(handle);
    for (int32_t i = 0; i < m; ++i) {
        std::priority_queue<std::pair<float, int32_t>> heap;
        if (tree->n > 0)
            tree->knn(&queries[3 * i], k, 1e30f, heap, 0);
        int32_t cnt = static_cast<int32_t>(heap.size());
        for (int32_t j = 0; j < k; ++j) {
            out_idx[i * k + j] = -1;
            out_d2[i * k + j] = INFINITY;
        }
        // heap pops farthest-first; fill from the back
        for (int32_t j = cnt - 1; j >= 0; --j) {
            out_idx[i * k + j] = heap.top().second;
            out_d2[i * k + j] = heap.top().first;
            heap.pop();
        }
    }
}

// Count neighbors within radius (self excluded) for every point.
void radius_count(const float* points, int32_t n, float radius,
                  int32_t* out_counts) {
    KdTree* tree = static_cast<KdTree*>(kdtree_build(points, n));
    float r2 = radius * radius;
    for (int32_t i = 0; i < n; ++i) {
        std::priority_queue<std::pair<float, int32_t>> heap;
        tree->knn(&points[3 * i], n, r2, heap, 0);
        int32_t c = 0;
        while (!heap.empty()) {
            if (heap.top().second != i) ++c;
            heap.pop();
        }
        out_counts[i] = c;
    }
    kdtree_free(tree);
}

// Hash-voxel mean downsample with min-points threshold
// (ApproximateMeanVoxelGrid semantics). Returns number of emitted points.
int32_t voxel_downsample(const float* points, int32_t n, float resolution,
                         int32_t min_points, float* out_points,
                         int32_t capacity) {
    struct Acc { double x = 0, y = 0, z = 0; int32_t c = 0; };
    std::unordered_map<uint64_t, Acc> grid;
    grid.reserve(static_cast<size_t>(n));
    const float inv = 1.0f / resolution;
    for (int32_t i = 0; i < n; ++i) {
        const float* p = &points[3 * i];
        int64_t cx = static_cast<int64_t>(std::floor(p[0] * inv));
        int64_t cy = static_cast<int64_t>(std::floor(p[1] * inv));
        int64_t cz = static_cast<int64_t>(std::floor(p[2] * inv));
        uint64_t key = (static_cast<uint64_t>(cx & 0x1FFFFF) << 42) |
                       (static_cast<uint64_t>(cy & 0x1FFFFF) << 21) |
                       static_cast<uint64_t>(cz & 0x1FFFFF);
        Acc& a = grid[key];
        a.x += p[0]; a.y += p[1]; a.z += p[2]; a.c += 1;
    }
    int32_t out = 0;
    for (const auto& kv : grid) {
        if (kv.second.c < min_points) continue;
        if (out >= capacity) break;
        out_points[3 * out + 0] = static_cast<float>(kv.second.x / kv.second.c);
        out_points[3 * out + 1] = static_cast<float>(kv.second.y / kv.second.c);
        out_points[3 * out + 2] = static_cast<float>(kv.second.z / kv.second.c);
        ++out;
    }
    return out;
}

// Distance band filter: keep near < ||p|| < far; returns kept count.
int32_t distance_filter(const float* points, int32_t n, float near_t,
                        float far_t, float* out_points) {
    int32_t out = 0;
    for (int32_t i = 0; i < n; ++i) {
        const float* p = &points[3 * i];
        float d = std::sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2]);
        if (d > near_t && d < far_t) {
            std::memcpy(&out_points[3 * out], p, 3 * sizeof(float));
            ++out;
        }
    }
    return out;
}

}  // extern "C"
