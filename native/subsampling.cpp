// Native point-cloud subsampling for the TPU 3DGS framework.
//
// C++ equivalent of the reference's native_modules/subsampling
// (pointcloud_subsampling.cpp / impl.cpp), re-implemented from its observed
// behavior with a plain C ABI (consumed via ctypes — no pybind11 in this
// build environment):
//
//  * mdi_compute_min_extents: for every point, the minimal world-space
//    sampling interval 2*depth/min(fx,fy) over all cameras observing it
//    (-1 if unobserved). The reference runs this O(N*C) loop single-threaded
//    (impl.cpp:84 TODO); here it is parallelized over points.
//  * mdi_subsample_pointcloud: KD-split merge — subdivide the cube root box
//    with spatial-median splits on round-robin axes; a node merges to its
//    centroid (position+rgb mean) when min(node-box, tight-box) aspect ratio
//    <= max_aspect and the tight bbox's largest side <= mult * average
//    minimal extent of the contained points.
//
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
    float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
    float& operator[](int i) { return i == 0 ? x : (i == 1 ? y : z); }
};

inline Vec3 min3(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 max3(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Box {
    Vec3 lo, hi;
    Vec3 diag() const { return {hi.x - lo.x, hi.y - lo.y, hi.z - lo.z}; }
    float max_side() const {
        Vec3 d = diag();
        return std::max(d.x, std::max(d.y, d.z));
    }
    float min_side() const {
        Vec3 d = diag();
        return std::min(d.x, std::min(d.y, d.z));
    }
};

Box tight_box(const Vec3* pts, const uint32_t* idx, size_t n) {
    constexpr float inf = std::numeric_limits<float>::max();
    Box b{{inf, inf, inf}, {-inf, -inf, -inf}};
    for (size_t i = 0; i < n; ++i) {
        b.lo = min3(b.lo, pts[idx[i]]);
        b.hi = max3(b.hi, pts[idx[i]]);
    }
    return b;
}

struct Frame {
    std::vector<uint32_t> idx;
    Box box;
    int prev_axis;
};

}  // namespace

extern "C" {

// positions [n*3], viewmats [c*16] row-major world->camera, Ks [c*9],
// widths/heights [c]; out_extents [n].
void mdi_compute_min_extents(const float* positions, int64_t n,
                             const float* viewmats, const float* Ks,
                             const int32_t* widths, const int32_t* heights,
                             int64_t c, float* out_extents) {
    int n_threads = std::max(1u, std::thread::hardware_concurrency());
    auto worker = [&](int64_t begin, int64_t end) {
        for (int64_t i = begin; i < end; ++i) {
            const float px = positions[3 * i], py = positions[3 * i + 1],
                        pz = positions[3 * i + 2];
            float best = std::numeric_limits<float>::max();
            for (int64_t cam = 0; cam < c; ++cam) {
                const float* m = viewmats + 16 * cam;
                const float* k = Ks + 9 * cam;
                float cx = m[0] * px + m[1] * py + m[2] * pz + m[3];
                float cy = m[4] * px + m[5] * py + m[6] * pz + m[7];
                float cz = m[8] * px + m[9] * py + m[10] * pz + m[11];
                if (cz <= 0) continue;
                float u = k[0] * cx / cz + k[2];
                float v = k[4] * cy / cz + k[5];
                if (u < 0 || u >= float(widths[cam]) || v < 0 ||
                    v >= float(heights[cam]))
                    continue;
                float f = std::min(k[0], k[4]);
                float ext = 2.0f * cz / f;
                best = std::min(best, ext);
            }
            out_extents[i] =
                best == std::numeric_limits<float>::max() ? -1.0f : best;
        }
    };
    if (n < 4096 || n_threads == 1) {
        worker(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t b = t * per, e = std::min<int64_t>(n, b + per);
        if (b >= e) break;
        threads.emplace_back(worker, b, e);
    }
    for (auto& t : threads) t.join();
}

// positions/rgbs [n*3], min_extents [n]; out buffers sized n*3.
// split_strategy: 0 = spatial_median (reference default), 1 = equal_num_pts,
// 2 = max_gap (falls back to spatial_median when the best gap is < 1.5x the
// mean gap) — reference impl.cpp:248-310.
// Returns the number of output points.
int64_t mdi_subsample_pointcloud_ex(const float* positions, const float* rgbs,
                                    const float* min_extents, int64_t n,
                                    float max_aspect_ratio, float extent_mult,
                                    int split_strategy, float* out_positions,
                                    float* out_rgbs) {
    if (n <= 0) return 0;
    const Vec3* pts = reinterpret_cast<const Vec3*>(positions);
    const Vec3* cols = reinterpret_cast<const Vec3*>(rgbs);

    int64_t n_out = 0;
    auto emit = [&](const Vec3& p, const Vec3& c) {
        out_positions[3 * n_out] = p.x;
        out_positions[3 * n_out + 1] = p.y;
        out_positions[3 * n_out + 2] = p.z;
        out_rgbs[3 * n_out] = c.x;
        out_rgbs[3 * n_out + 1] = c.y;
        out_rgbs[3 * n_out + 2] = c.z;
        ++n_out;
    };

    // Cube root box.
    std::vector<uint32_t> all(n);
    for (int64_t i = 0; i < n; ++i) all[i] = uint32_t(i);
    Box t = tight_box(pts, all.data(), all.size());
    float half = t.max_side() / 2.0f;
    Vec3 center{(t.lo.x + t.hi.x) / 2, (t.lo.y + t.hi.y) / 2,
                (t.lo.z + t.hi.z) / 2};
    Box root{{center.x - half, center.y - half, center.z - half},
             {center.x + half, center.y + half, center.z + half}};

    std::vector<Frame> stack;
    stack.push_back(Frame{std::move(all), root, 0});

    while (!stack.empty()) {
        Frame f = std::move(stack.back());
        stack.pop_back();
        const size_t m = f.idx.size();
        if (m == 0) continue;
        if (m == 1) {
            emit(pts[f.idx[0]], cols[f.idx[0]]);
            continue;
        }

        double avg_ext = 0;
        for (uint32_t ix : f.idx) avg_ext += min_extents[ix];
        avg_ext /= double(m);

        Box tb = tight_box(pts, f.idx.data(), f.idx.size());
        float eps = 1e-12f;
        float aspect_node = f.box.max_side() / std::max(f.box.min_side(), eps);
        float aspect_tight = tb.max_side() / std::max(tb.min_side(), eps);
        float aspect = std::min(aspect_node, aspect_tight);

        if (aspect <= max_aspect_ratio &&
            tb.max_side() <= extent_mult * float(avg_ext)) {
            Vec3 mp{0, 0, 0}, mc{0, 0, 0};
            for (uint32_t ix : f.idx) {
                mp.x += pts[ix].x; mp.y += pts[ix].y; mp.z += pts[ix].z;
                mc.x += cols[ix].x; mc.y += cols[ix].y; mc.z += cols[ix].z;
            }
            float inv = 1.0f / float(m);
            emit({mp.x * inv, mp.y * inv, mp.z * inv},
                 {mc.x * inv, mc.y * inv, mc.z * inv});
            continue;
        }
        if (m <= 2) {
            for (uint32_t ix : f.idx) emit(pts[ix], cols[ix]);
            continue;
        }

        int axis = (f.prev_axis + 1) % 3;
        float split;
        std::vector<uint32_t> left, right;
        bool did_split = false;
        if (split_strategy == 1) {  // equal_num_pts
            auto mid = f.idx.begin() + f.idx.size() / 2;
            std::nth_element(f.idx.begin(), mid, f.idx.end(),
                             [&](uint32_t a, uint32_t b) {
                                 return pts[a][axis] < pts[b][axis];
                             });
            float lo_max = pts[*std::max_element(
                f.idx.begin(), mid,
                [&](uint32_t a, uint32_t b) {
                    return pts[a][axis] < pts[b][axis];
                })][axis];
            split = (lo_max + pts[*mid][axis]) / 2.0f;
            left.assign(f.idx.begin(), mid);
            right.assign(mid, f.idx.end());
            did_split = true;
        } else if (split_strategy == 2) {  // max_gap (fallback: median)
            std::sort(f.idx.begin(), f.idx.end(),
                      [&](uint32_t a, uint32_t b) {
                          return pts[a][axis] < pts[b][axis];
                      });
            float dist_max = -1.0f, mean_dist = 0.0f;
            size_t split_i = 0;
            for (size_t i = 1; i < m; ++i) {
                float d = std::abs(pts[f.idx[i]][axis] - pts[f.idx[i - 1]][axis]);
                mean_dist += d;
                if (d > dist_max) {
                    dist_max = d;
                    split_i = i;
                }
            }
            mean_dist /= float(m - 1);
            if (dist_max >= 1.5f * mean_dist && split_i > 0) {
                split = (pts[f.idx[split_i - 1]][axis] +
                         pts[f.idx[split_i]][axis]) / 2.0f;
                left.assign(f.idx.begin(), f.idx.begin() + split_i);
                right.assign(f.idx.begin() + split_i, f.idx.end());
                did_split = true;
            }
        }
        if (!did_split) {  // spatial_median (default + max_gap fallback)
            split = (f.box.lo[axis] + f.box.hi[axis]) / 2.0f;
            left.reserve(m / 2);
            right.reserve(m / 2);
            for (uint32_t ix : f.idx) {
                (pts[ix][axis] < split ? left : right).push_back(ix);
            }
        }
        Box lb = f.box, rb = f.box;
        lb.hi[axis] = split;
        rb.lo[axis] = split;
        stack.push_back(Frame{std::move(left), lb, axis});
        stack.push_back(Frame{std::move(right), rb, axis});
    }
    return n_out;
}

int64_t mdi_subsample_pointcloud(const float* positions, const float* rgbs,
                                 const float* min_extents, int64_t n,
                                 float max_aspect_ratio, float extent_mult,
                                 float* out_positions, float* out_rgbs) {
    return mdi_subsample_pointcloud_ex(positions, rgbs, min_extents, n,
                                       max_aspect_ratio, extent_mult, 0,
                                       out_positions, out_rgbs);
}

}  // extern "C"
