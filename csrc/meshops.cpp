// Mesh vertex deduplication.
//
// The contrastive-MC triangle soup is deduplicated into (vertices, faces);
// numpy's sort-based `np.unique(rows)` costs ~15 s at the 2M-corner scale of
// a res-256 extraction. This hash-map dedup is O(n) (exact bit equality on
// the 3 doubles, the same identity the reference's python-dict dedup used,
// marching_cubes_vt.py:246-253). Loaded via ctypes with a numpy fallback
// (vf_nerf_tpu/evaluation/mc/contrastive.py).

#include <cstdint>
#include <cstring>
#include <unordered_map>

namespace {

struct Key {
    double x, y, z;
    bool operator==(const Key& o) const {
        return std::memcmp(this, &o, sizeof(Key)) == 0;
    }
};

struct KeyHash {
    size_t operator()(const Key& k) const {
        // FNV-1a over the 24 raw bytes.
        const unsigned char* p = reinterpret_cast<const unsigned char*>(&k);
        size_t h = 1469598103934665603ull;
        for (size_t i = 0; i < sizeof(Key); ++i) {
            h ^= p[i];
            h *= 1099511628211ull;
        }
        return h;
    }
};

}  // namespace

extern "C" {

// verts: (n, 3) float64 rows. Writes first-occurrence unique rows into
// out_verts (capacity n rows) and per-row indices into inverse (n).
// Returns the unique count.
int64_t dedup_vertices(const double* verts, int64_t n,
                       double* out_verts, int32_t* inverse) {
    std::unordered_map<Key, int32_t, KeyHash> seen;
    seen.reserve(static_cast<size_t>(n));
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        Key k;
        std::memcpy(&k, verts + 3 * i, sizeof(Key));
        auto it = seen.find(k);
        if (it == seen.end()) {
            seen.emplace(k, static_cast<int32_t>(count));
            std::memcpy(out_verts + 3 * count, verts + 3 * i, sizeof(Key));
            inverse[i] = static_cast<int32_t>(count);
            ++count;
        } else {
            inverse[i] = it->second;
        }
    }
    return count;
}

}  // extern "C"
