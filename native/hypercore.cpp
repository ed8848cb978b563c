// hypercore: native host-side hypergraph preprocessing kernels.
//
// The reference delegates all native compute to third-party extensions and
// runs its own preprocessing as pure-python loops (clique expansion at
// src/preprocessing.py:343-391 is O(sum k^2) python dict ops; coalesce
// goes through torch_sparse). These are the framework's first-party native
// equivalents for large hypergraphs (walmart/yelp scale), exposed over a
// plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libhypercore.so hypercore.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Weighted clique expansion: every hyperedge contributes all (i<j) member
// pairs; weight = co-occurrence count. Inputs are the V2E COO (any order).
// Writes up to `cap` pairs into out_i/out_j/out_w; returns the number of
// unique pairs, or -1 if cap is too small (caller sizes cap with the exact
// upper bound sum_e k_e*(k_e-1)/2).
int64_t hypercore_clique_expand(const int64_t* node, const int64_t* edge,
                                int64_t nnz, int64_t num_edges,
                                int64_t* out_i, int64_t* out_j, float* out_w,
                                int64_t cap) {
    // bucket members by hyperedge
    std::vector<int64_t> counts(num_edges + 1, 0);
    for (int64_t t = 0; t < nnz; ++t) counts[edge[t] + 1]++;
    for (int64_t e = 0; e < num_edges; ++e) counts[e + 1] += counts[e];
    std::vector<int64_t> members(nnz);
    {
        std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
        for (int64_t t = 0; t < nnz; ++t) members[cursor[edge[t]]++] = node[t];
    }

    std::unordered_map<uint64_t, float> weights;
    weights.reserve(static_cast<size_t>(nnz) * 4);
    for (int64_t e = 0; e < num_edges; ++e) {
        int64_t lo = counts[e], hi = counts[e + 1];
        if (hi - lo <= 1) continue;  // skip self loops (preprocessing.py:370)
        std::sort(members.begin() + lo, members.begin() + hi);
        for (int64_t a = lo; a < hi; ++a) {
            for (int64_t b = a + 1; b < hi; ++b) {
                uint64_t key = (static_cast<uint64_t>(members[a]) << 32) |
                               static_cast<uint32_t>(members[b]);
                weights[key] += 1.0f;
            }
        }
    }

    if (static_cast<int64_t>(weights.size()) > cap) return -1;
    int64_t k = 0;
    for (const auto& kv : weights) {
        out_i[k] = static_cast<int64_t>(kv.first >> 32);
        out_j[k] = static_cast<int64_t>(kv.first & 0xffffffffu);
        out_w[k] = kv.second;
        ++k;
    }
    return k;
}

// Sort incidence entries by (edge, node) and drop duplicates.
// In-place capable: outputs may alias inputs. Returns new nnz.
int64_t hypercore_coalesce(const int64_t* node, const int64_t* edge,
                           int64_t nnz, int64_t* out_node, int64_t* out_edge) {
    std::vector<std::pair<int64_t, int64_t>> pairs(nnz);
    for (int64_t t = 0; t < nnz; ++t) pairs[t] = {edge[t], node[t]};
    std::sort(pairs.begin(), pairs.end());
    pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
    int64_t k = static_cast<int64_t>(pairs.size());
    for (int64_t t = 0; t < k; ++t) {
        out_edge[t] = pairs[t].first;
        out_node[t] = pairs[t].second;
    }
    return k;
}

// CSR row pointers from sorted segment ids (for kernel block offsets and
// adjacency lists). boundaries are [0..num_segments] inclusive.
void hypercore_indptr(const int64_t* sorted_ids, int64_t nnz,
                      int64_t num_segments, int64_t* out_indptr) {
    int64_t t = 0;
    for (int64_t s = 0; s <= num_segments; ++s) {
        while (t < nnz && sorted_ids[t] < s) ++t;
        out_indptr[s] = t;
    }
}

// Stable counting argsort over small-ranged integer keys (node/hyperedge
// ids): O(n + K) vs numpy's O(n log n) comparison argsort. This is the
// host-side hot loop of Incidence.from_arrays (canonical edge sort +
// node-sorted second ordering) and of the sharded-exchange partition
// builder (per-shard src sorts).
void hypercore_counting_argsort(const int64_t* keys, int64_t n,
                                int64_t num_keys, int64_t* out_perm) {
    std::vector<int64_t> counts(num_keys + 1, 0);
    for (int64_t t = 0; t < n; ++t) counts[keys[t] + 1]++;
    for (int64_t k = 0; k < num_keys; ++k) counts[k + 1] += counts[k];
    for (int64_t t = 0; t < n; ++t) out_perm[counts[keys[t]]++] = t;
}

}  // extern "C"
