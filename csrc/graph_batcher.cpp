// Native host-side graph batcher.
//
// The reference leans on PyG's C++ collation inside DataLoader workers
// (/root/reference/main.py:149-152); this is the TPU-framework equivalent:
// given a dataset packed once into contiguous arrays (features, edges,
// offsets, labels), assemble a padded, destination-sorted GraphBatch
// directly into caller-provided output buffers — no per-graph Python loop,
// stable counting-sort CSR ordering, front-truncation ("keep last S nodes")
// semantics identical to data/batch.py::collate.
//
// v2 (gt_collate2) also RESETS the output buffers itself (memset/fill), so
// callers can keep a ring of reusable buffer sets instead of allocating
// fresh zeroed arrays per batch, and fills labels (y int/float, y_arr) in
// the same pass.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

template <typename T>
void fill(T* p, int64_t n, T v) {
    for (int64_t i = 0; i < n; ++i) p[i] = v;
}

}  // namespace

extern "C" {

// Returns 0 on success, negative error codes on capacity violation.
//  -1: node capacity exceeded, -2: edge capacity, -3: graph capacity
int gt_collate2(
    // dataset (packed, row-major)
    const int64_t* node_offsets,   // [num_total_graphs + 1]
    const int64_t* edge_offsets,   // [num_total_graphs + 1]
    const uint8_t* node_feat_in,   // [Ntot, feat_row_bytes]
    int64_t feat_row_bytes,
    const int64_t* edge_src_in,    // [Etot] (graph-local indices)
    const int64_t* edge_dst_in,    // [Etot]
    const uint8_t* edge_attr_in,   // [Etot, edge_row_bytes] or nullptr
    int64_t edge_row_bytes,
    const int32_t* node_depth_in,  // [Ntot] or nullptr
    // labels (packed per dataset; any may be nullptr)
    const int32_t* y_int_in,       // [num_total_graphs]
    const float* y_float_in,       // [num_total_graphs, t_float]
    int64_t t_float,
    const int32_t* y_arr_in,       // [num_total_graphs, t_arr]
    int64_t t_arr,
    // batch selection
    const int64_t* graph_indices,  // [num_sel]
    int64_t num_sel,
    // capacities
    int64_t n_cap, int64_t e_cap, int64_t g_cap, int64_t dense_s,
    // outputs (reset HERE — safe to reuse across batches)
    uint8_t* node_feat_out,        // [n_cap, feat_row_bytes]
    int32_t* node_graph,           // [n_cap]
    int32_t* node_pos,             // [n_cap]
    uint8_t* node_mask,            // [n_cap]
    int32_t* node_depth_out,       // [n_cap]
    int32_t* edge_src_out,         // [e_cap]
    int32_t* edge_dst_out,         // [e_cap]
    uint8_t* edge_attr_out,        // [e_cap, edge_row_bytes]
    uint8_t* edge_mask,            // [e_cap]
    uint8_t* graph_mask,           // [g_cap]
    int32_t* num_nodes,            // [g_cap]
    int32_t* graph_ids_out,        // [g_cap]
    int32_t* y_int_out,            // [g_cap] or nullptr
    float* y_float_out,            // [g_cap, t_float] or nullptr
    int32_t* y_arr_out             // [g_cap, t_arr] or nullptr
) {
    if (num_sel > g_cap) return -3;

    // ---- resets ----
    std::memset(node_feat_out, 0, (size_t)(n_cap * feat_row_bytes));
    fill(node_graph, n_cap, (int32_t)(g_cap - 1));
    std::memset(node_pos, 0, (size_t)n_cap * sizeof(int32_t));
    std::memset(node_mask, 0, (size_t)n_cap);
    std::memset(node_depth_out, 0, (size_t)n_cap * sizeof(int32_t));
    fill(edge_src_out, e_cap, (int32_t)(n_cap - 1));
    fill(edge_dst_out, e_cap, (int32_t)(n_cap - 1));
    if (edge_row_bytes > 0)
        std::memset(edge_attr_out, 0, (size_t)(e_cap * edge_row_bytes));
    std::memset(edge_mask, 0, (size_t)e_cap);
    std::memset(graph_mask, 0, (size_t)g_cap);
    std::memset(num_nodes, 0, (size_t)g_cap * sizeof(int32_t));
    fill(graph_ids_out, g_cap, (int32_t)-1);
    if (y_int_out) std::memset(y_int_out, 0, (size_t)g_cap * sizeof(int32_t));
    if (y_float_out) {
        const float nanv = std::nanf("");
        fill(y_float_out, g_cap * t_float, nanv);
    }
    if (y_arr_out)
        std::memset(y_arr_out, 0, (size_t)(g_cap * t_arr) * sizeof(int32_t));

    // ---- assembly ----
    int64_t node_off = 0, edge_off = 0;
    std::vector<int32_t> src_tmp, dst_tmp;
    std::vector<int64_t> eid_tmp;

    for (int64_t k = 0; k < num_sel; ++k) {
        const int64_t g = graph_indices[k];
        const int64_t n0 = node_offsets[g], n1 = node_offsets[g + 1];
        const int64_t e0 = edge_offsets[g], e1 = edge_offsets[g + 1];
        const int64_t n = n1 - n0, e = e1 - e0;
        if (node_off + n > n_cap) return -1;
        if (edge_off + e > e_cap) return -2;

        std::memcpy(node_feat_out + node_off * feat_row_bytes,
                    node_feat_in + n0 * feat_row_bytes,
                    (size_t)(n * feat_row_bytes));
        const int64_t keep = n < dense_s ? n : dense_s;
        for (int64_t j = 0; j < n; ++j) {
            node_graph[node_off + j] = (int32_t)k;
            node_mask[node_off + j] = 1;
            // keep the LAST `keep` nodes; earlier ones go to the trash column
            const int64_t rel = j - (n - keep);
            node_pos[node_off + j] = (int32_t)(rel >= 0 ? rel : dense_s);
            if (node_depth_in)
                node_depth_out[node_off + j] = node_depth_in[n0 + j];
        }
        for (int64_t j = 0; j < e; ++j) {
            src_tmp.push_back((int32_t)(edge_src_in[e0 + j] + node_off));
            dst_tmp.push_back((int32_t)(edge_dst_in[e0 + j] + node_off));
            eid_tmp.push_back(e0 + j);
        }
        graph_mask[k] = 1;
        num_nodes[k] = (int32_t)n;
        graph_ids_out[k] = (int32_t)g;
        if (y_int_in && y_int_out) y_int_out[k] = y_int_in[g];
        if (y_float_in && y_float_out)
            std::memcpy(y_float_out + k * t_float, y_float_in + g * t_float,
                        (size_t)(t_float * sizeof(float)));
        if (y_arr_in && y_arr_out)
            std::memcpy(y_arr_out + k * t_arr, y_arr_in + g * t_arr,
                        (size_t)(t_arr * sizeof(int32_t)));
        node_off += n;
        edge_off += e;
    }

    // stable counting sort of edges by destination -> contiguous CSR runs
    const int64_t n_used = node_off;
    const int64_t e_used = (int64_t)src_tmp.size();
    std::vector<int32_t> count((size_t)n_used + 1, 0);
    for (int64_t j = 0; j < e_used; ++j) count[(size_t)dst_tmp[j]]++;
    std::vector<int64_t> pos((size_t)n_used + 1, 0);
    for (int64_t v = 1; v <= n_used; ++v) pos[v] = pos[v - 1] + count[v - 1];
    for (int64_t j = 0; j < e_used; ++j) {
        const int64_t slot = pos[(size_t)dst_tmp[j]]++;
        edge_src_out[slot] = src_tmp[j];
        edge_dst_out[slot] = dst_tmp[j];
        edge_mask[slot] = 1;
        if (edge_attr_in && edge_row_bytes > 0)
            std::memcpy(edge_attr_out + slot * edge_row_bytes,
                        edge_attr_in + eid_tmp[j] * edge_row_bytes,
                        (size_t)edge_row_bytes);
    }
    return 0;
}

}  // extern "C"
