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
// v3 (gt_collate3) parallelizes the assembly across threads: a serial
// prefix pass computes per-graph node/edge destinations (so every graph's
// output region is known up front), then worker threads each own a
// contiguous range of graphs — feature copies, masks, labels, and a
// PER-GRAPH stable counting sort of edges by destination (identical output
// order to a global stable sort, because graph blocks occupy disjoint,
// increasing destination ranges). Padding tails are reset in a second
// parallel sweep, and ONLY the tails: every element of the used prefix is
// written by the assembly, so the old full-capacity memset (which dominated
// memory traffic at large batch) is gone. Labels (y int/float, y_arr) are
// filled in the same pass.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// gt_collate2 (single-threaded v2 signature) is kept as a shim.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

template <typename T>
void fill(T* p, int64_t n, T v) {
    for (int64_t i = 0; i < n; ++i) p[i] = v;
}

void run_parallel(int nt, const std::function<void(int)>& fn) {
    if (nt <= 1) {
        fn(0);
        return;
    }
    std::vector<std::thread> ts;
    ts.reserve(nt - 1);
    for (int t = 1; t < nt; ++t) ts.emplace_back(fn, t);
    fn(0);
    for (auto& th : ts) th.join();
}

// [lo, hi) split into `nt` near-equal slices; returns slice t
inline void slice(int64_t lo, int64_t hi, int nt, int t, int64_t* a, int64_t* b) {
    const int64_t n = hi - lo;
    *a = lo + n * t / nt;
    *b = lo + n * (t + 1) / nt;
}

}  // namespace

extern "C" {

// Returns 0 on success, negative error codes on capacity violation.
//  -1: node capacity exceeded, -2: edge capacity, -3: graph capacity
//  -4: per-graph stride/dense-edge capacity exceeded (strided mode)
//
// v4 adds the STRIDED (dense) layout: when node_stride > 0, graph k's
// nodes land at flat rows [k*stride, k*stride+n) (so [N, d] tensors
// reshape to [G, stride, d] for free), per-graph gaps are reset inline,
// and per-graph dense edge tables [g_cap, dense_edge_cap] are emitted for
// the scatter-free one-hot-matmul aggregation (ops/dense_mp.py).
int gt_collate4(
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
    // outputs (tails reset HERE — safe to reuse across batches)
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
    int32_t* y_arr_out,            // [g_cap, t_arr] or nullptr
    int64_t num_threads,
    // strided layout (all ignored when node_stride == 0)
    int64_t node_stride,
    int64_t dense_edge_cap,
    int32_t* edge_src_dense,       // [g_cap, dense_edge_cap] or nullptr
    int32_t* edge_dst_dense,       // [g_cap, dense_edge_cap]
    uint8_t* edge_mask_dense,      // [g_cap, dense_edge_cap]
    uint8_t* edge_attr_dense       // [g_cap, dense_edge_cap, edge_row_bytes]
) {
    if (num_sel > g_cap) return -3;
    const bool strided = node_stride > 0;

    // ---- serial prefix pass: per-graph output bases + capacity checks ----
    std::vector<int64_t> node_base((size_t)num_sel + 1);
    std::vector<int64_t> edge_base((size_t)num_sel + 1);
    int64_t max_n = 0;
    node_base[0] = edge_base[0] = 0;
    for (int64_t k = 0; k < num_sel; ++k) {
        const int64_t g = graph_indices[k];
        const int64_t n = node_offsets[g + 1] - node_offsets[g];
        const int64_t e = edge_offsets[g + 1] - edge_offsets[g];
        if (strided && (n > node_stride || e > dense_edge_cap)) return -4;
        node_base[k + 1] = strided ? (k + 1) * node_stride : node_base[k] + n;
        edge_base[k + 1] = edge_base[k] + e;
        if (n > max_n) max_n = n;
    }
    const int64_t n_used = node_base[num_sel];
    const int64_t e_used = edge_base[num_sel];
    if (n_used > n_cap) return -1;
    if (e_used > e_cap) return -2;

    int nt = (int)num_threads;
    if (nt < 1) nt = 1;
    if (nt > num_sel && num_sel > 0) nt = (int)num_sel;

    // contiguous graph ranges balanced by node count
    std::vector<int64_t> gcut((size_t)nt + 1, num_sel);
    gcut[0] = 0;
    {
        int64_t k = 0;
        for (int t = 1; t < nt; ++t) {
            const int64_t target = n_used * t / nt;
            while (k < num_sel && node_base[k] < target) ++k;
            gcut[t] = k;
        }
    }

    // ---- parallel assembly: each thread owns graphs [gcut[t], gcut[t+1]) ----
    run_parallel(nt, [&](int t) {
        std::vector<int32_t> count((size_t)max_n + 1);
        for (int64_t k = gcut[t]; k < gcut[t + 1]; ++k) {
            const int64_t g = graph_indices[k];
            const int64_t n0 = node_offsets[g];
            const int64_t e0 = edge_offsets[g];
            const int64_t n = node_offsets[g + 1] - n0;
            const int64_t e = edge_offsets[g + 1] - e0;
            const int64_t nb = node_base[k], eb = edge_base[k];

            std::memcpy(node_feat_out + nb * feat_row_bytes,
                        node_feat_in + n0 * feat_row_bytes,
                        (size_t)(n * feat_row_bytes));
            const int64_t keep = n < dense_s ? n : dense_s;
            for (int64_t j = 0; j < n; ++j) {
                node_graph[nb + j] = (int32_t)k;
                node_mask[nb + j] = 1;
                // keep the LAST `keep` nodes; earlier ones -> trash column
                const int64_t rel = j - (n - keep);
                node_pos[nb + j] = (int32_t)(rel >= 0 ? rel : dense_s);
                node_depth_out[nb + j] = node_depth_in ? node_depth_in[n0 + j] : 0;
            }
            if (strided) {
                // reset this graph's stride gap (reusable buffers)
                const int64_t g0 = nb + n, gap = node_stride - n;
                if (gap > 0) {
                    std::memset(node_feat_out + g0 * feat_row_bytes, 0,
                                (size_t)(gap * feat_row_bytes));
                    fill(node_graph + g0, gap, (int32_t)(g_cap - 1));
                    std::memset(node_pos + g0, 0, (size_t)gap * sizeof(int32_t));
                    std::memset(node_mask + g0, 0, (size_t)gap);
                    std::memset(node_depth_out + g0, 0,
                                (size_t)gap * sizeof(int32_t));
                }
                // per-graph dense edge tables (graph-LOCAL indices)
                int32_t* es = edge_src_dense + k * dense_edge_cap;
                int32_t* ed = edge_dst_dense + k * dense_edge_cap;
                uint8_t* em = edge_mask_dense + k * dense_edge_cap;
                for (int64_t j = 0; j < e; ++j) {
                    es[j] = (int32_t)edge_src_in[e0 + j];
                    ed[j] = (int32_t)edge_dst_in[e0 + j];
                    em[j] = 1;
                }
                const int64_t et = dense_edge_cap - e;
                std::memset(es + e, 0, (size_t)et * sizeof(int32_t));
                std::memset(ed + e, 0, (size_t)et * sizeof(int32_t));
                std::memset(em + e, 0, (size_t)et);
                if (edge_attr_dense && edge_row_bytes > 0) {
                    uint8_t* ea = edge_attr_dense
                        + k * dense_edge_cap * edge_row_bytes;
                    std::memcpy(ea, edge_attr_in + e0 * edge_row_bytes,
                                (size_t)(e * edge_row_bytes));
                    std::memset(ea + e * edge_row_bytes, 0,
                                (size_t)(et * edge_row_bytes));
                }
            }

            // stable counting sort of this graph's edges by LOCAL dst
            // (graph blocks occupy disjoint increasing dst ranges, so the
            // concatenation equals the old global stable sort exactly)
            std::memset(count.data(), 0, (size_t)(n + 1) * sizeof(int32_t));
            for (int64_t j = 0; j < e; ++j) count[(size_t)edge_dst_in[e0 + j]]++;
            int32_t run = 0;
            for (int64_t v = 0; v < n; ++v) {
                const int32_t c = count[(size_t)v];
                count[(size_t)v] = run;
                run += c;
            }
            for (int64_t j = 0; j < e; ++j) {
                const int64_t dl = edge_dst_in[e0 + j];
                const int64_t slot = eb + (count[(size_t)dl]++);
                edge_src_out[slot] = (int32_t)(edge_src_in[e0 + j] + nb);
                edge_dst_out[slot] = (int32_t)(dl + nb);
                edge_mask[slot] = 1;
                if (edge_attr_in && edge_row_bytes > 0)
                    std::memcpy(edge_attr_out + slot * edge_row_bytes,
                                edge_attr_in + (e0 + j) * edge_row_bytes,
                                (size_t)edge_row_bytes);
            }

            graph_mask[k] = 1;
            num_nodes[k] = (int32_t)n;
            graph_ids_out[k] = (int32_t)g;
            if (y_int_out) y_int_out[k] = y_int_in ? y_int_in[g] : 0;
            if (y_float_out) {
                if (y_float_in)
                    std::memcpy(y_float_out + k * t_float,
                                y_float_in + g * t_float,
                                (size_t)(t_float * sizeof(float)));
                else
                    fill(y_float_out + k * t_float, t_float, std::nanf(""));
            }
            if (y_arr_out) {
                if (y_arr_in)
                    std::memcpy(y_arr_out + k * t_arr, y_arr_in + g * t_arr,
                                (size_t)(t_arr * sizeof(int32_t)));
                else
                    std::memset(y_arr_out + k * t_arr, 0,
                                (size_t)(t_arr * sizeof(int32_t)));
            }
        }
    });

    // ---- parallel tail resets (ONLY the padding regions) ----
    run_parallel(nt, [&](int t) {
        int64_t a, b;
        slice(n_used, n_cap, nt, t, &a, &b);
        std::memset(node_feat_out + a * feat_row_bytes, 0,
                    (size_t)((b - a) * feat_row_bytes));
        fill(node_graph + a, b - a, (int32_t)(g_cap - 1));
        std::memset(node_pos + a, 0, (size_t)(b - a) * sizeof(int32_t));
        std::memset(node_mask + a, 0, (size_t)(b - a));
        std::memset(node_depth_out + a, 0, (size_t)(b - a) * sizeof(int32_t));

        slice(e_used, e_cap, nt, t, &a, &b);
        fill(edge_src_out + a, b - a, (int32_t)(n_cap - 1));
        fill(edge_dst_out + a, b - a, (int32_t)(n_cap - 1));
        std::memset(edge_mask + a, 0, (size_t)(b - a));
        if (edge_attr_in && edge_row_bytes > 0)
            std::memset(edge_attr_out + a * edge_row_bytes, 0,
                        (size_t)((b - a) * edge_row_bytes));

        slice(num_sel, g_cap, nt, t, &a, &b);
        std::memset(graph_mask + a, 0, (size_t)(b - a));
        std::memset(num_nodes + a, 0, (size_t)(b - a) * sizeof(int32_t));
        fill(graph_ids_out + a, b - a, (int32_t)-1);
        if (strided) {
            std::memset(edge_src_dense + a * dense_edge_cap, 0,
                        (size_t)((b - a) * dense_edge_cap) * sizeof(int32_t));
            std::memset(edge_dst_dense + a * dense_edge_cap, 0,
                        (size_t)((b - a) * dense_edge_cap) * sizeof(int32_t));
            std::memset(edge_mask_dense + a * dense_edge_cap, 0,
                        (size_t)((b - a) * dense_edge_cap));
            if (edge_attr_dense && edge_row_bytes > 0)
                std::memset(edge_attr_dense + a * dense_edge_cap * edge_row_bytes,
                            0, (size_t)((b - a) * dense_edge_cap * edge_row_bytes));
        }
        if (y_int_out)
            std::memset(y_int_out + a, 0, (size_t)(b - a) * sizeof(int32_t));
        if (y_float_out)
            fill(y_float_out + a * t_float, (b - a) * t_float, std::nanf(""));
        if (y_arr_out)
            std::memset(y_arr_out + a * t_arr, 0,
                        (size_t)((b - a) * t_arr) * sizeof(int32_t));
    });

    return 0;
}

// v3 compatibility shim: no strided layout.
int gt_collate3(
    const int64_t* node_offsets, const int64_t* edge_offsets,
    const uint8_t* node_feat_in, int64_t feat_row_bytes,
    const int64_t* edge_src_in, const int64_t* edge_dst_in,
    const uint8_t* edge_attr_in, int64_t edge_row_bytes,
    const int32_t* node_depth_in,
    const int32_t* y_int_in, const float* y_float_in, int64_t t_float,
    const int32_t* y_arr_in, int64_t t_arr,
    const int64_t* graph_indices, int64_t num_sel,
    int64_t n_cap, int64_t e_cap, int64_t g_cap, int64_t dense_s,
    uint8_t* node_feat_out, int32_t* node_graph, int32_t* node_pos,
    uint8_t* node_mask, int32_t* node_depth_out,
    int32_t* edge_src_out, int32_t* edge_dst_out, uint8_t* edge_attr_out,
    uint8_t* edge_mask, uint8_t* graph_mask, int32_t* num_nodes,
    int32_t* graph_ids_out,
    int32_t* y_int_out, float* y_float_out, int32_t* y_arr_out,
    int64_t num_threads
) {
    return gt_collate4(
        node_offsets, edge_offsets, node_feat_in, feat_row_bytes,
        edge_src_in, edge_dst_in, edge_attr_in, edge_row_bytes, node_depth_in,
        y_int_in, y_float_in, t_float, y_arr_in, t_arr,
        graph_indices, num_sel, n_cap, e_cap, g_cap, dense_s,
        node_feat_out, node_graph, node_pos, node_mask, node_depth_out,
        edge_src_out, edge_dst_out, edge_attr_out, edge_mask, graph_mask,
        num_nodes, graph_ids_out, y_int_out, y_float_out, y_arr_out,
        num_threads, 0, 0, nullptr, nullptr, nullptr, nullptr);
}

// v2 compatibility shim: single-threaded, full signature minus num_threads.
int gt_collate2(
    const int64_t* node_offsets, const int64_t* edge_offsets,
    const uint8_t* node_feat_in, int64_t feat_row_bytes,
    const int64_t* edge_src_in, const int64_t* edge_dst_in,
    const uint8_t* edge_attr_in, int64_t edge_row_bytes,
    const int32_t* node_depth_in,
    const int32_t* y_int_in, const float* y_float_in, int64_t t_float,
    const int32_t* y_arr_in, int64_t t_arr,
    const int64_t* graph_indices, int64_t num_sel,
    int64_t n_cap, int64_t e_cap, int64_t g_cap, int64_t dense_s,
    uint8_t* node_feat_out, int32_t* node_graph, int32_t* node_pos,
    uint8_t* node_mask, int32_t* node_depth_out,
    int32_t* edge_src_out, int32_t* edge_dst_out, uint8_t* edge_attr_out,
    uint8_t* edge_mask, uint8_t* graph_mask, int32_t* num_nodes,
    int32_t* graph_ids_out,
    int32_t* y_int_out, float* y_float_out, int32_t* y_arr_out
) {
    return gt_collate3(
        node_offsets, edge_offsets, node_feat_in, feat_row_bytes,
        edge_src_in, edge_dst_in, edge_attr_in, edge_row_bytes, node_depth_in,
        y_int_in, y_float_in, t_float, y_arr_in, t_arr,
        graph_indices, num_sel, n_cap, e_cap, g_cap, dense_s,
        node_feat_out, node_graph, node_pos, node_mask, node_depth_out,
        edge_src_out, edge_dst_out, edge_attr_out, edge_mask, graph_mask,
        num_nodes, graph_ids_out, y_int_out, y_float_out, y_arr_out, 1);
}

}  // extern "C"
