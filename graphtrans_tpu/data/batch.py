"""Static-shape padded graph batch container.

The reference (PyG `Batch`, see /root/reference/main.py:142-153) concatenates
ragged graphs into dynamic-shape tensors. XLA requires static shapes, so we
instead pad every batch to bucketed capacities `(num_graphs, num_nodes,
num_edges)` and carry explicit validity masks. The last graph slot is reserved
as a "padding graph" that absorbs all padding nodes/edges (jraph-style), so
segment reductions never index out of range.

Dense packing for the transformer stage: the reference front-pads each graph's
node sequence and truncates to the LAST `max_input_len` nodes
(/root/reference/modules/utils.py:5-29). We keep the same truncation semantics
(keep the last S nodes) but pack valid nodes contiguously from position 0 —
the batch carries `node_pos`, the target column of each node in the dense
`[B, S(+1), d]` tensor; truncated/padding nodes point at a trash column that is
sliced off after the scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A padded, statically-shaped batch of graphs (all leaves are arrays).

    Shapes: N = padded node count, E = padded edge count, G = padded graph
    count (last slot is the padding graph when any padding exists).
    """

    # --- node level ---
    node_feat: Any        # [N, F] float32 or int32 (raw features, pre-encoder)
    node_graph: Any       # [N] int32: graph id per node (padding -> G-1)
    node_pos: Any         # [N] int32: column in dense [G, S] packing (trash -> S)
    node_mask: Any        # [N] bool: valid node (and not truncated? no: valid node)
    node_depth: Any       # [N] int32 (code2 AST depth) or zeros
    # --- edge level (sorted by edge_dst for segment-reduce locality) ---
    edge_src: Any         # [E] int32 (padding -> N-1)
    edge_dst: Any         # [E] int32 (padding -> N-1)
    edge_attr: Any        # [E, Fe] float32/int32 (zeros when dataset has none)
    edge_mask: Any        # [E] bool
    # --- graph level ---
    graph_mask: Any       # [G] bool
    num_nodes: Any        # [G] int32 valid nodes per graph
    y: Any                # [G, T] float32 (mol multi-task) or [G] int32 (class id)
    y_arr: Any            # [G, L] int32 (code2 target token array) or [G, 0]
    # dense adjacency for the masked (structure-restricted) encoder; built
    # lazily only when masked layers are enabled (the reference builds it
    # unconditionally and pickles it: /root/reference/data/adj_list.py:37-49).
    dense_adj: Any = None  # [G, S, S] bool or None
    graph_ids: Any = None  # [G] int32: index into the source split (-1 = padding)
    # node-sharded (hybrid) execution only: [D, H] rows this chip ships to
    # each peer (parallel/halo.py); None everywhere else
    halo_send_idx: Any = None
    # hybrid GCN: host-precomputed degree normalization (local per-edge
    # scatter cannot see a node's global out-degree)
    edge_gcn_norm: Any = None   # [E] deg^-1/2[src] * deg^-1/2[dst]
    node_gcn_inv_deg: Any = None  # [N] 1/deg (self-loop term scale)
    # --- dense (strided) layout extras ---
    # When node_stride > 0, graph g's nodes occupy flat rows
    # [g*stride, g*stride+n) so [N, d] node tensors reshape to
    # [G, stride, d] for free, and per-graph edge tables below drive the
    # scatter-free one-hot-matmul aggregation (ops/dense_mp.py). The flat
    # edge arrays above remain valid (strided global indices, dst-sorted).
    edge_src_dense: Any = None   # [G, Em] int32 graph-local src (pad 0)
    edge_dst_dense: Any = None   # [G, Em] int32 graph-local dst (pad 0)
    edge_mask_dense: Any = None  # [G, Em] bool
    edge_attr_dense: Any = None  # [G, Em, Fe]
    # --- blocked-CSR (block-pair one-hot SpMM) extras ---
    # Flat-layout batches for graphs beyond the dense-layout regime (code2
    # ASTs): edges grouped into (dst_block, src_block) 128-row pairs so the
    # aggregation runs as MXU one-hot matmuls (ops/block_plan.py +
    # ops/pallas/block_spmm.py). bsp_fwd is the dst-major plan (forward +
    # d_emb), bsp_bwd the src-major plan (dx); edge_attr copies ride in
    # each plan's chunk order so the encoder output feeds the kernel with
    # no device-side permutation.
    bsp_fwd: Any = None          # dict of plan arrays (see block_plan.py)
    bsp_bwd: Any = None
    edge_attr_bsp_fwd: Any = None  # [C*EB, Fe]
    edge_attr_bsp_bwd: Any = None
    # --- scatter-free aggregation (ops/scatter_free.py, pure XLA) ---
    # dst-/src-major per-block slot plans; the production flat-TPU route
    # (gathers + batched one-hot matmuls, no serialized scatters).
    sfa_dst: Any = None          # dict: other_g/loc [L] i32, mask [L] f32
    sfa_src: Any = None          # src-major twin (backward's dx side)
    edge_attr_sfa: Any = None    # [L, Fe] dst-slot-ordered edge_attr copy
    edge_attr_sfa_src: Any = None  # [L, Fe] src-slot-ordered copy (bwd mask)
    # host-precomputed GCN degree normalization per slot order (structural
    # — avoids an in-jit degree scatter and per-slot dis gathers)
    sfa_gcn_norm_dst: Any = None   # [L] f32
    sfa_gcn_norm_src: Any = None   # [L] f32
    sfa_inv_deg: Any = None        # [N] f32 1/(out_degree+1)
    # graph-major slot plan for scatter-free per-graph sums (VN pooling /
    # flat readouts — ops/scatter_free.graph_sum_sfa)
    sfa_pool: Any = None
    # ELL neighbor-slot plans (segment min/max for PNA — ops/ell.py)
    edge_attr_ell: Any = None      # [N*K, Fe] dst-ELL-ordered edge_attr
    edge_attr_ell_src: Any = None  # [N*K, Fe] src-ELL-ordered copy (bwd mask)
    ell_gcn_norm_dst: Any = None   # [N*K] structural GCN norms per order
    ell_gcn_norm_src: Any = None
    ell_dst: Any = None
    ell_src: Any = None
    # --- COMPRESSED scatter-free plans (the production shipping format,
    # round 4): CSR row starts + one src-sorted edge permutation; every
    # plan above is derived on DEVICE from these (ops/plan_expand.py).
    # The explicit dicts above remain supported for tests/legacy callers.
    sfa_row_start_dst: Any = None   # [N+1] i32 (valid edges, dst-sorted prefix)
    sfa_row_start_src: Any = None   # [N+1] i32 (indexes edge_perm_src order)
    edge_perm_src: Any = None       # [E] i32 stable src-sort of valid edges
    edge_gcn_norm_e: Any = None     # [E] f32 structural GCN norm, edge order
    edge_pack_src: Any = None       # [E, 3+Fe] i32 src-sorted edge pack
    # --- variable-length sequence packing for the transformer stage
    # (ops/pack.py): graphs' kept nodes + their own CLS token packed
    # contiguously into [pack_rows, pack_w] slots with segment-id attention
    # masking — replaces the [G, S_max] dense padding for heavy-tailed
    # datasets (real ogbg-code2 pads ~8x there).
    pack_node: Any = None           # [R*W] i32 slot -> flat node row (N=zero)
    pack_seg: Any = None            # [R*W] i32 graph id per slot (-1 = pad)
    pack_cls_slot: Any = None       # [G] i32 CLS readout slot per graph
    pack_inv: Any = None            # [N] i32 node -> slot (R*W = absent)
    # second (small-graph) tier: graphs with <= pack2_w tokens pack into
    # narrower rows (attention cost ~ sum_rows W_r^2) — pack_cls_slot then
    # indexes the virtual concat [R*W + R2*W2)
    pack2_node: Any = None          # [R2*W2] i32
    pack2_seg: Any = None           # [R2*W2] i32
    pack2_inv: Any = None           # [N] i32 node -> tier-2 slot
    # third (smallest-graph) tier — the heavy-tail distribution's bulk
    # (mean ~125 nodes) rides W3=128 rows at 1/9 the per-token attention
    # cost of the W2=384 tier
    pack3_node: Any = None          # [R3*W3] i32
    pack3_seg: Any = None           # [R3*W3] i32
    pack3_inv: Any = None           # [N] i32 node -> tier-3 slot

    # --- static metadata (aux_data, not traced) ---
    max_nodes_dense: int = dataclasses.field(default=0, metadata=dict(static=True))
    node_stride: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack2_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack2_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack3_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    pack3_rows: int = dataclasses.field(default=0, metadata=dict(static=True))
    sfa_nb: int = dataclasses.field(default=0, metadata=dict(static=True))
    sfa_eb: int = dataclasses.field(default=0, metadata=dict(static=True))
    sfa_pool_eb: int = dataclasses.field(default=0, metadata=dict(static=True))
    ell_k_in: int = dataclasses.field(default=0, metadata=dict(static=True))
    ell_k_out: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_node_slots(self) -> int:
        return self.node_graph.shape[0]

    @property
    def num_edge_slots(self) -> int:
        return self.edge_src.shape[0]

    @property
    def num_graph_slots(self) -> int:
        return self.graph_mask.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_size(n: int, multiple: int = 128) -> int:
    """Round `n` up to a small set of bucket sizes to bound recompilation.

    Buckets are powers of two times `multiple` subdivided into quarters
    (1.0x, 1.25x, 1.5x, 1.75x), giving at most ~4 buckets per octave.
    """
    n = max(n, 1)
    b = multiple
    while b < n:
        b *= 2
    if b == multiple:
        return b
    lower = b // 2
    for frac in (1.25, 1.5, 1.75):
        cand = int(lower * frac)
        cand = _round_up(cand, multiple)
        if cand >= n:
            return cand
    return b


def collate(
    graphs: list[dict],
    num_graphs_cap: int,
    num_nodes_cap: int,
    num_edges_cap: int,
    max_input_len: int = 1000,
    num_tasks: int = 1,
    max_seq_len: Optional[int] = None,
    y_dtype: str = "int32",
    with_dense_adj: bool = False,
    dense_cap: Optional[int] = None,
    node_stride: int = 0,
    dense_edge_cap: int = 0,
    bsp_chunks_cap: int = 0,
    scatter_free: bool = False,
    sfa_eb: int = 0,
    sfa_explicit: bool = False,
    ell_explicit: bool = False,
    seq_pack_w: int = 0,
    seq_pack_rows: int = 0,
    seq_pack_w2: int = 0,
    seq_pack_rows2: int = 0,
    seq_pack_w3: int = 0,
    seq_pack_rows3: int = 0,
) -> GraphBatch:
    """Assemble a list of host-side graph dicts into one padded GraphBatch.

    Each graph dict has numpy arrays: ``x [n,F]``, ``edge_index [2,e]`` and
    optionally ``edge_attr [e,Fe]``, ``y``, ``y_arr [L]``, ``node_depth [n]``.

    Semantics mirrored from the reference:
      - graphs larger than ``max_input_len`` keep their LAST ``max_input_len``
        nodes in the dense transformer packing
        (/root/reference/modules/utils.py:22-24) — message passing still sees
        all nodes; only the dense packing truncates.
      - edges are sorted by destination node so the segment reduction is a
        contiguous-run reduce (TPU-friendly CSR layout).
    """
    G, N, E = num_graphs_cap, num_nodes_cap, num_edges_cap
    n_real = len(graphs)
    if n_real > G:
        raise ValueError(f"batch of {n_real} graphs exceeds cap {G}")

    if node_stride > 0:
        # strided (dense) layout: graph i owns flat rows [i*stride, ...).
        # No truncation in this mode — the stride IS the dense width.
        if node_stride > max_input_len:
            raise ValueError(f"node_stride {node_stride} exceeds "
                             f"max_input_len {max_input_len}")
        if N != G * node_stride:
            raise ValueError(f"strided layout needs num_nodes_cap == "
                             f"G*stride ({G}*{node_stride}), got {N}")
        if dense_edge_cap <= 0:
            raise ValueError("strided layout requires dense_edge_cap")

    total_nodes = sum(int(g["x"].shape[0]) for g in graphs)
    total_edges = sum(int(g["edge_index"].shape[1]) for g in graphs)
    if node_stride == 0 and total_nodes > N:
        raise ValueError(f"{total_nodes} nodes exceed cap {N}")
    if total_edges > E:
        raise ValueError(f"{total_edges} edges exceed cap {E}")

    feat_dim = graphs[0]["x"].shape[1] if graphs[0]["x"].ndim == 2 else 1
    feat_dtype = graphs[0]["x"].dtype
    ea0 = graphs[0].get("edge_attr")
    edge_dim = 0 if ea0 is None else (ea0.shape[1] if ea0.ndim == 2 else 1)
    edge_dtype = np.float32 if ea0 is None else ea0.dtype

    node_feat = np.zeros((N, feat_dim), dtype=feat_dtype)
    node_graph = np.full((N,), G - 1, dtype=np.int32)
    node_pos = np.zeros((N,), dtype=np.int32)
    node_mask = np.zeros((N,), dtype=bool)
    node_depth = np.zeros((N,), dtype=np.int32)
    edge_src = np.full((E,), N - 1, dtype=np.int32)
    edge_dst = np.full((E,), N - 1, dtype=np.int32)
    edge_attr = np.zeros((E, max(edge_dim, 1)), dtype=edge_dtype)
    edge_mask = np.zeros((E,), dtype=bool)
    graph_mask = np.zeros((G,), dtype=bool)
    num_nodes = np.zeros((G,), dtype=np.int32)
    graph_ids = np.full((G,), -1, dtype=np.int32)

    if max_seq_len is not None:
        y_arr = np.zeros((G, max_seq_len), dtype=np.int32)
    else:
        y_arr = np.zeros((G, 0), dtype=np.int32)

    if y_dtype == "int32":
        y = np.zeros((G,), dtype=np.int32)
    else:
        y = np.full((G, num_tasks), np.nan, dtype=np.float32)

    # dense packing width: reference uses min(max nodes in batch, max_input_len)
    # (/root/reference/modules/utils.py:16). We bucket it for shape stability;
    # dense_cap pins it dataset-wide (required for sharded stacking, and keeps
    # one compiled shape per epoch). In strided mode the stride IS the width.
    if node_stride > 0:
        S = node_stride
    elif dense_cap is not None:
        S = min(dense_cap, max_input_len)
    else:
        max_n = max((int(g["x"].shape[0]) for g in graphs), default=1)
        S = min(bucket_size(max_n, 16), max_input_len)

    if node_stride > 0:
        Em = dense_edge_cap
        edge_src_dense = np.zeros((G, Em), dtype=np.int32)
        edge_dst_dense = np.zeros((G, Em), dtype=np.int32)
        edge_mask_dense = np.zeros((G, Em), dtype=bool)
        edge_attr_dense = np.zeros((G, Em, max(edge_dim, 1)), dtype=edge_dtype)
    else:
        edge_src_dense = edge_dst_dense = edge_mask_dense = edge_attr_dense = None

    node_offsets = np.zeros((G,), dtype=np.int64)
    node_off = 0
    edge_off = 0
    for i, g in enumerate(graphs):
        n = int(g["x"].shape[0])
        e = int(g["edge_index"].shape[1])
        if node_stride > 0:
            if n > node_stride:
                raise ValueError(f"graph of {n} nodes exceeds stride {node_stride}")
            if e > dense_edge_cap:
                raise ValueError(f"graph of {e} edges exceeds dense edge cap "
                                 f"{dense_edge_cap}")
            node_off = i * node_stride
        node_offsets[i] = node_off
        x = g["x"].reshape(n, -1)
        node_feat[node_off : node_off + n] = x
        node_graph[node_off : node_off + n] = i
        node_mask[node_off : node_off + n] = True
        if "node_depth" in g and g["node_depth"] is not None:
            node_depth[node_off : node_off + n] = g["node_depth"].reshape(-1)
        # dense position: keep LAST min(n, S) nodes, packed from column 0
        # (strided mode never truncates: pos is just the within-graph index).
        n_keep = min(n, S)
        pos = np.full((n,), S, dtype=np.int32)  # default: trash column
        pos[n - n_keep :] = np.arange(n_keep, dtype=np.int32)
        node_pos[node_off : node_off + n] = pos

        ei = g["edge_index"]
        edge_src[edge_off : edge_off + e] = ei[0] + node_off
        edge_dst[edge_off : edge_off + e] = ei[1] + node_off
        if edge_dim > 0:
            edge_attr[edge_off : edge_off + e] = g["edge_attr"].reshape(e, -1)
        edge_mask[edge_off : edge_off + e] = True
        if node_stride > 0:
            edge_src_dense[i, :e] = ei[0]
            edge_dst_dense[i, :e] = ei[1]
            edge_mask_dense[i, :e] = True
            if edge_dim > 0:
                edge_attr_dense[i, :e] = g["edge_attr"].reshape(e, -1)

        graph_mask[i] = True
        num_nodes[i] = n
        graph_ids[i] = int(g.get("_id", -1))
        gy = g.get("y")
        if gy is not None:
            if y_dtype == "int32":
                y[i] = int(np.asarray(gy).reshape(-1)[0])
            else:
                arr = np.asarray(gy, dtype=np.float32).reshape(-1)
                y[i, : arr.shape[0]] = arr
        if max_seq_len is not None and "y_arr" in g:
            y_arr[i] = np.asarray(g["y_arr"], dtype=np.int32).reshape(-1)[:max_seq_len]

        node_off += n
        edge_off += e

    # sort edges by destination (stable) -> contiguous segments per node.
    order = np.argsort(edge_dst[:edge_off], kind="stable")
    full_order = np.concatenate([order, np.arange(edge_off, E)])
    edge_src = edge_src[full_order]
    edge_dst = edge_dst[full_order]
    edge_attr = edge_attr[full_order]
    edge_mask = edge_mask[full_order]

    # blocked-CSR plans (flat layout only; see GraphBatch.bsp_fwd). Built
    # AFTER the dst-sort so the fwd plan's chunk grouping refines the CSR
    # order. A batch whose edge distribution overflows the static cap gets
    # plan=None and falls back to the segment path at runtime.
    # scatter-free slot plans (the production flat-TPU aggregation route)
    sfa = None
    if scatter_free and node_stride == 0 and N % 128 == 0:
        from ..ops import block_plan as _bp

        if sfa_explicit:
            # legacy explicit slot-plan arrays (tests / parity baselines)
            sfa = _bp.build_sfa_fields(
                edge_src, edge_dst, edge_mask, edge_attr, N,
                eb=sfa_eb if sfa_eb > 0 else None, node_graph=node_graph,
                node_mask=node_mask, num_graphs=G)
        else:
            # compressed production format: row starts + one src-sort
            # permutation, plans derived on device (ops/plan_expand.py)
            sfa = _bp.build_sfa_compressed(
                edge_src, edge_dst, edge_mask, N,
                eb=sfa_eb if sfa_eb > 0 else None, node_graph=node_graph,
                node_mask=node_mask, num_graphs=G,
                ell_explicit=ell_explicit, edge_attr=edge_attr)

    bsp_fwd = bsp_bwd = ea_bsp_fwd = ea_bsp_bwd = None
    if bsp_chunks_cap > 0 and node_stride == 0 and N % 128 == 0:
        from ..ops import block_plan as _bp

        plan_f = _bp.build_block_plan(edge_src, edge_dst, edge_mask, N,
                                      bsp_chunks_cap, major="dst")
        plan_b = _bp.build_block_plan(edge_src, edge_dst, edge_mask, N,
                                      bsp_chunks_cap, major="src")
        if plan_f is not None and plan_b is not None:
            ea_bsp_fwd = _bp.permute_edge_data(edge_attr, plan_f.pop("perm"))
            ea_bsp_bwd = _bp.permute_edge_data(edge_attr, plan_b.pop("perm"))
            bsp_fwd, bsp_bwd = plan_f, plan_b

    # variable-length sequence packing for the transformer stage
    # (ops/pack.py): flat layout only; overflow of a pinned row cap yields
    # pack=None and the caller splits or falls back to the dense path
    # works for BOTH layouts: in the strided layout node_offsets[i] =
    # i*stride and the stride never truncates (max_keep covers it), so the
    # transformer stage can pack (~2x fewer tokens than stride padding)
    # while aggregation keeps the strided one-hot route
    pack = None
    if seq_pack_w > 0:
        from ..ops.pack import build_pack_fields_tiers

        widths = [seq_pack_w]
        caps = [seq_pack_rows]
        if 0 < seq_pack_w2 < seq_pack_w:
            widths.append(seq_pack_w2)
            caps.append(seq_pack_rows2)
            if 0 < seq_pack_w3 < seq_pack_w2:
                widths.append(seq_pack_w3)
                caps.append(seq_pack_rows3)
        pack = build_pack_fields_tiers(num_nodes, graph_mask, node_offsets,
                                       N, tuple(widths), max_input_len,
                                       tuple(caps))

    dense_adj = None
    if with_dense_adj:
        dense_adj = np.zeros((G, S + 1, S + 1), dtype=bool)
        # self loops on valid positions (reference: np.eye base,
        # /root/reference/data/adj_list.py:11-15)
        for i, g in enumerate(graphs):
            n = int(g["x"].shape[0])
            n_keep = min(n, S)
            dense_adj[i, np.arange(n_keep), np.arange(n_keep)] = True
        # map node -> (graph, pos) for both endpoints
        vsrc = edge_src[edge_mask]
        vdst = edge_dst[edge_mask]
        gi = node_graph[vsrc]
        ps = node_pos[vsrc]
        pd = node_pos[vdst]
        keep = (ps < S) & (pd < S)
        dense_adj[gi[keep], ps[keep], pd[keep]] = True
        dense_adj[gi[keep], pd[keep], ps[keep]] = True
        dense_adj = dense_adj[:, :S, :S]

    return GraphBatch(
        node_feat=node_feat,
        node_graph=node_graph,
        node_pos=node_pos,
        node_mask=node_mask,
        node_depth=node_depth,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        graph_mask=graph_mask,
        num_nodes=num_nodes,
        y=y,
        y_arr=y_arr,
        dense_adj=dense_adj,
        graph_ids=graph_ids,
        edge_src_dense=edge_src_dense,
        edge_dst_dense=edge_dst_dense,
        edge_mask_dense=edge_mask_dense,
        edge_attr_dense=edge_attr_dense,
        bsp_fwd=bsp_fwd,
        bsp_bwd=bsp_bwd,
        edge_attr_bsp_fwd=ea_bsp_fwd,
        edge_attr_bsp_bwd=ea_bsp_bwd,
        **(sfa or {}),
        **(pack or {}),
        max_nodes_dense=S,
        node_stride=node_stride,
    )
