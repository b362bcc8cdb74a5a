"""Host-side block-pair planning for the blocked-CSR one-hot SpMM.

The flat segment path's gather (x[src]) and scatter-add (out[dst] +=) both
lower to per-row serialized XLA ops on TPU — measured as the dominant cost
of the code2-shaped train step (~60-70 ms of 235 ms at bs=512). The dense
(strided) layout solves this for SMALL graphs by per-graph one-hot matmuls,
but its FLOP inflation is the per-graph node count, so medium/large graphs
(code2 ASTs) need a different decomposition: tile the node axis into
128-row BLOCKS and group edges by (dst_block, src_block) PAIRS. Within a
pair, gather and scatter are 128-wide one-hot matmuls (MXU-native, exactly
the trick proven in ops/pallas/gin_agg.py) regardless of graph size.

This module builds the static per-batch plan on the host (numpy):
edges are grouped by (major_block, minor_block), split into fixed-size
chunks of EB slots, and chunk-indexed arrays drive the Pallas kernel's
scalar-prefetch index maps (ops/pallas/block_spmm.py). Two plans per batch:
dst-major (forward accumulation + d_emb) and src-major (dx accumulation) —
the CSR/CSC pair of classical sparse autodiff. Every major block gets at
least one chunk so the kernel's first-visit zero-init covers blocks with no
edges.

Plan arrays (C = chunk capacity, EB = edge slots per chunk):
  blk_out [C] i32   major block (out accumulator index; grouped ascending)
  blk_in  [C] i32   minor block (the x / cotangent block the chunk reads)
  is_first [C] i32  1 on the first chunk of each out block (zero-init gate)
  loc_out [C,EB] i32  row of the edge's endpoint within the major block
  loc_in  [C,EB] i32  row within the minor block
  mask    [C,EB] f32  1.0 = real edge slot
  perm    [C*EB] i64  original edge index per slot (-1 pad) — HOST-ONLY,
                      used to permute per-edge data into chunk order.
"""

from __future__ import annotations

import numpy as np

NB = 128   # node rows per block (one MXU tile side)
EB = 512   # edge slots per chunk

# routing: 'off' by default — MEASURED NEGATIVE at pair-granular chunks
# (v5e, code2 bench bs=512: 328.9 ms blocked vs 234.4 segment; ~25k grid
# steps/train step at ~6 us each swamp the MXU win; see CLAUDE.md). 'on'
# forces it (A/B benches; numerically parity-tested and exact), 'auto'
# enables on TPU when the batch carries plans. Revisit with multi-src-block
# chunks (K=512 merged gathers) to cut the step count toward the NB floor.
_BLOCK_SPMM = "off"
_BLOCK_SPMM_INTERPRET = False

# build the ELL-slot-ordered edge copies (edge_attr_ell / ell_gcn_norm_*)
# consumed only by the opt-in ELL conv-aggregation route (nn/conv._ELL_GMS)
_ELL_EDGE_FIELDS = False


def set_ell_edge_fields(on: bool):
    global _ELL_EDGE_FIELDS
    _ELL_EDGE_FIELDS = bool(on)


def set_block_spmm(mode: str):
    global _BLOCK_SPMM
    assert mode in ("auto", "on", "off"), mode
    _BLOCK_SPMM = mode


def block_spmm_enabled() -> bool:
    if _BLOCK_SPMM == "off":
        return False
    if _BLOCK_SPMM == "on":
        return True
    import jax

    return jax.default_backend() == "tpu" or _BLOCK_SPMM_INTERPRET


def chunk_capacity(e_cap: int, n_cap: int, pair_slack: int = 4) -> int:
    """Static chunk count covering any batch under (e_cap, n_cap): one chunk
    per EB edges, one per node block (zero-init coverage), plus slack for
    partial chunks at (pair) boundaries."""
    nb = -(-n_cap // NB)
    return -(-e_cap // EB) + nb * pair_slack


def build_block_plan(src, dst, emask, n_slots: int, chunks_cap: int,
                     major: str = "dst"):
    """Build one plan (see module docstring). Returns a dict of numpy
    arrays, or None if the batch's edge distribution needs more than
    `chunks_cap` chunks (caller falls back to the segment path)."""
    assert n_slots % NB == 0, n_slots
    nb = n_slots // NB
    src = np.asarray(src)
    dst = np.asarray(dst)
    e_idx = np.nonzero(np.asarray(emask))[0]
    ma = (dst if major == "dst" else src)[e_idx]
    mi = (src if major == "dst" else dst)[e_idx]
    bo = ma // NB
    bi = mi // NB
    order = np.lexsort((bi, bo))
    e_idx, ma, mi, bo, bi = (a[order] for a in (e_idx, ma, mi, bo, bi))

    # chunk boundaries: new (bo, bi) pair, or EB slots exhausted
    pair_key = bo.astype(np.int64) * nb + bi
    chunks = []  # (bo, bi, slice into the sorted edge arrays)
    start = 0
    E = len(e_idx)
    while start < E:
        end = start
        key = pair_key[start]
        while end < E and pair_key[end] == key and end - start < EB:
            end += 1
        chunks.append((int(bo[start]), int(bi[start]), start, end))
        start = end
    covered = {c[0] for c in chunks}
    for b in range(nb):
        if b not in covered:
            chunks.append((b, 0, 0, 0))  # zero-init-only chunk
    chunks.sort(key=lambda c: c[0])
    C = chunks_cap
    if len(chunks) > C:
        return None

    blk_out = np.zeros(C, np.int32)
    blk_in = np.zeros(C, np.int32)
    is_first = np.zeros(C, np.int32)
    loc_out = np.zeros((C, EB), np.int32)
    loc_in = np.zeros((C, EB), np.int32)
    mask = np.zeros((C, EB), np.float32)
    perm = np.full(C * EB, -1, np.int64)

    last_bo = -1
    for c, (co, ci, s, e) in enumerate(chunks):
        blk_out[c] = co
        blk_in[c] = ci
        if co != last_bo:
            is_first[c] = 1
            last_bo = co
        n = e - s
        if n:
            loc_out[c, :n] = ma[s:e] - co * NB
            loc_in[c, :n] = mi[s:e] - ci * NB
            mask[c, :n] = 1.0
            perm[c * EB: c * EB + n] = e_idx[s:e]
    # pad chunks re-visit the LAST real out block (is_first=0, mask=0 —
    # a masked no-op += that cannot corrupt, and never an uninitialized
    # first visit)
    if len(chunks) < C:
        blk_out[len(chunks):] = blk_out[len(chunks) - 1]
        blk_in[len(chunks):] = blk_in[len(chunks) - 1]
    return {
        "blk_out": blk_out, "blk_in": blk_in, "is_first": is_first,
        "loc_out": loc_out, "loc_in": loc_in, "mask": mask, "perm": perm,
    }


def permute_edge_data(arr, perm, fill=0):
    """Per-edge array [E, ...] -> chunk-ordered [C*EB, ...] via plan perm."""
    arr = np.asarray(arr)
    out = np.full((len(perm),) + arr.shape[1:], fill, arr.dtype)
    valid = perm >= 0
    out[valid] = arr[perm[valid]]
    return out


# ---------------------------------------------------------------------------
# Scatter-free aggregation plans (ops/scatter_free.py — pure XLA, no Pallas).
# Profiling showed the flat path's GATHERS are cheap (~0.7 ms at code2 scale,
# bandwidth-bound) while its SCATTER-ADDS are row-SERIALIZED (~4.5 ms each,
# dtype-independent) — so only the scatter side needs the one-hot-matmul
# treatment. Group edges by dst block of nb rows with a fixed per-block slot
# budget; the scatter becomes ONE batched one-hot matmul over all blocks.
# The backward's dx runs the src-major twin plan, RECOMPUTING the message
# cotangent in that order (row gathers of per-node values — permuting [L, d]
# tensors between slot orders measured 3.5 ms vs 0.8 for a plain gather).
# ---------------------------------------------------------------------------


def sfa_block_rows(n_slots: int) -> int:
    """Scatter-plan block size: as LARGE as divides the node cap (skew in
    per-block edge counts shrinks with block size, so bigger blocks waste
    fewer pad slots; the one-hot matmul work L*nb is invariant in nb)."""
    for nb in (512, 384, 256, 128):
        if n_slots % nb == 0:
            return nb
    return NB


def scatter_slot_budget(major, emask, n_slots: int, nb: int) -> int:
    """Max edges landing in one nb-row block (bucketed for shape
    stability)."""
    from ..data.batch import bucket_size

    m = np.asarray(major)[np.asarray(emask)]
    if m.size == 0:
        return 64
    counts = np.bincount(m // nb, minlength=-(-n_slots // nb))
    return bucket_size(int(counts.max()), 64)


def build_scatter_plan(major, other, emask, n_slots: int, eb: int, nb: int):
    """Slot assignment for one direction: edges land in their major-index
    block's next free slot. Returns None if any block overflows `eb`.

    Arrays (NBLK = n_slots/nb, L = NBLK*eb):
      other_g [L] i32  global index of the edge's OTHER endpoint (gather id)
      loc     [L] i32  major row within its block (one-hot column)
      mask    [L] f32  1.0 = real edge
      perm    [L] i64  original edge index per slot (-1 pad; host-side)
    """
    assert n_slots % nb == 0
    nblk = n_slots // nb
    major = np.asarray(major)
    other = np.asarray(other)
    e_idx = np.nonzero(np.asarray(emask))[0]
    blk = major[e_idx] // nb
    order = np.argsort(blk, kind="stable")
    e_idx = e_idx[order]
    blk = blk[order]
    counts = np.bincount(blk, minlength=nblk)
    if counts.max(initial=0) > eb:
        return None
    starts = np.zeros(nblk, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    within = np.arange(len(e_idx)) - starts[blk]
    slot = blk.astype(np.int64) * eb + within
    L = nblk * eb
    other_g = np.zeros(L, np.int32)
    loc = np.zeros(L, np.int32)
    mask = np.zeros(L, np.float32)
    perm = np.full(L, -1, np.int64)
    other_g[slot] = other[e_idx]
    loc[slot] = major[e_idx] - blk * nb
    mask[slot] = 1.0
    perm[slot] = e_idx
    return {"other_g": other_g, "loc": loc, "mask": mask, "perm": perm}


def scatter_plan_pair(src, dst, emask, n_slots: int, eb: int = None,
                      nb: int = None):
    """(dst-major plan, src-major plan, nb) or None — the CSR/CSC pair of
    the scatter-free autodiff (forward + d_emb vs dx). `eb` pins the
    per-block slot budget dataset-wide (sharded stacking / one compiled
    shape); None derives it from this batch (bucketed)."""
    if nb is None:
        nb = sfa_block_rows(n_slots)
    if eb is None:
        eb = max(scatter_slot_budget(dst, emask, n_slots, nb),
                 scatter_slot_budget(src, emask, n_slots, nb))
    pd = build_scatter_plan(dst, src, emask, n_slots, eb, nb)
    ps = build_scatter_plan(src, dst, emask, n_slots, eb, nb)
    if pd is None or ps is None:
        return None
    return pd, ps, nb


POOL_NB = 64  # graphs per pooling block
ELL_K_CAP = 128  # max neighbor slots per node (fallback beyond)


def build_ell_plan(major, other, emask, n_rows: int, k: int = None):
    """ELLPACK neighbor slots: row r's incident edges land at slots
    [r*K, r*K + deg(r)). With messages in this layout every segment
    reduction (sum/mean/min/max/std — PNA's whole aggregator zoo) is a
    plain K-axis reduction: no scatter in either direction, and min/max —
    which no one-hot matmul can express — come for free. Returns
    ({other_g [n_rows*K] i32, mask [n_rows*K] f32, perm}, K) or None when
    the max degree exceeds ELL_K_CAP (segment fallback)."""
    from ..data.batch import bucket_size

    major = np.asarray(major)
    emask = np.asarray(emask)
    deg = np.bincount(major[emask], minlength=n_rows)
    if k is None:
        k = bucket_size(max(int(deg.max(initial=1)), 1), 8)
    if deg.max(initial=0) > k or k > ELL_K_CAP:
        return None
    plan = build_scatter_plan(major, other, emask, n_rows, k, nb=1)
    if plan is None:
        return None
    plan.pop("loc")  # always 0 at nb=1
    return plan, k


def build_pool_plan(node_graph, node_mask, num_graphs: int,
                    eb: int = None):
    """Graph-major slot plan for scatter-free per-graph sums
    (ops/scatter_free.graph_sum_sfa): nodes land in their graph's block
    slots; the forward per-graph sum is one batched one-hot matmul, the
    backward is the usual broadcast gather. Returns (plan, g_pad)."""
    g_pad = -(-max(num_graphs, 1) // POOL_NB) * POOL_NB
    node_idx = np.arange(len(np.asarray(node_graph)), dtype=np.int64)
    if eb is None:
        eb = scatter_slot_budget(node_graph, node_mask, g_pad, POOL_NB)
    plan = build_scatter_plan(np.asarray(node_graph), node_idx,
                              np.asarray(node_mask), g_pad, eb, POOL_NB)
    if plan is not None:
        plan.pop("perm")
    return plan, g_pad


def dataset_sfa_caps(graphs, n_cap: int):
    """Composition-independent slot budgets so EVERY batch of this dataset
    yields identically-shaped plans (required for shard stacking under data
    parallelism, and for one compiled shape per epoch):

      eb      edge slots per nb-row scatter block — LP (fractional
              knapsack) upper bound on edges landing in any window of
              nb + 2*max_nodes node rows, packing by edge density
      ell_k   max in/out degree across the dataset (degrees are per-graph
              local, so batch composition cannot change them)
      pool_eb node slots per POOL_NB-graph pooling block — sum of the
              POOL_NB largest graph node counts
    """
    from ..data.batch import bucket_size

    nodes = np.array([int(g["x"].shape[0]) for g in graphs], np.int64)
    edges = np.array([int(g["edge_index"].shape[1]) for g in graphs],
                     np.int64)
    nb = sfa_block_rows(n_cap)
    budget = nb + 2 * int(nodes.max(initial=1))
    dens_order = np.argsort(-(edges / np.maximum(nodes, 1)))
    acc_e = 0.0
    left = float(budget)
    for i in dens_order:
        take = min(1.0, left / max(float(nodes[i]), 1.0))
        acc_e += take * float(edges[i])
        left -= take * float(nodes[i])
        if left <= 0:
            break
    eb = bucket_size(max(int(np.ceil(acc_e)), 1), 64)

    kmax = 1
    for g in graphs:
        ei = np.asarray(g["edge_index"])
        if ei.shape[1]:
            kmax = max(kmax,
                       int(np.bincount(ei[0]).max(initial=1)),
                       int(np.bincount(ei[1]).max(initial=1)))
    ell_k = bucket_size(kmax, 8)
    pool_eb = bucket_size(max(int(np.sort(nodes)[::-1][:POOL_NB].sum()), 1),
                          64)
    return {"eb": eb, "ell_k": ell_k if ell_k <= ELL_K_CAP else 0,
            "pool_eb": pool_eb, "nb": nb}


def build_sfa_compressed(edge_src, edge_dst, edge_mask, n_slots: int,
                         eb: int = None, node_graph=None, node_mask=None,
                         num_graphs: int = 0, ell_k: int = None,
                         pool_eb: int = None, ell_explicit: bool = False,
                         edge_attr=None):
    """Compressed scatter-free plan fields (round 4): ship CSR row starts
    plus ONE src-sorted edge permutation instead of the explicit slot-plan
    arrays, and derive every plan on DEVICE (ops/plan_expand.py).

    The collated batch already satisfies two invariants (data/batch.collate,
    csrc/graph_batcher.cpp — both verified here per batch, falling back to
    the segment path if not): valid edges are a dst-sorted PREFIX of the
    edge arrays, and valid nodes are graph-major. So the dst-major scatter
    plan, the dst-major ELL plan, AND the pooling plan are all just
    contiguous-range views — block b's slots map to edge rows
    [row_start[b*nb], row_start[(b+1)*nb]) — and the src-major twins need
    only the one stable src-sort permutation. H2D per code2 batch drops
    ~30 MB -> ~9 MB (the round-3 open item; the tunnel-bound trainer is H2D
    limited).

    Returns the GraphBatch field dict (arrays + static ints) or None
    (caller falls back to the flat segment path)."""
    from ..data.batch import bucket_size

    em = np.asarray(edge_mask)
    E = em.shape[0]
    e_valid = int(em.sum())
    if e_valid and not em[:e_valid].all():
        return None  # valid edges not a contiguous prefix
    src = np.asarray(edge_src)[:e_valid]
    dst = np.asarray(edge_dst)[:e_valid]
    if e_valid and np.any(np.diff(dst) < 0):
        return None  # not dst-sorted
    cnt_dst = np.bincount(dst, minlength=n_slots).astype(np.int64)
    cnt_src = np.bincount(src, minlength=n_slots).astype(np.int64)
    row_start_dst = np.zeros(n_slots + 1, np.int32)
    row_start_dst[1:] = np.cumsum(cnt_dst)
    row_start_src = np.zeros(n_slots + 1, np.int32)
    row_start_src[1:] = np.cumsum(cnt_src)
    edge_perm_src = np.zeros(E, np.int32)
    edge_perm_src[:e_valid] = np.argsort(src, kind="stable")

    nb = sfa_block_rows(n_slots)
    nblk = n_slots // nb
    per_blk = max(
        int(cnt_dst.reshape(nblk, nb).sum(axis=1).max(initial=0)),
        int(cnt_src.reshape(nblk, nb).sum(axis=1).max(initial=0)))
    if eb is None:
        eb = bucket_size(max(per_blk, 1), 64)
    if per_blk > eb:
        return None

    # per-edge GCN normalization in EDGE order (structural; deriving the
    # two dis[] lookups on device would cost two 1-D gathers, which lower
    # to scalar SMEM loops on TPU — ~3.5 ms each at this size)
    deg = cnt_src.astype(np.float64) + 1.0
    dis = deg ** -0.5
    norm_e = np.zeros(E, np.float32)
    norm_e[:e_valid] = (dis[src] * dis[dst]).astype(np.float32)

    fields = {
        "sfa_row_start_dst": row_start_dst,
        "sfa_row_start_src": row_start_src,
        "edge_perm_src": edge_perm_src,
        "edge_gcn_norm_e": norm_e,
        "sfa_nb": nb,
        "sfa_eb": int(eb),
    }
    if edge_attr is not None:
        # src-sorted edge pack [E, 3+Fe] i32 (src, dst, norm bits, attrs) —
        # the exact operand ops/plan_expand._edge_pack builds on device in
        # dst order. Shipping the src order kills the expansion's last
        # permutation row gather; both slot expansions become
        # block-contiguous dynamic slices (~0.5 ms total).
        ea = np.asarray(edge_attr)
        if np.issubdtype(ea.dtype, np.floating):
            acols = ea.astype(np.float32).view(np.int32)
        else:
            acols = ea.astype(np.int32)
        pack = np.concatenate(
            [np.asarray(edge_src, np.int32)[:, None],
             np.asarray(edge_dst, np.int32)[:, None],
             norm_e.view(np.int32)[:, None], acols], axis=1)
        pack_src = np.zeros_like(pack)
        pack_src[:e_valid] = pack[edge_perm_src[:e_valid]]
        fields["edge_pack_src"] = pack_src
        del fields["edge_perm_src"]  # subsumed (saves the wire bytes)

    # ELL neighbor-slot caps (ops/ell.py), per direction as the explicit
    # builder derives them: 0 = disabled (hub degree past ELL_K_CAP, or
    # dataset-wide pin says so)
    def _k(cnt):
        kmax = max(int(cnt.max(initial=1)), 1)
        if ell_k == 0:
            return 0
        if ell_k is None:
            k = bucket_size(kmax, 8)
            return k if k <= ELL_K_CAP else 0
        return ell_k if kmax <= ell_k else 0

    k_in, k_out = _k(cnt_dst), _k(cnt_src)
    if k_in == 0 or k_out == 0:  # both or neither (consumers need the pair)
        k_in = k_out = 0
    fields["ell_k_in"], fields["ell_k_out"] = int(k_in), int(k_out)
    if ell_explicit and k_in > 0:
        # models that consume the ELL reducers every layer (PNA: need_deg)
        # get host-built explicit ELL plans — deriving them on device costs
        # two [N*K, W] row gathers per step (~6 ms at code2 scale), while
        # the wire cost is ~5 MB that overlaps via prefetch
        ed = build_ell_plan(edge_dst, edge_src, edge_mask, n_slots, k=k_in)
        es = build_ell_plan(edge_src, edge_dst, edge_mask, n_slots, k=k_out)
        if ed is not None and es is not None:
            (pd_ell, _), (ps_ell, _) = ed, es
            pd_ell.pop("perm")
            ps_ell.pop("perm")
            fields["ell_dst"] = pd_ell
            fields["ell_src"] = ps_ell

    # pooling plan: valid nodes must be graph-major (prefix + nondecreasing)
    if node_graph is not None and num_graphs > 0:
        nm = np.asarray(node_mask)
        n_valid = int(nm.sum())
        ng = np.asarray(node_graph)[:n_valid]
        if (n_valid == 0 or nm[:n_valid].all()) and \
                (n_valid == 0 or not np.any(np.diff(ng) < 0)):
            g_pad = -(-num_graphs // POOL_NB) * POOL_NB
            cnt_g = np.bincount(ng, minlength=g_pad).astype(np.int64)
            per_pool = int(cnt_g.reshape(-1, POOL_NB).sum(axis=1)
                           .max(initial=0))
            if pool_eb is None:
                pool_eb = bucket_size(max(per_pool, 1), 64)
            elif per_pool > pool_eb:
                # a PINNED pool budget is a shape contract (one executable
                # per epoch) — overflow must fall back/split, not silently
                # change the static and retrace
                return None
            fields["sfa_pool_eb"] = int(pool_eb)
    return fields


def build_sfa_fields(edge_src, edge_dst, edge_mask, edge_attr, n_slots: int,
                     eb: int = None, node_graph=None, node_mask=None,
                     num_graphs: int = 0, ell_k: int = None,
                     pool_eb: int = None):
    """Everything a GraphBatch needs for the scatter-free route
    (ops/scatter_free.py), or None if a block overflows `eb`: slot plans
    for both orders, slot-ordered edge_attr copies, and the host-computed
    GCN degree normalization (structural — reference deg semantics
    out_degree(src)+1 over valid edges, /root/reference/modules/conv.py:57).
    Shared by data/batch.collate and the loader's native-collation path."""
    pair = scatter_plan_pair(edge_src, edge_dst, edge_mask, n_slots, eb=eb)
    if pair is None:
        return None
    sfa_dst, sfa_src, nb = pair
    perm_d = sfa_dst.pop("perm")
    perm_s = sfa_src.pop("perm")
    deg = np.bincount(np.asarray(edge_src)[np.asarray(edge_mask)],
                      minlength=n_slots) + 1.0
    dis = deg ** -0.5
    norm = (dis[np.asarray(edge_src)]
            * dis[np.asarray(edge_dst)]).astype(np.float32)
    fields = {
        "sfa_dst": sfa_dst,
        "sfa_src": sfa_src,
        "edge_attr_sfa": permute_edge_data(edge_attr, perm_d),
        "edge_attr_sfa_src": permute_edge_data(edge_attr, perm_s),
        "sfa_gcn_norm_dst": permute_edge_data(norm, perm_d),
        "sfa_gcn_norm_src": permute_edge_data(norm, perm_s),
        "sfa_inv_deg": (1.0 / deg).astype(np.float32),
        "sfa_nb": nb,
    }
    if node_graph is not None and num_graphs > 0:
        pool, _ = build_pool_plan(node_graph, node_mask, num_graphs,
                                  eb=pool_eb)
        if pool is not None:
            fields["sfa_pool"] = pool
    # ELL neighbor slots (PNA's segment min/max — ops/ell.py).
    # ell_k: None = derive from this batch, 0 = DISABLED (dataset max
    # degree exceeds ELL_K_CAP — disabling everywhere keeps the batch
    # pytree structure identical across batches/shards), > 0 = pinned.
    if ell_k == 0:
        ed = es = None
    else:
        ed = build_ell_plan(edge_dst, edge_src, edge_mask, n_slots, k=ell_k)
        es = build_ell_plan(edge_src, edge_dst, edge_mask, n_slots, k=ell_k)
    if ed is not None and es is not None:
        (pd_ell, k_in), (ps_ell, k_out) = ed, es
        perm_ed = pd_ell.pop("perm")
        perm_es = ps_ell.pop("perm")
        fields["ell_dst"] = pd_ell
        fields["ell_src"] = ps_ell
        fields["ell_k_in"] = k_in
        fields["ell_k_out"] = k_out
        # ELL-slot-ordered edge data for the opt-in ELL conv aggregation
        # route (ops/ell.ell_gather_message_scatter — measured LOSS vs the
        # one-hot route, see nn/conv._ELL_GMS): gated off by default so
        # production batches don't pay the [N*K, Fe] host copies + H2D
        if _ELL_EDGE_FIELDS:
            fields["edge_attr_ell"] = permute_edge_data(edge_attr, perm_ed)
            fields["edge_attr_ell_src"] = permute_edge_data(edge_attr,
                                                            perm_es)
            fields["ell_gcn_norm_dst"] = permute_edge_data(norm, perm_ed)
            fields["ell_gcn_norm_src"] = permute_edge_data(norm, perm_es)
    return fields
