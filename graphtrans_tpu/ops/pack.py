"""Variable-length sequence packing for the global-attention stage.

The reference pads every graph's node sequence to the batch max (front-pad,
/root/reference/modules/utils.py:5-29); the round-4 TPU design padded to a
DATASET-wide dense width for shape stability. At real ogbg-code2 shapes
(heavy-tailed: mean ~125 nodes, max past max_input_len=1000) that pads the
transformer ~8x — [G, 1001, d] activations OOM the chip at bs=512 and burn
(S_max/mean)^2 = 64x the needed attention FLOPs.

TPU-native answer: pack each graph's kept nodes PLUS its own CLS token
contiguously into fixed-width rows [R, W] (first-fit-decreasing, W >=
max_kept+1), and mask attention by SEGMENT ID (token i attends token j iff
they belong to the same graph) — the generalization of the fixed-stride
graph-packing that won the mol flagship (nn/transformer 'packed' backend).
Token count drops from G*S_max to ~sum(n_i)+G; every per-token matmul
(QKV/FF/LN) and the flash attention shrink proportionally.

Host-side plan (this module): one int32 gather map `pack_node [R*W]`
(slot -> flat node row; the N sentinel gathers a zero row for CLS/pad
slots), segment ids `pack_seg [R*W]` (graph id, -1 = padding), the CLS
readout slots `pack_cls_slot [G]`, and the inverse map `pack_inv [N]`
(node -> slot, R*W = truncated/absent) that turns the gather's backward
into another GATHER — the slot map is injective, so no serialized
scatter-add ever runs (the round-3 layout lesson).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def plan_seq_pack(tokens: np.ndarray, W: int):
    """First-fit-decreasing bin packing of `tokens[i]` consecutive slots per
    graph into rows of width W. Returns (rows_used, row[i], start[i]).
    tokens[i] <= W is required (callers truncate to W-1 nodes + CLS)."""
    G = len(tokens)
    order = np.argsort(-tokens, kind="stable")
    row = np.zeros(G, np.int32)
    start = np.zeros(G, np.int32)
    rem = []  # remaining capacity per open row
    for i in order:
        t = int(tokens[i])
        if t > W:
            raise ValueError(f"graph of {t} tokens exceeds pack width {W}")
        for r, free in enumerate(rem):
            if free >= t:
                row[i], start[i] = r, W - free
                rem[r] -= t
                break
        else:
            row[i], start[i] = len(rem), 0
            rem.append(W - t)
    return len(rem), row, start


def build_pack_fields(num_nodes: np.ndarray, graph_mask: np.ndarray,
                      node_offsets: np.ndarray, N: int, W: int,
                      max_keep: int, rows_cap: int = 0):
    """Build the device-side packing arrays for one flat-layout batch.

    num_nodes[g], graph_mask[g]: per-graph valid node counts / validity.
    node_offsets[g]: first flat node row of graph g (graphs contiguous).
    N: padded node slot count. W: row width. max_keep: per-graph node
    truncation (reference keeps the LAST max_input_len nodes). rows_cap > 0
    pins the row count (sharded stacking / one compiled shape); returns None
    if the packing overflows it — the caller splits or falls back.
    """
    G = len(num_nodes)
    valid = np.asarray(graph_mask, bool)
    n = np.asarray(num_nodes, np.int64)
    n_keep = np.minimum(n, min(max_keep, W - 1))
    tokens = np.where(valid, n_keep + 1, 0)  # +1: the graph's own CLS slot

    idx = np.nonzero(valid)[0]
    R, row_v, start_v = plan_seq_pack(tokens[idx], W)
    if rows_cap > 0:
        if R > rows_cap:
            return None
        R = rows_cap
    R = max(R, 1)

    pack_node = np.full(R * W, N, np.int32)
    pack_seg = np.full(R * W, -1, np.int32)
    pack_cls_slot = np.full(G, R * W - 1, np.int32)  # padding graphs: unread
    pack_inv = np.full(N, R * W, np.int32)
    for k, g in enumerate(idx):
        nk = int(n_keep[g])
        s = int(row_v[k]) * W + int(start_v[k])
        # keep the LAST nk nodes (reference truncation semantics)
        first = int(node_offsets[g]) + int(n[g]) - nk
        pack_node[s:s + nk] = np.arange(first, first + nk, dtype=np.int32)
        pack_inv[first:first + nk] = np.arange(s, s + nk, dtype=np.int32)
        pack_seg[s:s + nk + 1] = g
        pack_cls_slot[g] = s + nk  # CLS at the segment end (reference order)
    return {
        "pack_node": pack_node,
        "pack_seg": pack_seg,
        "pack_cls_slot": pack_cls_slot,
        "pack_inv": pack_inv,
        "pack_w": int(W),
        "pack_rows": int(R),
    }


def build_pack_fields_tiers(num_nodes: np.ndarray, graph_mask: np.ndarray,
                            node_offsets: np.ndarray, N: int,
                            widths, max_keep: int, rows_caps):
    """Multi-tier packing: `widths` is a strictly decreasing tuple of row
    widths (e.g. (1024, 384, 128)); each graph packs into the NARROWEST
    tier its token count (kept nodes + CLS) fits. Attention cost is
    sum_rows W_r^2, so every extra tier moves tokens to cheaper rows —
    measured two-tier 90.4 -> 73.3 ms on the heavy-tail code2 bench; the
    third W=128 tier targets the distribution's bulk (mean ~125 nodes).
    Up to three tiers are supported (the GraphBatch carries pack/pack2/
    pack3 field groups). CLS readout slots index the VIRTUAL concat of the
    tiers in `widths` order. Returns None on overflow of any pinned cap."""
    assert 1 <= len(widths) <= 3 and list(widths) == sorted(widths, reverse=True)
    n = np.asarray(num_nodes, np.int64)
    valid = np.asarray(graph_mask, bool)
    W = widths[0]
    n_keep = np.minimum(n, min(max_keep, W - 1))
    tokens = n_keep + 1
    # tier index per graph: the narrowest width that fits tokens
    tier = np.zeros(len(n), np.int32)
    for t, Wt in enumerate(widths[1:], start=1):
        tier = np.where(tokens <= Wt, t, tier)

    fs, offs, off = [], [], 0
    for t, Wt in enumerate(widths):
        ft = build_pack_fields(num_nodes, valid & (tier == t), node_offsets,
                               N, Wt, min(max_keep, Wt - 1), rows_caps[t])
        if ft is None:
            return None
        fs.append(ft)
        offs.append(off)
        off += ft["pack_rows"] * ft["pack_w"]
    # per-graph CLS slots index the VIRTUAL concat (widest tier first); each
    # tier keeps its own inverse map — the tiers' pack_gather backwards sum
    # naturally under autodiff (every node lives in exactly one tier)
    cls_slot = fs[0]["pack_cls_slot"].astype(np.int64)
    for t in range(1, len(widths)):
        cls_slot = np.where(tier == t, fs[t]["pack_cls_slot"] + offs[t],
                            cls_slot)
    base = offs[1] - 1 if len(widths) > 1 else fs[0]["pack_cls_slot"]
    cls_slot = np.where(valid, cls_slot, base).astype(np.int32)
    out = {
        "pack_node": fs[0]["pack_node"], "pack_seg": fs[0]["pack_seg"],
        "pack_cls_slot": cls_slot, "pack_inv": fs[0]["pack_inv"],
        "pack_w": fs[0]["pack_w"], "pack_rows": fs[0]["pack_rows"],
    }
    for t, name in ((1, "pack2"), (2, "pack3")):
        if t < len(widths):
            out.update({
                f"{name}_node": fs[t]["pack_node"],
                f"{name}_seg": fs[t]["pack_seg"],
                f"{name}_inv": fs[t]["pack_inv"],
                f"{name}_w": fs[t]["pack_w"],
                f"{name}_rows": fs[t]["pack_rows"],
            })
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pack_gather(src, pack_node, pack_inv):
    """out[s] = src[pack_node[s]] with a GATHER-based backward.

    src: [N+1, d] (last row zeros — the pad/CLS sentinel target);
    pack_node: [R*W] int32 in [0, N]; pack_inv: [N] int32 in [0, R*W]
    (R*W = node has no slot). The slot map is injective on real nodes, so
    d_src[i] = d_out[pack_inv[i]] — no scatter-add (XLA serializes those
    row-by-row on TPU; the gather runs at full HBM bandwidth)."""
    return jnp.take(src, pack_node, axis=0)


def _pack_gather_fwd(src, pack_node, pack_inv):
    return pack_gather(src, pack_node, pack_inv), (pack_inv, src.shape[0])


def _pack_gather_bwd(res, g):
    pack_inv, n_src = res
    gz = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)], axis=0)
    d_nodes = jnp.take(gz, pack_inv, axis=0)         # [N, d]
    pad = jnp.zeros((n_src - d_nodes.shape[0],) + g.shape[1:], g.dtype)
    return jnp.concatenate([d_nodes, pad], axis=0), None, None


pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)
