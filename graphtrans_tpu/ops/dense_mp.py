"""Scatter-free message passing over the strided (dense) graph layout.

The TPU has no fast general scatter: XLA lowers scatter-add to a serialized
per-row update, and the transpose of a gather is a scatter, so BOTH
directions of the flat gather->message->segment-sum formulation
(ops/scatter.py) hit it — measured as the dominant cost of a training step
at batch scale. This module reformulates aggregation for the strided layout
(data/batch.py collate(node_stride=...)): with graph g's nodes at flat rows
[g*Sm, g*Sm+n), node tensors reshape to [G, Sm, d] for free, and

  out[g, s] = sum_{e : dst[g,e]=s} w_e * msg(x[g, src[g,e]], emb[g,e])

becomes two batched ONE-HOT MATMULS on the MXU:

  gathered = one_hot(src)[G, Em, Sm] @ x[G, Sm, d]
  out      = one_hot(dst)^T[G, Sm, Em] @ msg[G, Em, d]

One-hot entries are exact in any dtype and jax autodiff transposes a
dot_general into another dot_general, so forward AND backward are matmuls —
no scatter anywhere. The FLOP inflation factor is the per-graph node count
Sm (tiny for molecule/TU graphs), which is the minimum any one-hot
formulation can achieve. Precision HIGHEST keeps the result f32-exact
(one-hot operands are unaffected by bf16 pass splitting; the data operand's
3/6-pass split reconstructs the full f32 mantissa).

Replaces the torch-scatter / PyG MessagePassing.propagate role
(/root/reference/modules/conv.py:26-36) for small-graph datasets; large
graphs (code2) stay on the flat path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PRECISION = jax.lax.Precision.HIGHEST

# Fused-tables aggregation (ops/pallas/gin_agg.py): the Pallas kernel that
# folds the bond-encoder lookup into the aggregation so the [G, Em, d]
# edge-embedding tensor never touches HBM. 'auto' = on-TPU; 'on'/'off'
# force it (A/B benches); tests route through interpret mode.
# MEASURED (v5e, bs=4096 flagship, bf16, slope timing): 63.5 ms step fused
# vs 67.6 XLA dense path -> 'auto' (on-TPU) is the default.
_FUSED_TABLES = "auto"
_FUSED_TABLES_INTERPRET = False


def set_fused_tables(mode: str):
    global _FUSED_TABLES
    assert mode in ("auto", "on", "off"), mode
    _FUSED_TABLES = mode


def fused_tables_enabled():
    if _FUSED_TABLES == "off":
        return False
    if _FUSED_TABLES == "on":
        return True
    return jax.default_backend() == "tpu" or _FUSED_TABLES_INTERPRET


def gather_message_scatter_dense_tables(x, batch, tables, dims,
                                        message: str = "relu_add",
                                        edge_weight=None, eps_scale=None):
    """Fused-lookup aggregation over the strided layout: edge embeddings are
    computed IN-KERNEL from batch.edge_attr_dense and the concatenated
    encoder tables (see ops/pallas/gin_agg.py) — the [G, Em, d] embedding
    tensor and its cotangent never exist in HBM. Semantics identical to
    encoder(edge_attr) + gather_message_scatter_dense. With eps_scale
    (traced f32 scalar) the GIN combine fuses in too: returns
    eps_scale*x + agg."""
    from .pallas import gin_agg

    Sm = batch.node_stride
    G = batch.num_graph_slots
    d = x.shape[-1]
    xd = x.reshape(G, Sm, d)
    attr = batch.edge_attr_dense.astype(jnp.int32)         # [G, Em, F]
    off = 0
    cols = []
    for f, n in enumerate(dims):
        cols.append(jnp.clip(attr[..., f], 0, n - 1) + off)
        off += n
    attr_idx = jnp.stack(cols, axis=1)                     # [G, F, Em]
    tbl = jnp.concatenate(
        [tables, jnp.zeros((gin_agg.VP - tables.shape[0], d), tables.dtype)])
    out = gin_agg.fused_gin_agg(
        xd, batch.edge_src_dense, batch.edge_dst_dense,
        batch.edge_mask_dense, attr_idx, tbl, edge_weight, eps_scale,
        message == "relu_add", eps_scale is not None,
        _FUSED_TABLES_INTERPRET)
    return out.reshape(G * Sm, d)


def _one_hot(idx, mask, size, dtype):
    iota = jnp.arange(size, dtype=jnp.int32)
    return ((idx[..., None] == iota) & mask[..., None]).astype(dtype)


def dense_gather(x_dense, edge_idx, edge_mask):
    """[G, Sm, d] gathered along per-graph indices [G, Em] -> [G, Em, d]
    via one-hot matmul (backward is a matmul, not a scatter)."""
    oh = _one_hot(edge_idx, edge_mask, x_dense.shape[1], x_dense.dtype)
    return jax.lax.dot_general(
        oh, x_dense, (((2,), (1,)), ((0,), (0,))),
        precision=PRECISION, preferred_element_type=jnp.float32,
    ).astype(x_dense.dtype)


def dense_scatter_sum(msg, edge_dst, edge_mask, num_slots):
    """[G, Em, d] messages summed onto their destination slots -> [G, Sm, d]."""
    oh = _one_hot(edge_dst, edge_mask, num_slots, msg.dtype)
    return jax.lax.dot_general(
        oh, msg, (((1,), (1,)), ((0,), (0,))),
        precision=PRECISION, preferred_element_type=jnp.float32,
    ).astype(msg.dtype)


def dense_degree(edge_idx, edge_mask, num_slots, dtype=jnp.float32):
    """Edges incident per slot: [G, Em] -> [G, Sm] (a reduction, no scatter)."""
    oh = _one_hot(edge_idx, edge_mask, num_slots, dtype)
    return jnp.sum(oh, axis=1)


def gather_message_scatter_dense(x, batch, edge_emb, message: str = "relu_add",
                                 edge_weight=None):
    """Flat-in / flat-out aggregation over the strided layout.

    x: [N = G*Sm, d] strided node features; edge_emb: [G, Em, d] (from the
    encoder applied to batch.edge_attr_dense); edge_weight: [G, Em] or None.
    Returns [N, d] with the same semantics as scatter.gather_message_scatter.
    """
    Sm = batch.node_stride
    G = batch.num_graph_slots
    d = x.shape[-1]
    xd = x.reshape(G, Sm, d)

    from . import scatter as _scatter
    if _scatter.pallas_enabled() and jax.default_backend() == "tpu":
        from .pallas import dense_agg

        if dense_agg.supported(batch, d):
            pad = (-G) % dense_agg.GT
            def padg(a):
                if pad == 0:
                    return a
                return jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            out = dense_agg.fused_dense_agg(
                padg(xd), padg(batch.edge_src_dense),
                padg(batch.edge_dst_dense), padg(batch.edge_mask_dense),
                padg(edge_emb if message != "copy" else jnp.zeros_like(edge_emb)),
                padg(edge_weight) if edge_weight is not None else None,
                message == "relu_add",
            )
            return out[:G].reshape(G * Sm, d)

    xs = dense_gather(xd, batch.edge_src_dense, batch.edge_mask_dense)
    if message == "relu_add":
        m = jnp.maximum(xs + edge_emb, 0)
    elif message == "add":
        m = xs + edge_emb
    elif message == "copy":
        m = xs
    else:
        raise ValueError(message)
    if edge_weight is not None:
        m = m * edge_weight[..., None].astype(m.dtype)
    m = jnp.where(batch.edge_mask_dense[..., None], m, 0)
    out = dense_scatter_sum(m, batch.edge_dst_dense, batch.edge_mask_dense, Sm)
    return out.reshape(G * Sm, d)


def graph_sum(h, batch):
    """Per-graph sum of node rows [N, d] -> [G, d]: a masked axis reduction
    in the strided layout (global_add_pool without a segment op)."""
    Sm = batch.node_stride
    G = batch.num_graph_slots
    hd = h.reshape(G, Sm, h.shape[-1])
    m = batch.node_mask.reshape(G, Sm)[..., None].astype(h.dtype)
    return jnp.sum(hd * m, axis=1)


def graph_broadcast(v, batch):
    """Per-graph rows [G, d] broadcast to nodes [N, d] (masked): the strided
    replacement for v[node_graph], whose transpose would be a scatter."""
    Sm = batch.node_stride
    G = batch.num_graph_slots
    out = jnp.broadcast_to(v[:, None, :], (G, Sm, v.shape[-1]))
    out = out.reshape(G * Sm, v.shape[-1])
    return jnp.where(batch.node_mask[:, None], out, 0)
