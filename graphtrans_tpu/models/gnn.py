"""Plain GNN baseline (no transformer): GNN stack -> graph pooling -> head(s).
Behavior per /root/reference/models/gnn.py:16-115."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn import pooling
from ..nn.gnn import GNNNodeEmbedding, gnn_out_dim
from .base import ModelSpec
from .heads import PredictionHead


class NodePool(nn.Module):
    """Dispatches the PyG pooling zoo over padded node batches; 'attention'
    and 'set2set' own parameters."""

    pooling: str
    emb_dim: int
    bn_axis_name: Optional[str] = None

    def setup(self):
        if self.pooling == "attention":
            self.attn = pooling.GlobalAttentionPool(self.emb_dim, self.bn_axis_name)
        elif self.pooling == "set2set":
            self.s2s = pooling.Set2SetPool(self.emb_dim, processing_steps=2)

    def __call__(self, h, batch, training: bool = False):
        ng = batch.num_graph_slots
        if batch.node_stride > 0 and self.pooling in ("sum", "mean", "max"):
            # strided layout: axis reductions instead of segment scatters
            from ..ops.dense_mp import graph_sum

            if self.pooling == "sum":
                return graph_sum(h, batch)
            m = batch.node_mask.reshape(ng, batch.node_stride)
            hd = h.reshape(ng, batch.node_stride, h.shape[-1])
            if self.pooling == "mean":
                cnt = jnp.maximum(m.sum(1), 1).astype(h.dtype)
                return graph_sum(h, batch) / cnt[:, None]
            neg = jnp.finfo(h.dtype).min
            mx = jnp.max(jnp.where(m[..., None], hd, neg), axis=1)
            # empty graphs -> 0 (torch_scatter zero-init convention,
            # matching ops/segment.segment_max)
            return jnp.where(jnp.isfinite(mx) & (mx != neg), mx, 0)
        if self.pooling == "sum":
            return pooling.global_add_pool(h, batch.node_graph, batch.node_mask, ng)
        if self.pooling == "mean":
            return pooling.global_mean_pool(h, batch.node_graph, batch.node_mask, ng)
        if self.pooling == "max":
            return pooling.global_max_pool(h, batch.node_graph, batch.node_mask, ng)
        if self.pooling == "attention":
            return self.attn(h, batch.node_graph, batch.node_mask, ng, training)
        if self.pooling == "set2set":
            return self.s2s(h, batch.node_graph, batch.node_mask, ng, training)
        raise ValueError(f"Invalid graph pooling type. {self.pooling}")

    @property
    def out_dim(self):
        return 2 * self.emb_dim if self.pooling == "set2set" else self.emb_dim


class GNNModule(nn.Module):
    num_tasks: int
    gnn_num_layer: int
    gnn_emb_dim: int
    node_encoder: Optional[nn.Module]
    edge_encoder_factory: Callable
    gnn_dropout: float
    gnn_JK: str
    gnn_residual: bool
    gnn_type: str
    gnn_virtual_node: bool
    graph_pooling: str = "mean"
    max_seq_len: Optional[int] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.gnn_node = GNNNodeEmbedding(
            num_layer=self.gnn_num_layer,
            emb_dim=self.gnn_emb_dim,
            node_encoder=self.node_encoder,
            edge_encoder_factory=self.edge_encoder_factory,
            drop_ratio=self.gnn_dropout,
            JK=self.gnn_JK,
            residual=self.gnn_residual,
            gnn_type=self.gnn_type,
            virtual_node=self.gnn_virtual_node,
            bn_axis_name=self.bn_axis_name,
        )
        pool_dim = gnn_out_dim(self.gnn_JK, self.gnn_emb_dim)
        self.pool = NodePool(self.graph_pooling, pool_dim, self.bn_axis_name)
        self.head = PredictionHead(self.num_tasks, self.max_seq_len)

    def __call__(self, batch, perturb=None, training: bool = False):
        h_node = self.gnn_node(batch, perturb, training)
        h_graph = self.pool(h_node, batch, training)
        return self.head(h_graph)


class GNN(ModelSpec):
    @staticmethod
    def name(args):
        name = f"{args.model_type}+{args.gnn_type}"
        name += "-virtual" if args.gnn_virtual_node else ""
        return name

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        return GNNModule(
            num_tasks=num_tasks,
            gnn_num_layer=args.gnn_num_layer,
            gnn_emb_dim=args.gnn_emb_dim,
            node_encoder=node_encoder,
            edge_encoder_factory=edge_encoder_cls,
            gnn_dropout=args.gnn_dropout,
            gnn_JK=args.gnn_JK,
            gnn_residual=args.gnn_residual,
            gnn_type=args.gnn_type,
            gnn_virtual_node=args.gnn_virtual_node,
            graph_pooling=args.graph_pooling,
            max_seq_len=args.max_seq_len,
            bn_axis_name=getattr(args, "bn_axis_name", None),
        )
