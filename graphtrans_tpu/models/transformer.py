"""Transformer-only ablation (no GNN): node encoder (+perturb) -> pack dense
-> transformer -> CLS pooling, or unpack back to nodes and use the PyG-style
pooling zoo. Behavior per /root/reference/models/transformer.py:20-115."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.transformer import TransformerNodeEncoder
from ..ops.dense import dense_to_nodes, nodes_to_dense
from .base import ModelSpec
from .gnn import NodePool
from .heads import PredictionHead


class TransformerModule(nn.Module):
    num_tasks: int
    node_encoder: Optional[nn.Module]
    d_model: int
    nhead: int
    dim_feedforward: int
    transformer_dropout: float
    transformer_activation: str
    num_encoder_layers: int
    max_input_len: int
    transformer_norm_input: bool
    graph_pooling: str = "cls"
    max_seq_len: Optional[int] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.transformer = TransformerNodeEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            dim_feedforward=self.dim_feedforward,
            dropout=self.transformer_dropout,
            activation=self.transformer_activation,
            num_layers=self.num_encoder_layers,
            norm_input=self.transformer_norm_input,
            use_cls=self.graph_pooling == "cls",
        )
        if self.graph_pooling != "cls":
            self.pool = NodePool(self.graph_pooling, self.d_model, self.bn_axis_name)
        self.head = PredictionHead(self.num_tasks, self.max_seq_len)

    def __call__(self, batch, perturb=None, training: bool = False):
        if getattr(self.node_encoder, "takes_depth", False):
            h = self.node_encoder(batch.node_feat, batch.node_depth)
        else:
            h = self.node_encoder(batch.node_feat)
        if perturb is not None:
            h = h + perturb.astype(h.dtype)
        h = jnp.where(batch.node_mask[:, None], h, 0)

        S = min(batch.max_nodes_dense, self.max_input_len)
        dense, valid = nodes_to_dense(
            h, batch.node_graph, batch.node_pos, batch.node_mask,
            batch.num_graph_slots, S,
        )
        out, valid = self.transformer(dense, valid, training)
        if self.graph_pooling == "cls":
            h_graph = out[:, -1]
        else:
            h_node = dense_to_nodes(
                out[:, :S], h, batch.node_graph, batch.node_pos, batch.node_mask, S
            )
            h_graph = self.pool(h_node, batch, training)
        return self.head(h_graph)


class Transformer(ModelSpec):
    @staticmethod
    def get_emb_dim(args):
        return args.d_model

    @staticmethod
    def add_args(parser):
        from .args import add_transformer_args

        add_transformer_args(parser)

    @staticmethod
    def name(args):
        name = f"{args.model_type}-pooling={args.graph_pooling}"
        name += f"+{args.gnn_type}"
        name += "-virtual" if args.gnn_virtual_node else ""
        name += f"-d={args.d_model}"
        name += f"-tdp={args.transformer_dropout}"
        return name

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        return TransformerModule(
            num_tasks=num_tasks,
            node_encoder=node_encoder,
            d_model=args.d_model,
            nhead=args.nhead,
            dim_feedforward=args.dim_feedforward,
            transformer_dropout=args.transformer_dropout,
            transformer_activation=args.transformer_activation,
            num_encoder_layers=args.num_encoder_layers,
            max_input_len=int(args.max_input_len),
            transformer_norm_input=args.transformer_norm_input,
            graph_pooling=args.graph_pooling,
            max_seq_len=args.max_seq_len,
            bn_axis_name=getattr(args, "bn_axis_name", None),
        )
