"""Reversed-order ablation: transformer first, then GNN. Behavior per
/root/reference/models/transformer_gnn.py:22-192 (deviation: that file's
masked-encoder branch references an undefined `h_node` at :151 and would
crash — we implement the intended dense-adjacency path)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.gnn import GNNNodeEmbedding, gnn_out_dim
from ..nn.init import TDense
from ..nn.masked_transformer import MaskedOnlyTransformerEncoder
from ..nn.transformer import TransformerNodeEncoder
from ..ops.dense import dense_to_nodes, nodes_to_dense
from .base import ModelSpec
from .gnn import NodePool
from .heads import PredictionHead


class TransformerGNNModule(nn.Module):
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
    d_model: int
    nhead: int
    dim_feedforward: int
    transformer_dropout: float
    transformer_activation: str
    num_encoder_layers: int
    max_input_len: int
    transformer_norm_input: bool
    num_encoder_layers_masked: int = 0
    transformer_prenorm: bool = False
    graph_pooling: str = "mean"
    max_seq_len: Optional[int] = None
    graph_input_dim: Optional[int] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        if self.graph_input_dim is not None:
            self.input2transformer = TDense(self.d_model)
        if self.num_encoder_layers_masked > 0:
            self.masked_encoder = MaskedOnlyTransformerEncoder(
                num_layers=self.num_encoder_layers_masked,
                d_model=self.d_model,
                dim_feedforward=self.dim_feedforward,
                nhead=self.nhead,
                dropout=self.transformer_dropout,
                prenorm=self.transformer_prenorm,
            )
        self.transformer_encoder = TransformerNodeEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            dim_feedforward=self.dim_feedforward,
            dropout=self.transformer_dropout,
            activation=self.transformer_activation,
            num_layers=self.num_encoder_layers,
            norm_input=self.transformer_norm_input,
            use_cls=self.graph_pooling == "cls",
        )
        self.transformer2gnn = TDense(self.gnn_emb_dim)
        self.gnn_node = GNNNodeEmbedding(
            num_layer=self.gnn_num_layer,
            emb_dim=self.gnn_emb_dim,
            node_encoder=None,
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
        if getattr(self.node_encoder, "takes_depth", False):
            h = self.node_encoder(batch.node_feat, batch.node_depth)
        else:
            h = self.node_encoder(batch.node_feat)
        if perturb is not None:
            h = h + perturb.astype(h.dtype)
        if self.graph_input_dim is not None:
            h = self.input2transformer(h)
        h = jnp.where(batch.node_mask[:, None], h, 0)

        S = min(batch.max_nodes_dense, self.max_input_len)
        dense, valid = nodes_to_dense(
            h, batch.node_graph, batch.node_pos, batch.node_mask,
            batch.num_graph_slots, S,
        )
        if self.num_encoder_layers_masked > 0:
            dense = self.masked_encoder(dense, batch.dense_adj, valid, training)
        if self.num_encoder_layers > 0:
            out, _ = self.transformer_encoder(dense, valid, training)
        else:
            out = dense
        h_node = dense_to_nodes(
            out[:, :S], h, batch.node_graph, batch.node_pos, batch.node_mask, S
        )
        h_node = self.transformer2gnn(h_node)
        import dataclasses

        batch2 = dataclasses.replace(batch, node_feat=h_node)
        h_node = self.gnn_node(batch2, None, training)
        h_graph = self.pool(h_node, batch, training)
        return self.head(h_graph)


class TransformerGNN(ModelSpec):
    @staticmethod
    def add_args(parser):
        from .args import add_masked_transformer_args, add_transformer_args

        add_transformer_args(parser)
        add_masked_transformer_args(parser)
        group = parser.add_argument_group("GNNTransformer - Training Config")
        group.add_argument("--pretrained_gnn", type=str, default=None,
                           help="pretrained gnn_node node embedding path")
        group.add_argument("--freeze_gnn", type=int, default=None,
                           help="Freeze gnn_node weight from epoch `freeze_gnn`")
        group.add_argument("--graph_input_dim", type=int, default=None)

    @staticmethod
    def name(args):
        name = f"{args.model_type}-pooling={args.graph_pooling}"
        name += "-norm_input" if args.transformer_norm_input else ""
        name += f"+{args.gnn_type}"
        name += "-virtual" if args.gnn_virtual_node else ""
        name += f"-JK={args.gnn_JK}"
        name += f"-enc_layer={args.num_encoder_layers}"
        name += f"-enc_layer_masked={args.num_encoder_layers_masked}"
        name += f"-d={args.d_model}"
        name += f"-act={args.transformer_activation}"
        name += f"-tdrop={args.transformer_dropout}"
        name += f"-gdrop={args.gnn_dropout}"
        name += "-pretrained_gnn" if args.pretrained_gnn else ""
        name += f"-freeze_gnn={args.freeze_gnn}" if args.freeze_gnn is not None else ""
        name += "-prenorm" if args.transformer_prenorm else "-postnorm"
        return name

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        return TransformerGNNModule(
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
            d_model=args.d_model,
            nhead=args.nhead,
            dim_feedforward=args.dim_feedforward,
            transformer_dropout=args.transformer_dropout,
            transformer_activation=args.transformer_activation,
            num_encoder_layers=args.num_encoder_layers,
            max_input_len=int(args.max_input_len),
            transformer_norm_input=args.transformer_norm_input,
            num_encoder_layers_masked=args.num_encoder_layers_masked,
            transformer_prenorm=args.transformer_prenorm,
            graph_pooling=args.graph_pooling,
            max_seq_len=args.max_seq_len,
            graph_input_dim=args.graph_input_dim,
            bn_axis_name=getattr(args, "bn_axis_name", None),
        )
