"""GraphTrans flagship: GNN stack -> linear bridge -> global transformer with
CLS readout. Behavior per /root/reference/models/gnn_transformer.py:16-146.

Pooling: 'cls'/'last' read the final column (the CLS column when use_cls,
otherwise the last valid node via per-graph gather); 'mean' is a masked mean
over valid positions — the reference divides by the PAD count
(gnn_transformer.py:117, a bug since mean pooling is unused in published
configs); we implement the correct masked mean and document the deviation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..nn.gnn import GNNNodeEmbedding
from ..nn.init import TDense
from ..nn.masked_transformer import MaskedOnlyTransformerEncoder
from ..nn.transformer import PositionalEncoding, TransformerNodeEncoder
from ..ops.dense import maybe_graph_shard, nodes_to_dense
from .base import ModelSpec
from .heads import PredictionHead


def packed_transformer_stage(encoder, h_node, batch, training: bool):
    """Variable-length packed transformer stage (ops/pack.py): gather the
    bridged node features into [R, W, d] packed rows (zero row for CLS/pad
    slots; backward is a GATHER via pack_inv, never a serialized scatter),
    run the encoder with segment-id attention masking, and read each
    graph's own CLS slot back out. Token count ~ sum(n_i) + G instead of
    the dense path's G * S_max — the TPU answer to heavy-tailed datasets
    (real ogbg-code2: mean ~125 nodes, max past max_input_len=1000, where
    [G, S_max, d] dense padding OOMs at bs=512 and burns ~8x the matmul
    work). Numerics match the dense path exactly: same kept-node sets
    (last-S truncation), same per-graph attention sets (own tokens + own
    CLS), same post-norm layer semantics."""
    from ..ops.pack import pack_gather

    d = h_node.shape[-1]
    N = h_node.shape[0]
    src = jnp.concatenate(
        [h_node, jnp.zeros((1, d), h_node.dtype)], axis=0)

    def run_tier(pack_node, pack_inv, pack_seg, R, W):
        dense = pack_gather(src, pack_node, pack_inv).reshape(R, W, d)
        seg = pack_seg.reshape(R, W)
        valid = seg >= 0
        cls_mask = valid & (pack_node.reshape(R, W) == N)
        out, _ = encoder(dense, valid, training, seg=seg, cls_mask=cls_mask)
        return out.reshape(R * W, d)

    # multi-tier packing: smaller graphs run in narrower rows (attention
    # cost ~ sum_rows W_r^2); the shared-parameter encoder runs once per
    # tier and pack_cls_slot indexes the virtual concat of the tiers
    flats = [run_tier(batch.pack_node, batch.pack_inv, batch.pack_seg,
                      batch.pack_rows, batch.pack_w)]
    if batch.pack2_node is not None:
        flats.append(run_tier(batch.pack2_node, batch.pack2_inv,
                              batch.pack2_seg, batch.pack2_rows,
                              batch.pack2_w))
    if batch.pack3_node is not None:
        flats.append(run_tier(batch.pack3_node, batch.pack3_inv,
                              batch.pack3_seg, batch.pack3_rows,
                              batch.pack3_w))
    flat = flats[0] if len(flats) == 1 else jnp.concatenate(flats, axis=0)
    return flat[batch.pack_cls_slot]


def use_seq_pack(batch, graph_pooling: str, num_encoder_layers: int,
                 num_encoder_layers_masked: int = 0,
                 pos_encoder: bool = False, sp_axis=None) -> bool:
    """The packed route covers the production composition (CLS pooling,
    global encoder); the masked/positional/sequence-parallel ablations and
    non-CLS readouts keep the dense path."""
    return (batch.pack_node is not None and graph_pooling == "cls"
            and num_encoder_layers > 0 and num_encoder_layers_masked == 0
            and not pos_encoder and sp_axis is None)


def dense_pool(out, valid, num_nodes, pooling: str, use_cls: bool, max_len: int):
    """Graph readout from transformer output [B, S(+cls), d]."""
    if pooling in ("last", "cls"):
        if use_cls:
            return out[:, -1]
        # back-padded layout: "last" = last valid node = column min(n, S)-1
        idx = jnp.clip(jnp.minimum(num_nodes, max_len) - 1, 0, out.shape[1] - 1)
        return jnp.take_along_axis(out, idx[:, None, None].repeat(out.shape[-1], -1), axis=1)[:, 0]
    if pooling == "mean":
        m = valid.astype(out.dtype)[:, :, None]
        return (out * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
    raise NotImplementedError(pooling)


class GNNTransformerModule(nn.Module):
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
    graph_pooling: str = "cls"
    max_seq_len: Optional[int] = None
    pos_encoder: bool = False
    bn_axis_name: Optional[str] = None
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis (GSPMD mode)
    graph_reduce_axis: Optional[str] = None  # node-sharded (hybrid) execution

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
            graph_reduce_axis=self.graph_reduce_axis,
        )
        self.gnn2transformer = TDense(self.d_model)
        if self.pos_encoder:
            self.pos_encoding = PositionalEncoding(self.d_model)
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
            sp_axis=self.sp_axis,
        )
        self.head = PredictionHead(self.num_tasks, self.max_seq_len)

    def __call__(self, batch, perturb=None, training: bool = False):
        h_node = self.gnn_node(batch, perturb, training)
        h_node = self.gnn2transformer(h_node)

        if use_seq_pack(batch, self.graph_pooling, self.num_encoder_layers,
                        self.num_encoder_layers_masked, self.pos_encoder,
                        self.sp_axis):
            h_graph = packed_transformer_stage(
                self.transformer_encoder, h_node, batch, training)
            return self.head(h_graph)

        S = min(batch.max_nodes_dense, self.max_input_len)
        dense, valid = nodes_to_dense(
            h_node, batch.node_graph, batch.node_pos, batch.node_mask,
            batch.num_graph_slots, S, node_stride=batch.node_stride,
        )
        if self.pos_encoder:
            dense = self.pos_encoding(dense)
        if self.num_encoder_layers_masked > 0:
            dense = self.masked_encoder(dense, batch.dense_adj, valid, training)
        if self.num_encoder_layers > 0:
            dense, valid = self.transformer_encoder(dense, valid, training)

        # under hybrid graph-sharded execution the dense stage holds only
        # this chip's graph block — slice graph-level arrays to match
        h_graph = dense_pool(
            dense, valid, maybe_graph_shard(batch.num_nodes),
            self.graph_pooling,
            use_cls=self.graph_pooling == "cls", max_len=S,
        )
        return self.head(h_graph)


class GNNTransformer(ModelSpec):
    @staticmethod
    def add_args(parser):
        from .args import add_masked_transformer_args, add_transformer_args

        add_transformer_args(parser)
        add_masked_transformer_args(parser)
        group = parser.add_argument_group("GNNTransformer - Training Config")
        group.add_argument("--pos_encoder", default=False, action="store_true")
        group.add_argument("--pretrained_gnn", type=str, default=None,
                           help="pretrained gnn_node node embedding path")
        group.add_argument("--freeze_gnn", type=int, default=None,
                           help="Freeze gnn_node weight from epoch `freeze_gnn`")

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
        return GNNTransformerModule(
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
            pos_encoder=args.pos_encoder,
            bn_axis_name=getattr(args, "bn_axis_name", None),
            sp_axis=getattr(args, "sp_axis", None),
            graph_reduce_axis=getattr(args, "graph_reduce_axis", None),
        )
