"""PNA baseline and PNA-Transformer models. Behavior per
/root/reference/models/pna.py:20-104 and pna_transformer.py:15-118 (PNA head
is the fixed MLP emb->35->17->num_tasks; seq-task heads are emb->emb->tasks
MLPs; PNATransformer's 'mean' pooling correctly divides by the valid count)."""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from ..nn.init import TDense
from ..nn.pna import PNANodeEmbedding, avg_degree_stats
from ..nn.transformer import TransformerNodeEncoder
from ..ops.dense import nodes_to_dense
from .base import ModelSpec
from .gnn import NodePool
from .gnn_transformer import dense_pool
from .heads import PredictionHead


def add_pna_args(parser):
    group = parser.add_argument_group("PNANet configs")
    group.add_argument("--aggregators", type=str, nargs="+",
                       default=["mean", "max", "min", "std"])
    group.add_argument("--scalers", type=str, nargs="+",
                       default=["identity", "amplification", "attenuation"])
    group.add_argument("--post_layers", type=int, default=1)
    group.add_argument("--add_edge", type=str, default="none")
    group.set_defaults(gnn_residual=True)
    group.set_defaults(gnn_dropout=0.3)
    group.set_defaults(gnn_emb_dim=70)
    group.set_defaults(gnn_num_layer=4)


def _build_pna_stack(args, node_encoder, deg, bn_axis_name):
    stats = avg_degree_stats(deg if deg is not None else [0, 1])
    return PNANodeEmbedding(
        num_layer=args.gnn_num_layer,
        emb_dim=args.gnn_emb_dim,
        node_encoder=node_encoder,
        aggregators=tuple(args.aggregators),
        scalers=tuple(args.scalers),
        avg_deg_log=max(stats["log"], 1e-6),
        avg_deg_lin=max(stats["lin"], 1e-6),
        drop_ratio=args.gnn_dropout,
        residual=args.gnn_residual,
        bn_axis_name=bn_axis_name,
    )


class PNAModule(nn.Module):
    num_tasks: int
    pna: PNANodeEmbedding
    emb_dim: int
    graph_pooling: str = "mean"
    max_seq_len: Optional[int] = None
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.pool = NodePool(self.graph_pooling, self.emb_dim, self.bn_axis_name)
        if self.max_seq_len is None:
            self.head = PredictionHead(self.num_tasks, None, mlp_hidden=(35, 17))
        else:
            self.head = PredictionHead(
                self.num_tasks, self.max_seq_len, mlp_hidden=(self.emb_dim,)
            )

    def __call__(self, batch, perturb=None, training: bool = False):
        x = self.pna(batch, perturb, training)
        h_graph = self.pool(x, batch, training)
        return self.head(h_graph)


class PNANet(ModelSpec):
    @staticmethod
    def need_deg():
        return True

    @staticmethod
    def add_args(parser):
        add_pna_args(parser)

    @staticmethod
    def name(args):
        return f"{args.model_type}"

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        return PNAModule(
            num_tasks=num_tasks,
            pna=_build_pna_stack(args, node_encoder, deg,
                                 getattr(args, "bn_axis_name", None)),
            emb_dim=args.gnn_emb_dim,
            graph_pooling=args.graph_pooling,
            max_seq_len=args.max_seq_len,
            bn_axis_name=getattr(args, "bn_axis_name", None),
        )

    gnn_subtree = "pna"


class PNATransformerModule(nn.Module):
    num_tasks: int
    pna: PNANodeEmbedding
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

    def setup(self):
        self.gnn2transformer = TDense(self.d_model)
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
        self.head = PredictionHead(self.num_tasks, self.max_seq_len)

    def __call__(self, batch, perturb=None, training: bool = False):
        h_node = self.pna(batch, perturb, training)
        h_node = self.gnn2transformer(h_node)
        from .gnn_transformer import packed_transformer_stage, use_seq_pack

        if use_seq_pack(batch, self.graph_pooling, self.num_encoder_layers):
            h_graph = packed_transformer_stage(
                self.transformer_encoder, h_node, batch, training)
            return self.head(h_graph)
        S = min(batch.max_nodes_dense, self.max_input_len)
        dense, valid = nodes_to_dense(
            h_node, batch.node_graph, batch.node_pos, batch.node_mask,
            batch.num_graph_slots, S, node_stride=batch.node_stride,
        )
        out, valid = self.transformer_encoder(dense, valid, training)
        from ..ops.dense import maybe_graph_shard

        h_graph = dense_pool(
            out, valid, maybe_graph_shard(batch.num_nodes),
            self.graph_pooling,
            use_cls=self.graph_pooling == "cls", max_len=S,
        )
        return self.head(h_graph)


class PNATransformer(ModelSpec):
    @staticmethod
    def need_deg():
        return True

    @staticmethod
    def add_args(parser):
        from .args import add_transformer_args

        add_transformer_args(parser)
        add_pna_args(parser)
        group = parser.add_argument_group("GNNTransformer - Training Config")
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
        name += f"-d={args.d_model}"
        name += f"-act={args.transformer_activation}"
        name += f"-tdrop={args.transformer_dropout}"
        name += f"-gdrop={args.gnn_dropout}"
        name += "-pretrained_gnn" if args.pretrained_gnn else ""
        name += f"-freeze_gnn={args.freeze_gnn}" if args.freeze_gnn is not None else ""
        return name

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        return PNATransformerModule(
            num_tasks=num_tasks,
            pna=_build_pna_stack(args, node_encoder, deg,
                                 getattr(args, "bn_axis_name", None)),
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
        )

    gnn_subtree = "pna"
