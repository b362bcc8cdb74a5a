"""Model registry protocol.

The reference's plugin API (/root/reference/models/base_model.py:5-25 and
models/__init__.py:9-15): every model class contributes `add_args` (extends
the CLI parser), `name(args)` (run-name fingerprint), `need_deg()` (PNA degree
histogram), and is constructed from (num_tasks, args, node_encoder,
edge_encoder_cls). Here models are flax modules; `build` returns the module
instance and `freeze_param_prefixes` tells the trainer which parameter
subtrees `epoch_callback`-style GNN freezing applies to."""

from __future__ import annotations


class ModelSpec:
    """Base class for registry entries (static API only; the flax module does
    the compute)."""

    @staticmethod
    def need_deg() -> bool:
        return False

    @staticmethod
    def add_args(parser):
        return

    @staticmethod
    def name(args) -> str:
        raise NotImplementedError

    @staticmethod
    def get_emb_dim(args) -> int:
        return args.gnn_emb_dim

    @classmethod
    def build(cls, num_tasks, args, node_encoder, edge_encoder_cls, deg=None):
        raise NotImplementedError

    # parameter path prefix for --freeze_gnn / --pretrained_gnn features
    gnn_subtree = "gnn_node"
