"""GNN node-embedding stacks (plain and virtual-node variants).

Behavioral spec from /root/reference/modules/gnn_module.py:18-241:
  - `num_layer` convs, each followed by masked BatchNorm; ReLU+dropout between
    layers, NO ReLU after the last; optional residual.
  - node encoder applied once (with optional AST depth), then `+ perturb`
    (the FLAG adversarial hook — must stay differentiable w.r.t. perturb).
  - virtual node: per-graph embedding initialized to 0; each layer first adds
    the VN embedding to its graph's nodes, and after every non-final layer the
    VN is updated with segment-sum(h) + VN through a 2-layer BN-MLP with
    dropout (+ optional residual). Note the reference mutates h_list[layer]
    in place with the VN broadcast, which feeds JK=cat's first entry — we
    reproduce that ordering exactly.
  - JK in {last, sum, cat(first,last)}.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_sum
from ..ops import plan_expand
from .conv import GCNConv, GINConv, _sfa_route
from .init import TDense
from .dropout import ByteDropout
from .norm import MaskedBatchNorm


class VirtualNodeMLP(nn.Module):
    """Linear(d,2d) -> BN -> ReLU -> Linear(2d,d) -> BN -> ReLU over per-graph
    rows (/root/reference/modules/gnn_module.py:160-170)."""

    emb_dim: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, v, graph_mask, training: bool):
        v = TDense(2 * self.emb_dim)(v)
        v = MaskedBatchNorm(2 * self.emb_dim, axis_name=self.bn_axis_name)(
            v, graph_mask, use_running_average=not training
        )
        v = nn.relu(v)
        v = TDense(self.emb_dim)(v)
        v = MaskedBatchNorm(self.emb_dim, axis_name=self.bn_axis_name)(
            v, graph_mask, use_running_average=not training
        )
        return nn.relu(v)


class GNNNodeEmbedding(nn.Module):
    num_layer: int
    emb_dim: int
    node_encoder: Optional[nn.Module]
    edge_encoder_factory: Callable[[int], nn.Module]
    drop_ratio: float = 0.5
    JK: str = "last"
    residual: bool = False
    gnn_type: str = "gin"
    virtual_node: bool = False
    bn_axis_name: Optional[str] = None
    # set under node-sharded (hybrid) execution: per-graph segment sums are
    # partial on each chip and need a psum over this axis
    graph_reduce_axis: Optional[str] = None

    def setup(self):
        if self.num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        convs = []
        for i in range(self.num_layer):
            edge_enc = self.edge_encoder_factory(self.emb_dim)
            if self.gnn_type == "gin":
                convs.append(
                    GINConv(self.emb_dim, edge_encoder=edge_enc,
                            bn_axis_name=self.bn_axis_name, name=f"conv_{i}")
                )
            elif self.gnn_type == "gcn":
                convs.append(
                    GCNConv(self.emb_dim, edge_encoder=edge_enc, name=f"conv_{i}")
                )
            else:
                raise ValueError(f"Undefined GNN type called {self.gnn_type}")
        self.convs = convs
        self.batch_norms = [
            MaskedBatchNorm(self.emb_dim, axis_name=self.bn_axis_name, name=f"bn_{i}")
            for i in range(self.num_layer)
        ]
        if self.virtual_node:
            self.virtualnode_embedding = self.param(
                "virtualnode_embedding", nn.initializers.zeros, (self.emb_dim,)
            )
            # under node sharding (graph_reduce_axis set) the per-graph rows
            # are REPLICATED on every chip — a psum would multiply the BN
            # counts by the mesh size and skew the unbiased running-var
            # correction; under data parallelism each chip owns distinct
            # graphs and the psum is required.
            vn_bn_axis = None if self.graph_reduce_axis else self.bn_axis_name
            self.vn_mlps = [
                VirtualNodeMLP(self.emb_dim, vn_bn_axis, name=f"vn_mlp_{i}")
                for i in range(self.num_layer - 1)
            ]
        self.dropout = ByteDropout(self.drop_ratio)

    def _encode(self, batch, perturb):
        if self.node_encoder is None:
            h = batch.node_feat.astype(jnp.float32)
        elif getattr(self.node_encoder, "takes_depth", False):
            h = self.node_encoder(batch.node_feat, batch.node_depth)
        else:
            h = self.node_encoder(batch.node_feat)
        if perturb is not None:
            # cast to the compute dtype HERE: FLAG's f32 perturb would
            # otherwise promote the whole GNN stack (and the fused-tables
            # kernel's operands — Mosaic rejects the mixed-dtype dot) back
            # to f32 under --precision bf16. sign(grad) is dtype-robust.
            h = h + perturb.astype(h.dtype)
        return jnp.where(batch.node_mask[:, None], h, 0)

    def __call__(self, batch, perturb=None, training: bool = False):
        num_graphs = batch.num_graph_slots
        h_list = [self._encode(batch, perturb)]

        def drop(x):
            return self.dropout(x, deterministic=not training)

        if self.virtual_node:
            vn = jnp.broadcast_to(self.virtualnode_embedding, (num_graphs, self.emb_dim))

        strided = batch.node_stride > 0

        for layer in range(self.num_layer):
            if self.virtual_node:
                if strided:
                    from ..ops.dense_mp import graph_broadcast

                    vn_rows = graph_broadcast(vn, batch)
                else:
                    vn_rows = jnp.where(
                        batch.node_mask[:, None], vn[batch.node_graph], 0)
                h_in = h_list[layer] + vn_rows
                h_list[layer] = h_in
            else:
                h_in = h_list[layer]

            h = self.convs[layer](batch, h_in, training)
            h = self.batch_norms[layer](h, batch.node_mask, use_running_average=not training)
            if layer == self.num_layer - 1:
                h = drop(h)
            else:
                h = drop(nn.relu(h))
            if self.residual:
                h = h + h_list[layer]
            h_list.append(h)

            if self.virtual_node and layer < self.num_layer - 1:
                if strided:
                    from ..ops.dense_mp import graph_sum

                    pooled = graph_sum(h_list[layer], batch)
                elif (plan_expand.has_pool(batch)
                      and _sfa_route(batch, "add")):
                    # scatter-free per-graph sum (the forward segment-sum
                    # scatter is row-serialized on TPU; the backward is a
                    # broadcast gather either way)
                    from ..ops.scatter_free import graph_sum_sfa

                    pooled = graph_sum_sfa(
                        h_list[layer], batch.node_graph, batch.node_mask,
                        plan_expand.pool_plan(batch), num_graphs)
                else:
                    pooled = segment_sum(
                        h_list[layer], batch.node_graph, num_graphs,
                        mask=batch.node_mask
                    )
                if self.graph_reduce_axis is not None:
                    import jax

                    pooled = jax.lax.psum(pooled, self.graph_reduce_axis)
                vn_tmp = pooled + vn
                vn_new = drop(self.vn_mlps[layer](vn_tmp, batch.graph_mask, training))
                vn = vn + vn_new if self.residual else vn_new

        if self.JK == "last":
            out = h_list[-1]
        elif self.JK == "sum":
            out = sum(h_list[layer] for layer in range(self.num_layer))
        elif self.JK == "cat":
            out = jnp.concatenate([h_list[0], h_list[-1]], axis=-1)
        else:
            raise ValueError(f"unknown JK {self.JK}")
        return jnp.where(batch.node_mask[:, None], out, 0)


def gnn_out_dim(JK: str, emb_dim: int) -> int:
    return 2 * emb_dim if JK == "cat" else emb_dim
