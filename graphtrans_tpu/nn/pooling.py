"""Graph readout (pooling) functions over padded node batches.

Covers the PyG pooling zoo the reference selects from
(/root/reference/models/gnn.py:66-81): sum, mean, max, gated attention
(GlobalAttention with a Linear->BN->ReLU->Linear gate), and Set2Set with an
LSTM controller (processing_steps=2).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment
from .init import TDense
from .norm import MaskedBatchNorm


def global_add_pool(h, node_graph, node_mask, num_graphs):
    return segment.segment_sum(h, node_graph, num_graphs, mask=node_mask)


def global_mean_pool(h, node_graph, node_mask, num_graphs):
    return segment.segment_mean(h, node_graph, num_graphs, mask=node_mask)


def global_max_pool(h, node_graph, node_mask, num_graphs):
    return segment.segment_max(h, node_graph, num_graphs, mask=node_mask)


class GlobalAttentionPool(nn.Module):
    """PyG GlobalAttention: gate = softmax-per-graph(gate_nn(h)); out =
    sum gate * h. Gate net: Linear(d,2d)->BN->ReLU->Linear(2d,1)."""

    emb_dim: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, h, node_graph, node_mask, num_graphs, training: bool):
        g = TDense(2 * self.emb_dim)(h)
        g = MaskedBatchNorm(2 * self.emb_dim, axis_name=self.bn_axis_name)(
            g, node_mask, use_running_average=not training
        )
        g = nn.relu(g)
        gate = TDense(1)(g)[:, 0]
        gate = segment.segment_softmax(gate, node_graph, num_graphs, mask=node_mask)
        return segment.segment_sum(h * gate[:, None], node_graph, num_graphs, mask=node_mask)


class Set2SetPool(nn.Module):
    """Set2Set readout (Vinyals et al.) as used by PyG: LSTM over
    `processing_steps` attention rounds; output dim is 2*emb_dim."""

    emb_dim: int
    processing_steps: int = 2

    @nn.compact
    def __call__(self, h, node_graph, node_mask, num_graphs, training: bool = False):
        lstm = nn.OptimizedLSTMCell(features=self.emb_dim)
        c = jnp.zeros((num_graphs, self.emb_dim), h.dtype)
        hidden = jnp.zeros((num_graphs, self.emb_dim), h.dtype)
        q_star = jnp.zeros((num_graphs, 2 * self.emb_dim), h.dtype)
        carry = (c, hidden)
        for _ in range(self.processing_steps):
            carry, q = lstm(carry, q_star)
            e = jnp.sum(h * q[node_graph], axis=-1)
            a = segment.segment_softmax(e, node_graph, num_graphs, mask=node_mask)
            r = segment.segment_sum(h * a[:, None], node_graph, num_graphs, mask=node_mask)
            q_star = jnp.concatenate([q, r], axis=-1)
        return q_star
