"""Prediction heads: single linear, and the per-position head stack used for
the ogbg-code2 sequence task (the reference keeps a ModuleList of max_seq_len
linears and returns a list of [B, num_tasks] tensors, e.g.
/root/reference/models/gnn_transformer.py:121-127; we return one stacked
[B, max_seq_len, num_tasks] tensor)."""

from __future__ import annotations

from typing import Optional

from flax import linen as nn
import jax.numpy as jnp

from ..nn.init import TDense


class PredictionHead(nn.Module):
    num_tasks: int
    max_seq_len: Optional[int] = None
    mlp_hidden: Optional[tuple] = None  # e.g. PNA's (35, 17) fixed-head MLP

    @nn.compact
    def __call__(self, h_graph):
        def make_head(name):
            if self.mlp_hidden:
                layers = []
                for width in self.mlp_hidden:
                    layers += [TDense(width), nn.relu]
                layers.append(TDense(self.num_tasks))
                return nn.Sequential(layers, name=name)
            return TDense(self.num_tasks, name=name)

        if self.max_seq_len is None:
            return make_head("head")(h_graph)
        preds = [make_head(f"head_{i}")(h_graph) for i in range(self.max_seq_len)]
        return jnp.stack(preds, axis=1)  # [B, L, T]
