"""Adjacency-masked ("local attention") transformer blocks.

Re-implements /root/reference/modules/masked_transformer_encoder.py: explicit
q/k/v attention whose scores are restricted to graph-adjacent pairs via a
dense [B,S,S] adjacency mask, pre- or post-norm blocks with a GELU MLP.

The reference has an inverted-polarity bug in its `valid_input_mask` handling
(it masks VALID keys, masked_transformer_encoder.py:46-47); these layers are
disabled in every published config. We implement the intended semantics —
pad positions are excluded from attention — and document the deviation.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .dropout import ByteDropout

from .init import TDense
from .transformer import masked_softmax


class AdjacencyMaskedSelfAttention(nn.Module):
    d_model: int
    nhead: int
    attn_dropout: float
    resid_dropout: float

    @nn.compact
    def __call__(self, x, adj_mask, valid, training: bool):
        B, S, d = x.shape
        assert d % self.nhead == 0
        hd = d // self.nhead
        q = TDense(d)(x).reshape(B, S, self.nhead, hd).transpose(0, 2, 1, 3)
        k = TDense(d)(x).reshape(B, S, self.nhead, hd).transpose(0, 2, 1, 3)
        v = TDense(d)(x).reshape(B, S, self.nhead, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
        keep = jnp.ones((B, S, S), bool)
        if adj_mask is not None:
            keep = keep & (adj_mask != 0)
        if valid is not None:
            keep = keep & valid[:, None, :]
        att = masked_softmax(scores, keep[:, None, :, :])
        att = ByteDropout(self.attn_dropout)(att, deterministic=not training)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(att.dtype))
        y = y.transpose(0, 2, 1, 3).reshape(B, S, d).astype(x.dtype)
        y = TDense(d)(y)
        return ByteDropout(self.resid_dropout)(y, deterministic=not training)


class MaskedBlock(nn.Module):
    d_model: int
    dim_feedforward: int
    nhead: int
    dropout: float
    prenorm: bool = False

    @nn.compact
    def __call__(self, x, adj_mask, valid, training: bool):
        attn = AdjacencyMaskedSelfAttention(
            self.d_model, self.nhead, self.dropout, self.dropout
        )
        mlp = nn.Sequential([
            TDense(self.dim_feedforward),
            nn.gelu,
            TDense(self.d_model),
        ])
        drop = lambda t: ByteDropout(self.dropout)(t, deterministic=not training)
        if self.prenorm:
            x = x + attn(nn.LayerNorm(epsilon=1e-5)(x), adj_mask, valid, training)
            x = x + drop(mlp(nn.LayerNorm(epsilon=1e-5)(x)))
        else:
            x = nn.LayerNorm(epsilon=1e-5)(x + attn(x, adj_mask, valid, training))
            x = nn.LayerNorm(epsilon=1e-5)(x + drop(mlp(x)))
        return x


class MaskedOnlyTransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    dim_feedforward: int
    nhead: int
    dropout: float
    prenorm: bool = False

    @nn.compact
    def __call__(self, x, adj_mask, valid, training: bool):
        for i in range(self.num_layers):
            x = MaskedBlock(
                self.d_model, self.dim_feedforward, self.nhead, self.dropout,
                self.prenorm, name=f"block_{i}",
            )(x, adj_mask, valid, training)
        return x
