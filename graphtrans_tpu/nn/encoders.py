"""Node / edge feature encoders.

TPU-native re-implementations of the encoder zoo the reference wires per
dataset (/root/reference/dataset/{code,mol,tud}.py):
  - AtomEncoder / BondEncoder: OGB molecule categorical embeddings
    (sum of one embedding table per feature column, xavier-uniform init —
    mirrors ogb.graphproppred.mol_encoder).
  - ASTNodeEncoder: type + attribute + clamped-depth embeddings
    (/root/reference/dataset/utils.py:8-30).
  - LinearNodeEncoder: TU datasets (/root/reference/dataset/tud.py:65).
  - LinearEdgeEncoder: code2's 2-dim augmented edge attrs
    (/root/reference/dataset/code.py:117).
  - ZeroEdgeEncoder: TU datasets have no edge features
    (/root/reference/dataset/tud.py:67-71).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import TDense, normal, xavier_uniform


def embed_lookup(tbl, idx):
    """Embedding lookup whose BACKWARD is a matmul, not a scatter.

    On TPU, autodiff of `tbl[idx]` transposes to a scatter-add into the
    table, which XLA lowers to a serialized per-row update — measured as a
    dominant cost at batch scale. For small vocabularies the standard
    TPU-native formulation is a one-hot matmul: forward is
    one_hot(idx) @ tbl on the MXU (one-hot entries are exact in any dtype),
    and the transpose is one_hot^T @ grad — another matmul. Large tables
    (code2's 10k-attr vocab) keep the take path, where the one-hot would
    dominate.
    """
    n = tbl.shape[0]
    if n > 512:
        return tbl[idx]
    flat = idx.reshape(-1)
    oh = jax.nn.one_hot(flat, n, dtype=tbl.dtype)
    # HIGHEST keeps the selection exact on TPU (one-hot rows are exact in
    # any dtype; the table operand's pass-splitting reconstructs full f32)
    out = jax.lax.dot_general(oh, tbl, (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + (tbl.shape[1],))

# OGB molecule categorical feature cardinalities
# (ogb.utils.features.get_atom_feature_dims / get_bond_feature_dims).
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)


class AtomEncoder(nn.Module):
    emb_dim: int
    feature_dims: Sequence[int] = ATOM_FEATURE_DIMS

    @nn.compact
    def __call__(self, x):  # x: [N, F] int
        out = 0
        for i, n in enumerate(self.feature_dims[: x.shape[-1]]):
            tbl = self.param(f"emb_{i}", xavier_uniform(), (n, self.emb_dim))
            out = out + embed_lookup(tbl, jnp.clip(x[..., i].astype(jnp.int32), 0, n - 1))
        return out


class BondEncoder(nn.Module):
    emb_dim: int
    feature_dims: Sequence[int] = BOND_FEATURE_DIMS
    # the fused dense-aggregation kernel (ops/pallas/gin_agg.py) can consume
    # this encoder's tables directly via __call__(e, concat_tables=True)
    supports_concat_tables = True

    @nn.compact
    def __call__(self, e, concat_tables: bool = False):
        """e: [..., F] int. Default: summed per-feature embeddings [..., d].
        concat_tables=True: return (concatenated tables [sum(dims[:F]), d],
        dims tuple) for in-kernel lookup — same params, same creation order,
        so the variable tree is identical either way."""
        dims = tuple(self.feature_dims[: e.shape[-1]])
        tbls = [self.param(f"emb_{i}", xavier_uniform(), (n, self.emb_dim))
                for i, n in enumerate(dims)]
        if concat_tables:
            return jnp.concatenate(tbls, axis=0), dims
        out = 0
        for i, n in enumerate(dims):
            out = out + embed_lookup(
                tbls[i], jnp.clip(e[..., i].astype(jnp.int32), 0, n - 1))
        return out


class ASTNodeEncoder(nn.Module):
    """emb = type_emb(x[:,0]) + attr_emb(x[:,1]) + depth_emb(min(depth, max_depth))."""

    emb_dim: int
    num_nodetypes: int
    num_nodeattributes: int
    max_depth: int = 20
    takes_depth: bool = True

    @nn.compact
    def __call__(self, x, depth):
        type_tbl = self.param("type_emb", normal(1.0), (self.num_nodetypes, self.emb_dim))
        attr_tbl = self.param(
            "attr_emb", normal(1.0), (self.num_nodeattributes, self.emb_dim)
        )
        depth_tbl = self.param("depth_emb", normal(1.0), (self.max_depth + 1, self.emb_dim))
        xi = x.astype(jnp.int32)
        d = jnp.clip(depth.astype(jnp.int32), 0, self.max_depth)
        return (embed_lookup(type_tbl, xi[..., 0])
                + embed_lookup(attr_tbl, xi[..., 1])
                + embed_lookup(depth_tbl, d))


class LinearNodeEncoder(nn.Module):
    emb_dim: int

    @nn.compact
    def __call__(self, x):
        return TDense(self.emb_dim)(x.astype(jnp.float32))


class LinearEdgeEncoder(nn.Module):
    emb_dim: int

    @nn.compact
    def __call__(self, e):
        return TDense(self.emb_dim)(e.astype(jnp.float32))


class ZeroEdgeEncoder(nn.Module):
    """Edge "encoder" for datasets without edge features: contributes 0, so
    messages reduce to relu(x_j) exactly as in the reference TU path."""

    emb_dim: int

    @nn.compact
    def __call__(self, e):
        return jnp.zeros(e.shape[:-1] + (self.emb_dim,), jnp.float32)
