"""Masked segment reductions — the XLA reference path for all graph scatter ops.

These cover what the reference delegates to torch-scatter / PyG
``MessagePassing.propagate`` (/root/reference/modules/conv.py:10-71,
/root/reference/modules/pna/aggregators.py:11-44): gather source-node features
along edges, apply a message function, and segment-reduce onto destination
nodes. Edges arrive dst-sorted (see data/batch.py), which XLA's scatter-add
handles well on TPU; a fused Pallas kernel (ops/pallas/) shadows these for the
hot path and is parity-tested against them.

All functions take explicit masks so padded slots never pollute valid rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments, mask=None):
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, mask=None):
    s = segment_sum(data, segment_ids, num_segments, mask)
    if mask is None:
        cnt = jax.ops.segment_sum(
            jnp.ones(data.shape[0], data.dtype), segment_ids, num_segments=num_segments
        )
    else:
        cnt = jax.ops.segment_sum(
            mask.astype(data.dtype), segment_ids, num_segments=num_segments
        )
    cnt = jnp.maximum(cnt, 1)
    return s / _expand_to(cnt, s)


def segment_max(data, segment_ids, num_segments, mask=None, initial=None):
    """Masked segment max. Empty/masked segments produce 0 (matching
    torch_scatter's zero-init behavior used by PyG global_max_pool on empty
    segments is undefined; we clamp padded contributions to -inf then replace
    empty-segment results with `initial` (default 0))."""
    neg = jnp.finfo(data.dtype).min if jnp.issubdtype(data.dtype, jnp.floating) else jnp.iinfo(data.dtype).min
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, neg)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    fill = 0 if initial is None else initial
    # empty segments come back as the reduction identity (-inf), fully-masked
    # segments as the sentinel — replace both (inf would NaN the backward
    # pass through downstream multiplications)
    return jnp.where((out == neg) | ~jnp.isfinite(out), fill, out)


def segment_min(data, segment_ids, num_segments, mask=None, initial=None):
    pos = jnp.finfo(data.dtype).max if jnp.issubdtype(data.dtype, jnp.floating) else jnp.iinfo(data.dtype).max
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, pos)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    fill = 0 if initial is None else initial
    return jnp.where((out == pos) | ~jnp.isfinite(out), fill, out)


def segment_count(segment_ids, num_segments, mask=None, dtype=jnp.float32):
    ones = jnp.ones(segment_ids.shape[0], dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_softmax(logits, segment_ids, num_segments, mask=None):
    """Numerically-stable softmax within each segment (for attention pooling,
    reference PyG GlobalAttention gate normalization)."""
    m = segment_max(logits, segment_ids, num_segments, mask=mask, initial=0.0)
    shifted = logits - m[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(_expand(mask, e), e, 0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[segment_ids]


def segment_multi_aggregate(data, segment_ids, num_segments, mask=None):
    """Fused multi-aggregator pass for PNA: returns dict of
    mean/max/min/std in one traversal of the edge data (the reference issues
    four separate torch_scatter calls, /root/reference/modules/pna/aggregators.py).
    std follows the reference: sqrt(relu(E[x^2]-E[x]^2)+1e-5)."""
    mean = segment_mean(data, segment_ids, num_segments, mask)
    mean_sq = segment_mean(data * data, segment_ids, num_segments, mask)
    var = jax.nn.relu(mean_sq - mean * mean)
    std = jnp.sqrt(var + 1e-5)
    mx = segment_max(data, segment_ids, num_segments, mask)
    mn = segment_min(data, segment_ids, num_segments, mask)
    return {"mean": mean, "max": mx, "min": mn, "std": std, "sum": None, "var": var}


def in_degree(edge_dst, num_nodes, edge_mask=None, dtype=jnp.float32):
    """Number of incoming edges per node (PyG `degree(col)` equivalent)."""
    return segment_count(edge_dst, num_nodes, mask=edge_mask, dtype=dtype)


def out_degree(edge_src, num_nodes, edge_mask=None, dtype=jnp.float32):
    """Number of outgoing edges per node. The reference GCN computes its
    normalization from the ROW (source) index +1 (/root/reference/modules/conv.py:57)."""
    return segment_count(edge_src, num_nodes, mask=edge_mask, dtype=dtype)


def _expand(mask, data):
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def _expand_to(vec, data):
    return vec.reshape(vec.shape + (1,) * (data.ndim - vec.ndim))
