"""Ragged <-> dense packing for the global-attention stage.

Equivalent of the reference's `pad_batch`/`unpad_batch`
(/root/reference/modules/utils.py:5-53) re-designed for XLA: a single static
scatter/gather driven by precomputed `node_pos` (see data/batch.py) instead of
a Python loop over graphs. Layout is batch-major [B, S, d] (TPU-friendly)
with valid nodes packed from column 0; the reference's front-padding +
CLS-at-end convention is replaced by back-padding + a dedicated CLS column,
which is semantically identical (same truncation to the LAST S nodes, same
set of valid key positions, same CLS readout) — documented deviation: node
*positions* differ, which only matters for the optional sinusoidal positional
encoding ablation (there we use 0-based positions, batch-independent, instead
of the reference's batch-composition-dependent front-pad offsets).
"""

from __future__ import annotations

import contextlib
import threading

import jax.numpy as jnp

_PSUM = threading.local()


@contextlib.contextmanager
def dense_psum_context(axis_name: str):
    """Trace-time routing for node-sharded execution (parallel/hybrid.py):
    each chip scatters only its local node rows, so the dense packing is a
    partial tensor — a psum over the mesh completes it (the transformer
    stage then runs on the full, replicated packing)."""
    _PSUM.axis = axis_name
    try:
        yield
    finally:
        _PSUM.axis = None


_SHARD = threading.local()


@contextlib.contextmanager
def dense_shard_context(axis_name: str, n_shards: int):
    """Graph-sharded dense stage (parallel/hybrid.py training): instead of
    psum-replicating the full [G,S,d] packing, a reduce_scatter over the
    graph axis leaves each chip exactly its own graph block — 1/D the
    transformer compute and memory per chip, and D× less collective traffic
    than the replicating psum. Downstream graph-level arrays must be sliced
    with maybe_graph_shard."""
    _SHARD.ctx = (axis_name, int(n_shards))
    try:
        yield
    finally:
        _SHARD.ctx = None


def _shard_ctx():
    return getattr(_SHARD, "ctx", None)


def graph_block_size(num_graphs: int, n_shards: int) -> int:
    return -(-num_graphs // n_shards)


def maybe_graph_shard(arr):
    """Under dense_shard_context: pad the leading (graph) axis to a multiple
    of the shard count and return this chip's block; identity otherwise.
    Padded slots are zeros (all-masked-out)."""
    ctx = _shard_ctx()
    if ctx is None:
        return arr
    import jax

    axis, D = ctx
    G = arr.shape[0]
    Gb = graph_block_size(G, D)
    pad = Gb * D - G
    if pad:
        arr = jnp.concatenate(
            [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)])
    t = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(arr, t * Gb, Gb, axis=0)


def nodes_to_dense(h_node, node_graph, node_pos, node_mask, num_graphs, max_len,
                   node_stride: int = 0):
    """Scatter flat node features [N, d] into dense [G, S, d] plus key mask.

    Nodes with node_pos == max_len (truncated) or node_mask == False land in a
    trash column that is sliced off. Returns (dense [G,S,d], valid [G,S] bool).

    Strided fast path: when the batch uses the dense node layout
    (node_stride == max_len, data/batch.py), the flat tensor IS the dense
    packing — a free reshape instead of a scatter (whose transpose would be
    a gather; fine — but the scatter itself serializes on TPU).
    """
    d = h_node.shape[-1]
    if node_stride > 0 and node_stride == max_len and _shard_ctx() is None:
        dense = h_node.reshape(num_graphs, node_stride, d)
        valid = node_mask.reshape(num_graphs, node_stride)
        return dense, valid
    pos = jnp.where(node_mask, node_pos, max_len)
    dense = jnp.zeros((num_graphs, max_len + 1, d), h_node.dtype)
    dense = dense.at[node_graph, pos].set(h_node, mode="drop")
    valid = jnp.zeros((num_graphs, max_len + 1), bool)
    valid = valid.at[node_graph, pos].set(node_mask, mode="drop")
    ctx = _shard_ctx()
    if ctx is not None:
        import jax

        axis, D = ctx
        Gb = graph_block_size(num_graphs, D)
        pad = Gb * D - num_graphs
        if pad:
            dense = jnp.pad(dense, ((0, pad), (0, 0), (0, 0)))
            valid = jnp.pad(valid, ((0, pad), (0, 0)))
        # reduce_scatter over the graph axis: each chip ends with its own
        # fully-summed [G/D, S, d] block
        dense = jax.lax.psum_scatter(dense, axis, scatter_dimension=0,
                                     tiled=True)
        valid = jax.lax.psum_scatter(valid.astype(jnp.float32), axis,
                                     scatter_dimension=0, tiled=True) > 0
        return dense[:, :max_len], valid[:, :max_len]
    axis = getattr(_PSUM, "axis", None)
    if axis is not None:
        import jax

        dense = jax.lax.psum(dense, axis)
        valid = jax.lax.psum(valid.astype(jnp.int32), axis) > 0
    return dense[:, :max_len], valid[:, :max_len]


def dense_to_nodes(dense, h_node_prev, node_graph, node_pos, node_mask, max_len):
    """Gather dense [G, S, d] back to flat nodes [N, d] (`unpad_batch`
    equivalent, /root/reference/modules/utils.py:32-53): truncated nodes keep
    their previous features."""
    gathered = dense[node_graph, jnp.minimum(node_pos, max_len - 1)]
    keep = node_mask & (node_pos < max_len)
    return jnp.where(keep[:, None], gathered, h_node_prev)
