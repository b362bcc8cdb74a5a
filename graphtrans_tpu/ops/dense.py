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


def nodes_to_dense(h_node, node_graph, node_pos, node_mask, num_graphs, max_len):
    """Scatter flat node features [N, d] into dense [G, S, d] plus key mask.

    Nodes with node_pos == max_len (truncated) or node_mask == False land in a
    trash column that is sliced off. Returns (dense [G,S,d], valid [G,S] bool).
    """
    d = h_node.shape[-1]
    pos = jnp.where(node_mask, node_pos, max_len)
    dense = jnp.zeros((num_graphs, max_len + 1, d), h_node.dtype)
    dense = dense.at[node_graph, pos].set(h_node, mode="drop")
    valid = jnp.zeros((num_graphs, max_len + 1), bool)
    valid = valid.at[node_graph, pos].set(node_mask, mode="drop")
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
