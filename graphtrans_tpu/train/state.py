"""Train state pytree: params + BN running stats + optimizer state + step,
plus a traced freeze flag implementing the reference's epoch_callback GNN
freezing (/root/reference/models/gnn_transformer.py:130-135) without
recompilation: when `freeze_gnn_active` is set the update leaves under the
model's gnn subtree are zeroed (torch semantics: requires_grad=False params
receive no update at all)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    freeze_gnn_active: jnp.ndarray  # bool scalar

    @classmethod
    def create(cls, params, batch_stats, opt_state):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            freeze_gnn_active=jnp.zeros((), bool),
        )


def zero_subtree_where(flag, updates, subtree_key: str):
    """Multiply updates under params[subtree_key] by 0 when flag is set."""
    import jax

    if subtree_key not in updates:
        return updates
    scale = jnp.where(flag, 0.0, 1.0)
    frozen = jax.tree_util.tree_map(lambda u: u * scale, updates[subtree_key])
    return {**updates, subtree_key: frozen}


def keep_subtree_where(flag, new_tree, old_tree, subtree_key: str):
    """Select old_tree's leaves wherever the tree path contains subtree_key
    and flag is set. Used to pin the frozen GNN's optimizer moments in place
    (torch requires_grad=False: Adam state for frozen params does not advance
    at all)."""
    import jax

    def sel(path, n, o):
        keys = {getattr(k, "key", None) for k in path}
        if subtree_key in keys and hasattr(n, "shape"):
            return jnp.where(flag, o, n)
        return n

    return jax.tree_util.tree_map_with_path(sel, new_tree, old_tree)
