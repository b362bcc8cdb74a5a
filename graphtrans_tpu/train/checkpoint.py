"""Checkpoint / resume.

Replaces torch.save state_dict blobs (/root/reference/main.py:249-260) with
host-gathered pytree pickles {params, batch_stats, opt_state, epoch,
scheduler state} written atomically (tmp + rename); per run-id directories
`<save_path>/<run_id>/{last,best}_model.ckpt`; auto-resume when the last
checkpoint exists (main.py:198-208). A separate pretrained-GNN partial
restore grafts only the gnn subtree (gnn_transformer.py:61-66,137-146).
Sharded TrainStates (GSPMD dp×tp) round-trip through the same path: leaves
are gathered to host numpy on save and re-placed by jit on the first step
after restore."""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, epoch: int, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(state, blob: dict):
    """Restore a TrainState from a checkpoint blob, keeping pytree structure
    (shapes must match — same model/config)."""
    import jax.numpy as jnp

    def graft(new, old):
        return jax.tree_util.tree_map(lambda o, n: jnp.asarray(n, o.dtype) if hasattr(o, "dtype") else n, old, new)

    return state.replace(
        params=graft(blob["params"], state.params),
        batch_stats=graft(blob["batch_stats"], state.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda o, n: jnp.asarray(n, getattr(o, "dtype", None)) if hasattr(o, "dtype") else n,
            state.opt_state, blob["opt_state"],
        ),
        step=jnp.asarray(blob["step"], jnp.int32),
    )


def restore_params(blob: dict, params: Any, batch_stats: Any):
    """Restore only params + batch_stats (inference: optimizer state not
    needed, so the checkpoint's opt_state shape is irrelevant)."""
    import jax.numpy as jnp

    def graft(old, new):
        return jax.tree_util.tree_map(
            lambda o, n: jnp.asarray(n, o.dtype) if hasattr(o, "dtype") else n,
            old, new,
        )

    return graft(params, blob["params"]), graft(batch_stats, blob["batch_stats"])


def load_pretrained_gnn(params: Any, path: str, subtree: str = "gnn_node") -> Any:
    """Graft the `subtree` params from a saved checkpoint into fresh params
    (--pretrained_gnn feature)."""
    blob = load_checkpoint(path)
    if blob is None:
        raise FileNotFoundError(path)
    src = blob["params"]
    if subtree in src:
        src_sub = src[subtree]
    else:
        raise KeyError(f"checkpoint has no '{subtree}' subtree")
    import jax.numpy as jnp

    grafted = jax.tree_util.tree_map(
        lambda o, n: jnp.asarray(n, o.dtype), params[subtree], src_sub
    )
    return {**params, subtree: grafted}
