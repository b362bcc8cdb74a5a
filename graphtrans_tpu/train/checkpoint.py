"""Checkpoint / resume.

Replaces torch.save state_dict blobs (/root/reference/main.py:249-260) with
host-gathered pytree checkpoints {params, batch_stats, opt_state, epoch,
scheduler state}; per run-id directories
`<save_path>/<run_id>/{last,best}_model.ckpt`; auto-resume when the last
checkpoint exists (main.py:198-208). Two backends:
  - pickle (default): one atomic file (tmp + rename).
  - orbax (--ckpt_backend orbax): ASYNC array writes via
    orbax.checkpoint.AsyncCheckpointer (training continues while IO
    lands) plus a tiny synchronous structure sidecar, auto-detected on
    load.
A separate pretrained-GNN partial restore grafts only the gnn subtree
(gnn_transformer.py:61-66,137-146). Sharded TrainStates (GSPMD dp×tp)
round-trip through the same path: leaves are gathered to host numpy on
save and re-placed by jit on the first step after restore."""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_ORBAX = {"ckptr": None}


def _orbax_ckptr():
    import orbax.checkpoint as ocp

    if _ORBAX["ckptr"] is None:
        _ORBAX["ckptr"] = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ORBAX["ckptr"]


def wait_for_async():
    """Block until any in-flight orbax save lands (call before exit)."""
    if _ORBAX["ckptr"] is not None:
        _ORBAX["ckptr"].wait_until_finished()


def save_checkpoint(path: str, state, epoch: int, extra: Optional[dict] = None,
                    backend: str = "pickle"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blob = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    if backend == "orbax":
        # async orbax write of the array leaves (training continues while
        # the heavy IO lands); the pytree STRUCTURE (treedefs, scalars,
        # scheduler state) goes into a tiny synchronous sidecar so tuples
        # vs lists survive the round trip exactly. Each save is a NEW
        # generation directory `<path>.orbax.<step>` — the previous
        # generation stays durable until the next save confirms this one
        # finished, so a crash mid-write never loses both.
        import orbax.checkpoint as ocp

        arrays = {k: blob[k] for k in ("params", "batch_stats", "opt_state")}
        leaves, treedef = jax.tree_util.tree_flatten(arrays)
        meta = {"treedef": treedef, "step": blob["step"],
                "epoch": blob["epoch"], "extra": blob["extra"]}
        ck = _orbax_ckptr()
        ck.wait_until_finished()  # previous generation is durable now
        _gc_orbax(path, keep=1)
        gen = os.path.abspath(path) + f".orbax.{blob['step']:012d}"
        tmp = gen + ".meta.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(meta, f)
        os.replace(tmp, gen + ".meta")
        ck.save(gen, args=ocp.args.PyTreeSave(
                    {f"leaf_{i:04d}": v for i, v in enumerate(leaves)}),
                force=True)
        return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, path)


def _orbax_generations(path: str):
    import glob as _glob

    metas = sorted(_glob.glob(_glob.escape(os.path.abspath(path))
                              + ".orbax.*.meta"), reverse=True)
    return [m[: -len(".meta")] for m in metas]


def _gc_orbax(path: str, keep: int = 1):
    """Remove all but the newest `keep` VALID generations. Validity = the
    array directory exists: a crash between the meta write and the async
    array save leaves an orphan meta, which must never count toward `keep`
    (else GC would delete the only restorable checkpoint)."""
    import shutil

    kept = 0
    for gen in _orbax_generations(path):
        if os.path.isdir(gen) and kept < keep:
            kept += 1
            continue
        shutil.rmtree(gen, ignore_errors=True)
        try:
            os.remove(gen + ".meta")
        except OSError:
            pass


def load_checkpoint(path: str) -> Optional[dict]:
    pickle_mtime = os.path.getmtime(path) if os.path.exists(path) else -1.0
    for gen in _orbax_generations(path):
        if not os.path.isdir(gen):
            continue
        if pickle_mtime > os.path.getmtime(gen + ".meta"):
            break  # a newer pickle checkpoint supersedes the orbax ones
        try:
            with open(gen + ".meta", "rb") as f:
                meta = pickle.load(f)
            ck = _orbax_ckptr()
            ck.wait_until_finished()
            stored = ck.restore(gen)
            # numeric sort: lexicographic key order would scramble trees
            # with >= 10^4 leaves
            leaves = [stored[k] for k in
                      sorted(stored, key=lambda k: int(k.rsplit("_", 1)[1]))]
            arrays = jax.tree_util.tree_unflatten(meta["treedef"], leaves)
            return {**arrays, "step": meta["step"], "epoch": meta["epoch"],
                    "extra": meta["extra"]}
        except Exception:
            continue  # partial generation (crash mid-save): try the older one
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
