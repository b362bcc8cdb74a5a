"""Data-parallel training over a device mesh via shard_map.

The host loader emits per-device sub-batches stacked on a leading axis
(GraphLoader(num_shards=D)); in_specs shard that axis over 'data'. Each chip
runs the trainer's grad_fn on its local sub-batch (local segment indices — no
cross-chip gathers in the GNN), then gradients and loss are pmean'd over ICI
and the (replicated) optimizer update is applied identically everywhere.

Masked BatchNorm is built with axis_name='data' (sync-BN: the batch statistics
psum over the mesh), so an N-chip step matches the single-chip step on the
same global batch up to float reassociation. Each shard's loss is a masked
MEAN, so the cross-shard reduction is the count-weighted mean
psum(loss*w)/psum(w) — with w the loss's own denominator (valid graphs, or
labeled entries for mol; losses.py weight_fn) — which equals the global
masked mean even when shards are unbalanced (epoch-tail padding, bucketed
chunk breaks). Gradients reduce with the same weights.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..train import losses
from ..trainers.base_trainer import apply_update
from .mesh import make_mesh


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def make_dp_body(trainer, model, calc_loss, tx, args, gnn_subtree: str):
    """The per-shard DP step body (runs inside shard_map over 'data'):
    local grads on the local sub-batch, count-weighted psum reduction,
    replicated optimizer update. Shared by the single-process DP path and
    the multi-host path (parallel/multihost.py) — the math is identical;
    only input assembly differs."""
    grad_fn = trainer.make_grad_fn(model, calc_loss, args)
    weight_fn = getattr(calc_loss, "weight_fn", losses.graph_count_weight)

    def body(state, sharded_batch, rng):
        batch = _squeeze0(sharded_batch)
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        grads, new_bs, loss = grad_fn(state, batch, local_rng)
        w = weight_fn(batch)
        denom = jnp.maximum(jax.lax.psum(w, "data"), 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * w, "data") / denom, grads)
        loss = jax.lax.psum(loss * w, "data") / denom
        # sync-BN (axis_name='data') already made new_bs identical on every
        # shard; no extra collective needed.
        return apply_update(state, grads, new_bs, loss, tx, gnn_subtree)

    return body


def make_dp_train_step(trainer, model, calc_loss, tx, args,
                       gnn_subtree: str, n_shards: int,
                       donate: bool = True) -> Callable:
    mesh = make_mesh(dp=n_shards)
    body = make_dp_body(trainer, model, calc_loss, tx, args, gnn_subtree)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_eval_fn(model, n_shards: int) -> Callable:
    mesh = make_mesh(dp=n_shards)

    def body(params, batch_stats, sharded_batch):
        from ..ops.plan_expand import expand_inline

        batch = expand_inline(_squeeze0(sharded_batch))
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch, None, False)
        return out[None]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    jitted = jax.jit(sharded)

    def fwd(params, batch_stats, batch):
        out = jitted(params, batch_stats, batch)
        # flatten device axis back into the graph axis for host-side eval
        return np.asarray(out).reshape((-1,) + out.shape[2:])

    return fwd
