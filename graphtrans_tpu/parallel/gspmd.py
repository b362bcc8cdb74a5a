"""GSPMD (jit + sharding-annotation) training path: DP x TP on one mesh.

Complements the shard_map DP path (parallel/dp.py): here the batch stays a
single logical array sharded over 'data', and transformer weight matrices are
sharded over 'model' (megatron-style: the FF up-projection and the fused QKV
projection split their OUTPUT feature dim; the FF down-projection and the
attention output projection split their INPUT dim, so the pair contracts to
one psum that XLA inserts automatically). Everything else — gradient
all-reduce over 'data', BatchNorm statistics (logically-global reductions),
segment ops over sharded edges — falls out of GSPMD's global-semantics
compilation; no hand-written collectives.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..trainers.base_trainer import apply_update


def transformer_param_spec(path_tuple, shape=None) -> P:
    """Sharding rule keyed on parameter path (megatron split for the
    attention/FF matmul pairs and the GIN/virtual-node d->2d->d MLPs;
    everything else replicated)."""
    keys = [getattr(k, "key", str(k)) for k in path_tuple]
    path = "/".join(str(k) for k in keys)
    leaf = keys[-1] if keys else ""
    if "MultiheadSelfAttention" in path:
        if leaf == "in_proj":
            return P(None, "model")
        if leaf == "in_proj_bias":
            return P("model")
        if leaf == "out_proj":
            return P("model", None)
    if "layer_" in path and "TDense_0" in path and leaf == "kernel":
        return P(None, "model")  # FF up-projection [d, ff]
    if "layer_" in path and "TDense_0" in path and leaf == "bias":
        return P("model")
    if "layer_" in path and "TDense_1" in path and leaf == "kernel":
        return P("model", None)  # FF down-projection [ff, d]
    # GIN conv MLPs and virtual-node MLPs are the same megatron pair shape
    # (Linear d->2d, Linear 2d->d); the BatchNorm between them keeps
    # per-feature statistics, which shard cleanly along 'model'. The shape
    # guard excludes GCN's square x-projection (also named TDense_0).
    in_mlp = "conv_" in path or "vn_mlp_" in path
    if in_mlp and leaf == "kernel" and shape is not None:
        if "TDense_0" in path and shape[1] == 2 * shape[0]:
            return P(None, "model")  # up-projection [d, 2d]
        if "TDense_1" in path and shape[0] == 2 * shape[1]:
            return P("model", None)  # down-projection [2d, d]
    if in_mlp and ("mlp_bn" in path or "MaskedBatchNorm_0" in path):
        return P("model")  # scale/bias over the sharded 2d features
    return P()


def shard_params(params, mesh: Mesh):
    def place(path, x):
        spec = transformer_param_spec(path, getattr(x, "shape", None))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_spec(batch, mesh: Mesh):
    """Shard every leading batch axis over 'data' (node/edge/graph arrays all
    divide evenly: capacities are bucketed in multiples of large powers of
    two)."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.shape["data"] == 0:
            return NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, batch)


def make_gspmd_train_step(trainer, model, calc_loss, tx, args,
                          gnn_subtree: str, mesh: Mesh) -> Callable:
    grad_fn = trainer.make_grad_fn(model, calc_loss, args)

    def train_step(state, batch, rng):
        grads, new_bs, loss = grad_fn(state, batch, rng)
        return apply_update(state, grads, new_bs, loss, tx, gnn_subtree)

    jitted = jax.jit(train_step)

    def run(state, batch, rng):
        # set_mesh makes bare-PartitionSpec sharding constraints (the model's
        # sequence-parallel annotations) resolve against this mesh
        with jax.sharding.set_mesh(mesh):
            return jitted(state, batch, rng)

    return run


def place_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_spec(batch, mesh))


def make_gspmd_eval_fn(model, mesh: Mesh) -> Callable:
    """Eval forward under the dp×tp mesh: batch sharded over 'data',
    megatron-sharded weights stay resident; returns host-friendly output."""
    from ..ops.plan_expand import expand_inline

    jitted = jax.jit(lambda params, batch_stats, batch: model.apply(
        {"params": params, "batch_stats": batch_stats},
        expand_inline(batch), None, False))

    def fwd(params, batch_stats, batch):
        with jax.sharding.set_mesh(mesh):
            return jitted(params, batch_stats, place_batch(batch, mesh))

    return fwd
