"""Hybrid node-sharded GNN execution.

Runs the UNMODIFIED GNNNodeEmbedding stack (GIN ± virtual node, masked BN,
JK) with node features sharded across the mesh: each chip owns a contiguous
node-row block and the edges whose destination it owns; every conv layer
fetches its boundary (halo) sources with one all_to_all
(ops/scatter.halo_context), BatchNorm statistics psum over the mesh
(bn_axis_name), and virtual-node per-graph sums psum partial contributions
(graph_reduce_axis). The host-side partition comes from
parallel/halo.build_halo_partition.

This covers the compute-heavy message-passing stage of the flagship model
for batches whose node/edge sets exceed one chip; the dense transformer
stage consumes the resharded output (all-gather or graph-sharded — see
parallel/gspmd.py). GCN hybrid (degree normalization needs global degrees)
is a follow-up.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..data.batch import GraphBatch
from .halo import HaloPartition, build_halo_partition
from .mesh import make_mesh


def shard_batch_for_hybrid(batch: GraphBatch, n_shards: int):
    """Split a padded batch into per-chip local views (stacked on a leading
    axis) + the halo partition. Node-level arrays shard into row blocks;
    edge-level arrays are re-laid-out per destination owner with sources
    remapped into [local | halo] rows; graph-level arrays replicate."""
    D = n_shards
    N = batch.node_feat.shape[0]
    part = build_halo_partition(batch.edge_src, batch.edge_dst,
                                batch.edge_mask, N, D)
    ns = part.nodes_per_shard
    Es = part.edge_src_local.shape[1]

    def shard_nodes(a):
        a = np.asarray(a)
        return a.reshape((D, ns) + a.shape[1:])

    def repl(a):
        a = np.asarray(a)
        return np.broadcast_to(a, (D,) + a.shape).copy()

    edge_attr = np.asarray(batch.edge_attr)[part.edge_perm]  # [D, Es, Fe]
    local = GraphBatch(
        node_feat=shard_nodes(batch.node_feat),
        node_graph=shard_nodes(batch.node_graph),
        node_pos=shard_nodes(batch.node_pos),
        node_mask=shard_nodes(batch.node_mask),
        node_depth=shard_nodes(batch.node_depth),
        edge_src=part.edge_src_local.astype(np.int32),
        edge_dst=part.edge_dst_local.astype(np.int32),
        edge_attr=edge_attr,
        edge_mask=part.edge_mask,
        graph_mask=repl(batch.graph_mask),
        num_nodes=repl(batch.num_nodes),
        y=repl(batch.y),
        y_arr=repl(batch.y_arr),
        dense_adj=None,
        graph_ids=repl(batch.graph_ids),
        max_nodes_dense=batch.max_nodes_dense,
    )
    return local, part


def make_hybrid_gnn_forward(gnn_module, part: HaloPartition):
    """Returns fn(variables, local_batch_stacked, training=False) -> [N, out]
    — the GNN stack under shard_map with halo-exchange convs. `gnn_module`
    must be built with bn_axis_name='data' and graph_reduce_axis='data'."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import scatter

    D = part.n_shards
    mesh = make_mesh(dp=D)
    send_idx_all = np.asarray(part.send_idx)  # [D, D, H]

    def body_eval(variables, stacked, send_idx):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        with scatter.halo_context(send_idx[0], "data", part.halo_cap):
            out = gnn_module.apply(variables, local, None, False)
        return out[None]

    def body_train(variables, stacked, send_idx, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        # per-shard dropout streams; BN stats psum via bn_axis_name
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        with scatter.halo_context(send_idx[0], "data", part.halo_cap):
            out, mut = gnn_module.apply(
                variables, local, None, True,
                rngs={"dropout": local_rng}, mutable=["batch_stats"],
            )
        return out[None], mut["batch_stats"]

    sharded_eval = shard_map(
        body_eval, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    sharded_train = shard_map(
        body_train, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P("data"), P()),  # synced BN stats are replicated
        check_rep=False,
    )

    def fn(variables, stacked, training: bool = False, rng=None):
        import jax.numpy as jnp

        if training:
            out, new_bs = sharded_train(variables, stacked,
                                        jnp.asarray(send_idx_all), rng)
            return out.reshape((-1,) + out.shape[2:]), new_bs
        out = sharded_eval(variables, stacked, jnp.asarray(send_idx_all))
        return out.reshape((-1,) + out.shape[2:])

    return jax.jit(fn, static_argnums=(2,))


def make_hybrid_flagship_forward(model, part: HaloPartition):
    """Full GraphTrans forward across the mesh: node-sharded GNN stage (halo
    convs, psum BN/VN) whose dense packing psums into the replicated
    transformer stage. `model` must be built with bn_axis_name='data' and
    graph_reduce_axis='data'. Eval-mode forward (inference / eval loops);
    hybrid training integration is the follow-up."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import dense as dense_ops
    from ..ops import scatter

    D = part.n_shards
    mesh = make_mesh(dp=D)
    send_idx_all = np.asarray(part.send_idx)

    def body(variables, stacked, send_idx):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        with scatter.halo_context(send_idx[0], "data", part.halo_cap), \
                dense_ops.dense_psum_context("data"):
            out = model.apply(variables, local, None, False)
        return out  # replicated logits [G, ...]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_rep=False,
    )

    def fn(variables, stacked):
        import jax.numpy as jnp

        return sharded(variables, stacked, jnp.asarray(send_idx_all))

    return jax.jit(fn)


def make_hybrid_train_step(model, calc_loss, tx, part: HaloPartition,
                           gnn_subtree: str = "gnn_node",
                           donate: bool = True):
    """Full training step across the mesh with the node-sharded GNN stage.

    Gradient combination: the GNN subtree's compute is sharded, so each chip
    holds only its nodes' contributions -> psum; the transformer/head stages
    run replicated (identical on every chip after the dense-packing psum) ->
    pmean (identity up to float drift). A single rng keeps the replicated
    stages' dropout identical across chips (the GNN stage then reuses the
    same per-row pattern on each shard — different data, acceptable)."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import dense as dense_ops
    from ..ops import scatter
    from ..trainers.base_trainer import apply_update

    D = part.n_shards
    mesh = make_mesh(dp=D)
    send_idx_all = np.asarray(part.send_idx)

    def body(state, stacked, send_idx, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            with scatter.halo_context(send_idx[0], "data", part.halo_cap), \
                    dense_ops.dense_psum_context("data"):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    local, None, True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
            return calc_loss(out, local), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        combined = {
            k: (jax.lax.psum(v, "data") if k == gnn_subtree
                else jax.lax.pmean(v, "data"))
            for k, v in grads.items()
        }
        return apply_update(state, combined, new_bs, loss, tx, gnn_subtree)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )

    def fn(state, stacked, rng):
        import jax.numpy as jnp

        return sharded(state, stacked, jnp.asarray(send_idx_all), rng)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
