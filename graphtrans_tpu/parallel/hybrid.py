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
from .halo import build_halo_partition
from .mesh import make_mesh


def shard_batch_for_hybrid(batch: GraphBatch, n_shards: int,
                           halo_multiple: int = 8, edge_multiple: int = 8):
    """Split a padded batch into per-chip local views (stacked on a leading
    axis) + the halo partition. Node-level arrays shard into row blocks;
    edge-level arrays are re-laid-out per destination owner with sources
    remapped into [local | halo] rows; graph-level arrays replicate. The
    send-index table travels WITH the batch (halo_send_idx), so one compiled
    step serves every batch of the same (Es, H) bucket."""
    D = n_shards
    N = batch.node_feat.shape[0]
    part = build_halo_partition(batch.edge_src, batch.edge_dst,
                                batch.edge_mask, N, D,
                                halo_multiple=halo_multiple,
                                edge_multiple=edge_multiple)
    ns = part.nodes_per_shard
    Es = part.edge_src_local.shape[1]

    def shard_nodes(a):
        a = np.asarray(a)
        return a.reshape((D, ns) + a.shape[1:])

    def repl(a):
        a = np.asarray(a)
        return np.broadcast_to(a, (D,) + a.shape).copy()

    edge_attr = np.asarray(batch.edge_attr)[part.edge_perm]  # [D, Es, Fe]

    # GCN degree normalization is global — precompute host-side and lay out
    # per shard (deg(src)+1 semantics per /root/reference/modules/conv.py:57)
    src_np = np.asarray(batch.edge_src)
    mask_np = np.asarray(batch.edge_mask)
    deg = np.bincount(src_np[mask_np], minlength=N).astype(np.float32) + 1.0
    dis = deg ** -0.5
    norm_global = dis[src_np] * dis[np.asarray(batch.edge_dst)]
    edge_gcn_norm = (norm_global[part.edge_perm] * part.edge_mask).astype(np.float32)
    node_gcn_inv_deg = (1.0 / deg).reshape(D, ns).astype(np.float32)

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
        halo_send_idx=np.asarray(part.send_idx),
        edge_gcn_norm=edge_gcn_norm,
        node_gcn_inv_deg=node_gcn_inv_deg,
        max_nodes_dense=batch.max_nodes_dense,
    )
    return local, part


def make_hybrid_gnn_forward(gnn_module, part):
    """Returns fn(variables, local_batch_stacked, training=False) -> [N, out]
    — the GNN stack under shard_map with halo-exchange convs. `gnn_module`
    must be built with bn_axis_name='data' and graph_reduce_axis='data'."""
    import jax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import scatter

    D = part if isinstance(part, int) else part.n_shards
    mesh = make_mesh(dp=D)

    def body_eval(variables, stacked):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        send_idx = local.halo_send_idx
        with scatter.halo_context(send_idx, "data", send_idx.shape[-1]):
            out = gnn_module.apply(variables, local, None, False)
        return out[None]

    def body_train(variables, stacked, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        send_idx = local.halo_send_idx
        # per-shard dropout streams; BN stats psum via bn_axis_name
        local_rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        with scatter.halo_context(send_idx, "data", send_idx.shape[-1]):
            out, mut = gnn_module.apply(
                variables, local, None, True,
                rngs={"dropout": local_rng}, mutable=["batch_stats"],
            )
        return out[None], mut["batch_stats"]

    sharded_eval = shard_map(
        body_eval, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )
    sharded_train = shard_map(
        body_train, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P("data"), P()),  # synced BN stats are replicated
        check_rep=False,
    )

    def fn(variables, stacked, training: bool = False, rng=None):
        if training:
            out, new_bs = sharded_train(variables, stacked, rng)
            return out.reshape((-1,) + out.shape[2:]), new_bs
        out = sharded_eval(variables, stacked)
        return out.reshape((-1,) + out.shape[2:])

    return jax.jit(fn, static_argnums=(2,))


def make_hybrid_flagship_forward(model, part):
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

    D = part if isinstance(part, int) else part.n_shards
    mesh = make_mesh(dp=D)

    def body(variables, stacked):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        send_idx = local.halo_send_idx
        with scatter.halo_context(send_idx, "data", send_idx.shape[-1]), \
                dense_ops.dense_psum_context("data"):
            out = model.apply(variables, local, None, False)
        return out  # replicated logits [G, ...]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
        check_rep=False,
    )

    return jax.jit(lambda variables, stacked: sharded(variables, stacked))


def make_hybrid_train_step(model, calc_loss, tx, part,
                           gnn_subtree: str = "gnn_node",
                           donate: bool = True):
    """Full training step across the mesh: node-sharded GNN stage AND
    graph-sharded transformer stage.

    The dense packing reduce_scatters over the graph axis
    (ops/dense.dense_shard_context), so each chip runs the transformer,
    pooling, and head on only its own [G/D, S, d] graph block — 1/D the
    dense-stage compute/memory of the old psum-replicated layout. Each chip
    computes the GLOBAL-SUM-scaled local loss (local masked sum / psum'd
    global count); the per-chip losses sum to the exact global masked-mean
    loss, so EVERY gradient subtree combines with one psum — the node-sharded
    GNN contributions and the graph-sharded transformer contributions alike.
    A single rng is folded with the chip index for per-shard dropout
    streams; BN statistics psum via bn_axis_name as before."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import dense as dense_ops
    from ..ops import scatter
    from ..train import losses as loss_lib
    from ..trainers.base_trainer import apply_update

    D = part if isinstance(part, int) else part.n_shards
    mesh = make_mesh(dp=D)
    weight_fn = getattr(calc_loss, "weight_fn", loss_lib.graph_count_weight)

    def body(state, stacked, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], stacked)
        send_idx = local.halo_send_idx
        rng = jax.random.fold_in(rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        def loss_fn(params):
            with scatter.halo_context(send_idx, "data", send_idx.shape[-1]), \
                    dense_ops.dense_shard_context("data", D):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    local, None, True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                # this chip's graph block of the labels/masks
                view = dataclasses.replace(
                    local,
                    y=dense_ops.maybe_graph_shard(local.y),
                    y_arr=dense_ops.maybe_graph_shard(local.y_arr),
                    graph_mask=dense_ops.maybe_graph_shard(local.graph_mask),
                )
            w = weight_fn(view)
            denom = jnp.maximum(jax.lax.psum(w, "data"), 1.0)
            # local masked mean * local count / global count: the psum of
            # these per-chip terms IS the global masked mean
            return calc_loss(out, view) * w / denom, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        combined = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")
        return apply_update(state, combined, new_bs, loss, tx, gnn_subtree)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )

    return jax.jit(lambda state, stacked, rng: sharded(state, stacked, rng),
                   donate_argnums=(0,) if donate else ())
