"""Multi-chip-without-a-cluster tests: 8 virtual CPU devices (conftest).
Asserts the shard_map data-parallel step matches the single-device step on
the same global batch (sync-BN + pmean grads => identical math up to float
reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.synthetic import make_tu_dataset
from graphtrans_tpu.models import MODELS
from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
from graphtrans_tpu.parallel.dp import make_dp_eval_fn, make_dp_train_step
from graphtrans_tpu.train import losses
from graphtrans_tpu.train.optim import build_optimizer
from graphtrans_tpu.train.state import TrainState
from graphtrans_tpu.trainers import TRAINER_REGISTRY
from tests.test_models import default_args


def _stack(batches):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *batches)


def test_dp_step_matches_single_device(rng):
    graphs = make_tu_dataset(num_graphs=32, seed=5)
    caps = (512, 2048)
    shard_batches = [
        collate(graphs[:16], 17, caps[0], caps[1]),
        collate(graphs[16:], 17, caps[0], caps[1]),
    ]
    stacked = _stack(shard_batches)
    global_batch = collate(graphs, 34, 2 * caps[0], 2 * caps[1])

    args = default_args(gnn_dropout=0.0, transformer_dropout=0.0,
                        weight_decay=0.0)
    model_cls = MODELS["gnn-transformer"]

    args.bn_axis_name = None
    model_single = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    args.bn_axis_name = "data"
    model_dp = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)

    variables = model_single.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        shard_batches[0], None, False,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx, _ = build_optimizer(args, 10)
    trainer = TRAINER_REGISTRY["baseline"]

    step_single = trainer.make_train_step(model_single, losses.classification_loss,
                                          tx, args, donate=False)
    step_dp = make_dp_train_step(trainer, model_dp, losses.classification_loss,
                                 tx, args, "gnn_node", 2, donate=False)

    s0 = TrainState.create(params, bs, tx.init(params))
    s_single, loss_single = step_single(s0, global_batch, jax.random.key(9))
    s_dp, loss_dp = step_dp(
        TrainState.create(params, bs, tx.init(params)), stacked, jax.random.key(9)
    )

    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-4)
    # compare gradients directly: pmean-of-shard-grads must equal the
    # global-batch gradient (up to float reassociation)
    grad_single = trainer.make_grad_fn(model_single, losses.classification_loss, args)
    g_ref, _, _ = jax.jit(grad_single)(s0, global_batch, jax.random.key(9))

    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from graphtrans_tpu.parallel.mesh import make_mesh

    grad_dp_inner = trainer.make_grad_fn(model_dp, losses.classification_loss, args)

    def dp_grads(state, sb, rng):
        b = jax.tree_util.tree_map(lambda x: x[0], sb)
        g, _, _ = grad_dp_inner(state, b, rng)
        return jax.lax.pmean(g, "data")

    g_dp = jax.jit(shard_map(
        dp_grads, mesh=make_mesh(dp=2), in_specs=(P(), P("data"), P()),
        out_specs=P(), check_rep=False,
    ))(s0, stacked, jax.random.key(9))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6)

    # post-Adam params: the first Adam step is sign-normalized (g/|g|), so a
    # near-zero grad element can legitimately flip under reassociation; bound
    # the deviation by one full step (2*lr) instead of elementwise closeness
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) <= 2 * args.lr + 1e-6
    # sync-BN running stats match global-batch stats
    for a, b in zip(jax.tree_util.tree_leaves(s_single.batch_stats),
                    jax.tree_util.tree_leaves(s_dp.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_dp_eval_matches_single(rng):
    graphs = make_tu_dataset(num_graphs=32, seed=6)
    caps = (512, 2048)
    shard_batches = [
        collate(graphs[:16], 17, caps[0], caps[1]),
        collate(graphs[16:], 17, caps[0], caps[1]),
    ]
    stacked = _stack(shard_batches)
    args = default_args(gnn_dropout=0.0, transformer_dropout=0.0)
    model_cls = MODELS["gnn-transformer"]
    args.bn_axis_name = "data"
    model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        shard_batches[0], None, False,
    )
    fwd = make_dp_eval_fn(model, 2)
    out = fwd(variables["params"], variables.get("batch_stats", {}), stacked)
    assert out.shape == (34, 2)
    ref0 = model.apply(variables, shard_batches[0], None, False)
    np.testing.assert_allclose(out[:17], np.asarray(ref0), rtol=1e-5, atol=1e-6)


def test_edge_parallel_spmm_matches_single(rng):
    from graphtrans_tpu.ops import scatter
    from graphtrans_tpu.parallel.edge_parallel import make_edge_parallel_spmm

    N, E, d = 256, 1024, 64
    x = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((E, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    dst = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    mask = jnp.asarray(rng.random(E) > 0.2)
    w = jnp.asarray(rng.standard_normal(E).astype(np.float32))

    ref = scatter.gather_message_scatter(x, emb, src, dst, mask, N,
                                         edge_weight=w)
    for shards in (2, 4, 8):
        fn = make_edge_parallel_spmm(shards)
        got = fn(x, emb, src, dst, mask, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_gspmd_dp_tp_step(rng):
    """GSPMD path: batch sharded over 'data', transformer weights
    megatron-sharded over 'model' on a 4x2 mesh; one train step matches the
    unsharded step."""
    from graphtrans_tpu.parallel import gspmd
    from graphtrans_tpu.parallel.mesh import make_mesh

    graphs = make_tu_dataset(num_graphs=32, seed=7)
    batch = collate(graphs, 33, 1024, 4096)
    # gin + virtual so the megatron rules for the conv/VN d->2d->d MLPs
    # engage alongside the transformer pair
    args = default_args(gnn_dropout=0.0, transformer_dropout=0.0,
                        weight_decay=0.0, gnn_type="gin",
                        gnn_virtual_node=True)
    args.bn_axis_name = None
    model = MODELS["gnn-transformer"].build(2, args, LinearNodeEncoder(16),
                                            ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx, _ = build_optimizer(args, 10)
    trainer = TRAINER_REGISTRY["baseline"]

    step_ref = trainer.make_train_step(model, losses.classification_loss, tx,
                                       args, donate=False)
    s_ref, loss_ref = step_ref(TrainState.create(params, bs, tx.init(params)),
                               batch, jax.random.key(9))

    mesh = make_mesh(dp=4, tp=2)
    sharded_params = gspmd.shard_params(params, mesh)
    # at least one transformer kernel must actually be sharded over 'model'
    specs = jax.tree_util.tree_map(lambda x: x.sharding.spec, sharded_params)
    flat = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, type(jax.sharding.PartitionSpec())))
    assert any("model" in str(s) for s in flat)
    conv_specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding.spec,
                               sharded_params["gnn_node"]),
        is_leaf=lambda s: isinstance(s, type(jax.sharding.PartitionSpec())))
    assert any("model" in str(s) for s in conv_specs), "GIN MLPs not sharded"

    step = gspmd.make_gspmd_train_step(trainer, model,
                                       losses.classification_loss, tx, args,
                                       "gnn_node", mesh)
    sb = gspmd.place_batch(batch, mesh)
    state = TrainState.create(sharded_params, bs, tx.init(sharded_params))
    s_new, loss = step(state, sb, jax.random.key(9))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_new.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) <= 2 * args.lr + 1e-6


def test_gspmd_sequence_parallel(rng):
    """sp: dense transformer activations sharded along the node/sequence axis
    over 'model'; output must match the unsharded forward."""
    from graphtrans_tpu.parallel import gspmd
    from graphtrans_tpu.parallel.mesh import make_mesh

    graphs = make_tu_dataset(num_graphs=16, min_nodes=20, max_nodes=40, seed=8)
    batch = collate(graphs, 17, 1024, 4096)
    base = default_args(gnn_dropout=0.0, transformer_dropout=0.0)
    base.bn_axis_name = None
    model_plain = MODELS["gnn-transformer"].build(2, base, LinearNodeEncoder(16),
                                                  ZeroEdgeEncoder)
    variables = model_plain.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = model_plain.apply(variables, batch, None, False)

    sp = default_args(gnn_dropout=0.0, transformer_dropout=0.0)
    sp.bn_axis_name = None
    sp.sp_axis = "model"
    model_sp = MODELS["gnn-transformer"].build(2, sp, LinearNodeEncoder(16),
                                               ZeroEdgeEncoder)
    mesh = make_mesh(dp=2, tp=4)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda v, b: model_sp.apply(v, b, None, False))(
            variables, gspmd.place_batch(batch, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_halo_partition_spmm_matches_single(rng):
    """Node-partitioned SpMM with all_to_all halo exchange == single-chip
    reduction; halo volume stays far below full replication."""
    from graphtrans_tpu.ops import scatter
    from graphtrans_tpu.parallel.halo import build_halo_partition, make_halo_spmm

    # batched-graph-like edge structure: mostly local with some cross links
    N, d = 512, 64
    E = 2048
    src = rng.integers(0, N, size=E)
    # bias edges towards locality (same 64-node neighborhood)
    local_dst = np.clip(src + rng.integers(-32, 32, size=E), 0, N - 1)
    far_dst = rng.integers(0, N, size=E)
    use_far = rng.random(E) < 0.1
    dst = np.where(use_far, far_dst, local_dst)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order].astype(np.int32), dst[order].astype(np.int32)
    mask = rng.random(E) > 0.15
    emb = rng.standard_normal((E, d)).astype(np.float32)
    w = rng.standard_normal(E).astype(np.float32)
    x = rng.standard_normal((N, d)).astype(np.float32)

    ref = scatter.gather_message_scatter(
        jnp.asarray(x), jnp.asarray(emb), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask), N, edge_weight=jnp.asarray(w))

    for D in (2, 4, 8):
        part = build_halo_partition(src, dst, mask, N, D)
        fn = make_halo_spmm(part)
        got = fn(jnp.asarray(x), jnp.asarray(emb), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"D={D}")
        # halo exchange must move less than full replication
        full_replication_rows = (D - 1) * N // D
        assert part.halo_cap * D < full_replication_rows + part.halo_cap


def test_hybrid_node_sharded_gnn_matches_replicated(rng):
    """Full GIN-virtual stack with node features sharded + per-layer halo
    exchange == the replicated single-device forward."""
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
    from graphtrans_tpu.nn.gnn import GNNNodeEmbedding
    from graphtrans_tpu.parallel.hybrid import (
        make_hybrid_gnn_forward, shard_batch_for_hybrid,
    )

    graphs = make_tu_dataset(num_graphs=24, min_nodes=8, max_nodes=30, seed=9)
    batch = collate(graphs, 25, 512, 2048)

    common = dict(num_layer=3, emb_dim=32, node_encoder=LinearNodeEncoder(32),
                  edge_encoder_factory=ZeroEdgeEncoder, drop_ratio=0.0,
                  JK="cat", residual=False, gnn_type="gin", virtual_node=True)
    ref_mod = GNNNodeEmbedding(**common)
    variables = ref_mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = np.asarray(ref_mod.apply(variables, batch, None, False))

    for D in (2, 4, 8):
        hyb_mod = GNNNodeEmbedding(**common, bn_axis_name="data",
                                   graph_reduce_axis="data")
        local, part = shard_batch_for_hybrid(batch, D)
        fwd = make_hybrid_gnn_forward(hyb_mod, part)
        got = np.asarray(fwd(variables, local))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"D={D}")


def test_hybrid_gnn_training_mode_bn_sync(rng):
    """Training mode: per-chip partial BN statistics must psum to the global
    batch statistics (outputs AND updated running stats match the
    single-device training pass; dropout 0 for determinism)."""
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
    from graphtrans_tpu.nn.gnn import GNNNodeEmbedding
    from graphtrans_tpu.parallel.hybrid import (
        make_hybrid_gnn_forward, shard_batch_for_hybrid,
    )

    graphs = make_tu_dataset(num_graphs=20, min_nodes=6, max_nodes=24, seed=10)
    batch = collate(graphs, 21, 512, 2048)
    common = dict(num_layer=2, emb_dim=16, node_encoder=LinearNodeEncoder(16),
                  edge_encoder_factory=ZeroEdgeEncoder, drop_ratio=0.0,
                  JK="last", residual=False, gnn_type="gin", virtual_node=True)
    ref_mod = GNNNodeEmbedding(**common)
    variables = ref_mod.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref, ref_mut = ref_mod.apply(variables, batch, None, True,
                                 rngs={"dropout": jax.random.key(2)},
                                 mutable=["batch_stats"])
    hyb_mod = GNNNodeEmbedding(**common, bn_axis_name="data",
                               graph_reduce_axis="data")
    local, part = shard_batch_for_hybrid(batch, 4)
    fwd = make_hybrid_gnn_forward(hyb_mod, part)
    got, new_bs = fwd(variables, local, True, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_mut["batch_stats"]),
                    jax.tree_util.tree_leaves(new_bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_step_matches_single_device_unbalanced_shards(rng):
    """Shards with very different valid-graph counts (the epoch-tail /
    bucketed-chunk-break case): the count-weighted psum reduction in
    parallel/dp.py must reproduce the single-device global-batch step
    exactly, not the naive pmean of per-shard means."""
    graphs = make_tu_dataset(num_graphs=16, seed=7)
    caps = (512, 2048)
    # 12 valid graphs on shard 0, 4 on shard 1 (same padded graph cap);
    # pin the dense width so the shard batches stack
    shard_batches = [
        collate(graphs[:12], 17, caps[0], caps[1], dense_cap=64),
        collate(graphs[12:], 17, caps[0], caps[1], dense_cap=64),
    ]
    stacked = _stack(shard_batches)
    global_batch = collate(graphs, 34, 2 * caps[0], 2 * caps[1], dense_cap=64)

    args = default_args(gnn_dropout=0.0, transformer_dropout=0.0,
                        weight_decay=0.0)
    model_cls = MODELS["gnn-transformer"]

    args.bn_axis_name = None
    model_single = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    args.bn_axis_name = "data"
    model_dp = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)

    variables = model_single.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        shard_batches[0], None, False,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx, _ = build_optimizer(args, 10)
    trainer = TRAINER_REGISTRY["baseline"]

    step_single = trainer.make_train_step(model_single, losses.classification_loss,
                                          tx, args, donate=False)
    step_dp = make_dp_train_step(trainer, model_dp, losses.classification_loss,
                                 tx, args, "gnn_node", 2, donate=False)

    s0 = TrainState.create(params, bs, tx.init(params))
    s_single, loss_single = step_single(s0, global_batch, jax.random.key(9))
    s_dp, loss_dp = step_dp(
        TrainState.create(params, bs, tx.init(params)), stacked, jax.random.key(9)
    )
    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.batch_stats),
                    jax.tree_util.tree_leaves(s_dp.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)
    # post-Adam params: bound deviation by one full sign-normalized step
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_dp.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) <= 2 * args.lr + 1e-6


def test_dp_step_with_scatter_free_plans(rng, monkeypatch):
    """shard_map DP over batches carrying scatter-free slot plans (pinned
    dataset-wide caps): the sfa route under DP matches the segment route
    under DP — the plans shard correctly with the batch pytree."""
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import augment_edge
    from graphtrans_tpu.nn import conv as conv_mod
    from graphtrans_tpu.nn.encoders import LinearEdgeEncoder

    raw = make_code_dataset(num_graphs=32, min_nodes=8, max_nodes=40, seed=4)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["y"] = np.asarray([hash(tuple(g["y_seq"])) % 2])
        graphs.append(g)
    loader = GraphLoader(graphs, batch_size=16, shuffle=False, seed=0,
                         num_shards=2, scatter_free=True, use_native=False)
    stacked = next(iter(loader))
    assert stacked.sfa_row_start_dst is not None
    assert stacked.sfa_row_start_dst.shape[0] == 2  # leading shard axis

    args = default_args(model_type="gnn-transformer", gnn_type="gcn",
                        gnn_dropout=0.0, transformer_dropout=0.0,
                        weight_decay=0.0)
    args.bn_axis_name = "data"
    model = MODELS["gnn-transformer"].build(
        2, args, LinearNodeEncoder(args.gnn_emb_dim),
        lambda e: LinearEdgeEncoder(e))
    one = jax.tree_util.tree_map(lambda x: x[0], stacked)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        one, None, False,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx, _ = build_optimizer(args, 10)
    trainer = TRAINER_REGISTRY["baseline"]

    from functools import partial  # noqa: F401
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from graphtrans_tpu.parallel.mesh import make_mesh

    s0 = TrainState.create(params, bs, tx.init(params))

    def run(force):
        monkeypatch.setattr(conv_mod, "_SFA_FORCE", force)
        conv_mod.set_scatter_free("on" if force else "off")
        try:
            step_dp = make_dp_train_step(
                trainer, model, losses.classification_loss, tx, args,
                "gnn_node", 2, donate=False)
            _, loss = step_dp(s0, stacked, jax.random.key(9))

            grad_inner = trainer.make_grad_fn(
                model, losses.classification_loss, args)

            def dp_grads(state, sb, rng):
                b = jax.tree_util.tree_map(lambda x: x[0], sb)
                g, _, _ = grad_inner(state, b, rng)
                return jax.lax.pmean(g, "data")

            g = jax.jit(shard_map(
                dp_grads, mesh=make_mesh(dp=2),
                in_specs=(P(), P("data"), P()), out_specs=P(),
                check_rep=False,
            ))(s0, stacked, jax.random.key(9))
            return g, float(loss)
        finally:
            conv_mod.set_scatter_free("auto")

    g_sfa, l_sfa = run(True)
    g_seg, l_seg = run(False)
    np.testing.assert_allclose(l_sfa, l_seg, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_sfa),
                    jax.tree_util.tree_leaves(g_seg)):
        # relu-boundary outlier budget, slightly wider than the single-chip
        # conv tests: XLA-CPU threads the one-hot reductions, so the
        # accumulation order (and thus which near-zero pre-activations flip
        # between arms) varies with machine load — observed flaking at 2%
        # under a concurrently running full suite
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a) / (np.abs(a) + 1e-5)
        assert float((rel > 1e-3).mean()) <= 0.03, float(rel.max())
        assert float(np.median(rel)) < 1e-4
