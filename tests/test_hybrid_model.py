"""End-to-end hybrid flagship forward: node-sharded GNN stage (halo convs)
feeding the dense transformer stage via a psum'd scatter — the full
GraphTrans forward across the mesh, parity-checked against single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.synthetic import make_tu_dataset
from graphtrans_tpu.models import MODELS
from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
from graphtrans_tpu.parallel.hybrid import make_hybrid_flagship_forward, shard_batch_for_hybrid
from tests.test_models import default_args


def test_hybrid_flagship_forward_matches_single(rng):
    graphs = make_tu_dataset(num_graphs=24, min_nodes=8, max_nodes=30, seed=11)
    batch = collate(graphs, 25, 512, 2048)
    args = default_args(gnn_type="gin", gnn_virtual_node=True, gnn_JK="cat",
                        gnn_dropout=0.0, transformer_dropout=0.0)
    model_cls = MODELS["gnn-transformer"]
    ref_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = np.asarray(ref_model.apply(variables, batch, None, False))

    for D in (2, 4):
        args.bn_axis_name = "data"
        args.graph_reduce_axis = "data"
        hyb_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
        local, part = shard_batch_for_hybrid(batch, D)
        fwd = make_hybrid_flagship_forward(hyb_model, part)
        got = np.asarray(fwd(variables, local))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"D={D}")


def test_hybrid_train_step_matches_single(rng):
    """One hybrid training step == the single-device step: loss equal, grads
    combined correctly (psum for the sharded GNN subtree, pmean for the
    replicated stages), synced BN stats equal."""
    from graphtrans_tpu.parallel.hybrid import make_hybrid_train_step
    from graphtrans_tpu.train import losses
    from graphtrans_tpu.train.optim import build_optimizer
    from graphtrans_tpu.train.state import TrainState
    from graphtrans_tpu.trainers import TRAINER_REGISTRY

    graphs = make_tu_dataset(num_graphs=24, min_nodes=8, max_nodes=30, seed=12)
    batch = collate(graphs, 25, 512, 2048)
    args = default_args(gnn_type="gin", gnn_virtual_node=True, gnn_JK="cat",
                        gnn_dropout=0.0, transformer_dropout=0.0,
                        weight_decay=0.0)
    model_cls = MODELS["gnn-transformer"]
    ref_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx, _ = build_optimizer(args, 10)
    trainer = TRAINER_REGISTRY["baseline"]
    step_ref = trainer.make_train_step(ref_model, losses.classification_loss,
                                       tx, args, donate=False)
    s_ref, loss_ref = step_ref(TrainState.create(params, bs, tx.init(params)),
                               batch, jax.random.key(9))

    args.bn_axis_name = "data"
    args.graph_reduce_axis = "data"
    hyb_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    from graphtrans_tpu.parallel.hybrid import shard_batch_for_hybrid

    local, part = shard_batch_for_hybrid(batch, 4)
    step_hyb = make_hybrid_train_step(hyb_model, losses.classification_loss,
                                      tx, part, donate=False)
    s_hyb, loss_hyb = step_hyb(TrainState.create(params, bs, tx.init(params)),
                               local, jax.random.key(9))
    np.testing.assert_allclose(float(loss_ref), float(loss_hyb), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.batch_stats),
                    jax.tree_util.tree_leaves(s_hyb.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # post-Adam params within one sign-normalized step of each other
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_hyb.params)):
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) <= 2 * args.lr + 1e-6


def test_hybrid_flagship_forward_gcn(rng):
    """GCN hybrid: host-precomputed degree normalization reproduces the
    replicated GCN forward (global deg(src)+1 semantics)."""
    graphs = make_tu_dataset(num_graphs=20, min_nodes=8, max_nodes=26, seed=13)
    batch = collate(graphs, 21, 512, 2048)
    args = default_args(gnn_type="gcn", gnn_dropout=0.0, transformer_dropout=0.0)
    model_cls = MODELS["gnn-transformer"]
    ref_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = np.asarray(ref_model.apply(variables, batch, None, False))

    args.bn_axis_name = "data"
    args.graph_reduce_axis = "data"
    hyb_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    local, part = shard_batch_for_hybrid(batch, 4)
    fwd = make_hybrid_flagship_forward(hyb_model, 4)
    got = np.asarray(fwd(variables, local))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_hybrid_pna_transformer_forward(rng):
    """PNA hybrid: dst rows local, src rows via halo; degree scalers stay
    exact because a node's incoming edges are co-located with it."""
    from graphtrans_tpu.data.synthetic import make_mol_dataset
    from graphtrans_tpu.data.mol import degree_histogram
    from graphtrans_tpu.nn.encoders import AtomEncoder, BondEncoder

    graphs = make_mol_dataset(num_graphs=16, num_tasks=4, seed=14)
    batch = collate(graphs, 17, 512, 2048, num_tasks=4, y_dtype="float32")
    deg = degree_histogram(graphs, 10)
    args = default_args(model_type="pna-transformer", gnn_emb_dim=16,
                        gnn_dropout=0.0, transformer_dropout=0.0,
                        graph_pooling="cls")
    model_cls = MODELS["pna-transformer"]
    ref_model = model_cls.build(4, args, AtomEncoder(16),
                                lambda e: BondEncoder(e), deg=deg)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = np.asarray(ref_model.apply(variables, batch, None, False))

    args.bn_axis_name = "data"
    hyb_model = model_cls.build(4, args, AtomEncoder(16),
                                lambda e: BondEncoder(e), deg=deg)
    local, part = shard_batch_for_hybrid(batch, 4)
    from graphtrans_tpu.parallel.hybrid import make_hybrid_flagship_forward

    fwd = make_hybrid_flagship_forward(hyb_model, 4)
    got = np.asarray(fwd(variables, local))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)
