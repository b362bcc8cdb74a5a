"""Strided (dense) layout: scatter-free one-hot-matmul aggregation parity.

The dense layout (collate(node_stride=...) + ops/dense_mp.py) must be a pure
re-arrangement: every module output on a strided batch equals the flat-batch
output on the same graphs, row for row."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.loader import GraphLoader
from graphtrans_tpu.data.synthetic import make_mol_dataset, make_tu_dataset
from graphtrans_tpu.models import MODELS
from graphtrans_tpu.nn.encoders import AtomEncoder, BondEncoder, LinearNodeEncoder, ZeroEdgeEncoder
from tests.test_models import default_args

STRIDE, EM = 40, 128


def _pair(graphs, G=9, ncap=512, ecap=1024, **kw):
    flat = collate(graphs, G, ncap, ecap, **kw)
    dense = collate(graphs, G, G * STRIDE, ecap, node_stride=STRIDE,
                    dense_edge_cap=EM, **kw)
    return flat, dense


def _to_flat_rows(arr_strided, dense_batch, flat_batch):
    """Map strided node rows back to the flat batch's row order."""
    sm = np.asarray(dense_batch.node_mask)
    return np.asarray(arr_strided)[sm]


def test_collate_strided_invariants(rng):
    graphs = make_tu_dataset(num_graphs=8, min_nodes=5, max_nodes=30, seed=2)
    flat, dense = _pair(graphs)
    assert dense.node_stride == STRIDE
    assert dense.max_nodes_dense == STRIDE
    N = dense.node_feat.shape[0]
    assert N == dense.num_graph_slots * STRIDE
    # graph g's nodes at rows [g*stride, g*stride+n)
    for g, gr in enumerate(graphs):
        n = gr["x"].shape[0]
        np.testing.assert_array_equal(
            dense.node_feat[g * STRIDE: g * STRIDE + n], gr["x"])
        assert dense.node_mask[g * STRIDE: g * STRIDE + n].all()
        assert not dense.node_mask[g * STRIDE + n: (g + 1) * STRIDE].any()
        # dense positions are plain within-graph indices (no truncation)
        np.testing.assert_array_equal(
            dense.node_pos[g * STRIDE: g * STRIDE + n], np.arange(n))
    # flat edge arrays remain dst-sorted with strided global indices
    ed = np.asarray(dense.edge_dst)[np.asarray(dense.edge_mask)]
    assert (np.diff(ed) >= 0).all()
    # per-graph dense edge tables match the originals
    for g, gr in enumerate(graphs):
        e = gr["edge_index"].shape[1]
        np.testing.assert_array_equal(dense.edge_src_dense[g, :e], gr["edge_index"][0])
        np.testing.assert_array_equal(dense.edge_dst_dense[g, :e], gr["edge_index"][1])
        assert dense.edge_mask_dense[g, :e].all()
        assert not dense.edge_mask_dense[g, e:].any()


def test_dense_aggregation_matches_flat(rng):
    from graphtrans_tpu.ops import dense_mp, scatter

    graphs = make_tu_dataset(num_graphs=6, min_nodes=5, max_nodes=30, seed=3)
    flat, dense = _pair(graphs)
    d = 16
    hf = rng.standard_normal((flat.node_feat.shape[0], d)).astype(np.float32)
    hf[~np.asarray(flat.node_mask)] = 0
    # same values in strided arrangement
    hs = np.zeros((dense.node_feat.shape[0], d), np.float32)
    hs[np.asarray(dense.node_mask)] = hf[np.asarray(flat.node_mask)]

    out_flat = scatter.gather_message_scatter(
        jnp.asarray(hf), jnp.zeros((flat.edge_src.shape[0], d)),
        flat.edge_src, flat.edge_dst, flat.edge_mask,
        num_nodes=hf.shape[0], message="relu_add")
    out_dense = dense_mp.gather_message_scatter_dense(
        jnp.asarray(hs), dense,
        jnp.zeros(dense.edge_src_dense.shape + (d,)), message="relu_add")
    np.testing.assert_allclose(
        _to_flat_rows(out_dense, dense, flat),
        np.asarray(out_flat)[np.asarray(flat.node_mask)],
        rtol=1e-5, atol=1e-6)


def test_flagship_dense_matches_flat_forward_and_grads(rng):
    """GIN-virtual JK=cat flagship: logits and input-grads identical between
    flat and strided execution (eval mode)."""
    graphs = make_mol_dataset(num_graphs=6, num_tasks=4, min_nodes=6,
                              max_nodes=30, seed=4)
    flat, dense = _pair(graphs, num_tasks=4, y_dtype="float32")

    args = default_args(gnn_type="gin", gnn_virtual_node=True, gnn_JK="cat",
                        gnn_dropout=0.0, transformer_dropout=0.0,
                        graph_pooling="cls")
    model = MODELS["gnn-transformer"].build(4, args, AtomEncoder(16),
                                            lambda e: BondEncoder(e))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        flat, None, False)

    w = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))

    def loss_flat(v):
        out = model.apply(v, flat, None, False)
        return jnp.sum(out[:6] * w), out

    def loss_dense(v):
        out = model.apply(v, dense, None, False)
        return jnp.sum(out[:6] * w), out

    (lf, of), gf = jax.value_and_grad(loss_flat, has_aux=True)(variables)
    (ld, od), gd = jax.value_and_grad(loss_dense, has_aux=True)(variables)
    np.testing.assert_allclose(np.asarray(of)[:6], np.asarray(od)[:6],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)


def test_gcn_dense_matches_flat(rng):
    graphs = make_tu_dataset(num_graphs=6, min_nodes=5, max_nodes=30, seed=5)
    flat, dense = _pair(graphs)
    args = default_args(gnn_type="gcn", gnn_dropout=0.0,
                        transformer_dropout=0.0, graph_pooling="cls")
    model = MODELS["gnn-transformer"].build(2, args, LinearNodeEncoder(16),
                                            ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        flat, None, False)
    of = model.apply(variables, flat, None, False)
    od = model.apply(variables, dense, None, False)
    np.testing.assert_allclose(np.asarray(of)[:6], np.asarray(od)[:6],
                               rtol=2e-4, atol=1e-5)


def test_loader_dense_layout(rng):
    graphs = make_tu_dataset(num_graphs=40, min_nodes=4, max_nodes=25, seed=6)
    loader = GraphLoader(graphs, 8, dense_layout=True)
    assert loader.node_stride > 0
    batches = list(iter(loader))
    assert all(b.node_stride == loader.node_stride for b in batches)
    total = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert total == 40


def test_driver_dense_layout(tmp_path):
    from tests.test_driver import SMALL, run_main

    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--gnn_virtual_node", "--graph_pooling", "cls",
        "--scheduler", "cosine", "--dense_layout", "on"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_gnn_baseline_pooling_dense_matches_flat(rng):
    """The gnn baseline's sum/mean/max readouts on strided batches equal the
    flat segment-op path."""
    import jax as _jax

    graphs = make_tu_dataset(num_graphs=6, min_nodes=5, max_nodes=30, seed=8)
    flat, dense = _pair(graphs)
    for pool in ("sum", "mean", "max"):
        args = default_args(model_type="gnn", graph_pooling=pool,
                            gnn_type="gin", gnn_dropout=0.0)
        model = MODELS["gnn"].build(2, args, LinearNodeEncoder(16),
                                    ZeroEdgeEncoder)
        v = model.init({"params": _jax.random.key(0),
                        "dropout": _jax.random.key(1)}, flat, None, False)
        of = model.apply(v, flat, None, False)
        od = model.apply(v, dense, None, False)
        np.testing.assert_allclose(np.asarray(of)[:6], np.asarray(od)[:6],
                                   rtol=2e-4, atol=1e-5, err_msg=pool)
