"""Variable-length sequence packing (ops/pack.py + the packed transformer
stage): plan invariants, the gather-backward custom VJP, the segment-masked
flash kernel, and full-model packed-vs-dense parity.

The packed route must be NUMERICALLY IDENTICAL to the dense [G, S] path it
replaces (same kept-node sets under last-S truncation, same per-graph
attention sets, same post-norm semantics) — these tests pin that, so the
bench/production switch to packing is a pure layout change.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.synthetic import make_code_dataset, make_tu_dataset
from graphtrans_tpu.ops.pack import build_pack_fields, pack_gather, plan_seq_pack


def _hp(**over):
    ns = argparse.Namespace(
        model_type="gnn-transformer", graph_pooling="cls", gnn_type="gin",
        gnn_virtual_node=True, gnn_dropout=0.0, gnn_num_layer=3,
        gnn_emb_dim=64, gnn_JK="cat", gnn_residual=False, d_model=64,
        nhead=4, dim_feedforward=256, transformer_dropout=0.0,
        transformer_activation="relu", num_encoder_layers=2,
        max_input_len=1000, transformer_norm_input=True,
        num_encoder_layers_masked=0, transformer_prenorm=False,
        max_seq_len=None, pos_encoder=False, pretrained_gnn=None,
        freeze_gnn=None, graph_input_dim=None, precision="f32",
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_plan_seq_pack_invariants():
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 120, size=64)
    R, row, start = plan_seq_pack(tokens, 128)
    # non-overlap within rows, fit within W
    spans = {}
    for i in range(64):
        spans.setdefault(int(row[i]), []).append(
            (int(start[i]), int(start[i]) + int(tokens[i])))
        assert start[i] + tokens[i] <= 128
    for r, sp in spans.items():
        sp.sort()
        for (a0, a1), (b0, b1) in zip(sp, sp[1:]):
            assert a1 <= b0
    assert R == max(spans) + 1
    # packing is tight-ish: no more rows than FFD's 1.22*OPT + 1 bound
    assert R <= int(np.ceil(tokens.sum() / 128 * 1.23)) + 1


def test_build_pack_fields_invariants_and_truncation():
    num_nodes = np.array([5, 200, 60, 0], np.int64)  # last = padding graph
    graph_mask = np.array([True, True, True, False])
    offs = np.array([0, 5, 205, 265], np.int64)
    N, W = 384, 128
    f = build_pack_fields(num_nodes, graph_mask, offs, N, W, max_keep=1000)
    pn, sg = f["pack_node"], f["pack_seg"]
    RW = f["pack_rows"] * f["pack_w"]
    assert pn.shape == (RW,) and sg.shape == (RW,)
    # graph 1 (200 nodes) truncates to the LAST W-1 = 127 nodes
    slots1 = np.nonzero(sg == 1)[0]
    nodes1 = pn[slots1]
    kept = nodes1[nodes1 < N]
    assert len(slots1) == 128 and len(kept) == 127
    assert kept.min() == 5 + 200 - 127 and kept.max() == 204
    # every non-truncated node appears exactly once
    for g, (o, n) in [(0, (0, 5)), (2, (205, 60))]:
        nodes = pn[sg == g]
        real = np.sort(nodes[nodes < N])
        np.testing.assert_array_equal(real, np.arange(o, o + n))
    # cls slot: inside the segment, gathers the zero row
    for g in range(3):
        s = f["pack_cls_slot"][g]
        assert sg[s] == g and pn[s] == N
    # inverse map round-trips placed nodes
    inv = f["pack_inv"]
    placed = inv < RW
    np.testing.assert_array_equal(pn[inv[placed]],
                                  np.nonzero(placed)[0].astype(np.int32))
    # padding-graph cls slot points somewhere valid to gather (unread)
    assert 0 <= f["pack_cls_slot"][3] < RW


def test_build_pack_fields_rows_cap_overflow():
    num_nodes = np.array([100, 100, 100], np.int64)
    mask = np.ones(3, bool)
    offs = np.array([0, 100, 200], np.int64)
    assert build_pack_fields(num_nodes, mask, offs, 384, 128,
                             max_keep=1000, rows_cap=2) is None
    f = build_pack_fields(num_nodes, mask, offs, 384, 128,
                          max_keep=1000, rows_cap=4)
    assert f is not None and f["pack_rows"] == 4  # pinned, padded with -1


def test_pack_gather_backward_matches_scatter():
    rng = np.random.default_rng(1)
    N, RW, d = 40, 64, 8
    pack_node = np.full(RW, N, np.int32)
    perm = rng.permutation(N)[:30]
    slots = rng.permutation(RW)[:30]
    pack_node[slots] = perm
    inv = np.full(N, RW, np.int32)
    inv[perm] = slots
    src = jnp.asarray(rng.normal(size=(N + 1, d)).astype(np.float32))
    pn, pi = jnp.asarray(pack_node), jnp.asarray(inv)

    f = lambda s: jnp.sum(pack_gather(s, pn, pi) ** 2)
    ref = lambda s: jnp.sum(jnp.take(s, pn, axis=0) ** 2)
    np.testing.assert_allclose(f(src), ref(src), rtol=1e-6)
    # real node rows must match the scatter-add reference; the sentinel row
    # N (a constant zeros row in the model) intentionally gets zero grad
    gf, gr = jax.grad(f)(src), jax.grad(ref)(src)
    np.testing.assert_allclose(gf[:N], gr[:N], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gf[N]), 0.0)


def test_flash_seg_kernel_matches_reference():
    from graphtrans_tpu.nn.transformer import masked_softmax
    from graphtrans_tpu.ops.pallas.flash_attention import flash_attention_seg

    rng = np.random.default_rng(2)
    BH, S, hd = 4, 512, 32
    q, k, v = [jnp.asarray(rng.normal(size=(BH, S, hd)).astype(np.float32))
               for _ in range(3)]
    seg = np.where(rng.random((BH, S)) < 0.15, -1,
                   rng.integers(0, 6, (BH, S))).astype(np.int32)
    seg = jnp.asarray(seg)
    hi = jax.lax.Precision.HIGHEST

    def ref(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k, precision=hi) / np.sqrt(hd)
        m = (seg[:, :, None] == seg[:, None, :]) & (seg >= 0)[:, None, :]
        return jnp.einsum("bqk,bkd->bqd", masked_softmax(s, m), v,
                          precision=hi)

    o = flash_attention_seg(q, k, v, seg, 0, 0.0, False, True)
    np.testing.assert_allclose(o, ref(q, k, v), atol=2e-5)
    g = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_seg(q, k, v, seg, 0, 0.0, False, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(a, b, atol=5e-5)


@pytest.mark.parametrize("model_key", ["gnn-transformer", "pna-transformer"])
def test_packed_model_matches_dense(model_key):
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder

    graphs = make_tu_dataset(num_graphs=20, num_node_labels=16, seed=3)
    hp = _hp()
    deg = None
    if model_key == "pna-transformer":
        hp = _hp(gnn_type="pna", gnn_virtual_node=False, gnn_JK="last",
                 gnn_residual=True, gnn_emb_dim=64,
                 aggregators=["mean", "max", "min", "std"],
                 scalers=["identity", "amplification", "attenuation"],
                 post_layers=1, add_edge="none")
        deg = np.bincount(
            np.concatenate([np.bincount(g["edge_index"][1],
                                        minlength=g["x"].shape[0])
                            for g in graphs]), minlength=10)[:10]
    model = MODELS[model_key].build(2, hp, LinearNodeEncoder(hp.gnn_emb_dim),
                                    ZeroEdgeEncoder, deg=deg)
    kw = dict(num_tasks=2, y_dtype="int32")
    b_dense = collate(graphs, 21, 1024, 2048, **kw)
    b_pack = collate(graphs, 21, 1024, 2048, seq_pack_w=128, **kw)
    assert b_pack.pack_node is not None
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, b_pack, None, False)
    out_p = model.apply(v, b_pack, None, False)
    out_d = model.apply(v, b_dense, None, False)
    gm = np.asarray(b_dense.graph_mask)
    np.testing.assert_allclose(np.asarray(out_p)[gm], np.asarray(out_d)[gm],
                               atol=2e-5)

    def loss(p, b):
        o = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                        b, None, False)
        return jnp.sum(jnp.where(gm[:, None], o, 0.0) ** 2)

    gp = jax.grad(loss)(v["params"], b_pack)
    gd = jax.grad(loss)(v["params"], b_dense)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gd)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_packed_model_truncation_matches_dense():
    """Graphs past max_input_len: both layouts keep the LAST max_input_len
    nodes (reference pad_batch semantics) — parity must hold through
    truncation. Here W-1 = 127 < one graph's 150 nodes, so max_input_len is
    pinned to 127 on both sides."""
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder

    graphs = make_tu_dataset(num_graphs=8, num_node_labels=16,
                             min_nodes=100, max_nodes=150, seed=4)
    hp = _hp(max_input_len=127)
    model = MODELS["gnn-transformer"].build(
        2, hp, LinearNodeEncoder(64), ZeroEdgeEncoder)
    kw = dict(num_tasks=2, y_dtype="int32", max_input_len=127)
    b_dense = collate(graphs, 9, 1536, 4096, **kw)
    b_pack = collate(graphs, 9, 1536, 4096, seq_pack_w=128, **kw)
    assert int(b_dense.max_nodes_dense) == 127
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, b_pack, None, False)
    out_p = model.apply(v, b_pack, None, False)
    out_d = model.apply(v, b_dense, None, False)
    gm = np.asarray(b_dense.graph_mask)
    np.testing.assert_allclose(np.asarray(out_p)[gm], np.asarray(out_d)[gm],
                               atol=2e-5)


def test_packed_flash_route_matches_dense_route():
    """On-TPU the packed rows route through flash_attention_seg; force the
    interpret-mode kernel on CPU and pin it against the XLA dense-seg path
    at the full model level."""
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder

    graphs = make_code_dataset(num_graphs=10, min_nodes=40, max_nodes=120,
                               seed=5)
    for g in graphs:
        g["y"] = np.array([0])
        g["x"] = np.eye(16, dtype=np.float32)[
            np.asarray(g["x"][:, 0]) % 16]
    hp = _hp(gnn_num_layer=2, num_encoder_layers=1)
    model = MODELS["gnn-transformer"].build(
        2, hp, LinearNodeEncoder(64), ZeroEdgeEncoder)
    b = collate(graphs, 11, 1024, 2048, num_tasks=2, y_dtype="int32",
                seq_pack_w=256)
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, b, None, False)
    out_dense_seg = model.apply(v, b, None, False)
    T._FLASH_INTERPRET = True
    try:
        out_flash = model.apply(v, b, None, False)
    finally:
        T._FLASH_INTERPRET = False
    gm = np.asarray(b.graph_mask)
    np.testing.assert_allclose(np.asarray(out_flash)[gm],
                               np.asarray(out_dense_seg)[gm], atol=2e-5)


def test_packed_seg_fused_kernel_matches_reference():
    """Heads-in-lanes fused kernel with segment masking (interpret mode) vs
    the XLA dense-seg reference — fwd + dqkv."""
    from graphtrans_tpu.nn.transformer import masked_softmax
    from graphtrans_tpu.ops.pallas.attention_packed import (
        attention_packed_seg_qkv)

    rng = np.random.default_rng(7)
    B, S, d, H = 5, 256, 128, 4
    hd = d // H
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * d)).astype(np.float32))
    seg = np.where(rng.random((B, S)) < 0.12, -1,
                   rng.integers(0, 9, (B, S))).astype(np.int32)
    seg = jnp.asarray(seg)
    hi = jax.lax.Precision.HIGHEST

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hsplit = lambda t: t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        q, k, v = hsplit(q), hsplit(k), hsplit(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=hi) / np.sqrt(hd)
        m = ((seg[:, :, None] == seg[:, None, :])
             & (seg >= 0)[:, None, :])[:, None]
        p = masked_softmax(s, m)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=hi)
        return o.transpose(0, 2, 1, 3).reshape(B, S, d)

    o = attention_packed_seg_qkv(qkv, seg, 0, H, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref(qkv)),
                               atol=3e-5)
    g = jax.grad(lambda q: jnp.sum(
        attention_packed_seg_qkv(q, seg, 0, H, 0.0, False, True) ** 2))(qkv)
    gr = jax.grad(lambda q: jnp.sum(ref(q) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)


def test_flash_hil_kernel_matches_reference():
    """Streaming heads-in-lanes seg kernel (interpret) vs the XLA dense-seg
    reference — fwd + combined dqkv, at a non-BQ-multiple S (padding arm)."""
    from graphtrans_tpu.nn.transformer import masked_softmax
    from graphtrans_tpu.ops.pallas.flash_hil import flash_hil_seg_qkv

    rng = np.random.default_rng(9)
    B, S, d, H = 3, 640, 128, 4
    hd = d // H
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * d)).astype(np.float32))
    seg = np.where(rng.random((B, S)) < 0.1, -1,
                   rng.integers(0, 13, (B, S))).astype(np.int32)
    seg = jnp.asarray(seg)
    hi = jax.lax.Precision.HIGHEST

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=hi) / np.sqrt(hd)
        m = ((seg[:, :, None] == seg[:, None, :])
             & (seg >= 0)[:, None, :])[:, None]
        o = jnp.einsum("bhqk,bhkd->bhqd", masked_softmax(s, m), v,
                       precision=hi)
        return o.transpose(0, 2, 1, 3).reshape(B, S, d)

    o = flash_hil_seg_qkv(qkv, seg, 0, H, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref(qkv)),
                               atol=3e-5)
    g = jax.grad(lambda q: jnp.sum(
        flash_hil_seg_qkv(q, seg, 0, H, 0.0, False, True) ** 2))(qkv)
    gr = jax.grad(lambda q: jnp.sum(ref(q) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=3e-4)


def test_dp_step_with_packed_batches_matches_dense():
    """shard_map DP over stacked batches carrying pack fields (pinned row
    caps): the packed transformer route under DP produces the same loss
    and gradients as the dense route on the identical stacked batch with
    the pack fields stripped — layout only, no numerics."""
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import augment_edge
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import LinearEdgeEncoder, LinearNodeEncoder
    from graphtrans_tpu.parallel.dp import make_dp_train_step
    from graphtrans_tpu.train import losses
    from graphtrans_tpu.train.optim import build_optimizer
    from graphtrans_tpu.train.state import TrainState
    from graphtrans_tpu.trainers import TRAINER_REGISTRY

    raw = make_code_dataset(num_graphs=32, min_nodes=8, max_nodes=40, seed=6)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["x"] = np.eye(16, dtype=np.float32)[np.asarray(g["x"][:, 0]) % 16]
        g["y"] = np.asarray([int(g["x"].shape[0]) % 2])
        graphs.append(g)
    loader = GraphLoader(graphs, batch_size=16, shuffle=False, seed=0,
                         num_shards=2, seq_pack=True, use_native=False)
    stacked = next(iter(loader))
    assert stacked.pack_node is not None
    assert stacked.pack_node.shape[0] == 2  # leading shard axis
    stripped = loader._strip_pack(
        jax.tree_util.tree_map(lambda x: x, stacked))

    hp = _hp(gnn_type="gcn", gnn_virtual_node=True, gnn_JK="cat",
             gnn_num_layer=2, num_encoder_layers=1)
    hp.bn_axis_name = "data"
    hp.scheduler = "cosine"
    # small lr: Adam's sqrt(v)-normalization turns f32-reassociation grad
    # noise (the two layouts sum attention in different orders) into O(lr)
    # parameter deltas — the loss/grad math itself is identical
    hp.lr = hp.max_lr = 1e-4
    hp.pct_start, hp.weight_decay, hp.grad_clip = 0.3, 0.0, 1.0
    hp.epochs, hp.batch_size = 4, 16
    model = MODELS["gnn-transformer"].build(
        2, hp, LinearNodeEncoder(hp.gnn_emb_dim),
        lambda e: LinearEdgeEncoder(e))
    one = jax.tree_util.tree_map(lambda x: x[0], stacked)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        one, None, False)
    tx, _ = build_optimizer(hp, 10)
    s0 = TrainState.create(variables["params"],
                           variables.get("batch_stats", {}),
                           tx.init(variables["params"]))
    trainer = TRAINER_REGISTRY["baseline"]
    step_dp = make_dp_train_step(trainer, model,
                                 losses.classification_loss, tx, hp,
                                 "gnn_node", 2, donate=False)
    s_pack, loss_pack = step_dp(s0, stacked, jax.random.key(9))
    s_dense, loss_dense = step_dp(s0, stripped, jax.random.key(9))
    np.testing.assert_allclose(float(loss_pack), float(loss_dense),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_pack.params),
                    jax.tree.leaves(s_dense.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("tiers", ["two", "three"])
def test_two_tier_packed_model_matches_dense(tiers):
    """Multi-tier packing (big graphs in wide rows, small in narrow) must be
    numerically identical to the dense path — same readout, same grads."""
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder

    graphs = make_tu_dataset(num_graphs=24, num_node_labels=16,
                             min_nodes=8, max_nodes=200, seed=12)
    hp = _hp()
    model = MODELS["gnn-transformer"].build(2, hp, LinearNodeEncoder(64),
                                            ZeroEdgeEncoder)
    kw = dict(num_tasks=2, y_dtype="int32")
    b_dense = collate(graphs, 25, 4096, 16384, **kw)
    b_two = collate(graphs, 25, 4096, 16384, seq_pack_w=256,
                    seq_pack_w2=128,
                    seq_pack_w3=64 if tiers == "three" else 0, **kw)
    assert b_two.pack2_node is not None and b_two.pack2_rows > 0
    if tiers == "three":
        assert b_two.pack3_node is not None and b_two.pack3_rows > 0
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, b_two, None, False)
    out_p = model.apply(v, b_two, None, False)
    out_d = model.apply(v, b_dense, None, False)
    gm = np.asarray(b_dense.graph_mask)
    np.testing.assert_allclose(np.asarray(out_p)[gm], np.asarray(out_d)[gm],
                               atol=2e-5)

    def loss(p, b):
        o = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                        b, None, False)
        return jnp.sum(jnp.where(gm[:, None], o, 0.0) ** 2)

    gp = jax.grad(loss)(v["params"], b_two)
    gd = jax.grad(loss)(v["params"], b_dense)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gd)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_two_tier_loader_fields_cover_every_graph():
    """Loader-built two-tier packs: every valid node appears in exactly one
    tier; CLS slots index the virtual concat and land in the owning tier."""
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import augment_edge

    raw = make_code_dataset(num_graphs=80, size_dist="code2", seed=2)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["y"] = np.asarray([0])
        graphs.append(g)
    ld = GraphLoader(graphs, 32, shuffle=False, num_tasks=2,
                     y_dtype="int32", seq_pack=True, use_native=False)
    b = next(iter(ld))
    assert b.pack2_node is not None
    assert b.pack3_node is not None  # heavy-tailed dataset: 3 tiers
    N = b.num_node_slots
    tiers = [(b.pack_node, b.pack_inv, b.pack_seg, b.pack_rows, b.pack_w),
             (b.pack2_node, b.pack2_inv, b.pack2_seg, b.pack2_rows, b.pack2_w),
             (b.pack3_node, b.pack3_inv, b.pack3_seg, b.pack3_rows, b.pack3_w)]
    offs = np.cumsum([0] + [r * w for _, _, _, r, w in tiers])
    ins = [np.asarray(inv) < r * w for _, inv, _, r, w in tiers]
    max_keep = min(b.pack_w - 1, 1000)
    nn_ = np.asarray(b.num_nodes)
    # every valid, non-truncated node in exactly one tier
    for i in range(len(ins)):
        for j in range(i + 1, len(ins)):
            assert not np.any(ins[i] & ins[j])
    kept = int(np.minimum(nn_, max_keep).sum())
    assert int(sum(x.sum() for x in ins)) == kept
    # cls slots: each graph's lands in the NARROWEST tier that fits it
    gm = np.asarray(b.graph_mask)
    cls = np.asarray(b.pack_cls_slot)[gm]
    tokens = np.minimum(nn_[gm], max_keep) + 1
    tier_of = np.zeros(len(tokens), np.int32)
    for t, (_, _, _, _, w) in list(enumerate(tiers))[1:]:
        tier_of = np.where(tokens <= w, t, tier_of)
    assert np.all((cls >= offs[tier_of]) & (cls < offs[tier_of + 1]))
    # the slot really is the graph's own CLS (seg matches, gathers zero row)
    for gi, c, t in zip(np.nonzero(gm)[0], cls, tier_of):
        pn_t = np.asarray(tiers[t][0])
        seg_t = np.asarray(tiers[t][2])
        loc = c - offs[t]
        assert seg_t[loc] == gi and pn_t[loc] == N


def test_strided_layout_with_packed_transformer_matches():
    """The strided (mol) layout can keep its one-hot aggregation while the
    transformer stage runs packed rows — outputs must match the strided
    dense path exactly."""
    import bench

    s0, _, b0, model = bench.build(batch_size=24, precision="f32",
                                   layout="dense", want_model=True)
    _, _, b1 = bench.build(batch_size=24, precision="f32", layout="dense",
                           seq_pack=True)
    assert b1.pack_node is not None and b1.node_stride > 0
    v = {"params": s0.params, "batch_stats": s0.batch_stats}
    o0 = np.asarray(model.apply(v, b0, None, False))
    o1 = np.asarray(model.apply(v, b1, None, False))
    gm = np.asarray(b0.graph_mask)
    np.testing.assert_allclose(o1[gm], o0[gm], atol=2e-5)
