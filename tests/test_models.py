import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.models import MODELS
from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
from tests.conftest import make_random_graph


def default_args(**over):
    ns = argparse.Namespace(
        model_type="gnn-transformer",
        graph_pooling="cls",
        gnn_type="gcn",
        gnn_virtual_node=False,
        gnn_dropout=0.1,
        gnn_num_layer=2,
        gnn_emb_dim=16,
        gnn_JK="last",
        gnn_residual=False,
        d_model=16,
        nhead=4,
        dim_feedforward=32,
        transformer_dropout=0.1,
        transformer_activation="relu",
        num_encoder_layers=2,
        max_input_len=1000,
        transformer_norm_input=True,
        num_encoder_layers_masked=0,
        transformer_prenorm=False,
        max_seq_len=None,
        pos_encoder=False,
        pretrained_gnn=None,
        freeze_gnn=None,
        graph_input_dim=None,
        aggregators=["mean", "max", "min", "std"],
        scalers=["identity", "amplification", "attenuation"],
        scheduler=None,
        lr=1e-3,
        max_lr=1e-3,
        pct_start=0.3,
        weight_decay=0.0,
        grad_clip=None,
        epochs=10,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def make_batch(rng, n=3, feat_dim=8):
    graphs = [make_random_graph(rng, 5 + i, 8 + i, feat_dim=feat_dim) for i in range(n)]
    return collate(graphs, n + 1, 32, 64)


def build_and_run(model_cls, args, batch, num_tasks=2, deg=None, training=False):
    node_enc = LinearNodeEncoder(model_cls.get_emb_dim(args))
    model = model_cls.build(num_tasks, args, node_enc, ZeroEdgeEncoder, deg=deg)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    out, mutated = model.apply(
        variables, batch, None, training,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    return out, variables


@pytest.mark.parametrize("name", ["gnn", "transformer", "gnn-transformer", "transformer-gnn"])
def test_models_forward_shapes(rng, name):
    batch = make_batch(rng)
    args = default_args(model_type=name, graph_pooling="cls" if "transformer" in name else "mean")
    if name in ("gnn", "transformer-gnn"):
        args.graph_pooling = "mean"
    out, _ = build_and_run(MODELS[name], args, batch)
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name", ["pna", "pna-transformer"])
def test_pna_models(rng, name):
    batch = make_batch(rng)
    args = default_args(model_type=name, gnn_emb_dim=16,
                        graph_pooling="mean" if name == "pna" else "cls")
    deg = np.bincount([2, 3, 2, 4, 1], minlength=10)
    out, _ = build_and_run(MODELS[name], args, batch, deg=deg)
    assert out.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_gnn_transformer_variants(rng):
    batch = make_batch(rng)
    for over in [
        dict(gnn_virtual_node=True),
        dict(gnn_JK="cat"),
        dict(gnn_JK="sum"),
        dict(gnn_type="gin"),
        dict(gnn_residual=True),
        dict(graph_pooling="mean"),
        dict(graph_pooling="last"),
        dict(pos_encoder=True),
        dict(max_seq_len=5),
    ]:
        args = default_args(**over)
        out, _ = build_and_run(MODELS["gnn-transformer"], args, batch, training=True)
        if over.get("max_seq_len"):
            assert out.shape == (4, 5, 2)
        else:
            assert out.shape == (4, 2)
        assert np.all(np.isfinite(np.asarray(out))), over


def test_masked_encoder_path(rng):
    graphs = [make_random_graph(rng, 5, 8), make_random_graph(rng, 4, 6)]
    batch = collate(graphs, 3, 16, 32, with_dense_adj=True)
    args = default_args(num_encoder_layers_masked=1)
    out, _ = build_and_run(MODELS["gnn-transformer"], args, batch)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pooling_zoo(rng):
    batch = make_batch(rng)
    for pool in ["sum", "mean", "max", "attention", "set2set"]:
        args = default_args(model_type="gnn", graph_pooling=pool)
        out, _ = build_and_run(MODELS["gnn"], args, batch)
        assert out.shape == (4, 2), pool


def test_padding_invariance(rng):
    """Same graphs, different padding -> identical valid outputs (eval mode)."""
    graphs = [make_random_graph(rng, 5, 8), make_random_graph(rng, 4, 6)]
    b1 = collate(graphs, 3, 16, 32)
    b2 = collate(graphs, 6, 32, 64)
    args = default_args()
    node_enc = LinearNodeEncoder(16)
    model = MODELS["gnn-transformer"].build(2, args, node_enc, ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, b1, None, False
    )
    o1 = model.apply(variables, b1, None, False)
    o2 = model.apply(variables, b2, None, False)
    np.testing.assert_allclose(np.asarray(o1)[:2], np.asarray(o2)[:2], rtol=2e-4, atol=2e-5)


def test_perturb_gradient_flows(rng):
    batch = make_batch(rng)
    args = default_args()
    node_enc = LinearNodeEncoder(16)
    model = MODELS["gnn-transformer"].build(2, args, node_enc, ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, None, False
    )
    perturb = jnp.zeros((batch.num_node_slots, 16))

    def loss(p):
        out = model.apply(variables, batch, p, False)
        return jnp.sum(out**2)

    g = jax.grad(loss)(perturb)
    assert np.abs(np.asarray(g)).sum() > 0


def test_chunked_attention_matches_dense(rng):
    """Online-softmax chunked attention must equal the dense masked softmax
    path (eval mode, mixed padding)."""
    import jax.numpy as jnp

    from graphtrans_tpu.nn.transformer import (
        chunked_masked_attention, masked_softmax,
    )

    B, H, S, hd = 2, 4, 100, 16
    q = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[0, 60:] = False
    valid[1, 5:] = False
    valid = jnp.asarray(valid)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
    att = masked_softmax(scores, valid[:, None, None, :])
    ref = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    for chunk in (16, 33, 100, 128):
        got = chunked_masked_attention(q, k, v, valid, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5, err_msg=f"chunk={chunk}")


def test_long_sequence_model_uses_chunked_path(rng):
    """A >=512-node graph routes through chunked attention; outputs finite
    and gradient flows (train mode with dropout exercises in-scan dropout)."""
    import jax
    import jax.numpy as jnp

    from graphtrans_tpu.data.batch import collate

    g = make_random_graph(rng, 600, 1200, feat_dim=8)
    batch = collate([g], 2, 1024, 2048, max_input_len=1000)
    assert batch.max_nodes_dense >= 512
    args = default_args(num_encoder_layers=1, transformer_dropout=0.1)
    out, variables = build_and_run(MODELS["gnn-transformer"], args, batch,
                                   training=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_masked_encoder_respects_adjacency(rng):
    """In the adjacency-masked encoder, changing a NON-adjacent node's
    features must not change a node's output (single block, eval mode)."""
    import jax.numpy as jnp

    from graphtrans_tpu.nn.masked_transformer import MaskedOnlyTransformerEncoder

    B, S, d = 1, 6, 16
    x = rng.standard_normal((B, S, d)).astype(np.float32)
    adj = np.eye(S, dtype=bool)
    adj[0, 1] = adj[1, 0] = True  # 0-1 adjacent; node 5 isolated
    valid = np.ones((B, S), bool)

    enc = MaskedOnlyTransformerEncoder(num_layers=1, d_model=d,
                                       dim_feedforward=32, nhead=4, dropout=0.0)
    vs = enc.init({"params": jax.random.key(0)}, jnp.asarray(x),
                  jnp.asarray(adj[None]), jnp.asarray(valid), False)
    out1 = np.asarray(enc.apply(vs, jnp.asarray(x), jnp.asarray(adj[None]),
                                jnp.asarray(valid), False))
    x2 = x.copy()
    x2[0, 5] += 10.0  # perturb isolated node
    out2 = np.asarray(enc.apply(vs, jnp.asarray(x2), jnp.asarray(adj[None]),
                                jnp.asarray(valid), False))
    # nodes 0-4 must be unaffected by node 5's change
    np.testing.assert_allclose(out1[0, :5], out2[0, :5], rtol=1e-5, atol=1e-6)
    # node 5's own output does change
    assert np.abs(out1[0, 5] - out2[0, 5]).max() > 1e-3


def test_transformer_model_unpad_pooling_paths(rng):
    """Transformer-only model with non-cls pooling: transformer output is
    unpacked back to nodes and pooled PyG-style (reference
    transformer.py:103-107)."""
    batch = make_batch(rng)
    for pool in ["mean", "sum", "attention"]:
        args = default_args(model_type="transformer", graph_pooling=pool)
        out, _ = build_and_run(MODELS["transformer"], args, batch)
        assert out.shape == (4, 2), pool
        assert np.all(np.isfinite(np.asarray(out)))


def test_byte_dropout_semantics(rng):
    """ByteDropout: keep rate within quantization of the target, kept values
    scaled by exactly 1/(1-rate_q), deterministic under a fixed rng, and
    identity in deterministic mode."""
    from graphtrans_tpu.nn.dropout import ByteDropout

    x = jnp.asarray(rng.standard_normal((2000, 64)).astype(np.float32)) + 5.0
    drop = ByteDropout(0.3)
    v = drop.init({"dropout": jax.random.key(0)}, x, False)
    out = drop.apply(v, x, False, rngs={"dropout": jax.random.key(1)})
    out2 = drop.apply(v, x, False, rngs={"dropout": jax.random.key(1)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    kept = np.asarray(out) != 0
    rate_q = round(0.3 * 256) / 256
    assert abs(kept.mean() - (1 - rate_q)) < 0.01
    scale = np.asarray(out)[kept] / np.asarray(x)[kept]
    np.testing.assert_allclose(scale, 1.0 / (1.0 - rate_q), rtol=1e-5)

    ident = drop.apply(v, x, True)
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))
