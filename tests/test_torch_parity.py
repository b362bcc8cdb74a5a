"""Numerical parity against the reference's substrate (torch CPU).

The reference builds on torch modules (nn.TransformerEncoder post-norm,
BatchNorm1d, kaiming-init Linears) — here we copy weights between our flax
modules and the corresponding torch modules and assert allclose outputs.
This is the per-layer parity harness SURVEY §4/§6 calls for, without
depending on PyG (the conv parity uses an independent torch implementation
of the documented message-passing equations from SURVEY §2.5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t2n(t):
    return t.detach().cpu().numpy()


def test_transformer_encoder_matches_torch(rng):
    """Our TransformerNodeEncoder (post-norm, final LN, key padding mask)
    vs torch.nn.TransformerEncoder with identical weights."""
    from graphtrans_tpu.nn.transformer import TransformerNodeEncoder

    B, S, d, H, FF, L = 3, 10, 16, 4, 32, 2
    x = rng.standard_normal((B, S, d)).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[0, 7:] = False
    valid[2, 4:] = False

    enc = TransformerNodeEncoder(d_model=d, nhead=H, dim_feedforward=FF,
                                 dropout=0.0, activation="relu", num_layers=L,
                                 norm_input=False, use_cls=False)
    variables = enc.init({"params": jax.random.key(0)},
                         jnp.asarray(x), jnp.asarray(valid), False)
    params = variables["params"]

    layer = torch.nn.TransformerEncoderLayer(d, H, FF, dropout=0.0,
                                             activation="relu")
    tenc = torch.nn.TransformerEncoder(layer, L, torch.nn.LayerNorm(d))
    tenc.eval()

    with torch.no_grad():
        for i in range(L):
            p = params[f"layer_{i}"]
            tl = tenc.layers[i]
            tl.self_attn.in_proj_weight.copy_(
                torch.tensor(np.asarray(p["MultiheadSelfAttention_0"]["in_proj"]).T))
            tl.self_attn.in_proj_bias.copy_(
                torch.tensor(np.asarray(p["MultiheadSelfAttention_0"]["in_proj_bias"])))
            tl.self_attn.out_proj.weight.copy_(
                torch.tensor(np.asarray(p["MultiheadSelfAttention_0"]["out_proj"]).T))
            tl.self_attn.out_proj.bias.copy_(
                torch.tensor(np.asarray(p["MultiheadSelfAttention_0"]["out_proj_bias"])))
            tl.linear1.weight.copy_(torch.tensor(np.asarray(p["TDense_0"]["kernel"]).T))
            tl.linear1.bias.copy_(torch.tensor(np.asarray(p["TDense_0"]["bias"])))
            tl.linear2.weight.copy_(torch.tensor(np.asarray(p["TDense_1"]["kernel"]).T))
            tl.linear2.bias.copy_(torch.tensor(np.asarray(p["TDense_1"]["bias"])))
            tl.norm1.weight.copy_(torch.tensor(np.asarray(p["LayerNorm_0"]["scale"])))
            tl.norm1.bias.copy_(torch.tensor(np.asarray(p["LayerNorm_0"]["bias"])))
            tl.norm2.weight.copy_(torch.tensor(np.asarray(p["LayerNorm_1"]["scale"])))
            tl.norm2.bias.copy_(torch.tensor(np.asarray(p["LayerNorm_1"]["bias"])))
        tenc.norm.weight.copy_(torch.tensor(np.asarray(params["final_norm"]["scale"])))
        tenc.norm.bias.copy_(torch.tensor(np.asarray(params["final_norm"]["bias"])))

    ours, _ = enc.apply(variables, jnp.asarray(x), jnp.asarray(valid), False)

    # torch expects [S, B, d] and True=pad
    tx = torch.tensor(x).transpose(0, 1)
    pad_mask = torch.tensor(~valid)
    with torch.no_grad():
        theirs = tenc(tx, src_key_padding_mask=pad_mask).transpose(0, 1)

    ours_np = np.asarray(ours)
    theirs_np = t2n(theirs)
    # only valid positions are comparable (padded queries attend nothing)
    np.testing.assert_allclose(ours_np[valid], theirs_np[valid],
                               rtol=2e-4, atol=2e-5)


def test_masked_batchnorm_matches_torch(rng):
    from graphtrans_tpu.nn.norm import MaskedBatchNorm

    N, d = 64, 8
    x = rng.standard_normal((N, d)).astype(np.float32) * 2 + 1
    mask = rng.random(N) > 0.3

    bn = MaskedBatchNorm(d)
    variables = bn.init({"params": jax.random.key(0)},
                        jnp.asarray(x), jnp.asarray(mask), False)

    tbn = torch.nn.BatchNorm1d(d)
    tbn.train()
    xt = torch.tensor(x[mask])

    # two training passes: outputs + running-stat updates must match
    for _ in range(2):
        ours, mut = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                             False, mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
        with torch.no_grad():
            theirs = tbn(xt)
        np.testing.assert_allclose(np.asarray(ours)[mask], t2n(theirs),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               t2n(tbn.running_mean), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               t2n(tbn.running_var), rtol=1e-4, atol=1e-5)

    # eval mode uses running stats
    ours_eval = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask), True)
    tbn.eval()
    with torch.no_grad():
        theirs_eval = tbn(xt)
    np.testing.assert_allclose(np.asarray(ours_eval)[mask], t2n(theirs_eval),
                               rtol=1e-4, atol=1e-5)


def _torch_gcn_conv(x, edge_index, W, b, root_emb):
    """Independent torch implementation of the documented GCN semantics
    (SURVEY §2.5 / conv.py:40-71): x<-Wx; deg=out_degree(src)+1;
    norm=deg^-1/2[src]*deg^-1/2[dst]; out=Σ norm*relu(x_j) + relu(x+root)/deg
    (zero edge features)."""
    x = x @ W.T + b
    src, dst = edge_index
    deg = torch.zeros(x.shape[0]).index_add_(
        0, src, torch.ones(src.shape[0])) + 1
    dis = deg.pow(-0.5)
    norm = dis[src] * dis[dst]
    msg = norm.unsqueeze(-1) * torch.relu(x[src])
    agg = torch.zeros_like(x).index_add_(0, dst, msg)
    return agg + torch.relu(x + root_emb) / deg.unsqueeze(-1)


def test_gcn_conv_matches_torch(rng):
    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.nn.conv import GCNConv
    from graphtrans_tpu.nn.encoders import ZeroEdgeEncoder
    from tests.conftest import make_random_graph

    d = 8
    g = make_random_graph(rng, 12, 30, feat_dim=d)
    batch = collate([g], 2, 16, 64)
    h = rng.standard_normal((16, d)).astype(np.float32)
    h[~batch.node_mask] = 0

    conv = GCNConv(d, edge_encoder=ZeroEdgeEncoder(d))
    variables = conv.init({"params": jax.random.key(0)}, batch,
                          jnp.asarray(h), False)
    p = variables["params"]
    ours = conv.apply(variables, batch, jnp.asarray(h), False)

    W = torch.tensor(np.asarray(p["TDense_0"]["kernel"]).T)
    b = torch.tensor(np.asarray(p["TDense_0"]["bias"]))
    root = torch.tensor(np.asarray(p["root_emb"]))
    theirs = _torch_gcn_conv(
        torch.tensor(h[batch.node_mask]),
        torch.tensor(np.stack([g["edge_index"][0], g["edge_index"][1]])),
        W, b, root,
    )
    np.testing.assert_allclose(np.asarray(ours)[batch.node_mask], t2n(theirs),
                               rtol=2e-4, atol=2e-5)


def test_gin_conv_matches_torch(rng):
    """GIN: out = MLP((1+eps)x + Σ relu(x_j)); MLP Linear-BN-ReLU-Linear
    (training-mode BN over valid rows)."""
    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.nn.conv import GINConv
    from graphtrans_tpu.nn.encoders import ZeroEdgeEncoder
    from tests.conftest import make_random_graph

    d = 8
    g = make_random_graph(rng, 12, 30, feat_dim=d)
    batch = collate([g], 2, 16, 64)
    h = rng.standard_normal((16, d)).astype(np.float32)
    h[~batch.node_mask] = 0

    conv = GINConv(d, edge_encoder=ZeroEdgeEncoder(d))
    variables = conv.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                          batch, jnp.asarray(h), True)
    p = variables["params"]
    ours, _ = conv.apply(variables, batch, jnp.asarray(h), True,
                         mutable=["batch_stats"])

    xt = torch.tensor(h[batch.node_mask])
    src, dst = torch.tensor(g["edge_index"][0]), torch.tensor(g["edge_index"][1])
    agg = torch.zeros_like(xt).index_add_(0, dst, torch.relu(xt[src]))
    eps = float(np.asarray(p["eps"])[0])
    z = (1 + eps) * xt + agg
    lin1 = torch.nn.Linear(d, 2 * d)
    lin2 = torch.nn.Linear(2 * d, d)
    bn = torch.nn.BatchNorm1d(2 * d)
    with torch.no_grad():
        lin1.weight.copy_(torch.tensor(np.asarray(p["TDense_0"]["kernel"]).T))
        lin1.bias.copy_(torch.tensor(np.asarray(p["TDense_0"]["bias"])))
        lin2.weight.copy_(torch.tensor(np.asarray(p["TDense_1"]["kernel"]).T))
        lin2.bias.copy_(torch.tensor(np.asarray(p["TDense_1"]["bias"])))
    bn.train()
    theirs = lin2(torch.relu(bn(lin1(z))))
    np.testing.assert_allclose(np.asarray(ours)[batch.node_mask], t2n(theirs),
                               rtol=2e-3, atol=2e-4)


def test_virtualnode_gnn_stack_matches_torch(rng):
    """Full GIN-virtual stack, JK=cat, eval mode: independent torch
    implementation of the documented layer/VN ordering
    (SURVEY §2.5 / gnn_module.py:111-241) with copied weights."""
    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.nn.encoders import ZeroEdgeEncoder
    from graphtrans_tpu.nn.gnn import GNNNodeEmbedding
    from tests.conftest import make_random_graph

    d, L = 8, 3
    graphs = [make_random_graph(rng, 7, 16, feat_dim=d),
              make_random_graph(rng, 5, 10, feat_dim=d)]
    batch = collate(graphs, 3, 16, 64)
    h0 = rng.standard_normal((16, d)).astype(np.float32)
    h0[~batch.node_mask] = 0
    b2 = batch.__class__(**{
        **{f.name: getattr(batch, f.name) for f in __import__("dataclasses").fields(batch)},
        "node_feat": h0,
    })

    stack = GNNNodeEmbedding(
        num_layer=L, emb_dim=d, node_encoder=None,
        edge_encoder_factory=ZeroEdgeEncoder, drop_ratio=0.0, JK="cat",
        residual=False, gnn_type="gin", virtual_node=True,
    )
    variables = stack.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b2, None, False,
    )
    # eval mode (BN running averages: fresh init -> mean 0 var 1)
    ours = np.asarray(stack.apply(variables, b2, None, False))

    p = variables["params"]
    xt = torch.tensor(h0[batch.node_mask])
    n_per = [7, 5]
    graph_of = torch.tensor(np.asarray(batch.node_graph)[batch.node_mask].astype(np.int64))
    src = torch.tensor(np.concatenate([graphs[0]["edge_index"][0],
                                       graphs[1]["edge_index"][0] + 7]).astype(np.int64))
    dst = torch.tensor(np.concatenate([graphs[0]["edge_index"][1],
                                       graphs[1]["edge_index"][1] + 7]).astype(np.int64))

    def lin(prm, x):
        return x @ torch.tensor(np.asarray(prm["kernel"])) + torch.tensor(np.asarray(prm["bias"]))

    def bn_eval(prm_scale_bias, x):
        s = torch.tensor(np.asarray(prm_scale_bias["scale"]))
        b = torch.tensor(np.asarray(prm_scale_bias["bias"]))
        return x / np.sqrt(1 + 1e-5) * s + b  # running stats: mean 0, var 1

    vn = torch.zeros(2, d) + torch.tensor(np.asarray(p["virtualnode_embedding"]))
    h_list = [xt]
    for layer in range(L):
        h_in = h_list[layer] + vn[graph_of]
        h_list[layer] = h_in
        cp = p[f"conv_{layer}"]
        agg = torch.zeros_like(h_in).index_add_(0, dst, torch.relu(h_in[src]))
        eps = float(np.asarray(cp["eps"])[0])
        z = (1 + eps) * h_in + agg
        z = lin(cp["TDense_0"], z)
        z = bn_eval(cp["mlp_bn"], z)
        z = lin(cp["TDense_1"], torch.relu(z))
        z = bn_eval(p[f"bn_{layer}"], z)
        if layer < L - 1:
            z = torch.relu(z)
        h_list.append(z)
        if layer < L - 1:
            pooled = torch.zeros(2, d).index_add_(0, graph_of, h_list[layer])
            v = pooled + vn
            vp = p[f"vn_mlp_{layer}"]
            v = lin(vp["TDense_0"], v)
            v = torch.relu(bn_eval(vp["MaskedBatchNorm_0"], v))
            v = lin(vp["TDense_1"], v)
            v = torch.relu(bn_eval(vp["MaskedBatchNorm_1"], v))
            vn = v
    theirs = torch.cat([h_list[0], h_list[-1]], dim=-1)
    np.testing.assert_allclose(ours[np.asarray(batch.node_mask)], t2n(theirs),
                               rtol=2e-4, atol=2e-5)
