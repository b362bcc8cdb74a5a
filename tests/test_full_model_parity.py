"""FULL-MODEL numerical parity against the reference semantics in torch.

Per-module parity (test_torch_parity.py) can miss composition details — VN
ordering, JK=cat sources, front-pad/truncation, CLS-at-end readout, head
wiring. Here the ENTIRE flagship (GIN-virtual JK=cat stack -> gnn2transformer
-> front-padded CLS transformer -> head, per
/root/reference/models/gnn_transformer.py:90-127 composed with
modules/gnn_module.py:111-241) is built independently in torch with weights
copied from the flax model, asserting LOGITS and INPUT-GRADIENTS match in
eval mode. Also numerical (not shape) parity for the GlobalAttention and
Set2Set pooling readouts (/root/reference/models/gnn.py:66-81).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graphtrans_tpu.data.batch import collate  # noqa: E402
from graphtrans_tpu.models import MODELS  # noqa: E402
from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder  # noqa: E402
from tests.conftest import make_random_graph  # noqa: E402
from tests.test_models import default_args  # noqa: E402


def t2n(t):
    return t.detach().cpu().numpy()


def _tt(x):
    return torch.tensor(np.asarray(x))


def _lin(prm, x):
    return x @ _tt(prm["kernel"]) + _tt(prm["bias"])


def _randomize_batch_stats(bs, rng):
    """Non-trivial running stats so eval-mode BN is genuinely exercised."""
    def rnd(path, x):
        leaf = str(getattr(path[-1], "key", path[-1]))
        v = rng.standard_normal(x.shape).astype(np.float32)
        if leaf == "var":
            v = np.abs(v) + 0.5
        return jnp.asarray(v)

    return jax.tree_util.tree_map_with_path(rnd, bs)


def _bn_eval(params_sb, stats, x, eps=1e-5):
    mean, var = _tt(stats["mean"]), _tt(stats["var"])
    return (x - mean) / torch.sqrt(var + eps) * _tt(params_sb["scale"]) + _tt(params_sb["bias"])


def _torch_flagship(p, bs, node_feat, graphs, num_tasks, S, d_model, nhead, L_gnn, L_tf):
    """Reference composition in torch, differentiable w.r.t. node_feat."""
    n_per = [g["x"].shape[0] for g in graphs]
    N = sum(n_per)
    graph_of = torch.tensor(np.repeat(np.arange(len(graphs)), n_per))
    src = torch.tensor(np.concatenate(
        [g["edge_index"][0] + off for g, off in
         zip(graphs, np.cumsum([0] + n_per[:-1]))]).astype(np.int64))
    dst = torch.tensor(np.concatenate(
        [g["edge_index"][1] + off for g, off in
         zip(graphs, np.cumsum([0] + n_per[:-1]))]).astype(np.int64))
    G = len(graphs)

    # node encoder (Linear) — applied once inside the GNN stack
    xt = _lin(p["node_encoder"]["TDense_0"], node_feat)

    # GIN-virtual stack, JK=cat (gnn_module.py:111-241 ordering)
    gp, gbs = p["gnn_node"], bs["gnn_node"]
    vn = torch.zeros(G, xt.shape[1]) + _tt(gp["virtualnode_embedding"])
    h_list = [xt]
    for layer in range(L_gnn):
        h_in = h_list[layer] + vn[graph_of]
        h_list[layer] = h_in  # reference mutates h_list in place
        cp, cbs = gp[f"conv_{layer}"], gbs[f"conv_{layer}"]
        agg = torch.zeros_like(h_in).index_add_(0, dst, torch.relu(h_in[src]))
        z = (1 + float(np.asarray(cp["eps"])[0])) * h_in + agg
        z = _lin(cp["TDense_0"], z)
        z = _bn_eval(cp["mlp_bn"], cbs["mlp_bn"], z)
        z = _lin(cp["TDense_1"], torch.relu(z))
        z = _bn_eval(gp[f"bn_{layer}"], gbs[f"bn_{layer}"], z)
        if layer < L_gnn - 1:
            z = torch.relu(z)
        h_list.append(z)
        if layer < L_gnn - 1:
            pooled = torch.zeros(G, z.shape[1]).index_add_(0, graph_of, h_list[layer])
            v = pooled + vn
            vp, vbs = gp[f"vn_mlp_{layer}"], gbs[f"vn_mlp_{layer}"]
            v = _lin(vp["TDense_0"], v)
            v = torch.relu(_bn_eval(vp["MaskedBatchNorm_0"], vbs["MaskedBatchNorm_0"], v))
            v = _lin(vp["TDense_1"], v)
            v = torch.relu(_bn_eval(vp["MaskedBatchNorm_1"], vbs["MaskedBatchNorm_1"], v))
            vn = v
    h_node = torch.cat([h_list[0], h_list[-1]], dim=-1)  # JK=cat

    h_node = _lin(p["gnn2transformer"], h_node)

    # pad_batch: FRONT padding, graphs truncated to their LAST S nodes
    # (modules/utils.py:16-25)
    d = h_node.shape[1]
    padded = torch.zeros(S, G, d)
    pad_mask = torch.ones(G, S, dtype=torch.bool)  # True = pad
    off = 0
    for i, n in enumerate(n_per):
        keep = min(n, S)
        rows = h_node[off + n - keep: off + n]
        padded[S - keep:, i] = rows
        pad_mask[i, S - keep:] = False
        off += n

    # CLS appended at the END, then input LayerNorm
    # (transformer_encoder.py:50-57)
    tp = p["transformer_encoder"]
    cls = _tt(tp["cls_embedding"]).expand(1, G, d).clone()
    padded = torch.cat([padded, cls], dim=0)
    pad_mask = torch.cat([pad_mask, torch.zeros(G, 1, dtype=torch.bool)], dim=1)
    ln_in = torch.nn.LayerNorm(d)
    with torch.no_grad():
        ln_in.weight.copy_(_tt(tp["norm_input"]["scale"]))
        ln_in.bias.copy_(_tt(tp["norm_input"]["bias"]))
    padded = ln_in(padded)

    layer = torch.nn.TransformerEncoderLayer(d, nhead, 2 * d, dropout=0.0,
                                             activation="relu")
    tenc = torch.nn.TransformerEncoder(layer, L_tf, torch.nn.LayerNorm(d))
    tenc.eval()
    with torch.no_grad():
        for i in range(L_tf):
            lp = tp[f"layer_{i}"]
            tl = tenc.layers[i]
            tl.self_attn.in_proj_weight.copy_(_tt(lp["MultiheadSelfAttention_0"]["in_proj"]).T)
            tl.self_attn.in_proj_bias.copy_(_tt(lp["MultiheadSelfAttention_0"]["in_proj_bias"]))
            tl.self_attn.out_proj.weight.copy_(_tt(lp["MultiheadSelfAttention_0"]["out_proj"]).T)
            tl.self_attn.out_proj.bias.copy_(_tt(lp["MultiheadSelfAttention_0"]["out_proj_bias"]))
            tl.linear1.weight.copy_(_tt(lp["TDense_0"]["kernel"]).T)
            tl.linear1.bias.copy_(_tt(lp["TDense_0"]["bias"]))
            tl.linear2.weight.copy_(_tt(lp["TDense_1"]["kernel"]).T)
            tl.linear2.bias.copy_(_tt(lp["TDense_1"]["bias"]))
            tl.norm1.weight.copy_(_tt(lp["LayerNorm_0"]["scale"]))
            tl.norm1.bias.copy_(_tt(lp["LayerNorm_0"]["bias"]))
            tl.norm2.weight.copy_(_tt(lp["LayerNorm_1"]["scale"]))
            tl.norm2.bias.copy_(_tt(lp["LayerNorm_1"]["bias"]))
        tenc.norm.weight.copy_(_tt(tp["final_norm"]["scale"]))
        tenc.norm.bias.copy_(_tt(tp["final_norm"]["bias"]))
    out = tenc(padded, src_key_padding_mask=pad_mask)

    h_graph = out[-1]  # CLS-at-end readout (gnn_transformer.py:114-115)
    return _lin(p["head"]["head"], h_graph)


def test_full_flagship_matches_torch(rng):
    """Logits AND input-gradients of the composed flagship match torch
    (eval mode, randomized BN running stats, truncation active)."""
    num_tasks, d, L_gnn, L_tf, S_cap = 3, 16, 2, 2, 12
    graphs = [make_random_graph(rng, 16, 40, feat_dim=d, num_classes=num_tasks),
              make_random_graph(rng, 7, 18, feat_dim=d, num_classes=num_tasks),
              make_random_graph(rng, 10, 25, feat_dim=d, num_classes=num_tasks)]
    batch = collate(graphs, 4, 64, 256, max_input_len=S_cap)
    S = min(batch.max_nodes_dense, S_cap)

    args = default_args(gnn_type="gin", gnn_virtual_node=True, gnn_JK="cat",
                        gnn_dropout=0.0, transformer_dropout=0.0,
                        transformer_norm_input=True, graph_pooling="cls",
                        max_input_len=S_cap)
    model = MODELS["gnn-transformer"].build(num_tasks, args,
                                            LinearNodeEncoder(d), ZeroEdgeEncoder)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    params = variables["params"]
    bstats = _randomize_batch_stats(variables["batch_stats"], rng)

    w = rng.standard_normal((3, num_tasks)).astype(np.float32)

    def loss_fn(feat):
        b2 = dataclasses.replace(batch, node_feat=feat)
        out = model.apply({"params": params, "batch_stats": bstats}, b2, None, False)
        return jnp.sum(out[:3] * jnp.asarray(w)), out

    (loss, ours), g = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(batch.node_feat))
    ours = np.asarray(ours)
    g = np.asarray(g)

    feat_t = torch.tensor(np.asarray(batch.node_feat)[np.asarray(batch.node_mask)],
                          requires_grad=True)
    theirs = _torch_flagship(params, bstats, feat_t, graphs, num_tasks,
                             S, args.d_model, args.nhead, L_gnn, L_tf)
    loss_t = (theirs * torch.tensor(w)).sum()
    loss_t.backward()

    mask = np.asarray(batch.graph_mask)
    np.testing.assert_allclose(ours[mask], t2n(theirs), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-3)
    np.testing.assert_allclose(g[np.asarray(batch.node_mask)], t2n(feat_t.grad),
                               rtol=5e-3, atol=5e-4)
    # padded node rows must receive zero gradient
    assert np.abs(g[~np.asarray(batch.node_mask)]).max() == 0.0


def _torch_global_attention(p, bs, x, batch_vec, G):
    """PyG GlobalAttention semantics: per-graph softmax of gate_nn scores,
    weighted sum (ref models/gnn.py:70-78 gate net Linear-BN-ReLU-Linear)."""
    gate = _lin(p["TDense_0"], x)
    gate = _bn_eval(p["MaskedBatchNorm_0"], bs["MaskedBatchNorm_0"], gate)
    gate = _lin(p["TDense_1"], torch.relu(gate))[:, 0]
    out = torch.zeros(G, x.shape[1])
    for gi in range(G):
        m = batch_vec == gi
        a = torch.softmax(gate[m], dim=0)
        out[gi] = (a[:, None] * x[m]).sum(0)
    return out


def test_global_attention_pool_matches_reference(rng):
    from graphtrans_tpu.nn.pooling import GlobalAttentionPool

    N, d, G = 40, 8, 3
    h = rng.standard_normal((N + 8, d)).astype(np.float32)
    mask = np.zeros(N + 8, bool)
    mask[:N] = True
    h[~mask] = 0
    ng = np.sort(rng.integers(0, G, N)).astype(np.int32)
    ng = np.concatenate([ng, np.full(8, G - 1, np.int32)])

    pool = GlobalAttentionPool(d)
    v = pool.init({"params": jax.random.key(0)}, jnp.asarray(h),
                  jnp.asarray(ng), jnp.asarray(mask), G, False)
    bs = _randomize_batch_stats(v["batch_stats"], rng)
    ours = pool.apply({"params": v["params"], "batch_stats": bs},
                      jnp.asarray(h), jnp.asarray(ng), jnp.asarray(mask), G, False)
    theirs = _torch_global_attention(v["params"], bs, _tt(h[mask]),
                                     torch.tensor(ng[mask].astype(np.int64)), G)
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), rtol=2e-4, atol=2e-5)


def test_set2set_pool_matches_torch_lstm(rng):
    """Set2Set vs an independent torch composition using torch.nn.LSTM —
    pins the flax OptimizedLSTMCell gate ordering (ii/if/ig/io == torch's
    i,f,g,o chunks) and the q_star/attend/readout loop (PyG Set2Set,
    processing_steps=2)."""
    from graphtrans_tpu.nn.pooling import Set2SetPool

    N, d, G, steps = 30, 8, 3, 2
    h = rng.standard_normal((N + 6, d)).astype(np.float32)
    mask = np.zeros(N + 6, bool)
    mask[:N] = True
    h[~mask] = 0
    ng = np.sort(rng.integers(0, G, N)).astype(np.int32)
    ng = np.concatenate([ng, np.full(6, G - 1, np.int32)])

    pool = Set2SetPool(d, processing_steps=steps)
    v = pool.init({"params": jax.random.key(3)}, jnp.asarray(h),
                  jnp.asarray(ng), jnp.asarray(mask), G)
    ours = np.asarray(pool.apply(v, jnp.asarray(h), jnp.asarray(ng),
                                 jnp.asarray(mask), G))

    p = v["params"]["OptimizedLSTMCell_0"]
    lstm = torch.nn.LSTM(2 * d, d, num_layers=1)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.cat(
            [_tt(p[k]["kernel"]).T for k in ("ii", "if", "ig", "io")], dim=0))
        lstm.weight_hh_l0.copy_(torch.cat(
            [_tt(p[k]["kernel"]).T for k in ("hi", "hf", "hg", "ho")], dim=0))
        lstm.bias_hh_l0.copy_(torch.cat(
            [_tt(p[k]["bias"]) for k in ("hi", "hf", "hg", "ho")], dim=0))
        lstm.bias_ih_l0.zero_()

    x = _tt(h[mask])
    bv = torch.tensor(ng[mask].astype(np.int64))
    q_star = torch.zeros(G, 2 * d)
    hidden = (torch.zeros(1, G, d), torch.zeros(1, G, d))
    with torch.no_grad():
        for _ in range(steps):
            q, hidden = lstm(q_star.unsqueeze(0), hidden)
            q = q.view(G, d)
            e = (x * q[bv]).sum(-1)
            a = torch.zeros_like(e)
            for gi in range(G):
                m = bv == gi
                a[m] = torch.softmax(e[m], dim=0)
            r = torch.zeros(G, d).index_add_(0, bv, a[:, None] * x)
            q_star = torch.cat([q, r], dim=-1)
    np.testing.assert_allclose(ours, t2n(q_star), rtol=2e-4, atol=2e-5)
