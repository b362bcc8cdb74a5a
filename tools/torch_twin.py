"""Trainable torch twin of the GNNTransformer flagship.

An INDEPENDENT torch implementation of the reference composition
(GIN-virtual JK=cat stack -> gnn2transformer -> front-padded CLS
transformer -> linear head, per /root/reference/models/gnn_transformer.py:90-127
composed with /root/reference/modules/gnn_module.py:111-241), built from
torch.nn primitives so that train-mode BatchNorm (running-stat momentum,
biased/unbiased variance split), AdamW bias correction, global-norm grad
clipping and the cosine schedule all come from torch itself — the oracle the
reference trains with. Initial weights are copied FROM the flax model so both
frameworks start at the identical point in parameter space.

Used by tools/train_parity.py (cross-framework training-dynamics parity
artifact) and tests/test_training_parity.py. Dropout is fixed at 0 — the two
frameworks cannot share a bit-identical dropout stream; parity runs disable
it on both sides (the VERDICT-sanctioned setting).

The eval-mode composition here is the same one tests/test_full_model_parity.py
pins against the flax model (logits + input grads); this module extends it to
a torch nn.Module whose BN layers update running statistics in train mode.
"""

from __future__ import annotations

import math

import numpy as np
import torch


def _t(x):
    return torch.tensor(np.asarray(x))


class TorchGINVirtualFlagship(torch.nn.Module):
    """Reference flagship in torch: GIN-virtual JK=cat -> transformer, CLS."""

    def __init__(self, feat_dim: int, emb_dim: int, num_layer: int,
                 d_model: int, nhead: int, dim_feedforward: int,
                 num_tf_layers: int, num_tasks: int,
                 max_input_len: int = 1000):
        super().__init__()
        self.num_layer = num_layer
        self.max_input_len = max_input_len
        self.node_encoder = torch.nn.Linear(feat_dim, emb_dim)

        # GIN convs (reference modules/conv.py GINConv: mlp((1+eps)x + agg))
        self.eps = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(1)) for _ in range(num_layer)])
        self.mlp1 = torch.nn.ModuleList(
            [torch.nn.Linear(emb_dim, 2 * emb_dim) for _ in range(num_layer)])
        self.mlp_bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(2 * emb_dim) for _ in range(num_layer)])
        self.mlp2 = torch.nn.ModuleList(
            [torch.nn.Linear(2 * emb_dim, emb_dim) for _ in range(num_layer)])
        self.bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(emb_dim) for _ in range(num_layer)])

        # virtual node (gnn_module.py:122-170)
        self.vn_emb = torch.nn.Parameter(torch.zeros(emb_dim))
        self.vn_lin1 = torch.nn.ModuleList(
            [torch.nn.Linear(emb_dim, 2 * emb_dim) for _ in range(num_layer - 1)])
        self.vn_bn1 = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(2 * emb_dim) for _ in range(num_layer - 1)])
        self.vn_lin2 = torch.nn.ModuleList(
            [torch.nn.Linear(2 * emb_dim, emb_dim) for _ in range(num_layer - 1)])
        self.vn_bn2 = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(emb_dim) for _ in range(num_layer - 1)])

        self.gnn2transformer = torch.nn.Linear(2 * emb_dim, d_model)
        self.cls_embedding = torch.nn.Parameter(torch.zeros(d_model))
        self.norm_input = torch.nn.LayerNorm(d_model)
        layer = torch.nn.TransformerEncoderLayer(
            d_model, nhead, dim_feedforward, dropout=0.0, activation="relu")
        self.encoder = torch.nn.TransformerEncoder(
            layer, num_tf_layers, torch.nn.LayerNorm(d_model))
        self.head = torch.nn.Linear(d_model, num_tasks)

    def forward(self, x, src, dst, graph_of, n_per, perturb=None):
        """x [N,F] float; src/dst [E] int64; graph_of [N] int64; n_per list."""
        G = len(n_per)
        h = self.node_encoder(x)
        if perturb is not None:
            h = h + perturb
        vn = self.vn_emb.unsqueeze(0).expand(G, -1)
        h_list = [h]
        for layer in range(self.num_layer):
            h_in = h_list[layer] + vn[graph_of]
            h_list[layer] = h_in  # reference mutates h_list in place
            # zero edge encoder: message = relu(x_src + 0)
            agg = torch.zeros_like(h_in).index_add(0, dst, torch.relu(h_in[src]))
            z = (1 + self.eps[layer]) * h_in + agg
            z = self.mlp2[layer](torch.relu(self.mlp_bn[layer](self.mlp1[layer](z))))
            z = self.bn[layer](z)
            if layer < self.num_layer - 1:
                z = torch.relu(z)
            h_list.append(z)
            if layer < self.num_layer - 1:
                pooled = torch.zeros(G, h_in.shape[1]).index_add(
                    0, graph_of, h_list[layer])
                v = pooled + vn
                v = torch.relu(self.vn_bn1[layer](self.vn_lin1[layer](v)))
                v = torch.relu(self.vn_bn2[layer](self.vn_lin2[layer](v)))
                vn = v
        h_node = torch.cat([h_list[0], h_list[-1]], dim=-1)  # JK=cat
        h_node = self.gnn2transformer(h_node)

        # pad_batch: FRONT padding, keep the LAST S nodes (modules/utils.py:16-25)
        d = h_node.shape[1]
        S = min(max(n_per), self.max_input_len)
        padded = torch.zeros(S, G, d, dtype=h_node.dtype)
        pad_mask = torch.ones(G, S, dtype=torch.bool)  # True = pad
        off = 0
        for i, n in enumerate(n_per):
            keep = min(n, S)
            padded[S - keep:, i] = h_node[off + n - keep: off + n]
            pad_mask[i, S - keep:] = False
            off += n
        # CLS appended at the END, then input LayerNorm
        # (transformer_encoder.py:50-57)
        cls = self.cls_embedding.view(1, 1, d).expand(1, G, d)
        padded = torch.cat([padded, cls], dim=0)
        pad_mask = torch.cat(
            [pad_mask, torch.zeros(G, 1, dtype=torch.bool)], dim=1)
        padded = self.norm_input(padded)
        out = self.encoder(padded, src_key_padding_mask=pad_mask)
        return self.head(out[-1])  # CLS-at-end readout


def batch_to_torch(graphs):
    """Concatenate a list of graph dicts into flat torch batch tensors."""
    n_per = [int(g["x"].shape[0]) for g in graphs]
    offs = np.cumsum([0] + n_per[:-1])
    x = torch.tensor(np.concatenate([g["x"] for g in graphs]).astype(np.float32))
    src = torch.tensor(np.concatenate(
        [g["edge_index"][0] + o for g, o in zip(graphs, offs)]).astype(np.int64))
    dst = torch.tensor(np.concatenate(
        [g["edge_index"][1] + o for g, o in zip(graphs, offs)]).astype(np.int64))
    graph_of = torch.tensor(np.repeat(np.arange(len(graphs)), n_per))
    y = torch.tensor(np.concatenate([np.asarray(g["y"]).reshape(-1)
                                     for g in graphs]).astype(np.int64))
    return x, src, dst, graph_of, n_per, y


def _copy_lin(tlin: torch.nn.Linear, prm):
    with torch.no_grad():
        tlin.weight.copy_(_t(prm["kernel"]).T)
        tlin.bias.copy_(_t(prm["bias"]))


def _copy_bn(tbn: torch.nn.BatchNorm1d, prm, stats):
    with torch.no_grad():
        tbn.weight.copy_(_t(prm["scale"]))
        tbn.bias.copy_(_t(prm["bias"]))
        tbn.running_mean.copy_(_t(stats["mean"]))
        tbn.running_var.copy_(_t(stats["var"]))


def load_from_flax(twin: TorchGINVirtualFlagship, params, batch_stats):
    """Copy flax flagship params (+ BN running stats) into the torch twin."""
    _copy_lin(twin.node_encoder, params["node_encoder"]["TDense_0"])
    gp, gbs = params["gnn_node"], batch_stats["gnn_node"]
    with torch.no_grad():
        twin.vn_emb.copy_(_t(gp["virtualnode_embedding"]).reshape(-1))
    for i in range(twin.num_layer):
        cp, cbs = gp[f"conv_{i}"], gbs[f"conv_{i}"]
        with torch.no_grad():
            twin.eps[i].copy_(_t(cp["eps"]).reshape(1))
        _copy_lin(twin.mlp1[i], cp["TDense_0"])
        _copy_bn(twin.mlp_bn[i], cp["mlp_bn"], cbs["mlp_bn"])
        _copy_lin(twin.mlp2[i], cp["TDense_1"])
        _copy_bn(twin.bn[i], gp[f"bn_{i}"], gbs[f"bn_{i}"])
    for i in range(twin.num_layer - 1):
        vp, vbs = gp[f"vn_mlp_{i}"], gbs[f"vn_mlp_{i}"]
        _copy_lin(twin.vn_lin1[i], vp["TDense_0"])
        _copy_bn(twin.vn_bn1[i], vp["MaskedBatchNorm_0"], vbs["MaskedBatchNorm_0"])
        _copy_lin(twin.vn_lin2[i], vp["TDense_1"])
        _copy_bn(twin.vn_bn2[i], vp["MaskedBatchNorm_1"], vbs["MaskedBatchNorm_1"])
    _copy_lin(twin.gnn2transformer, params["gnn2transformer"])
    tp = params["transformer_encoder"]
    with torch.no_grad():
        twin.cls_embedding.copy_(_t(tp["cls_embedding"]).reshape(-1))
        twin.norm_input.weight.copy_(_t(tp["norm_input"]["scale"]))
        twin.norm_input.bias.copy_(_t(tp["norm_input"]["bias"]))
        for i, tl in enumerate(twin.encoder.layers):
            lp = tp[f"layer_{i}"]
            attn = lp["MultiheadSelfAttention_0"]
            tl.self_attn.in_proj_weight.copy_(_t(attn["in_proj"]).T)
            tl.self_attn.in_proj_bias.copy_(_t(attn["in_proj_bias"]))
            tl.self_attn.out_proj.weight.copy_(_t(attn["out_proj"]).T)
            tl.self_attn.out_proj.bias.copy_(_t(attn["out_proj_bias"]))
            tl.linear1.weight.copy_(_t(lp["TDense_0"]["kernel"]).T)
            tl.linear1.bias.copy_(_t(lp["TDense_0"]["bias"]))
            tl.linear2.weight.copy_(_t(lp["TDense_1"]["kernel"]).T)
            tl.linear2.bias.copy_(_t(lp["TDense_1"]["bias"]))
            tl.norm1.weight.copy_(_t(lp["LayerNorm_0"]["scale"]))
            tl.norm1.bias.copy_(_t(lp["LayerNorm_0"]["bias"]))
            tl.norm2.weight.copy_(_t(lp["LayerNorm_1"]["scale"]))
            tl.norm2.bias.copy_(_t(lp["LayerNorm_1"]["bias"]))
        twin.encoder.norm.weight.copy_(_t(tp["final_norm"]["scale"]))
        twin.encoder.norm.bias.copy_(_t(tp["final_norm"]["bias"]))
    _copy_lin(twin.head, params["head"]["head"])
    return twin


class TorchTrainer:
    """torch training loop with the reference's optimizer semantics:
    AdamW(b1=.9, b2=.999, eps=1e-8, wd) + global-norm clip + per-step cosine
    (/root/reference/main.py:178-196, base_trainer.py:34-35). The cosine is
    applied as an explicit per-step lr assignment so it is the *identical
    function of the step index* that optax.cosine_decay_schedule uses."""

    def __init__(self, twin, lr, weight_decay, grad_clip, total_steps,
                 cosine=True):
        self.twin = twin
        self.base_lr = lr
        self.grad_clip = grad_clip
        self.total_steps = total_steps
        self.cosine = cosine
        self.opt = torch.optim.AdamW(twin.parameters(), lr=lr,
                                     betas=(0.9, 0.999), eps=1e-8,
                                     weight_decay=weight_decay)
        self.step_idx = 0

    def lr_at(self, k):
        if not self.cosine:
            return self.base_lr
        t = min(k, self.total_steps) / max(self.total_steps, 1)
        return self.base_lr * 0.5 * (1 + math.cos(math.pi * t))

    def step(self, loss_fn):
        """loss_fn() -> scalar loss (forward in train mode). Returns loss."""
        lr = self.lr_at(self.step_idx)
        for pg in self.opt.param_groups:
            pg["lr"] = lr
        self.opt.zero_grad()
        loss = loss_fn()
        loss.backward()
        if self.grad_clip:
            torch.nn.utils.clip_grad_norm_(self.twin.parameters(),
                                           self.grad_clip)
        self.opt.step()
        self.step_idx += 1
        return float(loss.detach())

    def flag_step(self, forward_fn, perturb0, step_size, m):
        """FLAG inner ascent (reference trainers/flag_trainer.py:19-56):
        m passes of forward_fn(perturb) (the per-pass loss EXACTLY as the
        trainer sees it — the caller bakes in any /m, since e.g. the TU loss
        ignores m per the reference tud.py quirk); perturb += step_size *
        sign(grad_perturb) after each of the first m-1; parameter grads
        ACCUMULATE across passes (torch .backward() semantics). perturb0 is
        supplied by the caller so both frameworks share the same initial
        noise. Returns the LAST pass's loss (what FlagTrainer logs)."""
        lr = self.lr_at(self.step_idx)
        for pg in self.opt.param_groups:
            pg["lr"] = lr
        self.opt.zero_grad()
        perturb = perturb0.clone().requires_grad_(True)
        loss = forward_fn(perturb)
        for _ in range(m - 1):
            loss.backward()
            with torch.no_grad():
                new_p = perturb + step_size * perturb.grad.sign()
            perturb = new_p.detach().requires_grad_(True)
            loss = forward_fn(perturb)
        loss.backward()
        if self.grad_clip:
            torch.nn.utils.clip_grad_norm_(self.twin.parameters(),
                                           self.grad_clip)
        self.opt.step()
        self.step_idx += 1
        return float(loss.detach())


# ---------------------------------------------------------------------------
# Round-5 twins: PNA-transformer and GCN-virtual + seq head (the code2
# flagship composition) — the two most aggressively re-designed numerics in
# the jax stack (ELL/scatter-free PNA reducers; GCN norm + 5-position CE).
# Both are independent torch implementations whose scatter/BN/optimizer
# semantics come from torch itself.
# ---------------------------------------------------------------------------


class TorchPNATransformer(torch.nn.Module):
    """PNA (towers=4, divide_input, mean/max/min/std x identity/amp/atten,
    residual) -> transformer CLS readout, per the reference composition
    (/root/reference/modules/pna/pna_module.py:41-76 + models/pna.py)."""

    def __init__(self, feat_dim, emb_dim, num_layer, d_model, nhead,
                 dim_feedforward, num_tf_layers, num_tasks, avg_deg_log,
                 towers=4, max_input_len=1000):
        super().__init__()
        self.num_layer, self.towers = num_layer, towers
        self.emb_dim, self.avg_deg_log = emb_dim, avg_deg_log
        self.max_input_len = max_input_len
        Ft = emb_dim // towers
        A, S = 4, 3
        fan = (1 + S * A) * Ft
        self.node_encoder = torch.nn.Linear(feat_dim, emb_dim)
        mk = lambda *shape: torch.nn.Parameter(torch.zeros(*shape))
        self.pre_w = torch.nn.ParameterList(
            [mk(towers, 2 * Ft, Ft) for _ in range(num_layer)])
        self.pre_b = torch.nn.ParameterList(
            [mk(towers, Ft) for _ in range(num_layer)])
        self.post_w = torch.nn.ParameterList(
            [mk(towers, fan, Ft) for _ in range(num_layer)])
        self.post_b = torch.nn.ParameterList(
            [mk(towers, Ft) for _ in range(num_layer)])
        self.lin_w = torch.nn.ParameterList(
            [mk(emb_dim, emb_dim) for _ in range(num_layer)])
        self.lin_b = torch.nn.ParameterList(
            [mk(emb_dim) for _ in range(num_layer)])
        self.bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(emb_dim) for _ in range(num_layer)])
        self.gnn2transformer = torch.nn.Linear(emb_dim, d_model)
        self.cls_embedding = torch.nn.Parameter(torch.zeros(d_model))
        self.norm_input = torch.nn.LayerNorm(d_model)
        layer = torch.nn.TransformerEncoderLayer(
            d_model, nhead, dim_feedforward, dropout=0.0, activation="relu")
        self.encoder = torch.nn.TransformerEncoder(
            layer, num_tf_layers, torch.nn.LayerNorm(d_model))
        self.head = torch.nn.Linear(d_model, num_tasks)

    def _conv(self, i, x, src, dst):
        N, T = x.shape[0], self.towers
        Ft = self.emb_dim // T
        C = T * Ft
        xt = x.view(N, T, Ft)
        h = torch.cat([xt[dst], xt[src]], dim=-1)            # [E, T, 2Ft]
        msg = torch.einsum("etf,tfo->eto", h, self.pre_w[i]) + self.pre_b[i]
        msgf = msg.reshape(-1, C)
        cnt = torch.bincount(dst, minlength=N).float()
        deg = cnt.clamp(min=1.0)
        s1 = torch.zeros(N, C).index_add(0, dst, msgf)
        mean = s1 / deg[:, None]
        sq = torch.zeros(N, C).index_add(0, dst, msgf * msgf)
        var = torch.relu(sq / deg[:, None] - mean * mean)
        std = torch.sqrt(var + 1e-5)
        idx = dst[:, None].expand(-1, C)
        mx = torch.zeros(N, C).scatter_reduce(
            0, idx, msgf, reduce="amax", include_self=False)
        mn = torch.zeros(N, C).scatter_reduce(
            0, idx, msgf, reduce="amin", include_self=False)
        pieces = [mean, mx, mn, std]                          # aggregator order
        log_deg = torch.log(deg + 1.0)
        factors = [None, log_deg / self.avg_deg_log,
                   self.avg_deg_log / log_deg]                # scaler order
        cols = [xt]
        for f in factors:
            for p in pieces:
                p3 = p.view(N, T, Ft)
                cols.append(p3 if f is None else p3 * f[:, None, None])
        cat = torch.cat(cols, dim=-1)                         # [N, T, fan]
        out = torch.einsum("ntf,tfo->nto", cat, self.post_w[i]) + self.post_b[i]
        return out.reshape(N, self.emb_dim) @ self.lin_w[i] + self.lin_b[i]

    def forward(self, x, src, dst, graph_of, n_per, perturb=None):
        x = self.node_encoder(x)
        if perturb is not None:
            x = x + perturb
        for i in range(self.num_layer):
            h = torch.relu(self.bn[i](self._conv(i, x, src, dst)))
            x = h + x                                         # residual
        h_node = self.gnn2transformer(x)
        G, d = len(n_per), h_node.shape[1]
        S = min(max(n_per), self.max_input_len)
        padded = torch.zeros(S, G, d, dtype=h_node.dtype)
        pad_mask = torch.ones(G, S, dtype=torch.bool)
        off = 0
        for i, n in enumerate(n_per):
            keep = min(n, S)
            padded[S - keep:, i] = h_node[off + n - keep: off + n]
            pad_mask[i, S - keep:] = False
            off += n
        cls = self.cls_embedding.view(1, 1, d).expand(1, G, d)
        padded = torch.cat([padded, cls], dim=0)
        pad_mask = torch.cat(
            [pad_mask, torch.zeros(G, 1, dtype=torch.bool)], dim=1)
        padded = self.norm_input(padded)
        out = self.encoder(padded, src_key_padding_mask=pad_mask)
        return self.head(out[-1])


def _copy_encoder_stack(twin, tp):
    """Copy the flax TransformerNodeEncoder subtree (cls + norm_input +
    layers + final LN) into a torch twin's encoder attributes."""
    with torch.no_grad():
        twin.cls_embedding.copy_(_t(tp["cls_embedding"]).reshape(-1))
        twin.norm_input.weight.copy_(_t(tp["norm_input"]["scale"]))
        twin.norm_input.bias.copy_(_t(tp["norm_input"]["bias"]))
        for i, tl in enumerate(twin.encoder.layers):
            lp = tp[f"layer_{i}"]
            attn = lp["MultiheadSelfAttention_0"]
            tl.self_attn.in_proj_weight.copy_(_t(attn["in_proj"]).T)
            tl.self_attn.in_proj_bias.copy_(_t(attn["in_proj_bias"]))
            tl.self_attn.out_proj.weight.copy_(_t(attn["out_proj"]).T)
            tl.self_attn.out_proj.bias.copy_(_t(attn["out_proj_bias"]))
            tl.linear1.weight.copy_(_t(lp["TDense_0"]["kernel"]).T)
            tl.linear1.bias.copy_(_t(lp["TDense_0"]["bias"]))
            tl.linear2.weight.copy_(_t(lp["TDense_1"]["kernel"]).T)
            tl.linear2.bias.copy_(_t(lp["TDense_1"]["bias"]))
            tl.norm1.weight.copy_(_t(lp["LayerNorm_0"]["scale"]))
            tl.norm1.bias.copy_(_t(lp["LayerNorm_0"]["bias"]))
            tl.norm2.weight.copy_(_t(lp["LayerNorm_1"]["scale"]))
            tl.norm2.bias.copy_(_t(lp["LayerNorm_1"]["bias"]))
        twin.encoder.norm.weight.copy_(_t(tp["final_norm"]["scale"]))
        twin.encoder.norm.bias.copy_(_t(tp["final_norm"]["bias"]))


def load_pna_from_flax(twin: TorchPNATransformer, params, batch_stats):
    gp, gbs = params["pna"], batch_stats["pna"]
    _copy_lin(twin.node_encoder, gp["node_encoder"]["TDense_0"])
    with torch.no_grad():
        for i in range(twin.num_layer):
            cp = gp[f"conv_{i}"]
            twin.pre_w[i].copy_(_t(cp["pre_w"]))
            twin.pre_b[i].copy_(_t(cp["pre_b"]))
            twin.post_w[i].copy_(_t(cp["post_w"]))
            twin.post_b[i].copy_(_t(cp["post_b"]))
            twin.lin_w[i].copy_(_t(cp["lin_w"]))
            twin.lin_b[i].copy_(_t(cp["lin_b"]))
            _copy_bn(twin.bn[i], gp[f"bn_{i}"], gbs[f"bn_{i}"])
    _copy_lin(twin.gnn2transformer, params["gnn2transformer"])
    _copy_encoder_stack(twin, params["transformer_encoder"])
    _copy_lin(twin.head, params["head"]["head"])
    return twin


class TorchGCNVirtualSeqFlagship(torch.nn.Module):
    """The code2 flagship in torch: AST encoder -> GCN-virtual JK=cat ->
    norm_input CLS transformer -> 5-position seq head
    (/root/reference/modules/conv.py:40-71 + gnn_module.py:111-241 +
    dataset/code.py head list)."""

    def __init__(self, emb_dim, num_layer, d_model, nhead, dim_feedforward,
                 num_tf_layers, vocab_size, max_seq_len, num_nodetypes,
                 num_nodeattributes, max_depth, edge_dim=2,
                 max_input_len=1000):
        super().__init__()
        self.num_layer = num_layer
        self.max_depth = max_depth
        self.max_input_len = max_input_len
        self.type_emb = torch.nn.Embedding(num_nodetypes, emb_dim)
        self.attr_emb = torch.nn.Embedding(num_nodeattributes, emb_dim)
        self.depth_emb = torch.nn.Embedding(max_depth + 1, emb_dim)
        self.lin = torch.nn.ModuleList(
            [torch.nn.Linear(emb_dim, emb_dim) for _ in range(num_layer)])
        self.root_emb = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(emb_dim))
             for _ in range(num_layer)])
        self.edge_enc = torch.nn.ModuleList(
            [torch.nn.Linear(edge_dim, emb_dim) for _ in range(num_layer)])
        self.bn = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(emb_dim) for _ in range(num_layer)])
        self.vn_emb = torch.nn.Parameter(torch.zeros(emb_dim))
        self.vn_lin1 = torch.nn.ModuleList(
            [torch.nn.Linear(emb_dim, 2 * emb_dim) for _ in range(num_layer - 1)])
        self.vn_bn1 = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(2 * emb_dim) for _ in range(num_layer - 1)])
        self.vn_lin2 = torch.nn.ModuleList(
            [torch.nn.Linear(2 * emb_dim, emb_dim) for _ in range(num_layer - 1)])
        self.vn_bn2 = torch.nn.ModuleList(
            [torch.nn.BatchNorm1d(emb_dim) for _ in range(num_layer - 1)])
        self.gnn2transformer = torch.nn.Linear(2 * emb_dim, d_model)
        self.cls_embedding = torch.nn.Parameter(torch.zeros(d_model))
        self.norm_input = torch.nn.LayerNorm(d_model)
        layer = torch.nn.TransformerEncoderLayer(
            d_model, nhead, dim_feedforward, dropout=0.0, activation="relu")
        self.encoder = torch.nn.TransformerEncoder(
            layer, num_tf_layers, torch.nn.LayerNorm(d_model))
        self.heads = torch.nn.ModuleList(
            [torch.nn.Linear(d_model, vocab_size) for _ in range(max_seq_len)])

    def forward(self, x, depth, src, dst, edge_attr, graph_of, n_per,
                perturb=None):
        G = len(n_per)
        N = x.shape[0]
        h = (self.type_emb(x[:, 0]) + self.attr_emb(x[:, 1])
             + self.depth_emb(depth.clamp(0, self.max_depth)))
        if perturb is not None:
            h = h + perturb
        vn = self.vn_emb.unsqueeze(0).expand(G, -1)
        h_list = [h]
        for i in range(self.num_layer):
            h_in = h_list[i] + vn[graph_of]
            h_list[i] = h_in
            x_lin = self.lin[i](h_in)
            deg = torch.bincount(src, minlength=N).float() + 1.0
            dis = deg.pow(-0.5)
            norm = dis[src] * dis[dst]
            emb = self.edge_enc[i](edge_attr)
            msg = norm[:, None] * torch.relu(x_lin[src] + emb)
            agg = torch.zeros_like(x_lin).index_add(0, dst, msg)
            z = agg + torch.relu(x_lin + self.root_emb[i]) / deg[:, None]
            z = self.bn[i](z)
            if i < self.num_layer - 1:
                z = torch.relu(z)
            h_list.append(z)
            if i < self.num_layer - 1:
                pooled = torch.zeros(G, h_in.shape[1]).index_add(
                    0, graph_of, h_list[i])
                v = pooled + vn
                v = torch.relu(self.vn_bn1[i](self.vn_lin1[i](v)))
                v = torch.relu(self.vn_bn2[i](self.vn_lin2[i](v)))
                vn = v
        h_node = self.gnn2transformer(
            torch.cat([h_list[0], h_list[-1]], dim=-1))
        d = h_node.shape[1]
        S = min(max(n_per), self.max_input_len)
        padded = torch.zeros(S, G, d, dtype=h_node.dtype)
        pad_mask = torch.ones(G, S, dtype=torch.bool)
        off = 0
        for i, n in enumerate(n_per):
            keep = min(n, S)
            padded[S - keep:, i] = h_node[off + n - keep: off + n]
            pad_mask[i, S - keep:] = False
            off += n
        cls = self.cls_embedding.view(1, 1, d).expand(1, G, d)
        padded = torch.cat([padded, cls], dim=0)
        pad_mask = torch.cat(
            [pad_mask, torch.zeros(G, 1, dtype=torch.bool)], dim=1)
        padded = self.norm_input(padded)
        out = self.encoder(padded, src_key_padding_mask=pad_mask)
        return torch.stack([head(out[-1]) for head in self.heads], dim=1)


def load_gcn_seq_from_flax(twin: TorchGCNVirtualSeqFlagship, params,
                           batch_stats, edge_enc_key="edge_encoder"):
    ne = params["node_encoder"]
    with torch.no_grad():
        twin.type_emb.weight.copy_(_t(ne["type_emb"]))
        twin.attr_emb.weight.copy_(_t(ne["attr_emb"]))
        twin.depth_emb.weight.copy_(_t(ne["depth_emb"]))
    gp, gbs = params["gnn_node"], batch_stats["gnn_node"]
    with torch.no_grad():
        twin.vn_emb.copy_(_t(gp["virtualnode_embedding"]).reshape(-1))
        for i in range(twin.num_layer):
            cp = gp[f"conv_{i}"]
            _copy_lin(twin.lin[i], cp["TDense_0"])
            twin.root_emb[i].copy_(_t(cp["root_emb"]).reshape(-1))
            _copy_lin(twin.edge_enc[i], cp[edge_enc_key]["TDense_0"])
            _copy_bn(twin.bn[i], gp[f"bn_{i}"], gbs[f"bn_{i}"])
        for i in range(twin.num_layer - 1):
            vp, vbs = gp[f"vn_mlp_{i}"], gbs[f"vn_mlp_{i}"]
            _copy_lin(twin.vn_lin1[i], vp["TDense_0"])
            _copy_bn(twin.vn_bn1[i], vp["MaskedBatchNorm_0"],
                     vbs["MaskedBatchNorm_0"])
            _copy_lin(twin.vn_lin2[i], vp["TDense_1"])
            _copy_bn(twin.vn_bn2[i], vp["MaskedBatchNorm_1"],
                     vbs["MaskedBatchNorm_1"])
    _copy_lin(twin.gnn2transformer, params["gnn2transformer"])
    _copy_encoder_stack(twin, params["transformer_encoder"])
    for i, head in enumerate(twin.heads):
        _copy_lin(head, params["head"][f"head_{i}"])
    return twin


def batch_to_torch_code(graphs, max_seq_len=5):
    """Concatenate code2-style graph dicts (post augment_edge + y_arr) into
    flat torch tensors."""
    n_per = [int(g["x"].shape[0]) for g in graphs]
    offs = np.cumsum([0] + n_per[:-1])
    x = torch.tensor(np.concatenate(
        [np.asarray(g["x"]) for g in graphs]).astype(np.int64))
    depth = torch.tensor(np.concatenate(
        [np.asarray(g["node_depth"]).reshape(-1) for g in graphs]).astype(np.int64))
    src = torch.tensor(np.concatenate(
        [g["edge_index"][0] + o for g, o in zip(graphs, offs)]).astype(np.int64))
    dst = torch.tensor(np.concatenate(
        [g["edge_index"][1] + o for g, o in zip(graphs, offs)]).astype(np.int64))
    ea = torch.tensor(np.concatenate(
        [np.asarray(g["edge_attr"], np.float32) for g in graphs]))
    graph_of = torch.tensor(np.repeat(np.arange(len(graphs)), n_per))
    y_arr = torch.tensor(np.stack(
        [np.asarray(g["y_arr"], np.int64).reshape(-1)[:max_seq_len]
         for g in graphs]))
    return x, depth, src, dst, ea, graph_of, n_per, y_arr
