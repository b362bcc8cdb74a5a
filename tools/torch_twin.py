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
