"""Cross-framework training-DYNAMICS parity: graphtrans_tpu vs a torch twin.

The reference's correctness claim is its end-to-end training results
(/root/reference/README.md:32-42); per-layer and per-forward numerical parity
(tests/test_torch_parity.py, tests/test_full_model_parity.py) shows the
numerics match but not that the FRAMEWORK trains the same model. This harness
closes that gap inside a zero-egress image: both frameworks train the
flagship composition (GIN-virtual JK=cat -> CLS transformer,
/root/reference/models/gnn_transformer.py:90-127) on the SAME fixed synthetic
NCI-scale dataset, from the SAME initial weights (copied flax -> torch), with
the SAME batch order, under the reference's exact training semantics:
AdamW(b1=.9,b2=.999,eps=1e-8,wd) + global-norm clip + per-step cosine
(/root/reference/main.py:178-196, trainers/base_trainer.py:17-51), train-mode
BatchNorm momentum 0.1 with the biased/unbiased variance split, and a FLAG
arm sharing the initial perturbation (trainers/flag_trainer.py:19-56).

The torch side is tools/torch_twin.py — an independent torch implementation
whose optimizer/BN/clip semantics come from torch itself (the oracle the
reference trains with). The jax side is the PRODUCTION stack: MODELS registry,
BaseTrainer/FlagTrainer grad fns, train.optim.build_optimizer,
train.state.TrainState — not a test re-implementation.

What "parity" means here (and in the committed TRAIN_PARITY.md artifact):
  1. Short horizon, paired: from identical weights the per-step losses must
     track near float precision for the first steps (this pins optimizer,
     schedule, clip and BN-momentum semantics — any systematic difference
     shows up immediately and grows).
  2. Long horizon, statistical: f32 non-associativity makes trajectories
     chaotic, so after hundreds of steps the criterion is distributional —
     final losses/accuracies of N seeds per framework must agree within the
     cross-seed noise band, and each paired loss curve must stay inside the
     frameworks' own seed-to-seed spread.

Dropout is 0 on both sides (the frameworks cannot share a dropout stream).
Run:  python tools/train_parity.py --epochs 150 --seeds 3
Fast: python tools/train_parity.py --preset smoke
Artifacts: TRAIN_PARITY.json + TRAIN_PARITY.md at the repo root.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force_cpu():
    """Parity runs are f32 CPU-vs-CPU (torch has no TPU here)."""
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()


def flagship_args(**over):
    ns = argparse.Namespace(
        model_type="gnn-transformer",
        graph_pooling="cls",
        gnn_type="gin",
        gnn_virtual_node=True,
        gnn_dropout=0.0,
        gnn_num_layer=3,
        gnn_emb_dim=64,
        gnn_JK="cat",
        gnn_residual=False,
        d_model=64,
        nhead=4,
        dim_feedforward=256,
        transformer_dropout=0.0,
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
        scheduler="cosine",
        lr=5e-4,
        max_lr=5e-4,
        pct_start=0.3,
        weight_decay=1e-4,   # reference TU default (dataset/tud.py:14-21)
        grad_clip=1.0,
        epochs=100,
        precision="f32",
        step_size=8e-3,
        m=3,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def _split(graphs, seed):
    rng = np.random.default_rng(seed + 1000)
    order = rng.permutation(len(graphs))
    n_tr = int(len(graphs) * 0.8)
    n_va = int(len(graphs) * 0.1)
    return {
        "train": [graphs[i] for i in order[:n_tr]],
        "valid": [graphs[i] for i in order[n_tr:n_tr + n_va]],
        "test": [graphs[i] for i in order[n_tr + n_va:]],
    }


def build_dataset(num_graphs, seed, feat_dim=16):
    from graphtrans_tpu.data.synthetic import make_tu_dataset

    graphs = make_tu_dataset(num_graphs=num_graphs, num_node_labels=feat_dim,
                             seed=seed)
    return _split(graphs, seed)


def build_code_dataset(num_graphs, seed):
    """code2-shaped splits (augmented edges + 5-token target arrays) and the
    vocab they encode against."""
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import (augment_edge, encode_seq_to_arr,
                                           get_vocab_mapping)

    raw = make_code_dataset(num_graphs=num_graphs, vocab_size=20,
                            seq_len_max=5, min_nodes=10, max_nodes=50,
                            seed=seed)
    vocab2idx, _ = get_vocab_mapping([g["y_seq"] for g in raw], 20)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["y_arr"] = encode_seq_to_arr(g["y_seq"], vocab2idx, 5)
        graphs.append(g)
    return _split(graphs, seed), len(vocab2idx)


class JaxRunner:
    """Production-stack runner: real model registry, trainers, optax chain.

    arm: 'flagship' (GIN-virtual JK=cat -> CLS transformer, CE),
         'pna' (PNA-transformer, CE — exercises the ELL/scatter-free
         reducer numerics' segment-path oracle under real dynamics),
         'code2' (GCN-virtual JK=cat + 5-position seq head, per-position
         CE — the code2 flagship composition)."""

    def __init__(self, hp, splits, num_tasks, feat_dim, seed, flag=False,
                 arm="flagship"):
        import jax
        import jax.numpy as jnp

        from graphtrans_tpu.data.batch import collate
        from graphtrans_tpu.data.loader import dataset_caps
        from graphtrans_tpu.models import MODELS
        from graphtrans_tpu.nn.encoders import (ASTNodeEncoder,
                                                LinearEdgeEncoder,
                                                LinearNodeEncoder,
                                                ZeroEdgeEncoder)
        from graphtrans_tpu.train import losses
        from graphtrans_tpu.train.optim import build_optimizer
        from graphtrans_tpu.train.state import TrainState
        from graphtrans_tpu.trainers.base_trainer import BaseTrainer, apply_update
        from graphtrans_tpu.trainers.flag_trainer import FlagTrainer

        self.hp, self.flag, self.arm = hp, flag, arm
        all_graphs = sum(splits.values(), [])
        self.caps = dataset_caps(all_graphs, hp.batch_size,
                                 node_multiple=64, edge_multiple=128)
        self.num_tasks = num_tasks
        self._collate = lambda graphs: collate(
            graphs, hp.batch_size + 1, self.caps[0], self.caps[1],
            num_tasks=num_tasks, y_dtype="int32",
            max_seq_len=hp.max_seq_len,
            max_input_len=hp.max_input_len)

        gnn_subtree = "gnn_node"
        if arm == "pna":
            self.deg = np.zeros(64, np.int64)
            for g in splits["train"]:
                d = np.bincount(g["edge_index"][1],
                                minlength=g["x"].shape[0]).clip(max=63)
                self.deg += np.bincount(d, minlength=64)
            model = MODELS["pna-transformer"].build(
                num_tasks, hp, LinearNodeEncoder(hp.gnn_emb_dim),
                ZeroEdgeEncoder, deg=self.deg)
            calc_loss = losses.classification_loss
            gnn_subtree = "pna"
        elif arm == "code2":
            model = MODELS["gnn-transformer"].build(
                num_tasks, hp,
                ASTNodeEncoder(hp.gnn_emb_dim, num_nodetypes=20,
                               num_nodeattributes=100, max_depth=20),
                lambda e: LinearEdgeEncoder(e))
            calc_loss = losses.seq_token_loss
        else:
            model = MODELS["gnn-transformer"].build(
                num_tasks, hp, LinearNodeEncoder(hp.gnn_emb_dim),
                ZeroEdgeEncoder)
            calc_loss = losses.classification_loss
        probe = self._collate(splits["train"][:2])
        variables = model.init(
            {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
            probe, None, False)
        self.params0 = variables["params"]
        self.bstats0 = variables["batch_stats"]

        steps_per_epoch = max(len(splits["train"]) // hp.batch_size, 1)
        tx, _ = build_optimizer(hp, steps_per_epoch)
        self.state = TrainState.create(self.params0, self.bstats0,
                                       tx.init(self.params0))
        trainer = FlagTrainer if flag else BaseTrainer
        grad_fn = trainer.make_grad_fn(model, calc_loss, hp)

        if flag:
            def train_step(state, batch, rng, perturb0):
                grads, new_bs, loss = grad_fn(state, batch, rng, perturb0)
                return apply_update(state, grads, new_bs, loss, tx,
                                    gnn_subtree)
        else:
            def train_step(state, batch, rng):
                grads, new_bs, loss = grad_fn(state, batch, rng)
                return apply_update(state, grads, new_bs, loss, tx,
                                    gnn_subtree)

        self._step = jax.jit(train_step)
        self._fwd = jax.jit(lambda p, bs, b: model.apply(
            {"params": p, "batch_stats": bs}, b, None, False))
        self._rng = jax.random.key(seed + 7)
        self._jnp = jnp

    def step(self, graphs, perturb0_real=None):
        """One optimizer step on this list-of-graph-dicts batch."""
        batch = self._collate(graphs)
        if self.flag:
            jnp = self._jnp
            pad = np.zeros((batch.node_mask.shape[0], self.hp.gnn_emb_dim),
                           np.float32)
            if perturb0_real is not None:
                pad[np.asarray(batch.node_mask)] = perturb0_real
            self.state, loss = self._step(self.state, batch, self._rng,
                                          jnp.asarray(pad))
        else:
            self.state, loss = self._step(self.state, batch, self._rng)
        return float(loss)

    def evaluate(self, graphs, bs):
        correct = total = 0
        for i in range(0, len(graphs), bs):
            chunk = graphs[i:i + bs]
            batch = self._collate(chunk)
            logits = np.asarray(self._fwd(self.state.params,
                                          self.state.batch_stats, batch))
            mask = np.asarray(batch.graph_mask)
            if self.arm == "code2":
                pred = logits[mask].argmax(-1)        # [g, L]
                y = np.asarray(batch.y_arr)[mask]
                correct += int((pred == y).sum())
                total += y.size
            else:
                pred = logits[mask].argmax(-1)
                y = np.asarray(batch.y).reshape(-1)[mask]
                correct += int((pred == y).sum())
                total += len(y)
        return correct / max(total, 1)


class TorchRunner:
    """torch twin runner: same initial weights, same reference semantics."""

    def __init__(self, hp, jax_runner, num_tasks, feat_dim, total_steps,
                 flag=False, arm="flagship"):
        import torch

        from torch_twin import (TorchGCNVirtualSeqFlagship,
                                TorchGINVirtualFlagship, TorchPNATransformer,
                                TorchTrainer, batch_to_torch,
                                batch_to_torch_code, load_from_flax,
                                load_gcn_seq_from_flax, load_pna_from_flax)

        torch.manual_seed(0)  # init is overwritten by the copy below
        self.hp, self.flag, self.arm = hp, flag, arm
        self.batch_to_torch = batch_to_torch
        self.batch_to_torch_code = batch_to_torch_code
        if arm == "pna":
            from graphtrans_tpu.nn.pna import avg_degree_stats

            self.twin = TorchPNATransformer(
                feat_dim, hp.gnn_emb_dim, hp.gnn_num_layer, hp.d_model,
                hp.nhead, hp.dim_feedforward, hp.num_encoder_layers,
                num_tasks,
                avg_deg_log=max(avg_degree_stats(jax_runner.deg)["log"],
                                1e-6),
                max_input_len=hp.max_input_len)
            load_pna_from_flax(self.twin, jax_runner.params0,
                               jax_runner.bstats0)
        elif arm == "code2":
            self.twin = TorchGCNVirtualSeqFlagship(
                hp.gnn_emb_dim, hp.gnn_num_layer, hp.d_model, hp.nhead,
                hp.dim_feedforward, hp.num_encoder_layers, num_tasks,
                max_seq_len=hp.max_seq_len, num_nodetypes=20,
                num_nodeattributes=100, max_depth=20,
                max_input_len=hp.max_input_len)
            load_gcn_seq_from_flax(self.twin, jax_runner.params0,
                                   jax_runner.bstats0)
        else:
            self.twin = TorchGINVirtualFlagship(
                feat_dim, hp.gnn_emb_dim, hp.gnn_num_layer, hp.d_model,
                hp.nhead, hp.dim_feedforward, hp.num_encoder_layers,
                num_tasks, max_input_len=hp.max_input_len)
            load_from_flax(self.twin, jax_runner.params0, jax_runner.bstats0)
        self.trainer = TorchTrainer(
            self.twin, hp.lr, hp.weight_decay, hp.grad_clip, total_steps,
            cosine=hp.scheduler == "cosine")
        self._torch = torch

    def _seq_loss(self, logits, y_arr):
        """graphtrans_tpu.train.losses.seq_token_loss semantics: mean CE
        per position, averaged over positions."""
        F = self._torch.nn.functional
        L = logits.shape[1]
        return sum(F.cross_entropy(logits[:, i], y_arr[:, i])
                   for i in range(L)) / L

    def step(self, graphs, perturb0_real=None):
        torch = self._torch
        self.twin.train()
        if self.arm == "code2":
            (x, depth, src, dst, ea, graph_of, n_per,
             y_arr) = self.batch_to_torch_code(graphs, self.hp.max_seq_len)

            def loss_fn():
                logits = self.twin(x, depth, src, dst, ea, graph_of, n_per)
                return self._seq_loss(logits, y_arr)

            return self.trainer.step(loss_fn)
        x, src, dst, graph_of, n_per, y = self.batch_to_torch(graphs)
        if self.flag:
            def forward_fn(perturb):
                logits = self.twin(x, src, dst, graph_of, n_per, perturb)
                return torch.nn.functional.cross_entropy(logits, y)

            # reference tud.py quirk: the TU loss ignores the /m divisor
            return self.trainer.flag_step(
                forward_fn, torch.tensor(perturb0_real),
                self.hp.step_size, self.hp.m)

        def loss_fn():
            logits = self.twin(x, src, dst, graph_of, n_per)
            return torch.nn.functional.cross_entropy(logits, y)

        return self.trainer.step(loss_fn)

    def evaluate(self, graphs, bs):
        torch = self._torch
        self.twin.eval()
        correct = total = 0
        with torch.no_grad():
            for i in range(0, len(graphs), bs):
                chunk = graphs[i:i + bs]
                if self.arm == "code2":
                    (x, depth, src, dst, ea, graph_of, n_per,
                     y_arr) = self.batch_to_torch_code(chunk,
                                                       self.hp.max_seq_len)
                    pred = self.twin(x, depth, src, dst, ea, graph_of,
                                     n_per).argmax(-1)
                    correct += int((pred == y_arr).sum())
                    total += y_arr.numel()
                    continue
                x, src, dst, graph_of, n_per, y = self.batch_to_torch(chunk)
                pred = self.twin(x, src, dst, graph_of, n_per).argmax(-1)
                correct += int((pred == y).sum())
                total += len(y)
        return correct / max(total, 1)


def paired_run(hp, splits, num_tasks, feat_dim, seed, epochs, flag=False,
               log=print, arm="flagship"):
    """Train both frameworks in lockstep on identical batches from identical
    weights; returns per-step losses, per-epoch means and final metrics."""
    train = splits["train"]
    steps_per_epoch = max(len(train) // hp.batch_size, 1)
    total_steps = epochs * steps_per_epoch
    hp.epochs = epochs  # cosine horizon for the jax side

    jr = JaxRunner(hp, splits, num_tasks, feat_dim, seed, flag=flag, arm=arm)
    tr = TorchRunner(hp, jr, num_tasks, feat_dim, total_steps, flag=flag,
                     arm=arm)
    noise = np.random.default_rng(seed + 31337)

    j_losses, t_losses = [], []
    for epoch in range(epochs):
        order = np.random.default_rng((seed, epoch)).permutation(len(train))
        for k in range(steps_per_epoch):
            idx = order[k * hp.batch_size:(k + 1) * hp.batch_size]
            if len(idx) < 2:
                continue
            graphs = [train[i] for i in idx]
            p0 = None
            if flag:
                n_real = sum(g["x"].shape[0] for g in graphs)
                p0 = noise.uniform(-hp.step_size, hp.step_size,
                                   (n_real, hp.gnn_emb_dim)).astype(np.float32)
            j_losses.append(jr.step(graphs, p0))
            t_losses.append(tr.step(graphs, p0))
        if epoch % max(epochs // 10, 1) == 0 or epoch == epochs - 1:
            log(f"  seed {seed} epoch {epoch:4d}: "
                f"jax {np.mean(j_losses[-steps_per_epoch:]):.4f} "
                f"torch {np.mean(t_losses[-steps_per_epoch:]):.4f}")

    j_losses, t_losses = np.array(j_losses), np.array(t_losses)
    per_epoch = lambda a: a[:steps_per_epoch * epochs].reshape(
        epochs, steps_per_epoch).mean(1)
    res = {
        "seed": seed,
        "flag": flag,
        "steps": int(len(j_losses)),
        "jax_step_losses": j_losses.tolist(),
        "torch_step_losses": t_losses.tolist(),
        "jax_epoch_loss": per_epoch(j_losses).tolist(),
        "torch_epoch_loss": per_epoch(t_losses).tolist(),
        "final": {},
    }
    for split in ("train", "valid", "test"):
        res["final"][f"jax_{split}_acc"] = jr.evaluate(splits[split],
                                                       hp.batch_size)
        res["final"][f"torch_{split}_acc"] = tr.evaluate(splits[split],
                                                         hp.batch_size)
    head = min(10, len(j_losses))
    res["early_max_rel_diff"] = float(np.max(
        np.abs(j_losses[:head] - t_losses[:head])
        / np.maximum(np.abs(t_losses[:head]), 1e-8)))
    res["n_test"] = len(splits["test"])
    return res


def summarize(runs):
    """Cross-seed parity verdict for one arm (list of paired_run results)."""
    j_final = np.array([r["jax_epoch_loss"][-1] for r in runs])
    t_final = np.array([r["torch_epoch_loss"][-1] for r in runs])
    j_acc = np.array([r["final"]["jax_test_acc"] for r in runs])
    t_acc = np.array([r["final"]["torch_test_acc"] for r in runs])
    # paired curve distance vs the frameworks' own seed-to-seed spread
    curves_j = np.array([r["jax_epoch_loss"] for r in runs])
    curves_t = np.array([r["torch_epoch_loss"] for r in runs])
    cross = np.abs(curves_j - curves_t).mean()
    seed_spread = (np.abs(curves_j - curves_j.mean(0)).mean()
                   + np.abs(curves_t - curves_t.mean(0)).mean()) + 1e-9
    n = max(len(runs), 1)
    n_test = max(runs[0].get("n_test", 1), 1)
    return {
        "n_seeds": len(runs),
        "n_test": n_test,
        "early_max_rel_diff": float(max(r["early_max_rel_diff"] for r in runs)),
        "jax_final_loss_mean": float(j_final.mean()),
        "jax_final_loss_std": float(j_final.std()),
        "torch_final_loss_mean": float(t_final.mean()),
        "torch_final_loss_std": float(t_final.std()),
        "jax_test_acc_mean": float(j_acc.mean()),
        "jax_test_acc_std": float(j_acc.std()),
        "torch_test_acc_mean": float(t_acc.mean()),
        "torch_test_acc_std": float(t_acc.std()),
        "acc_gap": float(abs(j_acc.mean() - t_acc.mean())),
        # 2SE across seeds + the metric's quantization floor (accuracy on
        # an n_test-graph split moves in 1/n_test steps)
        "acc_noise_band": float(2.0 * math.sqrt(
            (j_acc.std() ** 2 + t_acc.std() ** 2) / n) + 1.0 / n_test + 1e-3),
        "loss_gap": float(abs(j_final.mean() - t_final.mean())),
        "loss_noise_band": float(2.0 * math.sqrt(
            (j_final.std() ** 2 + t_final.std() ** 2) / n) + 5e-3),
        "paired_curve_dist": float(cross),
        "seed_spread": float(seed_spread),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--num_graphs", type=int, default=240)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--flag_epochs", type=int, default=40)
    ap.add_argument("--arm_epochs", type=int, default=60,
                    help="epochs for the pna/code2 arms (heavier models)")
    ap.add_argument("--preset", choices=["full", "smoke"], default="full")
    ap.add_argument("--out", default=".")
    opts = ap.parse_args()
    if opts.preset == "smoke":
        opts.epochs, opts.seeds, opts.num_graphs, opts.flag_epochs = 5, 1, 80, 2
        opts.arm_epochs = 2

    force_cpu()
    splits = build_dataset(opts.num_graphs, seed=0)
    code_splits, code_vocab = build_code_dataset(opts.num_graphs, seed=0)
    feat_dim, num_tasks = 16, 2
    t0 = time.time()

    # arm table: (arm key, flag, epochs, dataset splits, num_tasks, hp maker)
    pna_hp = lambda: flagship_args(
        batch_size=opts.batch_size, gnn_type="pna", gnn_virtual_node=False,
        gnn_JK="last", gnn_residual=True, gnn_emb_dim=64, m=3,
        aggregators=["mean", "max", "min", "std"],
        scalers=["identity", "amplification", "attenuation"],
        post_layers=1, add_edge="none")
    code_hp = lambda: flagship_args(
        batch_size=opts.batch_size, gnn_type="gcn", gnn_virtual_node=True,
        gnn_JK="cat", gnn_emb_dim=64, max_seq_len=5, m=3)
    arm_specs = (
        ("baseline", "flagship", False, opts.epochs, splits, num_tasks,
         lambda: flagship_args(batch_size=opts.batch_size, m=3)),
        ("flag", "flagship", True, opts.flag_epochs, splits, num_tasks,
         lambda: flagship_args(batch_size=opts.batch_size, m=2)),
        # the two most aggressively re-designed numerics, under real
        # training dynamics (VERDICT r04 #2): PNA reducers and the code2
        # GCN-virtual + 5-position CE composition
        ("pna", "pna", False, opts.arm_epochs, splits, num_tasks, pna_hp),
        ("code2", "code2", False, opts.arm_epochs, code_splits, code_vocab,
         code_hp),
    )

    arms = {}
    for name, arm_kind, flag, epochs, sp, ntasks, mk_hp in arm_specs:
        runs = []
        for seed in range(opts.seeds):
            hp = mk_hp()
            print(f"[{name}] seed {seed} ({epochs} epochs)")
            runs.append(paired_run(hp, sp, ntasks, feat_dim, seed,
                                   epochs, flag=flag, arm=arm_kind))
        arms[name] = {"runs": runs, "summary": summarize(runs)}

    verdict = {}
    for name, arm in arms.items():
        s = arm["summary"]
        # FLAG's sign(grad) ascent is DISCONTINUOUS: one f32-reassociation
        # bit flip flips a perturbation element and step-level chaos onsets
        # within a few steps, so its early window is judged looser; the exact
        # m-step semantics are pinned tightly at CI scale in
        # tests/test_training_parity.py::test_flag_training_dynamics_match_torch
        early_tol = 3e-2 if name == "flag" else 5e-3
        verdict[name] = {
            "early_steps_match": s["early_max_rel_diff"] < early_tol,
            "final_loss_within_noise": s["loss_gap"] <= s["loss_noise_band"],
            "test_acc_within_noise": s["acc_gap"] <= s["acc_noise_band"],
            "curves_within_seed_spread":
                s["paired_curve_dist"] <= 1.5 * s["seed_spread"] + 2e-3,
        }
        verdict[name]["pass"] = all(verdict[name].values())
    out = {
        "config": vars(opts),
        "hparams": vars(flagship_args(batch_size=opts.batch_size)),
        "arms": {k: {"summary": v["summary"],
                     "runs": [{kk: r[kk] for kk in r if "step_losses" not in kk}
                              for r in v["runs"]]}
                 for k, v in arms.items()},
        "verdict": verdict,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(opts.out, "TRAIN_PARITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    write_md(out, arms, os.path.join(opts.out, "TRAIN_PARITY.md"))
    print(json.dumps(verdict, indent=1))
    print(f"wall: {out['wall_s']}s -> TRAIN_PARITY.json / TRAIN_PARITY.md")
    return 0 if all(v["pass"] for v in verdict.values()) else 1


def write_md(out, arms, path):
    lines = [
        "# Cross-framework training-dynamics parity",
        "",
        "graphtrans_tpu (production stack: MODELS + trainers + optax chain)",
        "vs an independent torch twin (`tools/torch_twin.py`) trained in",
        "lockstep from identical weights on identical batches — the",
        "zero-egress-image substitute for reference leaderboard parity",
        "(/root/reference/README.md:32-42). Generated by",
        "`python tools/train_parity.py`.",
        "",
        f"Config: {json.dumps(out['config'])}",
        "",
    ]
    for name, arm in arms.items():
        s = arm["summary"]
        v = out["verdict"][name]
        lines += [
            f"## Arm: {name} {'(FLAG m-step ascent)' if name == 'flag' else ''}",
            "",
            "| check | value | band | pass |",
            "|---|---|---|---|",
            f"| first-10-step max rel loss diff | {s['early_max_rel_diff']:.2e} | < {'3e-2 (sign-ascent chaos)' if name == 'flag' else '5e-3'} | {v['early_steps_match']} |",
            f"| final epoch loss gap | {s['loss_gap']:.4f} | <= {s['loss_noise_band']:.4f} (2SE+eps) | {v['final_loss_within_noise']} |",
            f"| test accuracy gap | {s['acc_gap']:.4f} | <= {s['acc_noise_band']:.4f} (2SE+eps) | {v['test_acc_within_noise']} |",
            f"| paired-curve distance | {s['paired_curve_dist']:.4f} | <= 1.5x seed spread {s['seed_spread']:.4f} | {v['curves_within_seed_spread']} |",
            "",
            f"jax:   final loss {s['jax_final_loss_mean']:.4f}±{s['jax_final_loss_std']:.4f}, "
            f"test acc {s['jax_test_acc_mean']:.4f}±{s['jax_test_acc_std']:.4f}",
            "",
            f"torch: final loss {s['torch_final_loss_mean']:.4f}±{s['torch_final_loss_std']:.4f}, "
            f"test acc {s['torch_test_acc_mean']:.4f}±{s['torch_test_acc_std']:.4f}",
            "",
        ]
        for r in arm["runs"]:
            ep = np.array(r["jax_epoch_loss"])
            tp = np.array(r["torch_epoch_loss"])
            pick = np.unique(np.linspace(0, len(ep) - 1, 8).astype(int))
            lines.append(f"seed {r['seed']} epoch-loss (jax/torch): " + ", ".join(
                f"e{i}:{ep[i]:.3f}/{tp[i]:.3f}" for i in pick))
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    sys.exit(main())
