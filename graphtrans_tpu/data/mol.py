"""Molecule datasets (ogbg-molhiv / ogbg-molpcba): reader for the OGB raw CSV
layout with synthetic fallback.

Behavioral contract from /root/reference/dataset/mol.py:11-85:
  - parser defaults: batch_size=32, epochs=100, gnn_dropout=0.5;
    --feature simple truncates node/edge features to 2 columns
  - loss: BCE-with-logits over labeled (non-NaN) entries, MSE for regression
  - degree histogram (bins 0..9) over the train split ALWAYS computed
  - encoders: AtomEncoder / BondEncoder
"""

from __future__ import annotations

import os

import numpy as np

from ..nn.encoders import AtomEncoder, BondEncoder
from ..train import losses
from .bundle import DatasetBundle
from .evaluators import eval_ap, eval_rocauc
from .synthetic import make_mol_dataset


def _read_csv(path, dtype):
    import pandas as pd

    return pd.read_csv(path, header=None).to_numpy(dtype=dtype)


def load_ogb_graphs(root: str, dataset: str):
    """Read OGB's raw CSV format: num-node-list, num-edge-list, node-feat,
    edge-feat, edge, graph-label (+ split dir)."""
    d = os.path.join(root, dataset.replace("-", "_"), "raw")
    if not os.path.exists(os.path.join(d, "num-node-list.csv.gz")):
        return None
    nn_list = _read_csv(os.path.join(d, "num-node-list.csv.gz"), np.int64)[:, 0]
    ne_list = _read_csv(os.path.join(d, "num-edge-list.csv.gz"), np.int64)[:, 0]
    node_feat = _read_csv(os.path.join(d, "node-feat.csv.gz"), np.int64)
    edge_feat = _read_csv(os.path.join(d, "edge-feat.csv.gz"), np.int64)
    edge = _read_csv(os.path.join(d, "edge.csv.gz"), np.int64)
    import pandas as pd

    glabel = pd.read_csv(os.path.join(d, "graph-label.csv.gz"), header=None).to_numpy(np.float64)

    graphs = []
    n_off = e_off = 0
    for i, (n, e) in enumerate(zip(nn_list, ne_list)):
        graphs.append({
            # OGB atom/bond feature cardinalities max out at 119, so int8
            # halves nothing on-chip (encoders upcast) but quarters the
            # host->device bytes — material through this image's tunnel
            "x": node_feat[n_off:n_off + n].astype(np.int8),
            "edge_index": edge[e_off:e_off + e].T.astype(np.int64),
            "edge_attr": edge_feat[e_off:e_off + e].astype(np.int8),
            "y": glabel[i].astype(np.float32),
        })
        n_off += n
        e_off += e

    split_dir = os.path.join(root, dataset.replace("-", "_"), "split", "scaffold")
    split_idx = {}
    for split in ("train", "valid", "test"):
        p = os.path.join(split_dir, f"{split}.csv.gz")
        split_idx[split] = _read_csv(p, np.int64)[:, 0] if os.path.exists(p) else None
    return graphs, split_idx


def degree_histogram(graphs, bins: int) -> np.ndarray:
    """In-degree histogram over the train split (reference computes it on the
    UNTRANSFORMED dataset, dataset/mol.py:70-79)."""
    deg = np.zeros(bins, np.int64)
    for g in graphs:
        d = np.bincount(g["edge_index"][1], minlength=g["x"].shape[0])
        deg += np.bincount(np.minimum(d, bins - 1), minlength=bins)
    return deg


class MolUtil:
    @staticmethod
    def add_args(parser):
        parser.add_argument("--feature", type=str, default="full",
                            help="full feature or simple feature")
        parser.set_defaults(batch_size=32)
        parser.set_defaults(epochs=100)
        parser.set_defaults(gnn_dropout=0.5)

    @staticmethod
    def loss_fn(task_type):
        if "classification" in task_type:
            return losses.binary_multitask_loss
        return losses.regression_loss

    @staticmethod
    def eval(forward_fn, loader):
        y_true, y_pred = [], []
        for batch in loader:
            pred = np.asarray(forward_fn(batch))
            pred = pred.reshape((-1,) + pred.shape[-1:])
            mask = np.asarray(batch.graph_mask).reshape(-1)
            y = np.asarray(batch.y)
            y = y.reshape((-1,) + y.shape[-1:])
            y_pred.append(pred[mask])
            y_true.append(y[mask])
        if not y_true:
            return {"ap": 0.0, "rocauc": 0.0}
        y_true = np.concatenate(y_true)
        y_pred = np.concatenate(y_pred)
        return {**eval_ap(y_true, y_pred), **eval_rocauc(y_true, y_pred)}

    @staticmethod
    def preprocess(args, model_cls=None, seed=None):
        loaded = load_ogb_graphs(args.data_root, args.dataset)
        if loaded is None:
            num_tasks = 8 if "pcba" in args.dataset else 1
            graphs = make_mol_dataset(
                num_graphs=getattr(args, "synthetic_num_graphs", 400),
                num_tasks=num_tasks,
                seed=getattr(args, "synthetic_seed", 0),
            )
            rng = np.random.default_rng(0)
            order = rng.permutation(len(graphs))
            n_tr, n_va = int(0.8 * len(graphs)), int(0.1 * len(graphs))
            split_idx = {
                "train": order[:n_tr],
                "valid": order[n_tr:n_tr + n_va],
                "test": order[n_tr + n_va:],
            }
        else:
            graphs, split_idx = loaded
            num_tasks = graphs[0]["y"].shape[0]

        if getattr(args, "feature", "full") == "simple":
            for g in graphs:
                g["x"] = g["x"][:, :2]
                if g["edge_attr"] is not None:
                    g["edge_attr"] = g["edge_attr"][:, :2]

        splits = {
            k: [graphs[i] for i in idx] if idx is not None else []
            for k, idx in split_idx.items()
        }
        deg = degree_histogram(splits["train"], bins=10)
        emb_dim = model_cls.get_emb_dim(args) if model_cls else args.gnn_emb_dim
        metric = "ap" if "pcba" in args.dataset else "rocauc"
        return DatasetBundle(
            splits=splits,
            num_tasks=num_tasks,
            node_encoder_cls=lambda: AtomEncoder(emb_dim),
            edge_encoder_cls=lambda emb: BondEncoder(emb),
            deg=deg,
            task_type="binary classification",
            eval_metric=metric,
            y_dtype="float32",
        )

    resplit_per_run = False
