"""TU datasets (NCI1 / NCI109): loader for the standard TU file format, with
a synthetic fallback when no data directory exists (zero-egress environment).

Behavioral contract from /root/reference/dataset/tud.py:13-73:
  - parser defaults: batch_size=128, epochs=10000, lr=5e-4, wd=1e-4,
    gnn_dropout=0.5, gnn_emb_dim=128
  - fresh random 80/10/10 split built on EVERY preprocess call (the reference
    re-preprocesses per run so each run sees a new split, main.py:160-163)
  - node features: one-hot node labels; edge encoder contributes zero
  - loss: plain cross-entropy (FLAG's m divisor ignored); metric: accuracy
"""

from __future__ import annotations

import os

import numpy as np

from ..nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
from ..train import losses
from .bundle import DatasetBundle
from .evaluators import eval_acc
from .synthetic import make_tu_dataset


def load_tu_dataset(root: str, name: str):
    """Parse the standard TU format (DS_A.txt 1-based edge list,
    DS_graph_indicator.txt, DS_graph_labels.txt, DS_node_labels.txt)."""
    candidates = [
        os.path.join(root, name, name),          # root/DS/DS_A.txt
        os.path.join(root, name, "raw", name),   # root/DS/raw/DS_A.txt
        os.path.join(root, name),                # root/DS_A.txt
    ]
    d = next((c for c in candidates if os.path.exists(c + "_A.txt")), None)
    if d is None:
        return None

    edges = np.loadtxt(d + "_A.txt", delimiter=",", dtype=np.int64) - 1
    indicator = np.loadtxt(d + "_graph_indicator.txt", dtype=np.int64) - 1
    glabels = np.loadtxt(d + "_graph_labels.txt", dtype=np.int64)
    classes = np.unique(glabels)
    remap = {c: i for i, c in enumerate(classes)}
    nlabel_path = d + "_node_labels.txt"
    if os.path.exists(nlabel_path):
        nlabels = np.loadtxt(nlabel_path, delimiter=",", dtype=np.int64)
        if nlabels.ndim > 1:
            nlabels = nlabels[:, 0]
        num_nl = int(nlabels.max()) + 1
    else:
        nlabels = np.zeros(len(indicator), np.int64)
        num_nl = 1

    graphs = []
    num_graphs = int(indicator.max()) + 1
    node_offsets = np.zeros(num_graphs + 1, np.int64)
    counts = np.bincount(indicator, minlength=num_graphs)
    node_offsets[1:] = np.cumsum(counts)
    edge_graph = indicator[edges[:, 0]]
    order = np.argsort(edge_graph, kind="stable")
    edges = edges[order]
    edge_graph = edge_graph[order]
    e_off = np.searchsorted(edge_graph, np.arange(num_graphs + 1))
    for g in range(num_graphs):
        lo, hi = node_offsets[g], node_offsets[g + 1]
        n = hi - lo
        x = np.zeros((n, num_nl), np.float32)
        x[np.arange(n), nlabels[lo:hi]] = 1.0
        ei = edges[e_off[g]:e_off[g + 1]].T - lo
        graphs.append({
            "x": x,
            "edge_index": ei.astype(np.int64),
            "edge_attr": None,
            "y": np.array([remap[glabels[g]]]),
        })
    return graphs, len(classes)


class TUUtil:
    @staticmethod
    def add_args(parser):
        parser.set_defaults(batch_size=128)
        parser.set_defaults(epochs=10000)
        parser.set_defaults(lr=0.0005)
        parser.set_defaults(weight_decay=0.0001)
        parser.set_defaults(gnn_dropout=0.5)
        parser.set_defaults(gnn_emb_dim=128)

    @staticmethod
    def loss_fn(task_type):
        return losses.classification_loss

    @staticmethod
    def eval(forward_fn, loader):
        """forward_fn(batch) -> [G, C] logits (numpy)."""
        y_true, y_pred = [], []
        for batch in loader:
            pred = np.asarray(forward_fn(batch))
            pred = pred.reshape((-1,) + pred.shape[-1:])
            mask = np.asarray(batch.graph_mask).reshape(-1)
            y_pred.append(pred[mask].argmax(-1))
            y_true.append(np.asarray(batch.y).reshape(-1)[mask])
        if not y_true:
            return {"acc": 0.0}
        return eval_acc(np.concatenate(y_true), np.concatenate(y_pred))

    @staticmethod
    def preprocess(args, model_cls=None, seed=None):
        loaded = load_tu_dataset(args.data_root, args.dataset)
        if loaded is None:
            graphs = make_tu_dataset(
                num_graphs=getattr(args, "synthetic_num_graphs", 400),
                seed=getattr(args, "synthetic_seed", 0),
            )
            num_classes = 2
        else:
            graphs, num_classes = loaded

        rng = np.random.default_rng(seed)
        order = rng.permutation(len(graphs))
        n_train = int(len(graphs) * 0.8)
        n_val = int(len(graphs) * 0.1)
        splits = {
            "train": [graphs[i] for i in order[:n_train]],
            "valid": [graphs[i] for i in order[n_train:n_train + n_val]],
            "test": [graphs[i] for i in order[n_train + n_val:]],
        }
        emb_dim = model_cls.get_emb_dim(args) if model_cls else args.gnn_emb_dim
        return DatasetBundle(
            splits=splits,
            num_tasks=num_classes,
            node_encoder_cls=lambda: LinearNodeEncoder(emb_dim),
            edge_encoder_cls=ZeroEdgeEncoder,
            deg=None,
            task_type="classification",
            eval_metric="acc",
            y_dtype="int32",
        )

    # per-run re-split, mirroring main.py:160-163
    resplit_per_run = True
