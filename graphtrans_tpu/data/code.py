"""ogbg-code2 (AST -> method-name sequence prediction), with synthetic
fallback.

Behavioral contract from /root/reference/dataset/code.py:24-133:
  - defaults: num_vocab=5000, max_seq_len=5
  - vocabulary built from TRAIN split targets only
  - transforms on every graph: augment_edge (AST + inverse + next-token +
    inverse next-token edges with 2-dim attrs) and encode_y_to_arr
  - node encoder: ASTNodeEncoder(type, attr, depth<=20); edge encoder:
    Linear(2, emb)
  - loss: mean over max_seq_len positions of CE; eval: per-position argmax ->
    decode to tokens -> set-based F1
  - degree histogram bins 0..799 over the (untransformed) train split only
    when the model needs it (PNA)
"""

from __future__ import annotations

import os

import numpy as np

from ..nn.encoders import ASTNodeEncoder, LinearEdgeEncoder
from ..train import losses
from .bundle import DatasetBundle
from .evaluators import eval_f1_seq
from .mol import degree_histogram
from .synthetic import make_code_dataset
from .vocab import augment_edge, decode_arr_to_seq, encode_seq_to_arr, get_vocab_mapping


def load_code_graphs(root: str, dataset: str):
    d = os.path.join(root, dataset.replace("-", "_"), "raw")
    if not os.path.exists(os.path.join(d, "num-node-list.csv.gz")):
        return None
    import pandas as pd

    def rd(name, dtype=np.int64):
        return pd.read_csv(os.path.join(d, name), header=None).to_numpy(dtype=dtype)

    nn_list = rd("num-node-list.csv.gz")[:, 0]
    ne_list = rd("num-edge-list.csv.gz")[:, 0]
    node_feat = rd("node-feat.csv.gz")
    edge = rd("edge.csv.gz")
    node_depth = rd("node_depth.csv.gz")[:, 0] if os.path.exists(
        os.path.join(d, "node_depth.csv.gz")) else None
    node_is_attr = rd("node_is_attributed.csv.gz")[:, 0] if os.path.exists(
        os.path.join(d, "node_is_attributed.csv.gz")) else None
    seq_path = os.path.join(d, "graph-label.csv.gz")
    seqs = None
    if os.path.exists(seq_path):
        df = pd.read_csv(seq_path, header=None)
        seqs = [str(v).split() for v in df[0].tolist()]

    graphs = []
    n_off = e_off = 0
    for i, (n, e) in enumerate(zip(nn_list, ne_list)):
        graphs.append({
            "x": node_feat[n_off:n_off + n, :2].astype(np.int32),
            "edge_index": edge[e_off:e_off + e].T.astype(np.int64),
            "edge_attr": None,
            "node_depth": node_depth[n_off:n_off + n] if node_depth is not None else np.zeros(n, np.int64),
            "node_is_attributed": node_is_attr[n_off:n_off + n] if node_is_attr is not None else np.zeros(n, np.int64),
            "y_seq": seqs[i] if seqs else [],
        })
        n_off += n
        e_off += e

    split_dir = os.path.join(root, dataset.replace("-", "_"), "split", "project")
    split_idx = {}
    for split in ("train", "valid", "test"):
        p = os.path.join(split_dir, f"{split}.csv.gz")
        split_idx[split] = (
            pd.read_csv(p, header=None).to_numpy(np.int64)[:, 0]
            if os.path.exists(p) else None
        )
    # encoder vocabulary sizes come from OGB's mapping CSVs when present
    # (headered files, /root/reference/dataset/code.py:103-116 reads
    # mapping/typeidx2type.csv.gz and mapping/attridx2attr.csv.gz to size
    # the ASTNodeEncoder); fall back to inferring from the data
    mapping_dir = os.path.join(root, dataset.replace("-", "_"), "mapping")
    tpath = os.path.join(mapping_dir, "typeidx2type.csv.gz")
    apath = os.path.join(mapping_dir, "attridx2attr.csv.gz")
    if os.path.exists(tpath) and os.path.exists(apath):
        num_types = len(pd.read_csv(tpath)["type"])
        num_attrs = len(pd.read_csv(apath)["attr"])
    else:
        num_types = int(node_feat[:, 0].max()) + 1
        num_attrs = int(node_feat[:, 1].max()) + 1
    return graphs, split_idx, num_types, num_attrs


class CodeUtil:
    def __init__(self):
        self.arr_to_seq = None

    @staticmethod
    def add_args(parser):
        parser.add_argument(
            "--num_vocab", type=int, default=5000,
            help="the number of vocabulary used for sequence prediction (default: 5000)",
        )
        parser.set_defaults(max_seq_len=5)

    @staticmethod
    def loss_fn(task_type):
        return losses.seq_token_loss

    def eval(self, forward_fn, loader):
        """Gold sequences are variable-length strings that never enter the
        device batch; batch.graph_ids maps predictions back to the split's
        graph dicts."""
        seq_ref, seq_pred = [], []
        for batch in loader:
            pred = np.asarray(forward_fn(batch))  # [G, L, V]
            pred = pred.reshape((-1,) + pred.shape[-2:])
            mask = np.asarray(batch.graph_mask).reshape(-1)
            ids = np.asarray(batch.graph_ids).reshape(-1)
            mat = pred.argmax(-1)  # [G, L]
            for i in np.nonzero(mask)[0]:
                seq_pred.append(self.arr_to_seq(mat[i]))
                seq_ref.append(loader.graphs[ids[i]]["y_seq"])
        return eval_f1_seq(seq_ref, seq_pred)

    def preprocess(self, args, model_cls=None, seed=None):
        loaded = load_code_graphs(args.data_root, args.dataset)
        if loaded is None:
            graphs = make_code_dataset(
                num_graphs=getattr(args, "synthetic_num_graphs", 400),
                seed=getattr(args, "synthetic_seed", 0),
            )
            num_types, num_attrs = 20, 100
            rng = np.random.default_rng(0)
            order = rng.permutation(len(graphs))
            n_tr, n_va = int(0.8 * len(graphs)), int(0.1 * len(graphs))
            split_idx = {
                "train": order[:n_tr],
                "valid": order[n_tr:n_tr + n_va],
                "test": order[n_tr + n_va:],
            }
        else:
            graphs, split_idx, num_types, num_attrs = loaded

        train_seqs = [graphs[i]["y_seq"] for i in split_idx["train"]]
        vocab2idx, idx2vocab = get_vocab_mapping(train_seqs, args.num_vocab)
        self.arr_to_seq = lambda arr: decode_arr_to_seq(arr, idx2vocab)

        # degree histogram on UNTRANSFORMED train graphs (code.py:119-132)
        deg = None
        if model_cls is not None and model_cls.need_deg():
            deg = degree_histogram([graphs[i] for i in split_idx["train"]], bins=800)

        # base transforms on every split (code.py:97-101)
        transformed = {}
        for split, idx in split_idx.items():
            out = []
            for i in idx:
                g = augment_edge(graphs[i])
                g["y_arr"] = encode_seq_to_arr(g["y_seq"], vocab2idx, args.max_seq_len)
                out.append(g)
            transformed[split] = out

        # reference quirk: the AST encoder is ALWAYS sized gnn_emb_dim
        # (code.py:111), even for the transformer-only model — published
        # configs keep gnn_emb_dim == d_model for that case
        emb_dim = args.gnn_emb_dim
        return DatasetBundle(
            splits=transformed,
            num_tasks=len(vocab2idx),
            node_encoder_cls=lambda: ASTNodeEncoder(
                emb_dim, num_nodetypes=num_types, num_nodeattributes=num_attrs,
                max_depth=20,
            ),
            edge_encoder_cls=lambda emb: LinearEdgeEncoder(emb),
            deg=deg,
            task_type="sequence",
            eval_metric="F1",
            y_dtype="int32",
            max_seq_len=args.max_seq_len,
            arr_to_seq=self.arr_to_seq,
        )

    resplit_per_run = False
