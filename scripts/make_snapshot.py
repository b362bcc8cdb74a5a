"""Generate the vendored mini data snapshots under data_snapshots/.

This zero-egress image cannot download real OGB archives, so these
snapshots are DETERMINISTICALLY GENERATED stand-ins written in the exact
raw-CSV layout the readers consume (data/mol.py:load_ogb_graphs,
data/code.py:load_code_graphs — the same num-node-list / num-edge-list /
node-feat / edge / graph-label file scheme OGB ships, plus code2's
node_depth / node_is_attributed and the headered mapping CSVs the
reference sizes its ASTNodeEncoder from, /root/reference/dataset/code.py:
103-116). Feature columns stay inside the real datasets' cardinalities
(OGB atom features [119,4,12,12,10,6,6,2,2], bond features [5,6,2]) so
the Atom/Bond encoders exercise their real embedding tables.

Swapping in a real download: place the extracted OGB raw/ + split/ +
mapping/ directories under --data_root using the same layout (for code2,
export the target token sequences to raw/graph-label.csv.gz, one
space-separated line per graph) and run the commands in README.md
"Quality parity on real data".

Run: python scripts/make_snapshot.py  (writes data_snapshots/, ~100 KB)
"""

from __future__ import annotations

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data_snapshots")

ATOM_DIMS = [119, 4, 12, 12, 10, 6, 6, 2, 2]
BOND_DIMS = [5, 6, 2]


def write_csv_gz(path, rows, header=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        if header is not None:
            f.write(",".join(header) + "\n")
        for r in rows:
            if isinstance(r, (list, tuple, np.ndarray)):
                f.write(",".join(str(x) for x in np.asarray(r).tolist()) + "\n")
            else:
                f.write(str(r) + "\n")


def mol_graph(rng):
    n = int(rng.integers(8, 36))
    # molecule-like topology: spanning tree + a few ring closures, each
    # edge stored in both directions (OGB convention)
    src = [int(rng.integers(0, i)) for i in range(1, n)]
    edges = [(s, i + 1) for i, s in enumerate(src)]
    for _ in range(int(rng.integers(0, max(n // 6, 1)))):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.append((int(a), int(b)))
    und = edges + [(b, a) for a, b in edges]
    x = np.stack([rng.integers(0, d, n) for d in ATOM_DIMS], axis=1)
    # skew toward common atoms (C/N/O region of the table)
    common = rng.integers(5, 9, n)
    use_common = rng.random(n) < 0.8
    x[:, 0] = np.where(use_common, common, x[:, 0])
    ea = np.stack([rng.integers(0, d, len(und)) for d in BOND_DIMS], axis=1)
    y = np.full(128, np.nan)
    labeled = rng.random(128) < 0.15
    y[labeled] = (rng.random(labeled.sum()) < 0.3).astype(float)
    return x, np.array(und, np.int64), ea, y


def make_molpcba(num_graphs=240, seed=7):
    rng = np.random.default_rng(seed)
    d = os.path.join(ROOT, "ogbg_molpcba")
    nn, ne, feats, efeats, edges, labels = [], [], [], [], [], []
    for _ in range(num_graphs):
        x, ei, ea, y = mol_graph(rng)
        nn.append(x.shape[0])
        ne.append(ei.shape[0])
        feats.append(x)
        efeats.append(ea)
        edges.append(ei)
        labels.append(y)
    write_csv_gz(os.path.join(d, "raw", "num-node-list.csv.gz"), nn)
    write_csv_gz(os.path.join(d, "raw", "num-edge-list.csv.gz"), ne)
    write_csv_gz(os.path.join(d, "raw", "node-feat.csv.gz"), np.concatenate(feats))
    write_csv_gz(os.path.join(d, "raw", "edge-feat.csv.gz"), np.concatenate(efeats))
    write_csv_gz(os.path.join(d, "raw", "edge.csv.gz"), np.concatenate(edges))
    lab = [",".join("" if np.isnan(v) else str(v) for v in y) for y in labels]
    path = os.path.join(d, "raw", "graph-label.csv.gz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lab) + "\n")
    order = rng.permutation(num_graphs)
    cut1, cut2 = int(0.8 * num_graphs), int(0.9 * num_graphs)
    for name, idx in (("train", order[:cut1]), ("valid", order[cut1:cut2]),
                      ("test", order[cut2:])):
        write_csv_gz(os.path.join(d, "split", "scaffold", f"{name}.csv.gz"),
                     sorted(int(i) for i in idx))


NODE_TYPES = ["Module", "FunctionDef", "arguments", "arg", "Assign", "Name",
              "Attribute", "Call", "Return", "BinOp", "Constant", "If",
              "Compare", "For", "Expr", "Load", "Store", "Add", "Sub", "Mult"]
ATTRS = ["self", "x", "y", "data", "value", "result", "i", "n", "key", "node",
         "get", "set", "list", "dict", "update", "run", "init", "load",
         "save", "parse", "index", "count", "item", "name", "path", "size",
         "type", "util", "map", "filter"]
METHOD_TOKENS = ["get", "set", "update", "load", "save", "parse", "run",
                 "init", "index", "count", "name", "path", "size", "item",
                 "node", "value", "list", "map", "filter", "util"]


def code_graph(rng):
    # heavy-tailed sizes matching the real dataset (mean ~125, tail past
    # max_input_len=1000) so the snapshot exercises truncation and the
    # packed/flash transformer routes; clipped lower than the synthetic
    # generator's 2000 to keep the vendored snapshot small
    from graphtrans_tpu.data.synthetic import code2_size_sampler

    n = code2_size_sampler(rng, hi=1400)
    parent = [int(rng.integers(0, i)) for i in range(1, n)]  # DFS-ish tree
    edges = np.array([(p, i + 1) for i, p in enumerate(parent)], np.int64)
    depth = np.zeros(n, np.int64)
    for i, p in enumerate(parent):
        depth[i + 1] = depth[p] + 1
    types = rng.integers(0, len(NODE_TYPES), n)
    is_attr = (rng.random(n) < 0.35).astype(np.int64)
    attrs = np.where(is_attr == 1, rng.integers(0, len(ATTRS), n), len(ATTRS))
    x = np.stack([types, attrs], axis=1)
    k = int(rng.integers(1, 5))
    y_seq = [METHOD_TOKENS[int(t)] for t in rng.integers(0, len(METHOD_TOKENS), k)]
    return x, edges, depth, is_attr, y_seq


def make_code2(num_graphs=240, seed=13):
    rng = np.random.default_rng(seed)
    d = os.path.join(ROOT, "ogbg_code2")
    nn, ne, feats, edges, depths, attrs, seqs = [], [], [], [], [], [], []
    for _ in range(num_graphs):
        x, ei, dep, ia, ys = code_graph(rng)
        nn.append(x.shape[0])
        ne.append(ei.shape[0])
        feats.append(x)
        edges.append(ei)
        depths.append(dep)
        attrs.append(ia)
        seqs.append(" ".join(ys))
    write_csv_gz(os.path.join(d, "raw", "num-node-list.csv.gz"), nn)
    write_csv_gz(os.path.join(d, "raw", "num-edge-list.csv.gz"), ne)
    write_csv_gz(os.path.join(d, "raw", "node-feat.csv.gz"), np.concatenate(feats))
    write_csv_gz(os.path.join(d, "raw", "edge.csv.gz"), np.concatenate(edges))
    write_csv_gz(os.path.join(d, "raw", "node_depth.csv.gz"), np.concatenate(depths))
    write_csv_gz(os.path.join(d, "raw", "node_is_attributed.csv.gz"),
                 np.concatenate(attrs))
    write_csv_gz(os.path.join(d, "raw", "graph-label.csv.gz"), seqs)
    order = rng.permutation(num_graphs)
    cut1, cut2 = int(0.8 * num_graphs), int(0.9 * num_graphs)
    for name, idx in (("train", order[:cut1]), ("valid", order[cut1:cut2]),
                      ("test", order[cut2:])):
        write_csv_gz(os.path.join(d, "split", "project", f"{name}.csv.gz"),
                     sorted(int(i) for i in idx))
    # headered mapping CSVs (the reference sizes ASTNodeEncoder from these)
    write_csv_gz(os.path.join(d, "mapping", "typeidx2type.csv.gz"),
                 [[i, t] for i, t in enumerate(NODE_TYPES)],
                 header=["type idx", "type"])
    write_csv_gz(os.path.join(d, "mapping", "attridx2attr.csv.gz"),
                 [[i, a] for i, a in enumerate(ATTRS + ["__NONE__"])],
                 header=["attr idx", "attr"])


if __name__ == "__main__":
    make_molpcba()
    make_code2()
    print(f"snapshots written under {ROOT}")
