"""Synthetic dataset generators.

The reference pulls OGB/TU datasets over the network; this environment is
zero-egress, so tests and benchmarks run on synthetic data with the same
schema (real on-disk datasets are supported by the per-dataset loaders).
Labels are functions of graph structure so models can actually learn.
"""

from __future__ import annotations

import numpy as np


def _random_connected_graph(rng, n, extra_edges):
    """Random tree + extra edges, undirected (both directions emitted)."""
    src, dst = [], []
    for v in range(1, n):
        u = int(rng.integers(0, v))
        src += [u, v]
        dst += [v, u]
    for _ in range(extra_edges):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            src += [int(u), int(v)]
            dst += [int(v), int(u)]
    return np.array([src, dst], dtype=np.int64)


def make_tu_dataset(num_graphs=200, num_classes=2, num_node_labels=16,
                    min_nodes=8, max_nodes=40, seed=0):
    """NCI-like: one-hot node-label features, binary class correlated with
    graph density + label histogram."""
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        extra = int(rng.integers(0, n))
        ei = _random_connected_graph(rng, n, extra)
        labels = rng.integers(0, num_node_labels, size=n)
        x = np.zeros((n, num_node_labels), np.float32)
        x[np.arange(n), labels] = 1.0
        density = ei.shape[1] / (n * (n - 1) + 1)
        signal = density * 10 + (labels < num_node_labels // 2).mean()
        y = int(signal > np.median([1.05]))  # threshold fixed below
        graphs.append({"x": x, "edge_index": ei, "edge_attr": None,
                       "y": np.array([y]), "_signal": signal})
    med = np.median([g["_signal"] for g in graphs])
    for g in graphs:
        g["y"] = np.array([int(g.pop("_signal") > med)])
    return graphs


def make_mol_dataset(num_graphs=200, num_tasks=8, min_nodes=8, max_nodes=35, seed=0):
    """molpcba-like: 9 int atom features, 3 int bond features, multi-task
    binary labels with NaN holes."""
    from ..nn.encoders import ATOM_FEATURE_DIMS, BOND_FEATURE_DIMS

    rng = np.random.default_rng(seed)
    graphs = []
    signals = []
    for _ in range(num_graphs):
        n = int(rng.integers(min_nodes, max_nodes + 1))
        ei = _random_connected_graph(rng, n, int(rng.integers(0, n // 2 + 1)))
        x = np.stack(
            [rng.integers(0, d, size=n) for d in ATOM_FEATURE_DIMS], axis=1
        ).astype(np.int8)
        ea = np.stack(
            [rng.integers(0, d, size=ei.shape[1]) for d in BOND_FEATURE_DIMS], axis=1
        ).astype(np.int8)
        base = (x[:, 0].mean() / ATOM_FEATURE_DIMS[0]) + ei.shape[1] / (4.0 * n)
        signals.append(base + rng.normal(0, 0.1, size=num_tasks))
        graphs.append({"x": x, "edge_index": ei, "edge_attr": ea})
    # balanced labels: threshold each task at its dataset median
    sig = np.stack(signals)
    thresh = np.median(sig, axis=0)
    for g, s in zip(graphs, sig):
        y = (s > thresh).astype(np.float32)
        y[rng.random(num_tasks) < 0.25] = np.nan
        g["y"] = y
    return graphs


def code2_size_sampler(rng, mean=125.0, sigma=1.0, lo=9, hi=2000):
    """Heavy-tailed AST size draw matching real ogbg-code2's shape: lognormal
    with mean ~125 nodes, p99 ~ 650, and a tail past max_input_len=1000 (the
    reference truncates the transformer view there —
    /root/reference/modules/utils.py:16-24). Clipped at `hi` so a single
    synthetic graph stays bounded (real code2's max is ~36k but those are
    <0.01% of the data)."""
    mu = np.log(mean) - 0.5 * sigma * sigma
    n = int(np.exp(rng.normal(mu, sigma)))
    return int(np.clip(n, lo, hi))


def make_code_dataset(num_graphs=200, vocab_size=40, seq_len_max=8,
                      num_nodetypes=20, num_nodeattributes=100,
                      min_nodes=10, max_nodes=60, seed=0,
                      size_dist="uniform"):
    """code2-like ASTs: random trees in DFS order with (type, attr) features,
    node depth, node_is_attributed flags, and a target token sequence
    correlated with the root's subtree types.

    size_dist='code2' replaces the uniform [min_nodes, max_nodes] draw with
    the heavy-tailed lognormal of the real dataset (code2_size_sampler) so
    benchmarks exercise truncation, the flash-attention route, and the
    loader's cap-overflow handling at honest shapes."""
    rng = np.random.default_rng(seed)
    words = [f"tok{i}" for i in range(vocab_size)]
    graphs = []
    for _ in range(num_graphs):
        if size_dist == "code2":
            n = code2_size_sampler(rng)
        else:
            n = int(rng.integers(min_nodes, max_nodes + 1))
        # random tree in DFS order: parent of v in [max(0, v-5), v-1]
        parents = [0] * n
        depth = np.zeros(n, np.int64)
        src, dst = [], []
        for v in range(1, n):
            p = int(rng.integers(max(0, v - 5), v))
            parents[v] = p
            depth[v] = depth[p] + 1
            src.append(p)
            dst.append(v)
        ei = np.array([src, dst], dtype=np.int64)
        types = rng.integers(0, num_nodetypes, size=n)
        attrs = rng.integers(0, num_nodeattributes, size=n)
        is_attributed = (rng.random(n) < 0.4).astype(np.int64)
        x = np.stack([types, attrs], axis=1).astype(np.int32)
        L = int(rng.integers(1, seq_len_max))
        seq = [words[int(types[i % n]) % vocab_size] for i in range(L)]
        graphs.append({
            "x": x,
            "edge_index": ei,
            "edge_attr": None,
            "node_depth": depth,
            "node_is_attributed": is_attributed,
            "y_seq": seq,
        })
    return graphs
