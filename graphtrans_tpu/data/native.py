"""ctypes bindings for the native C++ batcher (csrc/graph_batcher.cpp).

The dataset is packed ONCE into contiguous arrays; every batch is then
assembled by a single native call (copy + pad + stable counting-sort CSR by
destination) into preallocated numpy buffers — the role PyG's C++ collate
plays inside the reference's DataLoader workers. Falls back transparently to
the pure-numpy collate when the shared library hasn't been built
(`make -C csrc`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _load_lib(build_if_missing: bool = True):
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.abspath(os.path.join(_CSRC, "libgraph_batcher.so"))
    if not os.path.exists(so) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.gt_collate.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class PackedDataset:
    """Dataset packed into contiguous arrays for the native batcher."""

    def __init__(self, graphs: Sequence[dict]):
        n_list = [int(g["x"].shape[0]) for g in graphs]
        e_list = [int(g["edge_index"].shape[1]) for g in graphs]
        self.node_offsets = np.zeros(len(graphs) + 1, np.int64)
        self.node_offsets[1:] = np.cumsum(n_list)
        self.edge_offsets = np.zeros(len(graphs) + 1, np.int64)
        self.edge_offsets[1:] = np.cumsum(e_list)

        x0 = graphs[0]["x"]
        self.feat_dtype = x0.dtype
        self.feat_dim = x0.shape[1] if x0.ndim == 2 else 1
        self.node_feat = np.concatenate(
            [np.ascontiguousarray(g["x"].reshape(-1, self.feat_dim)) for g in graphs]
        )
        self.edge_src = np.concatenate(
            [g["edge_index"][0] for g in graphs]).astype(np.int64)
        self.edge_dst = np.concatenate(
            [g["edge_index"][1] for g in graphs]).astype(np.int64)
        ea0 = graphs[0].get("edge_attr")
        if ea0 is not None:
            self.edge_dim = ea0.shape[1] if ea0.ndim == 2 else 1
            self.edge_dtype = ea0.dtype
            self.edge_attr = np.concatenate(
                [np.ascontiguousarray(g["edge_attr"].reshape(-1, self.edge_dim))
                 for g in graphs])
        else:
            self.edge_dim = 0
            self.edge_dtype = np.float32
            self.edge_attr = None
        if "node_depth" in graphs[0] and graphs[0]["node_depth"] is not None:
            self.node_depth = np.concatenate(
                [g["node_depth"].reshape(-1) for g in graphs]).astype(np.int32)
        else:
            self.node_depth = None
        self.graphs = graphs

        # labels packed once for vectorized per-batch fill (the per-graph
        # python loop otherwise dominates batch assembly time)
        y0 = graphs[0].get("y")
        if y0 is not None and np.issubdtype(np.asarray(y0).dtype, np.floating):
            T = int(np.asarray(y0).reshape(-1).shape[0])
            self.y_float = np.full((len(graphs), T), np.nan, np.float32)
            for i, g in enumerate(graphs):
                arr = np.asarray(g["y"], np.float32).reshape(-1)
                self.y_float[i, : arr.shape[0]] = arr
            self.y_int = None
        elif y0 is not None:
            self.y_int = np.array(
                [int(np.asarray(g["y"]).reshape(-1)[0]) for g in graphs], np.int32)
            self.y_float = None
        else:
            self.y_int = None
            self.y_float = None
        if "y_arr" in graphs[0]:
            self.y_arr = np.stack(
                [np.asarray(g["y_arr"], np.int32).reshape(-1) for g in graphs])
        else:
            self.y_arr = None


def _ptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.c_void_p)


def native_collate(packed: PackedDataset, indices: np.ndarray,
                   n_cap: int, e_cap: int, g_cap: int, dense_s: int):
    """Run the native batcher; returns the raw output arrays or None if the
    library is unavailable / capacities are violated."""
    lib = _load_lib()
    if lib is None:
        return None
    feat_row = int(self_bytes(packed.feat_dtype) * packed.feat_dim)
    edge_row = int(self_bytes(packed.edge_dtype) * packed.edge_dim)

    node_feat = np.zeros((n_cap, packed.feat_dim), packed.feat_dtype)
    node_graph = np.full(n_cap, g_cap - 1, np.int32)
    node_pos = np.zeros(n_cap, np.int32)
    node_mask = np.zeros(n_cap, np.uint8)
    node_depth = np.zeros(n_cap, np.int32)
    edge_src = np.full(e_cap, n_cap - 1, np.int32)
    edge_dst = np.full(e_cap, n_cap - 1, np.int32)
    edge_attr = np.zeros((e_cap, max(packed.edge_dim, 1)), packed.edge_dtype)
    edge_mask = np.zeros(e_cap, np.uint8)
    graph_mask = np.zeros(g_cap, np.uint8)
    num_nodes = np.zeros(g_cap, np.int32)
    graph_ids = np.full(g_cap, -1, np.int32)

    idx = np.ascontiguousarray(indices, np.int64)
    rc = lib.gt_collate(
        _ptr(packed.node_offsets), _ptr(packed.edge_offsets),
        _ptr(packed.node_feat), ctypes.c_int64(feat_row),
        _ptr(packed.edge_src), _ptr(packed.edge_dst),
        _ptr(packed.edge_attr), ctypes.c_int64(edge_row),
        _ptr(packed.node_depth),
        _ptr(idx), ctypes.c_int64(len(idx)),
        ctypes.c_int64(n_cap), ctypes.c_int64(e_cap),
        ctypes.c_int64(g_cap), ctypes.c_int64(dense_s),
        _ptr(node_feat), _ptr(node_graph), _ptr(node_pos), _ptr(node_mask),
        _ptr(node_depth),
        _ptr(edge_src), _ptr(edge_dst), _ptr(edge_attr), _ptr(edge_mask),
        _ptr(graph_mask), _ptr(num_nodes), _ptr(graph_ids),
    )
    if rc != 0:
        return None
    return dict(
        node_feat=node_feat, node_graph=node_graph, node_pos=node_pos,
        node_mask=node_mask.astype(bool), node_depth=node_depth,
        edge_src=edge_src, edge_dst=edge_dst, edge_attr=edge_attr,
        edge_mask=edge_mask.astype(bool), graph_mask=graph_mask.astype(bool),
        num_nodes=num_nodes, graph_ids=graph_ids,
    )


def self_bytes(dtype) -> int:
    return np.dtype(dtype).itemsize
