"""ctypes bindings for the native C++ batcher (csrc/graph_batcher.cpp).

The dataset is packed ONCE into contiguous arrays (features, edges, offsets,
labels); every batch is then assembled by a single native call
(reset + copy + pad + label fill + stable counting-sort CSR by destination)
into a reusable ring of output buffers — the role PyG's C++ collate plays
inside the reference's DataLoader workers, minus per-batch allocations.
Falls back transparently to the pure-numpy collate when the shared library
hasn't been built (`make -C csrc`).

Buffer-ring safety: a yielded batch's arrays are overwritten `ring_size`
batches later. The training loop's device prefetch keeps at most 2 batches
in flight and `jax.device_put` snapshots data before then, so the default
ring of 4 leaves slack; pass ring_size=0 to allocate per batch instead.
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
    src = os.path.abspath(os.path.join(_CSRC, "graph_batcher.cpp"))
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if (not os.path.exists(so) or stale) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    if not hasattr(lib, "gt_collate4"):
        return None
    lib.gt_collate4.restype = ctypes.c_int
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

        # labels packed once: filled per batch inside the native call
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


class BatchBuffers:
    """One reusable set of output buffers for the native collate."""

    def __init__(self, packed: PackedDataset, n_cap, e_cap, g_cap,
                 dense_edge_cap: int = 0):
        self.node_feat = np.empty((n_cap, packed.feat_dim), packed.feat_dtype)
        self.node_graph = np.empty(n_cap, np.int32)
        self.node_pos = np.empty(n_cap, np.int32)
        self.node_mask = np.empty(n_cap, np.uint8)
        self.node_depth = np.empty(n_cap, np.int32)
        self.edge_src = np.empty(e_cap, np.int32)
        self.edge_dst = np.empty(e_cap, np.int32)
        # no edge features -> the native call never touches this buffer;
        # zero it once here so padding stays clean across reuses
        self.edge_attr = (
            np.zeros((e_cap, 1), packed.edge_dtype) if packed.edge_dim == 0
            else np.empty((e_cap, packed.edge_dim), packed.edge_dtype)
        )
        self.edge_mask = np.empty(e_cap, np.uint8)
        self.graph_mask = np.empty(g_cap, np.uint8)
        self.num_nodes = np.empty(g_cap, np.int32)
        self.graph_ids = np.empty(g_cap, np.int32)
        self.y_int = np.empty(g_cap, np.int32) if packed.y_int is not None else None
        self.y_float = (np.empty((g_cap, packed.y_float.shape[1]), np.float32)
                        if packed.y_float is not None else None)
        self.y_arr = (np.empty((g_cap, packed.y_arr.shape[1]), np.int32)
                      if packed.y_arr is not None else None)
        # strided-layout dense edge tables
        if dense_edge_cap > 0:
            self.edge_src_dense = np.empty((g_cap, dense_edge_cap), np.int32)
            self.edge_dst_dense = np.empty((g_cap, dense_edge_cap), np.int32)
            self.edge_mask_dense = np.empty((g_cap, dense_edge_cap), np.uint8)
            self.edge_attr_dense = (
                np.zeros((g_cap, dense_edge_cap, 1), packed.edge_dtype)
                if packed.edge_dim == 0
                else np.empty((g_cap, dense_edge_cap, packed.edge_dim),
                              packed.edge_dtype))
        else:
            self.edge_src_dense = self.edge_dst_dense = None
            self.edge_mask_dense = self.edge_attr_dense = None


class BufferRing:
    def __init__(self, packed, n_cap, e_cap, g_cap, size: int = 4,
                 dense_edge_cap: int = 0):
        self._bufs = [BatchBuffers(packed, n_cap, e_cap, g_cap,
                                   dense_edge_cap=dense_edge_cap)
                      for _ in range(size)]
        self._i = 0

    def next(self) -> BatchBuffers:
        b = self._bufs[self._i]
        self._i = (self._i + 1) % len(self._bufs)
        return b


def _ptr(a: Optional[np.ndarray]):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.c_void_p)


def native_collate(packed: PackedDataset, indices: np.ndarray,
                   n_cap: int, e_cap: int, g_cap: int, dense_s: int,
                   buffers: Optional[BatchBuffers] = None,
                   num_threads: int = 1,
                   node_stride: int = 0, dense_edge_cap: int = 0):
    """Run the native batcher; returns the output arrays (views of `buffers`
    when given) or None if unavailable / capacity violated. `num_threads`
    parallelizes the assembly inside the call (the call releases the GIL, so
    this scales with cores independent of Python)."""
    lib = _load_lib()
    if lib is None:
        return None
    b = buffers or BatchBuffers(packed, n_cap, e_cap, g_cap,
                                dense_edge_cap=dense_edge_cap)
    feat_row = int(np.dtype(packed.feat_dtype).itemsize * packed.feat_dim)
    edge_row = int(np.dtype(packed.edge_dtype).itemsize * packed.edge_dim)
    t_float = packed.y_float.shape[1] if packed.y_float is not None else 0
    t_arr = packed.y_arr.shape[1] if packed.y_arr is not None else 0

    idx = np.ascontiguousarray(indices, np.int64)
    rc = lib.gt_collate4(
        _ptr(packed.node_offsets), _ptr(packed.edge_offsets),
        _ptr(packed.node_feat), ctypes.c_int64(feat_row),
        _ptr(packed.edge_src), _ptr(packed.edge_dst),
        _ptr(packed.edge_attr), ctypes.c_int64(edge_row),
        _ptr(packed.node_depth),
        _ptr(packed.y_int), _ptr(packed.y_float), ctypes.c_int64(t_float),
        _ptr(packed.y_arr), ctypes.c_int64(t_arr),
        _ptr(idx), ctypes.c_int64(len(idx)),
        ctypes.c_int64(n_cap), ctypes.c_int64(e_cap),
        ctypes.c_int64(g_cap), ctypes.c_int64(dense_s),
        _ptr(b.node_feat), _ptr(b.node_graph), _ptr(b.node_pos),
        _ptr(b.node_mask), _ptr(b.node_depth),
        _ptr(b.edge_src), _ptr(b.edge_dst), _ptr(b.edge_attr),
        _ptr(b.edge_mask), _ptr(b.graph_mask), _ptr(b.num_nodes),
        _ptr(b.graph_ids),
        _ptr(b.y_int), _ptr(b.y_float), _ptr(b.y_arr),
        ctypes.c_int64(max(1, num_threads)),
        ctypes.c_int64(node_stride), ctypes.c_int64(dense_edge_cap),
        _ptr(b.edge_src_dense), _ptr(b.edge_dst_dense),
        _ptr(b.edge_mask_dense), _ptr(b.edge_attr_dense),
    )
    if rc != 0:
        return None
    return dict(
        node_feat=b.node_feat, node_graph=b.node_graph, node_pos=b.node_pos,
        node_mask=b.node_mask.view(bool), node_depth=b.node_depth,
        edge_src=b.edge_src, edge_dst=b.edge_dst, edge_attr=b.edge_attr,
        edge_mask=b.edge_mask.view(bool), graph_mask=b.graph_mask.view(bool),
        num_nodes=b.num_nodes, graph_ids=b.graph_ids,
        y_int=b.y_int, y_float=b.y_float, y_arr=b.y_arr,
        edge_src_dense=b.edge_src_dense, edge_dst_dense=b.edge_dst_dense,
        edge_mask_dense=(b.edge_mask_dense.view(bool)
                         if b.edge_mask_dense is not None else None),
        edge_attr_dense=b.edge_attr_dense,
    )
