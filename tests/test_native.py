"""Native C++ batcher parity: identical GraphBatch as the numpy collate."""

import numpy as np
import pytest

from graphtrans_tpu.data import native
from graphtrans_tpu.data.loader import GraphLoader
from graphtrans_tpu.data.synthetic import make_code_dataset, make_mol_dataset, make_tu_dataset
from graphtrans_tpu.data.vocab import augment_edge, encode_seq_to_arr, get_vocab_mapping

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="libgraph_batcher.so not built"
)


def _batches(graphs, **kw):
    ln = GraphLoader(graphs, use_native=True, **kw)
    lp = GraphLoader(graphs, use_native=False, **kw)
    assert ln.packed is not None, "native path not active"
    return list(iter(ln)), list(iter(lp))


def _assert_equal(bn, bp):
    import dataclasses

    for f in dataclasses.fields(bn):
        a, b = getattr(bn, f.name), getattr(bp, f.name)
        if a is None or isinstance(a, int):
            assert a == b, f.name
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f.name)


@pytest.mark.parametrize("maker,kw", [
    (make_tu_dataset, dict(batch_size=16)),
    (make_mol_dataset, dict(batch_size=16, num_tasks=8, y_dtype="float32")),
])
def test_native_matches_python(maker, kw):
    graphs = maker(num_graphs=50, seed=4)
    kw = dict(kw)
    nt = kw.pop("num_tasks", 1)
    yd = kw.pop("y_dtype", "int32")
    native_batches, python_batches = _batches(graphs, num_tasks=nt, y_dtype=yd, **kw)
    assert len(native_batches) == len(python_batches)
    for bn, bp in zip(native_batches, python_batches):
        _assert_equal(bn, bp)


def test_native_code2_with_depth_and_edge_attr():
    graphs = make_code_dataset(num_graphs=30, seed=1)
    vocab2idx, _ = get_vocab_mapping([g["y_seq"] for g in graphs], 30)
    out = []
    for g in graphs:
        g = augment_edge(g)
        g["y_arr"] = encode_seq_to_arr(g["y_seq"], vocab2idx, 5)
        out.append(g)
    native_batches, python_batches = _batches(out, batch_size=8, max_seq_len=5)
    for bn, bp in zip(native_batches, python_batches):
        _assert_equal(bn, bp)


def test_native_truncation():
    graphs = make_tu_dataset(num_graphs=10, min_nodes=30, max_nodes=60, seed=2)
    native_batches, python_batches = _batches(
        graphs, batch_size=4, max_input_len=16
    )
    for bn, bp in zip(native_batches, python_batches):
        _assert_equal(bn, bp)


def test_native_threaded_matches_python():
    """Multi-threaded native assembly (per-graph counting sort + tail-only
    resets) must stay bit-identical to the single-threaded python collate."""
    graphs = make_mol_dataset(num_graphs=200, num_tasks=8, seed=9)
    ln = GraphLoader(graphs, 64, num_tasks=8, y_dtype="float32",
                     use_native=True, native_threads=4)
    lp = GraphLoader(graphs, 64, num_tasks=8, y_dtype="float32",
                     use_native=False)
    assert ln.packed is not None and ln.native_threads == 4
    for bn, bp in zip(list(iter(ln)), list(iter(lp))):
        _assert_equal(bn, bp)


def test_native_buffer_ring_reuse_stays_clean():
    """Reused ring buffers must not leak stale data between batches of very
    different sizes (tail-only resets cover exactly the padding)."""
    from graphtrans_tpu.data import native as nat
    from graphtrans_tpu.data.batch import collate

    graphs = make_tu_dataset(num_graphs=60, min_nodes=4, max_nodes=40, seed=3)
    gid = [dict(g, _id=i) for i, g in enumerate(graphs)]
    packed = nat.PackedDataset(gid)
    n_cap, e_cap, g_cap = 1024, 4096, 33
    ring = nat.BufferRing(packed, n_cap, e_cap, g_cap, size=2)
    big = np.arange(32, dtype=np.int64)
    small = np.array([40, 41], dtype=np.int64)
    # fill both ring slots with BIG batches, then collate small ones into them
    for _ in range(2):
        nat.native_collate(packed, big, n_cap, e_cap, g_cap, 1000,
                           buffers=ring.next(), num_threads=3)
    for sel in (small, small):
        raw = nat.native_collate(packed, sel, n_cap, e_cap, g_cap, 1000,
                                 buffers=ring.next(), num_threads=3)
        ref = collate([gid[i] for i in sel], g_cap, n_cap, e_cap)
        np.testing.assert_array_equal(raw["node_feat"], np.asarray(ref.node_feat))
        np.testing.assert_array_equal(raw["node_mask"], np.asarray(ref.node_mask))
        np.testing.assert_array_equal(raw["edge_src"], np.asarray(ref.edge_src))
        np.testing.assert_array_equal(raw["edge_dst"], np.asarray(ref.edge_dst))
        np.testing.assert_array_equal(raw["edge_mask"], np.asarray(ref.edge_mask))
        np.testing.assert_array_equal(raw["graph_mask"], np.asarray(ref.graph_mask))
        np.testing.assert_array_equal(raw["node_graph"], np.asarray(ref.node_graph))
        np.testing.assert_array_equal(raw["num_nodes"], np.asarray(ref.num_nodes))


def test_native_strided_layout_matches_python():
    """gt_collate4 strided mode: per-graph node placement, inline gap
    resets, and dense edge tables must match the python collate exactly."""
    graphs = make_mol_dataset(num_graphs=120, num_tasks=8, seed=12)
    ln = GraphLoader(graphs, 32, num_tasks=8, y_dtype="float32",
                     use_native=True, dense_layout=True, native_threads=3)
    lp = GraphLoader(graphs, 32, num_tasks=8, y_dtype="float32",
                     use_native=False, dense_layout=True)
    assert ln.packed is not None and ln.node_stride > 0
    assert ln.node_stride == lp.node_stride
    nb, pb = list(iter(ln)), list(iter(lp))
    assert len(nb) == len(pb)
    for a, b in zip(nb, pb):
        _assert_equal(a, b)
