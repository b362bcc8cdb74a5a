"""Seeded fuzz over the batching pipeline: for random dataset shapes and
loader configs, the padded-batch invariants the compute stack relies on must
hold (mask consistency, dst-sorted edges, exact coverage, index ranges,
padding-graph convention, python/native agreement)."""

import numpy as np

from graphtrans_tpu.data import native
from graphtrans_tpu.data.loader import GraphLoader
from graphtrans_tpu.data.synthetic import make_mol_dataset, make_tu_dataset


def check_batch_invariants(b, num_graphs_total):
    N = b.node_feat.shape[0]
    G = b.graph_mask.shape[0]
    nm = np.asarray(b.node_mask)
    em = np.asarray(b.edge_mask)
    gm = np.asarray(b.graph_mask)
    ng = np.asarray(b.node_graph)
    src = np.asarray(b.edge_src)
    dst = np.asarray(b.edge_dst)

    # index ranges
    assert ng.min() >= 0 and ng.max() < G
    assert src.min() >= 0 and src.max() < N
    assert dst.min() >= 0 and dst.max() < N
    # padding nodes point at the reserved last graph slot
    if (~nm).any():
        assert np.all(ng[~nm] == G - 1)
        assert not gm[G - 1]
    # valid edges touch valid nodes only
    assert nm[src[em]].all() and nm[dst[em]].all()
    # dst-sorted for CSR segment runs
    vd = dst[em]
    assert np.all(np.diff(vd) >= 0)
    # per-graph node counts match the mask
    for gi in np.nonzero(gm)[0]:
        assert (ng[nm] == gi).sum() == np.asarray(b.num_nodes)[gi]
    # dense positions within [0, S] (S = trash column)
    pos = np.asarray(b.node_pos)[nm]
    assert pos.min() >= 0 and pos.max() <= b.max_nodes_dense
    # ids valid
    ids = np.asarray(b.graph_ids)
    assert np.all(ids[gm] >= 0) and np.all(ids[gm] < num_graphs_total)


def test_fuzz_loader_invariants():
    rng = np.random.default_rng(123)
    for trial in range(25):
        kind = trial % 2
        n_graphs = int(rng.integers(3, 120))
        if kind == 0:
            graphs = make_tu_dataset(num_graphs=n_graphs,
                                     min_nodes=int(rng.integers(2, 6)),
                                     max_nodes=int(rng.integers(7, 60)),
                                     seed=trial)
            y_dtype, num_tasks = "int32", 2
        else:
            graphs = make_mol_dataset(num_graphs=n_graphs,
                                      num_tasks=int(rng.integers(1, 12)),
                                      min_nodes=int(rng.integers(2, 8)),
                                      max_nodes=int(rng.integers(9, 40)),
                                      seed=trial)
            y_dtype, num_tasks = "float32", graphs[0]["y"].shape[0]
        bs = int(rng.integers(1, n_graphs + 4))
        mil = int(rng.choice([4, 16, 1000]))
        for use_native in ((False, True) if native.native_available() else (False,)):
            loader = GraphLoader(graphs, bs, shuffle=bool(trial % 3),
                                 seed=trial, num_tasks=num_tasks,
                                 y_dtype=y_dtype, max_input_len=mil,
                                 use_native=use_native)
            seen = []
            for b in loader:
                check_batch_invariants(b, len(graphs))
                seen.extend(np.asarray(b.graph_ids)[np.asarray(b.graph_mask)].tolist())
            assert sorted(seen) == list(range(len(graphs))), (
                f"trial {trial} native={use_native}: coverage broken")


def test_fuzz_dense_layout_invariants():
    """Strided-layout fuzz: random shapes, python AND native collation —
    batch invariants hold, dense edge tables agree with flat edges, and
    epoch coverage is exact (oversized graphs excluded loudly)."""
    rng = np.random.default_rng(7)
    for trial in range(15):
        n_graphs = int(rng.integers(3, 100))
        graphs = make_tu_dataset(num_graphs=n_graphs,
                                 min_nodes=int(rng.integers(2, 6)),
                                 max_nodes=int(rng.integers(7, 50)),
                                 seed=100 + trial)
        bs = int(rng.integers(1, n_graphs + 4))
        for use_native in ((False, True) if native.native_available() else (False,)):
            loader = GraphLoader(graphs, bs, shuffle=bool(trial % 2),
                                 seed=trial, num_tasks=2, y_dtype="int32",
                                 dense_layout=True, use_native=use_native)
            assert loader.node_stride > 0
            seen = []
            for b in loader:
                check_batch_invariants(b, len(graphs))
                assert b.node_stride == loader.node_stride
                N = b.node_feat.shape[0]
                assert N == b.num_graph_slots * b.node_stride
                # strided placement: node_graph of valid rows == row // stride
                nm = np.asarray(b.node_mask)
                rows = np.nonzero(nm)[0]
                np.testing.assert_array_equal(
                    np.asarray(b.node_graph)[rows], rows // b.node_stride)
                # dense edge tables reproduce the flat edges exactly
                em = np.asarray(b.edge_mask)
                es = np.asarray(b.edge_src)[em]
                ed = np.asarray(b.edge_dst)[em]
                flat_pairs = set(zip(es.tolist(), ed.tolist()))
                emd = np.asarray(b.edge_mask_dense)
                gsrc = np.asarray(b.edge_src_dense)
                gdst = np.asarray(b.edge_dst_dense)
                dense_pairs = set()
                for g in range(b.num_graph_slots):
                    for e in np.nonzero(emd[g])[0]:
                        dense_pairs.add((int(gsrc[g, e] + g * b.node_stride),
                                         int(gdst[g, e] + g * b.node_stride)))
                assert dense_pairs == flat_pairs
                seen.extend(np.asarray(b.graph_ids)[np.asarray(b.graph_mask)].tolist())
            assert sorted(seen) == list(range(len(graphs)))
