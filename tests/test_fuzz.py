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


def test_fuzz_scatter_free_plan_invariants():
    """Random shapes through GraphLoader(scatter_free=True): every batch's
    slot plans must cover exactly the valid edges, reconstruct the flat
    endpoints as a multiset, and keep the ELL/pool plan geometry sound."""
    rng = np.random.default_rng(321)
    from graphtrans_tpu.ops import block_plan as bp

    for trial in range(12):
        n_graphs = int(rng.integers(3, 80))
        graphs = make_mol_dataset(num_graphs=n_graphs,
                                  num_tasks=4,
                                  min_nodes=int(rng.integers(2, 8)),
                                  max_nodes=int(rng.integers(9, 50)),
                                  seed=1000 + trial)
        bs = int(rng.integers(1, n_graphs + 2))
        loader = GraphLoader(graphs, bs, shuffle=bool(trial % 2), seed=trial,
                             num_tasks=4, y_dtype="float32",
                             scatter_free=True, use_native=False)
        for b in loader:
            if b.sfa_dst is None:
                continue
            em = np.asarray(b.edge_mask)
            N = b.node_graph.shape[0]
            nb = b.sfa_nb
            assert N % nb == 0
            for plan, major, other in (
                (b.sfa_dst, b.edge_dst, b.edge_src),
                (b.sfa_src, b.edge_src, b.edge_dst),
            ):
                mask = np.asarray(plan["mask"]) > 0
                assert int(mask.sum()) == int(em.sum())
                L = mask.shape[0]
                eb = L // (N // nb)
                blk = np.arange(L) // eb
                mg = (blk * nb + np.asarray(plan["loc"]))[mask]
                og = np.asarray(plan["other_g"])[mask]
                want = sorted(zip(np.asarray(major)[em].tolist(),
                                  np.asarray(other)[em].tolist()))
                assert sorted(zip(mg.tolist(), og.tolist())) == want
            if b.ell_dst is not None:
                for plan, k, major in ((b.ell_dst, b.ell_k_in, b.edge_dst),
                                       (b.ell_src, b.ell_k_out, b.edge_src)):
                    mask = np.asarray(plan["mask"]).reshape(N, k) > 0
                    assert int(mask.sum()) == int(em.sum())
                    deg = np.bincount(np.asarray(major)[em], minlength=N)
                    np.testing.assert_array_equal(mask.sum(1), deg)
            if b.sfa_pool is not None:
                pm = np.asarray(b.sfa_pool["mask"]) > 0
                assert int(pm.sum()) == int(np.asarray(b.node_mask).sum())
