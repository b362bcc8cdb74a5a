import numpy as np
import pytest

from graphtrans_tpu.data import DATASET_UTILS
from graphtrans_tpu.data.evaluators import eval_acc, eval_ap, eval_f1_seq, eval_rocauc
from graphtrans_tpu.data.loader import GraphLoader, dataset_caps
from graphtrans_tpu.data.synthetic import make_code_dataset, make_mol_dataset, make_tu_dataset
from graphtrans_tpu.data.vocab import (
    augment_edge,
    decode_arr_to_seq,
    encode_seq_to_arr,
    get_vocab_mapping,
)


def test_vocab_roundtrip():
    seqs = [["a", "b"], ["a", "b", "c", "df", "f", "2edea", "a"],
            ["eraea", "a", "c"], ["d"], ["4rq4f", "f", "a", "a", "g"]]
    vocab2idx, idx2vocab = get_vocab_mapping(seqs, 4)
    assert len(vocab2idx) == len(idx2vocab) == 6  # 4 + UNK + EOS
    assert idx2vocab[vocab2idx["a"]] == "a"
    assert vocab2idx["__EOS__"] == len(idx2vocab) - 1
    for seq in seqs:
        arr = encode_seq_to_arr(seq, vocab2idx, 4)
        dec = decode_arr_to_seq(arr, idx2vocab)
        expect = [w if w in vocab2idx else "__UNK__" for w in seq[:4]]
        assert dec == expect


def test_augment_edge():
    g = {
        "edge_index": np.array([[0, 0], [1, 2]]),
        "node_is_attributed": np.array([0, 1, 1]),
    }
    out = augment_edge(g)
    # 2 AST + 2 inverse + 1 next-token + 1 inverse = 6
    assert out["edge_index"].shape == (2, 6)
    assert out["edge_attr"].shape == (6, 2)
    np.testing.assert_array_equal(out["edge_attr"][:2], [[0, 0], [0, 0]])
    np.testing.assert_array_equal(out["edge_attr"][2:4], [[0, 1], [0, 1]])
    np.testing.assert_array_equal(out["edge_attr"][4], [1, 0])
    np.testing.assert_array_equal(out["edge_attr"][5], [1, 1])
    np.testing.assert_array_equal(out["edge_index"][:, 4], [1, 2])
    np.testing.assert_array_equal(out["edge_index"][:, 5], [2, 1])


def test_evaluators():
    r = eval_f1_seq([["a", "b"], ["c"]], [["a"], ["c"]])
    # sample 1: p=1, r=0.5, f1=2/3; sample 2: p=r=f1=1
    np.testing.assert_allclose(r["F1"], (2 / 3 + 1) / 2, rtol=1e-6)

    y = np.array([[1.0, np.nan], [0.0, 1.0], [1.0, 0.0], [0.0, np.nan]])
    p = np.array([[0.9, 0.1], [0.1, 0.8], [0.8, 0.3], [0.2, 0.4]])
    assert eval_ap(y, p)["ap"] == 1.0
    assert eval_rocauc(y, p)["rocauc"] == 1.0
    assert eval_acc(np.array([1, 0, 1]), np.array([1, 1, 1]))["acc"] == pytest.approx(2 / 3)


def test_loader_covers_all_graphs(rng):
    graphs = make_tu_dataset(num_graphs=57, seed=2)
    loader = GraphLoader(graphs, batch_size=16)
    seen = []
    for b in loader:
        seen.extend(np.asarray(b.graph_ids)[np.asarray(b.graph_mask)].tolist())
    assert sorted(seen) == list(range(57))
    # shuffled epoch still covers everything exactly once
    loader2 = GraphLoader(graphs, batch_size=16, shuffle=True, seed=1)
    seen2 = []
    for b in loader2:
        seen2.extend(np.asarray(b.graph_ids)[np.asarray(b.graph_mask)].tolist())
    assert sorted(seen2) == list(range(57))
    assert seen2 != sorted(seen2)


def test_loader_sharded_shapes(rng):
    graphs = make_tu_dataset(num_graphs=40, seed=2)
    loader = GraphLoader(graphs, batch_size=8, num_shards=2)
    total = 0
    for b in loader:
        assert b.node_feat.ndim == 3 and b.node_feat.shape[0] == 2
        total += int(np.asarray(b.graph_mask).sum())
    assert total == 40


def test_dataset_utils_synthetic(tmp_path):
    import argparse

    from graphtrans_tpu.models import MODELS

    for name, extra in [("NCI1", {}), ("ogbg-molpcba", {}), ("ogbg-code2", {"max_seq_len": 5, "num_vocab": 100})]:
        util = DATASET_UTILS[name]()
        args = argparse.Namespace(
            dataset=name, data_root=str(tmp_path), gnn_emb_dim=16,
            synthetic_num_graphs=30, synthetic_seed=0, feature="full",
            max_seq_len=extra.get("max_seq_len"), num_vocab=extra.get("num_vocab", 100),
        )
        bundle = util.preprocess(args, MODELS["gnn"], seed=0)
        assert set(bundle.splits) == {"train", "valid", "test"}
        assert len(bundle.splits["train"]) == 24
        enc = bundle.node_encoder_cls()
        assert enc is not None
        if name == "ogbg-code2":
            assert bundle.max_seq_len == 5
            g = bundle.splits["train"][0]
            assert g["edge_attr"].shape[1] == 2
            assert g["y_arr"].shape == (5,)
        if name == "ogbg-molpcba":
            assert bundle.deg is not None and bundle.deg.shape == (10,)
            assert bundle.y_dtype == "float32"


def test_tu_format_parser(tmp_path):
    from graphtrans_tpu.data.tu import load_tu_dataset

    d = tmp_path / "TOY"
    d.mkdir(parents=True)
    base = str(d / "TOY")  # standard TU layout: root/DS/DS_A.txt
    # 2 graphs: 3-node triangle + 2-node edge (1-based format)
    np.savetxt(base + "_A.txt", [[1, 2], [2, 1], [2, 3], [3, 2], [4, 5], [5, 4]],
               fmt="%d", delimiter=",")
    np.savetxt(base + "_graph_indicator.txt", [1, 1, 1, 2, 2], fmt="%d")
    np.savetxt(base + "_graph_labels.txt", [1, -1], fmt="%d")
    np.savetxt(base + "_node_labels.txt", [0, 1, 2, 0, 1], fmt="%d")
    graphs, ncls = load_tu_dataset(str(tmp_path), "TOY")
    assert ncls == 2
    assert len(graphs) == 2
    assert graphs[0]["x"].shape == (3, 3)
    assert graphs[0]["edge_index"].shape == (2, 4)
    assert graphs[1]["edge_index"].tolist() == [[0, 1], [1, 0]]
    assert {int(g["y"][0]) for g in graphs} == {0, 1}


def test_ogb_raw_csv_reader_roundtrip(tmp_path):
    """Write a synthetic dataset in OGB's raw CSV layout, read it back."""
    import gzip

    import pandas as pd

    from graphtrans_tpu.data.mol import load_ogb_graphs
    from graphtrans_tpu.data.synthetic import make_mol_dataset

    graphs = make_mol_dataset(num_graphs=12, num_tasks=3, seed=1)
    d = tmp_path / "ogbg_molpcba" / "raw"
    d.mkdir(parents=True)

    def w(name, arr):
        pd.DataFrame(np.asarray(arr)).to_csv(d / name, header=False, index=False,
                                             compression="gzip")

    w("num-node-list.csv.gz", [[g["x"].shape[0]] for g in graphs])
    w("num-edge-list.csv.gz", [[g["edge_index"].shape[1]] for g in graphs])
    w("node-feat.csv.gz", np.concatenate([g["x"] for g in graphs]))
    w("edge-feat.csv.gz", np.concatenate([g["edge_attr"] for g in graphs]))
    w("edge.csv.gz", np.concatenate([g["edge_index"].T for g in graphs]))
    w("graph-label.csv.gz", np.stack([g["y"] for g in graphs]))
    sd = tmp_path / "ogbg_molpcba" / "split" / "scaffold"
    sd.mkdir(parents=True)
    for name, idx in (("train", range(8)), ("valid", range(8, 10)), ("test", range(10, 12))):
        pd.DataFrame([[i] for i in idx]).to_csv(sd / f"{name}.csv.gz", header=False,
                                                index=False, compression="gzip")

    out, split_idx = load_ogb_graphs(str(tmp_path), "ogbg-molpcba")
    assert len(out) == 12
    for a, b in zip(out, graphs):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["edge_index"], b["edge_index"])
        np.testing.assert_array_equal(a["edge_attr"], b["edge_attr"])
        np.testing.assert_allclose(
            np.nan_to_num(a["y"], nan=-9), np.nan_to_num(b["y"], nan=-9))
    assert list(split_idx["train"]) == list(range(8))
    assert list(split_idx["test"]) == [10, 11]

    # preprocess() should pick up the on-disk data instead of synthetic
    import argparse

    from graphtrans_tpu.data.mol import MolUtil
    from graphtrans_tpu.models import MODELS

    args = argparse.Namespace(dataset="ogbg-molpcba", data_root=str(tmp_path),
                              gnn_emb_dim=16, feature="full")
    bundle = MolUtil.preprocess(args, MODELS["gnn"], seed=0)
    assert len(bundle.splits["train"]) == 8
    assert bundle.num_tasks == 3


def test_loader_drops_oversized_without_duplication(rng):
    """A graph exceeding the fixed caps is dropped exactly once — following
    graphs must not be duplicated, and an oversized FIRST graph must not
    requeue forever (regression)."""
    graphs = make_tu_dataset(num_graphs=20, min_nodes=5, max_nodes=10, seed=3)
    # graph 0 and graph 7 oversized
    big = make_tu_dataset(num_graphs=2, min_nodes=400, max_nodes=420, seed=4)
    graphs[0] = big[0]
    graphs[7] = big[1]
    loader = GraphLoader(graphs, batch_size=4, fixed_caps=(128, 512),
                         use_native=False)
    seen = []
    for b in loader:
        seen.extend(np.asarray(b.graph_ids)[np.asarray(b.graph_mask)].tolist())
    assert sorted(seen) == [i for i in range(20) if i not in (0, 7)]
    assert len(seen) == len(set(seen))


def test_vocab_tiebreak_first_appearance():
    """Equal-count tokens must rank by first corpus appearance (pins the
    reference's stable-argsort tie-break, dataset/utils.py:33-86 — vocab ids
    feed checkpoints and eval decoding, so the order is load-bearing)."""
    seqs = [["zz", "aa", "mm"], ["aa", "zz", "mm"], ["qq"]]
    # counts: zz=2, aa=2, mm=2, qq=1 — all ties resolve by appearance order
    vocab2idx, idx2vocab = get_vocab_mapping(seqs, 10)
    assert idx2vocab[:4] == ["zz", "aa", "mm", "qq"]
    # truncation keeps the earlier-appearing token among equals
    _, top2 = get_vocab_mapping(seqs, 2)
    assert top2 == ["zz", "aa", "__UNK__", "__EOS__"]
