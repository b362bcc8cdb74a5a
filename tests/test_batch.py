import numpy as np

from graphtrans_tpu.data.batch import GraphBatch, bucket_size, collate
from tests.conftest import make_random_graph


def test_bucket_size():
    assert bucket_size(1) == 128
    assert bucket_size(128) == 128
    assert bucket_size(129) == 256  # 1.25*128=160 -> 160? rounded up multiple of 128 -> 256
    assert bucket_size(300, 128) in (384, 448, 512)
    b = bucket_size(1000, 128)
    assert b >= 1000


def test_collate_basic(rng):
    graphs = [make_random_graph(rng, 5, 7), make_random_graph(rng, 3, 4)]
    b = collate(graphs, num_graphs_cap=4, num_nodes_cap=16, num_edges_cap=32)
    assert b.node_feat.shape == (16, 8)
    assert b.node_mask.sum() == 8
    assert b.edge_mask.sum() == 11
    assert b.graph_mask.tolist() == [True, True, False, False]
    assert np.all(b.node_graph[b.node_mask] == np.repeat([0, 1], [5, 3]))
    # padding nodes assigned to last graph slot
    assert np.all(b.node_graph[~b.node_mask] == 3)
    # edges sorted by dst
    vd = b.edge_dst[b.edge_mask]
    assert np.all(np.diff(vd) >= 0)
    # edge endpoints stay within their graph's node range after offsetting
    assert b.num_nodes.tolist() == [5, 3, 0, 0]


def test_collate_truncation_keeps_last_nodes(rng):
    g = make_random_graph(rng, 40, 10)
    b = collate([g], 2, 64, 16, max_input_len=16)
    # dense width S = min(bucket(40,16)=48? no: bucket_size(40,16)=? , 16) = 16
    assert b.max_nodes_dense == 16
    pos = b.node_pos[b.node_mask]
    # first 24 nodes truncated -> trash column 16
    assert np.all(pos[:24] == 16)
    assert pos[24:].tolist() == list(range(16))


def test_collate_dense_adj(rng):
    g = {
        "x": np.zeros((3, 2), np.float32),
        "edge_index": np.array([[0, 1], [1, 2]]),
        "edge_attr": None,
        "y": np.array([0]),
    }
    b = collate([g], 2, 8, 8, with_dense_adj=True)
    S = b.max_nodes_dense
    adj = b.dense_adj
    assert adj.shape == (2, S, S)
    assert adj[0, 0, 1] and adj[0, 1, 0]  # edge + inverse
    assert adj[0, 1, 2] and adj[0, 2, 1]
    assert adj[0, 0, 0] and adj[0, 1, 1] and adj[0, 2, 2]  # self loops
    assert not adj[0, 0, 2]
    assert not adj[1].any()


def test_graphbatch_is_pytree(rng):
    import jax

    b = collate([make_random_graph(rng, 4, 6)], 2, 8, 8)
    leaves = jax.tree_util.tree_leaves(b)
    assert len(leaves) >= 10
    b2 = jax.tree_util.tree_map(lambda x: x, b)
    assert isinstance(b2, GraphBatch)
    assert b2.max_nodes_dense == b.max_nodes_dense
