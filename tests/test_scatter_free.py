"""Scatter-free flat aggregation (ops/scatter_free.py): pure-XLA parity
against the segment path — plans, forward, and grads through GIN/GCN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.loader import dataset_caps
from graphtrans_tpu.data.synthetic import make_code_dataset
from graphtrans_tpu.data.vocab import augment_edge
from graphtrans_tpu.nn import conv as conv_mod
from graphtrans_tpu.nn.conv import GCNConv, GINConv
from graphtrans_tpu.nn.encoders import LinearEdgeEncoder
from graphtrans_tpu.ops import block_plan as bp
from graphtrans_tpu.ops import plan_expand


def _sfa_batch(num_graphs=8, min_nodes=20, max_nodes=120, seed=5,
               explicit=False):
    raw = make_code_dataset(num_graphs=num_graphs, min_nodes=min_nodes,
                            max_nodes=max_nodes, seed=seed)
    graphs = [augment_edge(g) for g in raw]
    ncap, ecap = dataset_caps(graphs, num_graphs)
    return collate(graphs, num_graphs + 1, ncap, ecap, num_tasks=4,
                   y_dtype="float32", scatter_free=True,
                   sfa_explicit=explicit)


def test_compressed_plans_match_explicit():
    """The compressed shipping format (row starts + one src-sort permutation,
    ops/plan_expand.py) expands on device to EXACTLY the host-built explicit
    plans: identical ELL plans, identical GCN norms/inv-deg per slot, and
    bit-equal aggregation/pooling results."""
    be = _sfa_batch(explicit=True)
    bc = _sfa_batch()
    assert be.sfa_dst is not None and bc.sfa_row_start_dst is not None
    assert bc.sfa_eb > 0 and bc.sfa_pool_eb > 0
    # ELL plans are bit-identical (same stable orders)
    ed_c, es_c = jax.jit(plan_expand.ell_plans)(bc)
    for got, want in ((ed_c, be.ell_dst), (es_c, be.ell_src)):
        np.testing.assert_array_equal(np.asarray(got["other_g"]),
                                      np.asarray(want["other_g"]))
        np.testing.assert_array_equal(np.asarray(got["mask"]),
                                      np.asarray(want["mask"]))
    # expanded scatter plans cover the same (major, other) edge multiset
    pd_c, ps_c = jax.jit(plan_expand.sfa_plans)(bc)
    nb = bc.sfa_nb
    em = np.asarray(bc.edge_mask)
    for plan, major, other in ((pd_c, bc.edge_dst, bc.edge_src),
                               (ps_c, bc.edge_src, bc.edge_dst)):
        mask = np.asarray(plan["mask"]) > 0
        assert int(mask.sum()) == int(em.sum())
        L = mask.shape[0]
        eb = L // (bc.node_graph.shape[0] // nb)
        blk = np.arange(L) // eb
        major_g = (blk * nb + np.asarray(plan["loc"]))[mask]
        got = sorted(zip(major_g.tolist(),
                         np.asarray(plan["other_g"])[mask].tolist()))
        want = sorted(zip(np.asarray(major)[em].tolist(),
                          np.asarray(other)[em].tolist()))
        assert got == want
    # GCN normalization: derived == host-precomputed (per valid slot)
    (nd, ns), inv = jax.jit(plan_expand.sfa_gcn)(bc)
    np.testing.assert_allclose(np.asarray(inv[:, 0]),
                               np.asarray(be.sfa_inv_deg), rtol=1e-6)
    np.testing.assert_allclose(
        np.sort(np.asarray(nd)[np.asarray(pd_c["mask"]) > 0]),
        np.sort(np.asarray(be.sfa_gcn_norm_dst)[
            np.asarray(be.sfa_dst["mask"]) > 0]), rtol=1e-6)
    # the full once-per-step expansion (the trainers' route) produces the
    # same plans and slot attrs as the helpers
    bx = plan_expand.expand_batch(bc)
    np.testing.assert_array_equal(np.asarray(bx.sfa_dst["other_g"]),
                                  np.asarray(pd_c["other_g"]))
    np.testing.assert_array_equal(np.asarray(bx.ell_dst["other_g"]),
                                  np.asarray(be.ell_dst["other_g"]))
    assert bx.edge_attr_sfa is not None and bx.sfa_pool is not None
    # pooling plan: identical per-graph sums
    from graphtrans_tpu.ops.scatter_free import graph_sum_sfa

    rs = np.random.default_rng(0)
    h = jnp.asarray(rs.standard_normal(
        (bc.node_feat.shape[0], 32)).astype(np.float32))
    pp = jax.jit(plan_expand.pool_plan)(bc)
    ge = graph_sum_sfa(h, be.node_graph, be.node_mask, be.sfa_pool,
                       be.num_graph_slots)
    gc = graph_sum_sfa(h, bc.node_graph, bc.node_mask, pp,
                       bc.num_graph_slots)
    np.testing.assert_array_equal(np.asarray(ge), np.asarray(gc))


def test_scatter_plan_pair_covers_all_edges():
    batch = _sfa_batch(explicit=True)
    assert batch.sfa_dst is not None
    em = np.asarray(batch.edge_mask)
    nb = batch.sfa_nb
    nblk = batch.node_graph.shape[0] // nb
    for major_name, plan, major, other in (
        ("dst", batch.sfa_dst, batch.edge_dst, batch.edge_src),
        ("src", batch.sfa_src, batch.edge_src, batch.edge_dst),
    ):
        mask = np.asarray(plan["mask"]) > 0
        assert int(mask.sum()) == int(em.sum())
        L = mask.shape[0]
        eb = L // nblk
        blk = np.arange(L) // eb
        major_g = (blk * nb + np.asarray(plan["loc"]))[mask]
        other_g = np.asarray(plan["other_g"])[mask]
        want = sorted(zip(np.asarray(major)[em].tolist(),
                          np.asarray(other)[em].tolist()))
        got = sorted(zip(major_g.tolist(), other_g.tolist()))
        assert got == want, major_name
    # host-precomputed GCN norms match the in-jit formula per slot order
    em_idx = np.nonzero(em)[0]
    deg = np.bincount(np.asarray(batch.edge_src)[em],
                      minlength=batch.node_graph.shape[0]) + 1.0
    dis = deg ** -0.5
    norm = dis[np.asarray(batch.edge_src)] * dis[np.asarray(batch.edge_dst)]
    for plan, norms in ((batch.sfa_dst, batch.sfa_gcn_norm_dst),
                        (batch.sfa_src, batch.sfa_gcn_norm_src)):
        mask = np.asarray(plan["mask"]) > 0
        got = np.sort(np.asarray(norms)[mask])
        want = np.sort(norm[em_idx])
        np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("conv_kind", ["gin", "gcn"])
@pytest.mark.parametrize("route", ["ell", "onehot"])
@pytest.mark.parametrize("fmt", ["compressed", "explicit"])
def test_scatter_free_conv_matches_segment_path(rng, conv_kind, route, fmt,
                                                monkeypatch):
    # the ELL arm's batch fields are opt-in (measured loss in production —
    # see nn/conv._ELL_GMS) but their parity stays pinned here
    monkeypatch.setattr(bp, "_ELL_EDGE_FIELDS", route == "ell")
    batch = _sfa_batch(explicit=(fmt == "explicit"))
    d = 128
    enc = LinearEdgeEncoder(d)
    conv = (GINConv(emb_dim=d, edge_encoder=enc) if conv_kind == "gin"
            else GCNConv(emb_dim=d, edge_encoder=enc))
    h = rng.standard_normal((batch.node_feat.shape[0], d)).astype(np.float32)
    h[~np.asarray(batch.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(0), batch, h, False)
    if route == "ell":
        assert plan_expand.has_ell(batch)
        if fmt == "explicit":
            assert batch.edge_attr_ell is not None
    # pin the scatter-free inner route (ELL columns vs one-hot dot) so BOTH
    # arms keep parity coverage regardless of the auto heuristic
    monkeypatch.setattr(conv_mod, "_ELL_GMS",
                        "on" if route == "ell" else "off")

    def loss(variables, h, sfa):
        monkeypatch.setattr(conv_mod, "_SFA_FORCE", sfa)
        conv_mod.set_scatter_free("on" if sfa else "off")
        try:
            out = conv.apply(variables, batch, h, False)
            return jnp.sum(out ** 2)
        finally:
            conv_mod.set_scatter_free("auto")

    l_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, False)
    l_f, g_f = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, True)
    np.testing.assert_allclose(float(l_f), float(l_s), rtol=1e-5)
    flat_s, tree_s = jax.tree_util.tree_flatten(g_s)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
    assert tree_s == tree_f
    for a, b in zip(flat_s, flat_f):
        # outlier budget: both arms recompute relu'(pre) independently —
        # pre values within f32 noise of 0 flip between arms (see
        # test_pallas.test_block_spmm_conv_matches_segment_path)
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a) / (np.abs(a) + 2e-4)
        assert float((rel > 1e-3).mean()) <= 0.02, float(rel.max())
        assert float(np.median(rel)) < 1e-5


def test_dataset_caps_are_statistical_not_worst_case():
    """Regression for the round-4 2x-padding bug: caps must track the mean
    batch sum (+ noise headroom), not bs * p95 — worst-case sizing doubled
    every [N,*] tensor in the step (measured 259 vs 117 ms/step). Also pins
    the benign-overflow contract: the packer closes batches early at the
    cap, so a full epoch still covers every graph."""
    from graphtrans_tpu.data.loader import GraphLoader, dataset_caps

    rs = np.random.default_rng(0)
    graphs = []
    for _ in range(2048):
        n = int(rs.integers(50, 250))
        src = rs.integers(0, n, 3 * n)
        dst = rs.integers(0, n, 3 * n)
        graphs.append({"x": rs.standard_normal((n, 4)).astype(np.float32),
                       "edge_index": np.stack([src, dst]).astype(np.int64),
                       "y": np.asarray([0])})
    bs = 512
    ncap, ecap = dataset_caps(graphs, bs)
    mean_nodes = np.mean([g["x"].shape[0] for g in graphs])
    assert ncap <= 1.3 * bs * mean_nodes  # was ~2x before the fix
    # every graph still trains: an epoch's plans cover the dataset exactly
    ld = GraphLoader(graphs, batch_size=bs, shuffle=True, seed=3,
                     num_tasks=2, y_dtype="int32", use_native=False)
    seen = sum(int(np.asarray(b.graph_mask).sum()) for b in ld)
    assert seen == len(graphs)


def test_sfa_split_retry_on_budget_overflow(monkeypatch):
    """A batch whose edge distribution overflows the sampled slot budgets
    is SPLIT and re-collated (single-consumer loaders), so every emitted
    batch keeps the one compiled shape and every graph still trains."""
    from graphtrans_tpu.data.loader import GraphLoader

    raw = make_code_dataset(num_graphs=32, min_nodes=20, max_nodes=80,
                            seed=3)
    graphs = [augment_edge(g) for g in raw]
    ld = GraphLoader(graphs, batch_size=16, num_tasks=4, y_dtype="float32",
                     scatter_free=True, use_native=False)
    # force a tiny eb so real batches overflow and must split
    caps = ld._sample_sfa_caps()
    caps["eb"] = 64
    ld._sfa_caps = caps
    batches = list(ld)
    assert len(batches) >= 2  # splits happened
    total = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert total == len(graphs)
    for b in batches:
        # either the split made plans fit, or the give-up path emitted a
        # plan-less batch — but nothing was dropped and shapes are intact
        assert b.node_graph.shape[0] == batches[0].node_graph.shape[0]


def test_loader_attaches_sfa_plans():
    """GraphLoader(scatter_free=True) ships slot plans on every flat batch;
    sharded/hybrid/dense loaders gate them off."""
    from graphtrans_tpu.data.loader import GraphLoader

    raw = make_code_dataset(num_graphs=24, min_nodes=20, max_nodes=80, seed=3)
    graphs = [augment_edge(g) for g in raw]
    ld = GraphLoader(graphs, batch_size=8, num_tasks=4, y_dtype="float32",
                     scatter_free=True)
    batches = list(ld)
    assert batches and all(b.sfa_row_start_dst is not None for b in batches)
    for b in batches:
        # row_start[-1] = valid edge count (compressed CSR invariant)
        assert int(np.asarray(b.sfa_row_start_dst)[-1]) == int(
            np.asarray(b.edge_mask).sum())
        assert b.sfa_nb > 0 and b.node_graph.shape[0] % b.sfa_nb == 0
        assert b.sfa_eb > 0
    # shard stacking: pinned dataset-wide caps make every shard's plans
    # identically shaped, so they stack tree-wise
    ld2 = GraphLoader(graphs, batch_size=8, num_tasks=4, y_dtype="float32",
                      scatter_free=True, num_shards=2)
    assert ld2.scatter_free
    stacked = list(ld2)
    assert stacked
    for b in stacked:
        assert b.sfa_row_start_dst is not None
        assert b.sfa_row_start_dst.shape[0] == 2  # leading shard axis
        assert b.sfa_nb > 0
    # hybrid partitioning still gates plans off
    ld3 = GraphLoader(graphs, batch_size=8, num_tasks=4, y_dtype="float32",
                      scatter_free=True, hybrid_shards=2)
    assert not ld3.scatter_free


def test_graph_sum_sfa_matches_segment(rng, monkeypatch):
    """Scatter-free per-graph sum: forward equals the masked segment sum,
    backward equals the broadcast gather — through the GIN-virtual stack."""
    import jax

    from graphtrans_tpu.ops.scatter_free import graph_sum_sfa
    from graphtrans_tpu.ops.segment import segment_sum

    batch = _sfa_batch()
    assert plan_expand.has_pool(batch)
    sfa_pool = jax.jit(plan_expand.pool_plan)(batch)
    d = 64
    h = jnp.asarray(
        rng.standard_normal((batch.node_feat.shape[0], d)).astype(np.float32))
    h = jnp.where(jnp.asarray(batch.node_mask)[:, None], h, 0)
    G = batch.num_graph_slots

    ref = segment_sum(h, batch.node_graph, G, mask=batch.node_mask)
    got = graph_sum_sfa(h, batch.node_graph, batch.node_mask,
                        sfa_pool, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda t: jnp.sum(
        segment_sum(t, batch.node_graph, G, mask=batch.node_mask) ** 2))(h)
    g_got = jax.grad(lambda t: jnp.sum(graph_sum_sfa(
        t, batch.node_graph, batch.node_mask, sfa_pool, G) ** 2))(h)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pna_ell_matches_segment_path(rng, monkeypatch):
    """PNA tower aggregation via the linear-message decomposition (node
    projections + scatter-free sums + ELL min/max) equals the segment
    path — outputs and grads (x, tower params)."""
    from graphtrans_tpu.nn.pna import PNAConv

    batch = _sfa_batch()
    assert plan_expand.has_ell(batch)
    F = 64
    conv = PNAConv(emb_dim=F, towers=4, avg_deg_log=1.3, avg_deg_lin=3.0)
    h = rng.standard_normal((batch.node_feat.shape[0], F)).astype(np.float32)
    h[~np.asarray(batch.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(0), batch, h, False)

    def loss(variables, h, ell):
        monkeypatch.setattr(conv_mod, "_SFA_FORCE", ell)
        conv_mod.set_scatter_free("on" if ell else "off")
        try:
            out = conv.apply(variables, batch, h, False)
            return jnp.sum(out ** 2)
        finally:
            conv_mod.set_scatter_free("auto")

    l_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, False)
    l_e, g_e = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, True)
    np.testing.assert_allclose(float(l_e), float(l_s), rtol=1e-4)
    flat_s, tree_s = jax.tree_util.tree_flatten(g_s)
    flat_e, tree_e = jax.tree_util.tree_flatten(g_e)
    assert tree_s == tree_e
    for a, b in zip(flat_s, flat_e):
        # decomposition reassociates sums (var(a+b)=var(b), a+max(b)) and
        # min/max tie-splitting differs from segment vjps only AT ties —
        # outlier budget as in the conv tests
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a) / (np.abs(a) + 1e-3)
        assert float((rel > 5e-3).mean()) <= 0.02, float(rel.max())
        assert float(np.median(rel)) < 1e-4


def test_pna_ell_var_and_sum_aggregators(rng, monkeypatch):
    """Regression: the ELL route must cover the full reference aggregator
    set — 'var' used to raise a trace-time KeyError there (ADVICE r2)."""
    from graphtrans_tpu.nn.pna import PNAConv

    batch = _sfa_batch()
    assert plan_expand.has_ell(batch)
    F = 64
    conv = PNAConv(emb_dim=F, towers=4, avg_deg_log=1.3, avg_deg_lin=3.0,
                   aggregators=("mean", "var", "sum"))
    h = rng.standard_normal((batch.node_feat.shape[0], F)).astype(np.float32)
    h[~np.asarray(batch.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(0), batch, h, False)

    outs = {}
    for ell in (False, True):
        monkeypatch.setattr(conv_mod, "_SFA_FORCE", ell)
        conv_mod.set_scatter_free("on" if ell else "off")
        try:
            outs[ell] = np.asarray(conv.apply(variables, batch, h, False))
        finally:
            conv_mod.set_scatter_free("auto")
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-3, atol=2e-4)


def test_scatter_free_large_graphs_and_hub_fallback(rng, monkeypatch):
    """Real-code2 regime insurance: graphs past max_input_len (message
    passing sees all nodes; only the dense packing truncates) still train
    through the forced scatter-free route, and a hub node whose degree
    exceeds ELL_K_CAP disables the ELL plans (batch structure stays stable)
    while the scatter plans keep working."""
    import jax

    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import LinearEdgeEncoder, LinearNodeEncoder
    from graphtrans_tpu.ops import block_plan as bp

    rs = np.random.default_rng(9)
    graphs = []
    for i in range(6):
        n = int(rs.integers(400, 1500))
        src = rs.integers(0, n, 3 * n)
        dst = rs.integers(0, n, 3 * n)
        if i == 0:
            # hub: one node receives > ELL_K_CAP edges
            dst[: bp.ELL_K_CAP + 40] = 7
        g = {
            "x": rs.standard_normal((n, 4)).astype(np.float32),
            "edge_index": np.stack([src, dst]).astype(np.int64),
            "edge_attr": rs.standard_normal((3 * n, 2)).astype(np.float32),
            "y": np.asarray([i % 2]),
        }
        graphs.append(g)

    loader = GraphLoader(graphs, batch_size=6, shuffle=False, seed=0,
                         num_tasks=2, y_dtype="int32", max_input_len=512,
                         scatter_free=True, use_native=False)
    batch = next(iter(loader))
    assert batch.sfa_row_start_dst is not None
    assert batch.ell_k_in == 0  # hub exceeded ELL_K_CAP -> ELL disabled
    assert not plan_expand.has_ell(batch)
    # truncation happened in the dense packing only
    assert batch.max_nodes_dense <= 512
    assert int(np.asarray(batch.node_mask).sum()) == sum(
        g["x"].shape[0] for g in graphs)

    from tests.test_train import default_args  # reuse arg defaults

    args = default_args(model_type="gnn-transformer", gnn_type="gcn",
                        scheduler=None, weight_decay=0.0, grad_clip=None)
    model = MODELS["gnn-transformer"].build(
        2, args, LinearNodeEncoder(args.gnn_emb_dim),
        lambda e: LinearEdgeEncoder(e))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False)

    monkeypatch.setattr(conv_mod, "_SFA_FORCE", True)
    conv_mod.set_scatter_free("on")
    try:
        out = model.apply(variables, batch, None, False)
        assert np.isfinite(np.asarray(out)).all()
    finally:
        conv_mod.set_scatter_free("auto")


@pytest.mark.parametrize("use_sfa_bwd", [True, False])
def test_ell_multi_backward_slot_vs_column(use_sfa_bwd):
    """ADVICE r04: the ELL-column fallback backward (sfa_src=None) is the
    no-sfa fallback arm — pin it against the production slot-order backward
    so it cannot silently rot. Both must match the autodiff of a dense
    reference reduction."""
    import jax
    import jax.numpy as jnp

    from graphtrans_tpu.ops import plan_expand
    from graphtrans_tpu.ops.ell import ell_multi

    batch = _sfa_batch(num_graphs=6, min_nodes=10, max_nodes=60, seed=11)
    assert plan_expand.has_ell(batch)
    ell_d, ell_s = jax.jit(plan_expand.ell_plans)(batch)
    _, sfa_s = jax.jit(plan_expand.sfa_plans)(batch)
    N = batch.num_node_slots
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

    def loss(v):
        s1, s2, mx, mn = ell_multi(
            v, ell_d, ell_s, sfa_s if use_sfa_bwd else None,
            batch.ell_k_in, batch.ell_k_out, True, True,
            batch.sfa_nb if use_sfa_bwd else 0)
        return (jnp.sum(s1 * s1) + jnp.sum(s2) + jnp.sum(mx ** 2)
                + jnp.sum(jnp.abs(mn)))

    g = jax.grad(loss)(vals)

    # dense autodiff reference over the adjacency implied by the edge lists
    src = np.asarray(batch.edge_src)[np.asarray(batch.edge_mask)]
    dst = np.asarray(batch.edge_dst)[np.asarray(batch.edge_mask)]
    A = np.zeros((N, N), np.float32)
    for s, d in zip(src, dst):
        A[d, s] += 1.0  # multigraph edges accumulate, like the ELL slots
    A_t = jnp.asarray(A)
    big = 1e30

    def ref_loss(v):
        s1 = A_t @ v
        s2 = A_t @ (v * v)
        has = (A_t.sum(1) > 0)[:, None]
        vx = jnp.where((A_t > 0)[:, :, None], v[None], -big)
        mx = jnp.where(has, vx.max(1), 0.0)
        vn = jnp.where((A_t > 0)[:, :, None], v[None], big)
        mn = jnp.where(has, vn.min(1), 0.0)
        return (jnp.sum(s1 * s1) + jnp.sum(s2) + jnp.sum(mx ** 2)
                + jnp.sum(jnp.abs(mn)))

    g_ref = jax.grad(ref_loss)(vals)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_ell_multi_sfa_nb_mismatch_raises():
    """ADVICE r04: a (plan, nb) mismatch must fail loudly, not corrupt
    gradients."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from graphtrans_tpu.ops import plan_expand
    from graphtrans_tpu.ops.ell import ell_multi

    batch = _sfa_batch(num_graphs=6, min_nodes=10, max_nodes=60, seed=11)
    ell_d, ell_s = jax.jit(plan_expand.ell_plans)(batch)
    _, sfa_s = jax.jit(plan_expand.sfa_plans)(batch)
    vals = jnp.ones((batch.num_node_slots, 8), jnp.float32)

    def loss(v, nb):
        s1, *_ = ell_multi(v, ell_d, ell_s, sfa_s, batch.ell_k_in,
                           batch.ell_k_out, True, True, nb)
        return jnp.sum(s1)

    with _pytest.raises(ValueError, match="nb"):
        jax.grad(loss)(vals, 0)
    with _pytest.raises(ValueError, match="nb"):
        jax.grad(loss)(vals, batch.sfa_nb + 1)
