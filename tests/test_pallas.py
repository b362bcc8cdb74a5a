"""Pallas kernel parity tests (interpreter mode on the CPU mesh; the same
kernels run compiled on TPU via --use_pallas)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphtrans_tpu.ops import scatter
from graphtrans_tpu.ops.pallas import spmm


def make_edges(rng, N, E, d):
    x = rng.standard_normal((N, d)).astype(np.float32)
    emb = rng.standard_normal((E, d)).astype(np.float32)
    src = rng.integers(0, N, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    mask = rng.random(E) > 0.2
    # emulate collation: padded edges live at the tail pointing at N-1
    dst[~mask] = N - 1
    order = np.argsort(dst, kind="stable")
    return (jnp.asarray(x), jnp.asarray(emb[order]), jnp.asarray(src[order]),
            jnp.asarray(dst[order]), jnp.asarray(mask[order]))


@pytest.mark.parametrize("message", ["relu_add", "add"])
@pytest.mark.parametrize("weighted", [False, True])
def test_spmm_kernel_matches_xla(rng, message, weighted):
    N, E, d = 512, 1024, 128
    x, emb, src, dst, mask = make_edges(rng, N, E, d)
    ew = jnp.asarray(rng.standard_normal(E).astype(np.float32)) if weighted else None
    ref = scatter.gather_message_scatter(x, emb, src, dst, mask, N,
                                         message=message, edge_weight=ew)
    got = spmm.gather_message_scatter(x, emb, src, dst, mask, N,
                                      message=message, edge_weight=ew,
                                      interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_spmm_kernel_fallback_on_bad_shapes(rng):
    # misaligned d -> kernel declines, caller falls back
    x, emb, src, dst, mask = make_edges(rng, 512, 1024, 100)
    assert spmm.gather_message_scatter(x, emb, src, dst, mask, 512,
                                       interpret=True) is None


def test_spmm_empty_blocks(rng):
    """Node blocks with zero incident edges must produce zero rows."""
    N, E, d = 512, 256, 128
    x = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    emb = jnp.zeros((E, d), jnp.float32)
    # all edges into node 3 (block 0); blocks 1 have no edges
    src = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    dst = jnp.full((E,), 3, jnp.int32)
    mask = jnp.ones((E,), bool)
    got = spmm.gather_message_scatter(x, emb, src, dst, mask, N, interpret=True)
    ref = scatter.gather_message_scatter(x, emb, src, dst, mask, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(got)[256:] == 0)


def test_scatter_mxu_kernel_matches_xla(rng):
    from graphtrans_tpu.ops import segment
    from graphtrans_tpu.ops.pallas import scatter_mxu

    N, E, d = 512, 1024, 128
    msg = jnp.asarray(rng.standard_normal((E, d)).astype(np.float32))
    dst = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    got = scatter_mxu.segment_sum_mxu(msg, dst, N, interpret=True)
    assert got is not None
    ref = segment.segment_sum(msg, dst, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_dense_agg_matches_xla_dense(rng):
    """ops/pallas/dense_agg (interpret mode): bit-identical to the XLA
    one-hot formulation for fwd and all grads, with and without relu /
    per-edge weights."""
    import jax
    import jax.numpy as jnp
    from jax.lax import Precision

    from graphtrans_tpu.ops.pallas.dense_agg import GT, fused_dense_agg

    G, Sm, Em, d = GT * 2, 24, 40, 128
    xd = jnp.asarray(rng.standard_normal((G, Sm, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    emask = jnp.asarray(rng.random((G, Em)) > 0.2)
    emb = jnp.asarray(rng.standard_normal((G, Em, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((G, Em)).astype(np.float32))

    def ref(xd, emb, wa, relu):
        iota = jnp.arange(Sm)
        oh_s = ((src[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        oh_d = ((dst[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        xs = jax.lax.dot_general(oh_s, xd, (((2,), (1,)), ((0,), (0,))),
                                 precision=Precision.HIGHEST)
        m = jnp.maximum(xs + emb, 0) if relu else xs + emb
        if wa is not None:
            m = m * wa[..., None]
        m = jnp.where(emask[..., None], m, 0)
        return jax.lax.dot_general(oh_d, m, (((1,), (1,)), ((0,), (0,))),
                                   precision=Precision.HIGHEST)

    for relu in (True, False):
        for wa in (None, w):
            o_ref = ref(xd, emb, wa, relu)
            o = fused_dense_agg(xd, src, dst, emask, emb, wa, relu, True)
            np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                       rtol=1e-6, atol=1e-6)
            argn = (0, 1) + ((2,) if wa is not None else ())
            a = (xd, emb) + ((w,) if wa is not None else ())
            gr = jax.grad(lambda x, e, *rest: jnp.sum(
                ref(x, e, rest[0] if rest else None, relu) ** 2),
                argnums=argn)(*a)
            gf = jax.grad(lambda x, e, *rest: jnp.sum(fused_dense_agg(
                x, src, dst, emask, e, rest[0] if rest else None, relu,
                True) ** 2), argnums=argn)(*a)
            for ga, gb in zip(gr, gf):
                np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                           rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("weighted", [False, True])
def test_fused_gin_agg_matches_xla_dense(rng, weighted, monkeypatch):
    """Fused-tables aggregation kernel (ops/pallas/gin_agg.py): the
    in-kernel bond-embedding lookup + aggregation must equal
    BondEncoder(edge_attr) + the XLA one-hot-matmul path — forward AND
    grads (x, encoder tables, edge weights) — via the real _aggregate
    routing with its interpret hook."""
    import jax
    from flax import linen as nn

    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.data.synthetic import make_mol_dataset
    from graphtrans_tpu.nn.conv import _aggregate
    from graphtrans_tpu.nn.encoders import BondEncoder
    from graphtrans_tpu.ops import dense_mp

    graphs = make_mol_dataset(num_graphs=6, num_tasks=4, min_nodes=5,
                              max_nodes=30, seed=7)
    G, stride, em = 7, 40, 128
    dense = collate(graphs, G, G * stride, 1024, num_tasks=4,
                    y_dtype="float32", node_stride=stride, dense_edge_cap=em)
    d = 128

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, batch, h, w):
            enc = BondEncoder(d)
            return _aggregate(batch, h, enc, message="relu_add",
                              edge_weight=w)

    h = rng.standard_normal((dense.node_feat.shape[0], d)).astype(np.float32)
    h[~np.asarray(dense.node_mask)] = 0
    h = jnp.asarray(h)
    w = (jnp.asarray(rng.standard_normal(
        (dense.num_graph_slots, em)).astype(np.float32))
         if weighted else None)

    model = Wrap()
    params = model.init(jax.random.key(0), dense, h, w)

    def loss(params, h, w, fused):
        monkeypatch.setattr(dense_mp, "_FUSED_TABLES_INTERPRET", fused)
        dense_mp.set_fused_tables("on" if fused else "off")
        try:
            out = model.apply(params, dense, h, w)
            return jnp.sum(out ** 2), out
        finally:
            dense_mp.set_fused_tables("off")

    (l_x, out_x), g_x = jax.value_and_grad(loss, argnums=(0, 1) if w is None
                                           else (0, 1, 2), has_aux=True)(
        params, h, w, False)
    (l_f, out_f), g_f = jax.value_and_grad(loss, argnums=(0, 1) if w is None
                                           else (0, 1, 2), has_aux=True)(
        params, h, w, True)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves(g_x)
    flat_f = jax.tree_util.tree_leaves(g_f)
    assert len(flat_x) == len(flat_f)
    for a, b in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_fused_gin_agg_in_gin_conv(rng, monkeypatch):
    """GINConv end-to-end on the fused-tables route equals the stock dense
    route (same params), including through BN/MLP."""
    import jax

    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.data.synthetic import make_mol_dataset
    from graphtrans_tpu.nn.conv import GINConv
    from graphtrans_tpu.nn.encoders import BondEncoder
    from graphtrans_tpu.ops import dense_mp

    graphs = make_mol_dataset(num_graphs=5, num_tasks=4, min_nodes=4,
                              max_nodes=25, seed=11)
    G, stride, em = 6, 32, 96
    dense = collate(graphs, G, G * stride, 640, num_tasks=4,
                    y_dtype="float32", node_stride=stride, dense_edge_cap=em)
    d = 128
    conv = GINConv(emb_dim=d, edge_encoder=BondEncoder(d))
    h = rng.standard_normal((dense.node_feat.shape[0], d)).astype(np.float32)
    h[~np.asarray(dense.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(1), dense, h, False)

    out_x = conv.apply(variables, dense, h, False)
    monkeypatch.setattr(dense_mp, "_FUSED_TABLES_INTERPRET", True)
    dense_mp.set_fused_tables("on")
    try:
        out_f = conv.apply(variables, dense, h, False)
    finally:
        dense_mp.set_fused_tables("off")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_fused_dropout_semantics(rng):
    """Fused byte-dropout (interpret mode): output is x*scale-or-zero with
    the right keep fraction, deterministic in the seed, and the backward
    regenerates the exact forward mask."""
    import jax

    from graphtrans_tpu.ops.pallas.dropout import byte_dropout

    x = jnp.asarray(rng.standard_normal((300, 7, 128)).astype(np.float32))
    x = jnp.where(jnp.abs(x) < 1e-3, 1e-2, x)  # keep zeros unambiguous
    drop = int(round(0.3 * 256))
    scale = 1.0 / (1.0 - drop / 256.0)

    y = byte_dropout(x, 123, drop, interpret=True)
    y2 = byte_dropout(x, 123, drop, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    y3 = byte_dropout(x, 124, drop, interpret=True)
    assert not np.array_equal(np.asarray(y), np.asarray(y3))

    yn, xn = np.asarray(y), np.asarray(x)
    kept = yn != 0
    np.testing.assert_allclose(yn[kept], (xn * scale)[kept], rtol=1e-6)
    keep_frac = kept.mean()
    assert abs(keep_frac - (1 - drop / 256.0)) < 0.02, keep_frac

    # backward applies the same mask to the cotangent
    g = jax.grad(lambda t: jnp.sum(byte_dropout(t, 123, drop,
                                                interpret=True) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), np.where(kept, 2.0 * scale, 0.0),
                               rtol=1e-6)


def test_byte_dropout_module_pallas_route(rng, monkeypatch):
    """ByteDropout routes big lane-aligned tensors to the fused kernel; the
    kernel path keeps the module contract (scale-or-zero, keep rate)."""
    import jax

    from graphtrans_tpu.nn import dropout as dmod

    x = jnp.asarray(rng.standard_normal((2048, 256)).astype(np.float32))
    x = jnp.where(jnp.abs(x) < 1e-3, 1e-2, x)
    m = dmod.ByteDropout(rate=0.3)
    monkeypatch.setattr(dmod, "_PALLAS_INTERPRET", True)
    monkeypatch.setattr(dmod, "_PALLAS_MIN_SIZE", 1024)
    y = m.apply({}, x, False, rngs={"dropout": jax.random.key(5)})
    yn, xn = np.asarray(y), np.asarray(x)
    kept = yn != 0
    scale = 1.0 / (1.0 - round(0.3 * 256) / 256.0)
    np.testing.assert_allclose(yn[kept], (xn * scale)[kept], rtol=1e-6)
    assert abs(kept.mean() - (1 - round(0.3 * 256) / 256.0)) < 0.03
    # same key -> same mask (the kernel seed derives from the key data)
    y2 = m.apply({}, x, False, rngs={"dropout": jax.random.key(5)})
    np.testing.assert_array_equal(yn, np.asarray(y2))


def test_fused_gin_agg_eps_prologue_grads(rng, monkeypatch):
    """The fused GIN combine (scale*x + agg inside the kernel) matches the
    explicit (1+eps)*h + agg formulation — loss, and grads for params
    (incl. eps and the encoder tables) and h."""
    import jax

    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.data.synthetic import make_mol_dataset
    from graphtrans_tpu.nn.conv import GINConv
    from graphtrans_tpu.nn.encoders import BondEncoder
    from graphtrans_tpu.ops import dense_mp

    graphs = make_mol_dataset(num_graphs=6, num_tasks=4, min_nodes=5,
                              max_nodes=28, seed=3)
    G, stride, em = 7, 32, 96
    dense = collate(graphs, G, G * stride, 640, num_tasks=4,
                    y_dtype="float32", node_stride=stride, dense_edge_cap=em)
    d = 128
    conv = GINConv(emb_dim=d, edge_encoder=BondEncoder(d))
    h = rng.standard_normal((dense.node_feat.shape[0], d)).astype(np.float32)
    h[~np.asarray(dense.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(2), dense, h, False)
    # non-zero eps so its gradient path is exercised off the init point
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    params["eps"] = jnp.asarray([0.37], jnp.float32)
    variables = {**variables, "params": params}

    def loss(variables, h, fused):
        monkeypatch.setattr(dense_mp, "_FUSED_TABLES_INTERPRET", fused)
        dense_mp.set_fused_tables("on" if fused else "off")
        try:
            out = conv.apply(variables, dense, h, False)
            return jnp.sum(out ** 2)
        finally:
            dense_mp.set_fused_tables("off")

    l_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, False)
    l_f, g_f = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, True)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    flat_x, tree_x = jax.tree_util.tree_flatten(g_x)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
    assert tree_x == tree_f
    for a, b in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def _bsp_batch(rng, num_graphs=8, min_nodes=20, max_nodes=120, seed=5):
    """Flat-layout code2-like batch with block plans attached."""
    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.data.loader import dataset_caps
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import augment_edge
    from graphtrans_tpu.ops import block_plan as bp

    raw = make_code_dataset(num_graphs=num_graphs, min_nodes=min_nodes,
                            max_nodes=max_nodes, seed=seed)
    graphs = [augment_edge(g) for g in raw]
    ncap, ecap = dataset_caps(graphs, num_graphs)
    cap = bp.chunk_capacity(ecap, ncap)
    return collate(graphs, num_graphs + 1, ncap, ecap, num_tasks=4,
                   y_dtype="float32", bsp_chunks_cap=cap)


def test_block_plan_covers_all_edges(rng):
    """Every valid edge lands in exactly one plan slot; every node block
    gets a first-visit chunk; globals reconstruct from block*NB + loc."""
    from graphtrans_tpu.ops import block_plan as bp

    batch = _bsp_batch(rng)
    assert batch.bsp_fwd is not None
    for major, plan in (("dst", batch.bsp_fwd), ("src", batch.bsp_bwd)):
        mask = np.asarray(plan["mask"]) > 0
        assert int(mask.sum()) == int(np.asarray(batch.edge_mask).sum())
        bo = np.asarray(plan["blk_out"])
        assert (np.sort(bo) == bo).all()  # grouped ascending (revisit-safe)
        nb = batch.node_graph.shape[0] // bp.NB
        firsts = np.asarray(plan["is_first"]) > 0
        assert set(bo[firsts]) == set(range(nb))
        # endpoint reconstruction matches the flat edge arrays as a multiset
        out_g = (bo[:, None] * bp.NB + np.asarray(plan["loc_out"]))[mask]
        in_g = (np.asarray(plan["blk_in"])[:, None] * bp.NB
                + np.asarray(plan["loc_in"]))[mask]
        src_g, dst_g = (out_g, in_g) if major == "src" else (in_g, out_g)
        em = np.asarray(batch.edge_mask)
        want = sorted(zip(np.asarray(batch.edge_src)[em].tolist(),
                          np.asarray(batch.edge_dst)[em].tolist()))
        got = sorted(zip(src_g.tolist(), dst_g.tolist()))
        assert got == want


@pytest.mark.parametrize("conv_kind", ["gin", "gcn"])
def test_block_spmm_conv_matches_segment_path(rng, conv_kind, monkeypatch):
    """GIN/GCN conv on the blocked-CSR kernel (interpret mode) equals the
    flat segment path — outputs AND grads (params incl. edge encoder, h)."""
    import jax

    from graphtrans_tpu.nn.conv import GCNConv, GINConv
    from graphtrans_tpu.nn.encoders import LinearEdgeEncoder
    from graphtrans_tpu.ops import block_plan as bp

    batch = _bsp_batch(rng)
    d = 128
    enc = LinearEdgeEncoder(d)
    conv = (GINConv(emb_dim=d, edge_encoder=enc) if conv_kind == "gin"
            else GCNConv(emb_dim=d, edge_encoder=enc))
    h = rng.standard_normal((batch.node_feat.shape[0], d)).astype(np.float32)
    h[~np.asarray(batch.node_mask)] = 0
    h = jnp.asarray(h)
    variables = conv.init(jax.random.key(0), batch, h, False)

    def loss(variables, h, blocked):
        monkeypatch.setattr(bp, "_BLOCK_SPMM_INTERPRET", blocked)
        bp.set_block_spmm("on" if blocked else "off")
        try:
            out = conv.apply(variables, batch, h, False)
            return jnp.sum(out ** 2)
        finally:
            bp.set_block_spmm("auto")

    l_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, False)
    l_b, g_b = jax.value_and_grad(loss, argnums=(0, 1))(variables, h, True)
    np.testing.assert_allclose(float(l_b), float(l_s), rtol=1e-5)
    flat_s, tree_s = jax.tree_util.tree_flatten(g_s)
    flat_b, tree_b = jax.tree_util.tree_flatten(g_b)
    assert tree_s == tree_b
    for a, b in zip(flat_s, flat_b):
        # Grad comparison with a small outlier budget: relu'(pre) is
        # recomputed independently by each arm, and pre values that land
        # within f32 noise of 0 (a handful among ~1M edge-channel values)
        # get their mask FLIPPED between the arms — each flip moves a grad
        # element by a whole message contribution. Which elements flip
        # shifts with XLA:CPU's in-process fusion context, so this shows
        # only in full-suite runs. Everything off the boundary must match
        # tightly; flips are capped at 2%.
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(b - a) / (np.abs(a) + 2e-4)
        frac_off = float((rel > 1e-3).mean())
        assert frac_off <= 0.02, (frac_off, float(rel.max()))
        assert float(np.median(rel)) < 1e-5
