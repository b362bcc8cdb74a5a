"""Flash-attention Pallas kernel parity (interpret mode on CPU).

The kernel must match the dense masked-softmax reference exactly for
forward AND all three input gradients, including key-padding masks and
fully-masked rows, and compose inside MultiheadSelfAttention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphtrans_tpu.nn.transformer import MultiheadSelfAttention, masked_softmax
from graphtrans_tpu.ops.pallas.flash_attention import flash_attention


def _ref(q, k, v, valid):
    hd = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(hd)
    a = masked_softmax(s, valid[:, None, :])
    return jnp.einsum("bqk,bkd->bqd", a, v)


def test_flash_matches_dense_fwd_bwd(rng):
    BH, S, hd = 4, 300, 32
    q = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    valid = np.ones((BH, S), bool)
    valid[0, 250:] = False
    valid[2, :] = False  # fully-masked sequence must produce zeros, not NaN
    validj = jnp.asarray(valid)

    o_ref = _ref(q, k, v, validj)
    o_fa = flash_attention(q, k, v, validj, 0, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(o_fa), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(o_fa)[2]).max() == 0.0

    gr = jax.grad(lambda *a: jnp.sum(_ref(*a, validj) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(flash_attention(*a, validj, 0, 0.0, False, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_flash_backend_in_module(rng, monkeypatch):
    """MultiheadSelfAttention with the flash backend (interpret-mode
    kernels) equals the dense path, eval mode."""
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.ops.pallas import flash_attention as FA

    # route the module's flash calls through interpret mode on CPU
    orig = FA.flash_attention
    monkeypatch.setattr(
        T, "_ATTN_BACKEND", "flash")
    import functools

    def interp_flash(q, k, v, kvm, seed, rate=0.0, training=False,
                     interpret=False):
        return orig(q, k, v, kvm, seed, rate, training, True)

    monkeypatch.setattr(FA, "flash_attention", interp_flash)

    B, S, d, H = 2, 260, 32, 4
    x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[1, 200:] = False
    validj = jnp.asarray(valid)

    attn = MultiheadSelfAttention(d_model=d, nhead=H, dropout=0.0,
                                  chunk_threshold=128)
    variables = attn.init({"params": jax.random.key(0)}, x, validj, False)
    out_flash = attn.apply(variables, x, validj, False)

    monkeypatch.setattr(T, "_ATTN_BACKEND", "dense")
    out_dense = attn.apply(variables, x, validj, False)
    np.testing.assert_allclose(np.asarray(out_flash)[valid],
                               np.asarray(out_dense)[valid],
                               rtol=2e-4, atol=2e-5)


def test_smalls_matches_dense_fwd_bwd(rng):
    """Fused small-S attention kernel: exact vs the dense reference, with
    padding masks, fully-masked rows, and a BH count that is not a tile
    multiple."""
    from graphtrans_tpu.ops.pallas.attention_smallS import attention_smallS

    BH, S, hd = 100, 33, 32
    q = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    valid = np.ones((BH, S), bool)
    valid[0, 20:] = False
    valid[5, :] = False
    vj = jnp.asarray(valid)

    o_ref = _ref(q, k, v, vj)
    o = attention_smallS(q, k, v, vj, 0, 0.0, False, True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(o)[5]).max() == 0.0
    gr = jax.grad(lambda *a: jnp.sum(_ref(*a, vj) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(attention_smallS(*a, vj, 0, 0.0, False, True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_smalls_block_diagonal_matches_per_graph(rng):
    """Graph-packed block-diagonal mode (block>0): packing GB graphs into
    one row and attending block-diagonally must equal per-graph dense
    attention on the unpacked layout — forward and all input grads."""
    from graphtrans_tpu.ops.pallas.attention_smallS import attention_smallS

    BH, GB, S, hd = 10, 3, 11, 16
    Sp = GB * S
    q = jnp.asarray(rng.standard_normal((BH, Sp, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, Sp, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, Sp, hd)).astype(np.float32))
    valid = np.ones((BH, Sp), bool)
    valid[0, 5:S] = False        # padded tail inside one graph's block
    valid[3, S:2 * S] = False    # a fully-masked graph inside a packed row
    vj = jnp.asarray(valid)

    def unpacked_ref(q, k, v):
        qs, ks, vs = (t.reshape(BH * GB, S, hd) for t in (q, k, v))
        return _ref(qs, ks, vs, vj.reshape(BH * GB, S)).reshape(BH, Sp, hd)

    o_ref = unpacked_ref(q, k, v)
    o = attention_smallS(q, k, v, vj, 0, 0.0, False, True, S)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(o)[3, S:2 * S]).max() == 0.0

    gr = jax.grad(lambda *a: jnp.sum(unpacked_ref(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(
            attention_smallS(*a, vj, 0, 0.0, False, True, S) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_packed_encoder_matches_dense(rng, monkeypatch):
    """TransformerNodeEncoder with the 'packed' backend (graph-packed rows,
    block-diagonal attention, B not a multiple of GB, CLS on) must equal the
    plain dense path in eval mode."""
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.nn.transformer import TransformerNodeEncoder

    B, S, d = 7, 31, 32            # S+1 with CLS -> 32, GB = 4, pad_b = 1
    x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[1, 20:] = False
    valid[4, :] = False            # an all-padding graph slot
    validj = jnp.asarray(valid)

    enc = TransformerNodeEncoder(d_model=d, nhead=4, dim_feedforward=64,
                                 dropout=0.0, num_layers=2, use_cls=True)
    variables = enc.init({"params": jax.random.key(0)}, x, validj, False)

    monkeypatch.setattr(T, "_ATTN_BACKEND", "packed")
    out_packed, valid_packed = enc.apply(variables, x, validj, False)
    monkeypatch.setattr(T, "_ATTN_BACKEND", "dense")
    out_dense, valid_dense = enc.apply(variables, x, validj, False)

    assert out_packed.shape == out_dense.shape == (B, S + 1, d)
    np.testing.assert_array_equal(np.asarray(valid_packed),
                                  np.asarray(valid_dense))
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)


def _ref_heads_in_lanes(q, k, v, valid, nhead, block):
    """Dense reference for the heads-in-lanes fused kernel: split heads,
    dense block-diagonal masked attention, re-concat lanes."""
    B, S, d = q.shape
    hd = d // nhead

    def split(t):
        return t.reshape(B, S, nhead, hd).transpose(0, 2, 1, 3)

    qs, ks, vs = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qs, ks) / np.sqrt(hd)
    mask = valid[:, None, None, :]
    if block:
        grp = jnp.arange(S) // block
        mask = mask & (grp[:, None] == grp[None, :])[None, None]
    a = masked_softmax(s, mask)
    y = jnp.einsum("bhqk,bhkd->bhqd", a, vs)
    return y.transpose(0, 2, 1, 3).reshape(B, S, d)


def test_packed_fused_matches_dense_fwd_bwd(rng):
    """Heads-in-lanes fused kernel (attention_packed): exact vs the dense
    reference at the flagship packed shape (S=3x33, d=128, block-diagonal),
    with a partially-padded block, a fully-masked graph block, a fully-
    masked row, and B not a tile multiple."""
    from graphtrans_tpu.ops.pallas.attention_packed import attention_packed

    B, S, d, H, block = 11, 99, 128, 4, 33
    q = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[0, 20:33] = False        # padded tail inside one graph's block
    valid[3, 33:66] = False        # a fully-masked graph inside a packed row
    valid[7, :] = False            # fully-masked packed row
    vj = jnp.asarray(valid)

    o_ref = _ref_heads_in_lanes(q, k, v, vj, H, block)
    o = attention_packed(q, k, v, vj, 0, H, 0.0, False, True, block)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(o)[3, 33:66]).max() == 0.0
    assert np.abs(np.asarray(o)[7]).max() == 0.0

    gr = jax.grad(
        lambda *a: jnp.sum(_ref_heads_in_lanes(*a, vj, H, block) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(
            attention_packed(*a, vj, 0, H, 0.0, False, True, block) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_packed_fused_dropout_semantics(rng):
    """Dropout in the fused packed kernel: deterministic per seed, keep
    rate ~ 1-rate, torch normalize-then-drop semantics (undropped rows
    unscaled... scaled by 1/(1-rate)), and the backward regenerates the
    SAME mask — checked by the exact directional derivative in v (the
    output is linear in v for a fixed mask)."""
    from graphtrans_tpu.ops.pallas.attention_packed import attention_packed

    B, S, d, H, block, rate = 8, 64, 128, 4, 32, 0.4
    q = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    vj = jnp.ones((B, S), bool)

    o1 = attention_packed(q, k, v, vj, 123, H, rate, True, True, block)
    o2 = attention_packed(q, k, v, vj, 123, H, rate, True, True, block)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = attention_packed(q, k, v, vj, 124, H, rate, True, True, block)
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0

    # expectation of dropped attention output is the undropped output
    os = [np.asarray(attention_packed(q, k, v, vj, s, H, rate, True, True,
                                      block))
          for s in range(40)]
    o_ref = np.asarray(_ref_heads_in_lanes(q, k, v, vj, H, block))
    # 40-sample Monte-Carlo: the mean absolute deviation of the MC mean
    # measured 0.026 for an unbiased estimator at this shape (max-over-65k-
    # elements is too heavy-tailed to bound tightly)
    err = np.abs(np.mean(os, axis=0) - o_ref).mean()
    assert err < 0.05, err

    # exact directional derivative in v: loss = <W, o> with fixed W
    W = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    delta = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))

    def loss(vv):
        return jnp.sum(W * attention_packed(q, k, vv, vj, 123, H, rate,
                                            True, True, block))

    dv = jax.grad(loss)(v)
    eps = 1.0
    lhs = loss(v + eps * delta) - loss(v)       # linear in v: exact
    rhs = eps * jnp.sum(dv * delta)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-3)


def test_packed_fused_encoder_matches_dense(rng, monkeypatch):
    """TransformerNodeEncoder routed through the fused packed kernel
    (interpret mode) equals the dense path in eval mode at d_model=128."""
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.nn.transformer import TransformerNodeEncoder

    B, S, d = 7, 31, 128           # S+1 with CLS -> 32, GB = 4
    x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[1, 20:] = False
    valid[4, :] = False
    validj = jnp.asarray(valid)

    enc = TransformerNodeEncoder(d_model=d, nhead=4, dim_feedforward=256,
                                 dropout=0.0, num_layers=2, use_cls=True)
    variables = enc.init({"params": jax.random.key(0)}, x, validj, False)

    monkeypatch.setattr(T, "_PFUSED_INTERPRET", True)
    monkeypatch.setattr(T, "_ATTN_BACKEND", "packed_fused")
    out_fused, _ = enc.apply(variables, x, validj, False)
    monkeypatch.setattr(T, "_ATTN_BACKEND", "dense")
    out_dense, _ = enc.apply(variables, x, validj, False)

    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_dense),
                               rtol=2e-5, atol=2e-5)


def test_packed_layer_matches_unfused(rng, monkeypatch):
    """The fully fused transformer-layer kernel (interpret mode) must equal
    the unfused composition with SHARED params — forward and grads wrt
    input AND every weight/bias/LN param — in eval mode at d_model=128."""
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.nn.transformer import TransformerNodeEncoder

    B, S, d = 11, 31, 128          # S+1 with CLS -> 32, GB = 4
    x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[1, 20:] = False
    valid[4, :] = False
    validj = jnp.asarray(valid)

    enc = TransformerNodeEncoder(d_model=d, nhead=4, dim_feedforward=512,
                                 dropout=0.0, num_layers=2, use_cls=True)
    monkeypatch.setattr(T, "_PFUSED_INTERPRET", True)
    monkeypatch.setattr(T, "_ATTN_BACKEND", "packed_layer")
    variables = enc.init({"params": jax.random.key(0)}, x, validj, False)
    # identical variable tree between the fused and unfused paths
    monkeypatch.setattr(T, "_ATTN_BACKEND", "packed")
    variables_unfused = enc.init({"params": jax.random.key(0)}, x, validj,
                                 False)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(variables_unfused)
    assert t1 == t2

    def run(backend, params, xx):
        monkeypatch.setattr(T, "_ATTN_BACKEND", backend)
        out, _ = enc.apply(params, xx, validj, False)
        return out

    out_fused = run("packed_layer", variables, x)
    out_ref = run("dense", variables, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=5e-5, atol=5e-5)

    def loss(backend):
        def f(params, xx):
            return jnp.sum(run(backend, params, xx) ** 2)
        return f

    (gp_f, gx_f) = jax.grad(loss("packed_layer"), argnums=(0, 1))(
        variables, x)
    (gp_r, gx_r) = jax.grad(loss("dense"), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gp_r),
                    jax.tree_util.tree_leaves(gp_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_packed_layer_dropout_determinism(rng, monkeypatch):
    """Fused layer dropout: same rngs -> identical output; training mode
    differs from eval; backward runs (mask regeneration path)."""
    from graphtrans_tpu.nn import transformer as T
    from graphtrans_tpu.nn.transformer import TransformerNodeEncoder

    B, S, d = 8, 31, 128
    x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    validj = jnp.ones((B, S), bool)
    enc = TransformerNodeEncoder(d_model=d, nhead=4, dim_feedforward=256,
                                 dropout=0.3, num_layers=1, use_cls=True)
    monkeypatch.setattr(T, "_PFUSED_INTERPRET", True)
    monkeypatch.setattr(T, "_ATTN_BACKEND", "packed_layer")
    variables = enc.init({"params": jax.random.key(0)}, x, validj, False)
    rngs = {"dropout": jax.random.key(7)}
    o1, _ = enc.apply(variables, x, validj, True, rngs=rngs)
    o2, _ = enc.apply(variables, x, validj, True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3, _ = enc.apply(variables, x, validj, False)
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0

    g = jax.grad(lambda p: jnp.sum(
        enc.apply(p, x, validj, True, rngs=rngs)[0] ** 2))(variables)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_packed_fused_medium_S(rng):
    """The generalized kernel at 128 < S <= 384 (code2-shaped, block=0):
    per-head key blocks pad S to the lane-tile multiple; outputs and grads
    match the dense reference."""
    from graphtrans_tpu.ops.pallas.attention_packed import attention_packed

    B, S, d, H = 5, 257, 128, 4
    q = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32))
    valid = np.ones((B, S), bool)
    valid[0, 130:] = False
    valid[2, :] = False
    vj = jnp.asarray(valid)

    o_ref = _ref_heads_in_lanes(q, k, v, vj, H, 0)
    o = attention_packed(q, k, v, vj, 0, H, 0.0, False, True, 0)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(o)[2]).max() == 0.0

    gr = jax.grad(
        lambda *a: jnp.sum(_ref_heads_in_lanes(*a, vj, H, 0) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(
        lambda *a: jnp.sum(
            attention_packed(*a, vj, 0, H, 0.0, False, True, 0) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)
