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
