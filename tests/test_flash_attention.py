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
