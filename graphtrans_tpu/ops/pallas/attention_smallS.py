"""Fused attention for SHORT padded sequences (graph batches, S <= 128).

The molpcba/TU-scale transformer stage runs attention at S ~ 30-50 over
thousands of graphs; XLA's dense path materializes the [G, H, S, S] scores,
softmax, dropout bits, and probabilities in HBM (profiled as a long tail of
~1 ms fusions and u32 random-bit slices). Here a tile of (batch, head)
pairs stays resident in VMEM and score -> masked softmax -> dropout -> AV
happens in one pass; the dropout mask is regenerated bit-identically in the
backward from per-tile TPU PRNG seeds, so nothing but q,k,v and the output
cotangent ever crosses HBM. Semantics identical to
nn/transformer.masked_softmax + torch attention dropout (normalize by the
undropped denominator, fully-masked rows produce zeros).

Layout [BH, S, hd], one grid step per HT-row tile; complement of
flash_attention.py (which streams long sequences in blocks).

MEASURED RESULT (TPU v5e, S=33, hd=32, BH=16k): SLOWER than XLA's dense
path (10.5 vs 7.1 ms fwd+bwd) — Mosaic pads the 32-lane head dim to 128,
quadrupling VMEM block traffic, and the [HT,S,S] intermediates force small
tiles. Kept as an opt-in backend (set_attn_backend('smalls')) and as the
starting point for a head-packed layout; the auto route uses XLA dense for
short sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HT = 16   # (batch, head) pairs per grid step (hd lanes pad to
          # 128 in VMEM, so blocks are 4x their logical bytes)
_NEG = -1e30


def _keep_mask(shape, rate, seed):
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(max(1.0 - rate, 0.0), 1.0) * 0xFFFFFFFF)
    return (bits < thresh).astype(jnp.float32)


def _probs(q, k, valid):
    """Masked softmax probabilities [HT, S, S] (f32)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) * scale
    s = jnp.where(valid[:, None, :], s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(valid[:, None, :], e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-16)
    return e / denom


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, *,
                rate: float, training: bool):
    from jax.experimental import pallas as pl

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    p = _probs(q, k, valid_ref[...])
    if training and rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed_ref[0] + pl.program_id(0))
        p = p * keep / (1.0 - rate)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, rate: float, training: bool):
    from jax.experimental import pallas as pl

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    valid = valid_ref[...]
    p = _probs(q, k, valid)                                   # [HT, S, S]
    if training and rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed_ref[0] + pl.program_id(0))
        p_drop = p * keep / (1.0 - rate)
    else:
        keep = None
        p_drop = p
    dv_ref[...] = jax.lax.dot_general(
        p_drop, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                   # [HT, S, S]
    if keep is not None:
        dp = dp * keep / (1.0 - rate)
    # softmax backward: ds = p * (dp - sum(p_undropped... NOTE: the
    # normalization denominator came from the UNDROPPED p, so the chain is
    # ds = p * (dp - sum(p * dp)) with the undropped p.
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    dq_ref[...] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * scale).astype(dq_ref.dtype)
    dk_ref[...] = (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) * scale).astype(dk_ref.dtype)


def _pad_bh(x, bh_pad):
    pad = bh_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _specs(S, hd, n_in):
    from jax.experimental import pallas as pl

    def blk3(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    qkv = pl.BlockSpec((HT, S, hd), blk3)
    val = pl.BlockSpec((HT, S), blk2)
    return [qkv, qkv, qkv, val] + [qkv] * (n_in - 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def attention_smallS(q, k, v, key_valid, seed, rate: float = 0.0,
                     training: bool = False, interpret: bool = False):
    """q,k,v: [BH, S, hd]; key_valid: [BH, S]; seed: int32 scalar."""
    return _call_fwd(q, k, v, key_valid, seed, rate, training, interpret)


def _call_fwd(q, k, v, key_valid, seed, rate, training, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH, S, hd = q.shape
    bh_pad = -(-BH // HT) * HT
    qp, kp, vp = (_pad_bh(t, bh_pad) for t in (q, k, v))
    validp = _pad_bh(key_valid, bh_pad)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, training=training),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_pad // HT,),
            in_specs=_specs(S, hd, 4),
            out_specs=_specs(S, hd, 1)[0],
        ),
        out_shape=jax.ShapeDtypeStruct((bh_pad, S, hd), q.dtype),
        interpret=interpret,
    )(seed, qp, kp, vp, validp)
    return o[:BH]


def _fwd_rule(q, k, v, key_valid, seed, rate, training, interpret):
    o = _call_fwd(q, k, v, key_valid, seed, rate, training, interpret)
    return o, (q, k, v, key_valid, seed)


def _bwd_rule(rate, training, interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, key_valid, seed = res
    BH, S, hd = q.shape
    bh_pad = -(-BH // HT) * HT
    qp, kp, vp, gp = (_pad_bh(t, bh_pad) for t in (q, k, v, g))
    validp = _pad_bh(key_valid, bh_pad)
    seeds = jnp.asarray(seed, jnp.int32).reshape(1)
    spec3 = _specs(S, hd, 1)[0]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, training=training),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_pad // HT,),
            in_specs=_specs(S, hd, 5),
            out_specs=[spec3, spec3, spec3],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh_pad, S, hd), q.dtype)] * 3,
        interpret=interpret,
    )(seeds, qp, kp, vp, validp, gp)
    return dq[:BH], dk[:BH], dv[:BH], None, None


attention_smallS.defvjp(_fwd_rule, _bwd_rule)
