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

GRAPH-PACKED MODE (`block` > 0): the caller packs GB graphs' sequences
into one row of length S' = GB*S (a free row-major reshape of [B,S,d])
and this kernel computes BLOCK-DIAGONAL attention — token t may only
attend within its own `block`-sized group. This fixes the measured
failure mode above at its root: the [33,32] per-graph matmuls that XLA
runs at ~0.5% MFU (latency-bound — 16k tiny batched matmuls) become
[S',32] matmuls with ~4x the rows, and the score/softmax/dropout
intermediates never touch HBM. See nn/transformer.py 'packed' backend.
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


def _prec(dtype):
    """f32 inputs: HIGHEST (exact f32 passes — the parity/exactness
    contract). bf16 inputs: DEFAULT — single-pass MXU with f32 accumulation,
    matching the XLA dense path's einsum(preferred_element_type=f32)
    semantics; HIGHEST here would force 3-pass bf16 emulation and was
    measured to make the packed kernel LOSE to XLA (108.6 vs 97.7 ms step)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _probs(q, k, valid, block: int = 0):
    """Masked softmax probabilities [HT, S, S] (f32). With block > 0 the
    attention is block-diagonal: query t only sees keys in the same
    `block`-sized group (graph-packed sequences)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=_prec(q.dtype)) * scale
    mask = valid[:, None, :]
    if block > 0:
        S = q.shape[1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) // block
        ki = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1) // block
        mask = mask & (qi == ki)[None]
    s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-16)
    return e / denom


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, *,
                rate: float, training: bool, block: int = 0):
    from jax.experimental import pallas as pl

    q = q_ref[...]          # native dtype: bf16 runs single-pass MXU
    k = k_ref[...]
    v = v_ref[...]
    p = _probs(q, k, valid_ref[...], block)
    if training and rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed_ref[0] + pl.program_id(0))
        p = p * keep / (1.0 - rate)
    o_ref[...] = jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype)).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, rate: float, training: bool,
                block: int = 0):
    from jax.experimental import pallas as pl

    q = q_ref[...]          # native dtype: bf16 runs single-pass MXU
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    prec = _prec(q.dtype)
    valid = valid_ref[...]
    p = _probs(q, k, valid, block)                            # [HT, S, S] f32
    if training and rate > 0.0:
        keep = _keep_mask(p.shape, rate, seed_ref[0] + pl.program_id(0))
        p_drop = p * keep / (1.0 - rate)
    else:
        keep = None
        p_drop = p
    dv_ref[...] = jax.lax.dot_general(
        p_drop.astype(q.dtype), g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                                        # [HT, S, S]
    if keep is not None:
        dp = dp * keep / (1.0 - rate)
    # softmax backward: ds = p * (dp - sum(p_undropped... NOTE: the
    # normalization denominator came from the UNDROPPED p, so the chain is
    # ds = p * (dp - sum(p * dp)) with the undropped p.
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    dq_ref[...] = (jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec) * scale).astype(dq_ref.dtype)
    dk_ref[...] = (jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec) * scale).astype(dk_ref.dtype)


def _pad_bh(x, bh_pad):
    pad = bh_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _ht(S):
    """Rows of (batch, head) pairs per grid step, shrunk for longer packed
    sequences so the [ht, S, S] f32 score block stays a few MB of VMEM."""
    return max(1, min(HT, 4096 // max(S, 1)))


def _specs(S, hd, n_in, ht):
    from jax.experimental import pallas as pl

    def blk3(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    qkv = pl.BlockSpec((ht, S, hd), blk3)
    val = pl.BlockSpec((ht, S), blk2)
    return [qkv, qkv, qkv, val] + [qkv] * (n_in - 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def attention_smallS(q, k, v, key_valid, seed, rate: float = 0.0,
                     training: bool = False, interpret: bool = False,
                     block: int = 0):
    """q,k,v: [BH, S, hd]; key_valid: [BH, S]; seed: int32 scalar.
    block > 0: block-diagonal attention (graph-packed sequences)."""
    return _call_fwd(q, k, v, key_valid, seed, rate, training, interpret,
                     block)


def _call_fwd(q, k, v, key_valid, seed, rate, training, interpret, block=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH, S, hd = q.shape
    ht = _ht(S)
    bh_pad = -(-BH // ht) * ht
    qp, kp, vp = (_pad_bh(t, bh_pad) for t in (q, k, v))
    validp = _pad_bh(key_valid, bh_pad)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, training=training,
                          block=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_pad // ht,),
            in_specs=_specs(S, hd, 4, ht),
            out_specs=_specs(S, hd, 1, ht)[0],
        ),
        out_shape=jax.ShapeDtypeStruct((bh_pad, S, hd), q.dtype),
        interpret=interpret,
    )(seed, qp, kp, vp, validp)
    return o[:BH]


def _fwd_rule(q, k, v, key_valid, seed, rate, training, interpret, block=0):
    o = _call_fwd(q, k, v, key_valid, seed, rate, training, interpret, block)
    return o, (q, k, v, key_valid, seed)


def _bwd_rule(rate, training, interpret, block, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, k, v, key_valid, seed = res
    BH, S, hd = q.shape
    ht = _ht(S)
    bh_pad = -(-BH // ht) * ht
    qp, kp, vp, gp = (_pad_bh(t, bh_pad) for t in (q, k, v, g))
    validp = _pad_bh(key_valid, bh_pad)
    seeds = jnp.asarray(seed, jnp.int32).reshape(1)
    spec3 = _specs(S, hd, 1, ht)[0]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, training=training,
                          block=block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh_pad // ht,),
            in_specs=_specs(S, hd, 5, ht),
            out_specs=[spec3, spec3, spec3],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh_pad, S, hd), q.dtype)] * 3,
        interpret=interpret,
    )(seeds, qp, kp, vp, validp, gp)
    return dq[:BH], dk[:BH], dv[:BH], None, None


attention_smallS.defvjp(_fwd_rule, _bwd_rule)
