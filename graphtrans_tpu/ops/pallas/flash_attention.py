"""Flash attention (fwd + custom-VJP bwd) for padded node sequences.

Pallas TPU kernel for the global-attention stage at code2-scale sequence
lengths (S ~ 1000): online-softmax forward and a two-pass backward, never
materializing the [B, H, S, S] score tensor in HBM — the kernel-level
version of the lax.scan chunked path in nn/transformer.py
(chunked_masked_attention), replacing the role torch's fused attention
plays in the reference's nn.TransformerEncoder
(/root/reference/modules/transformer_encoder.py:28-32).

Semantics match masked_softmax + torch-style attention dropout exactly:
  - key-padding mask: invalid keys get probability 0; fully-masked query
    rows produce zeros (not NaN).
  - dropout normalizes by the UNDROPPED denominator, then drops+rescales
    the probabilities (torch nn.MultiheadAttention semantics, same as the
    chunked path). The dropout mask is regenerated bit-identically in the
    backward pass from the same per-(head, q-block, k-block) seeds, so no
    mask tensor is stored.

Layout: [BH, S, hd] with the key/value rows of one (batch, head) resident
in VMEM per grid step (S=1024, hd<=128 -> ~1 MB), q processed in BQ-row
blocks. All matmuls carry preferred_element_type=f32, and at f32 inputs
they request Precision.HIGHEST — without it the MXU multiplies f32 operands
in bf16 (production runs bf16 where this is moot, but the chip-side
exactness smoke (tools/tpu_smoke.py) and any f32 user would silently lose
~3 decimal digits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _prec(dtype):
    """HIGHEST when the ORIGINAL inputs are f32 (exact 6-pass multiplies);
    default for bf16 inputs — the in-kernel f32 upcast of bf16 values is
    exactly representable, so single-pass bf16 multiplies are already exact
    and HIGHEST would cost 6x MXU work for nothing. Keyed on the HBM ref
    dtype, never the f32-cast kernel local."""
    import jax.numpy as _jnp

    return jax.lax.Precision.HIGHEST if dtype == _jnp.float32 else None

BQ = 256   # query rows per grid step
BK = 256   # key columns per inner loop step

_NEG = -1e30


def _dropout_keep(shape, rate, seed):
    """Deterministic keep mask from the per-block seed (TPU PRNG)."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed)
    bits = pltpu.prng_random_bits(shape)
    # keep with probability 1-rate: uint32 threshold compare
    thresh = jnp.uint32(min(max(1.0 - rate, 0.0), 1.0) * 0xFFFFFFFF)
    return (pltpu.bitcast(bits, jnp.uint32) < thresh).astype(jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                o_ref, m_ref, l_ref,
                *, s_len: int, rate: float, training: bool):
    from jax.experimental import pallas as pl

    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                       # [BQ, hd]
    segq = segq_ref[0]                                     # [BQ, 1] i32
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))

    # stats ride as [BQ, 1] columns and masks as [1, BK] rows — Mosaic has
    # no 1-D vectors / minor-dim insertion on non-32-bit types. Attention is
    # masked by SEGMENT ID: query i attends key j iff segq[i] == segk[j] and
    # segk[j] >= 0 (-1 = padding). The plain key-padding mask is the
    # degenerate case segq = 0, segk = valid - 1.
    nk = s_len // BK
    m = jnp.full((BQ, 1), _NEG, jnp.float32)
    l = jnp.zeros((BQ, 1), jnp.float32)
    acc = jnp.zeros((BQ, q.shape[-1]), jnp.float32)

    def body(kc, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.dslice(kc * BK, BK), :].astype(jnp.float32)
        vb = v_ref[0, pl.dslice(kc * BK, BK), :].astype(jnp.float32)
        sk = segk_ref[0, :, pl.dslice(kc * BK, BK)]        # [1, BK] i32
        kv = (segq == sk) & (sk >= 0)                      # [BQ, BK]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype)) * scale
        s = jnp.where(kv, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(kv, p, 0.0)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if training and rate > 0.0:
            keep = _dropout_keep((BQ, BK), rate,
                                 seed_ref[0] + (bh * 16384 + qi) * 1024 + kc)
            p = p * keep / (1.0 - rate)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype))
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-16)).astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, segq_ref, segk_ref, do_ref,
               delta_ref, m_ref, l_ref, dq_ref, *, s_len: int, rate: float,
               training: bool):
    from jax.experimental import pallas as pl

    bh = pl.program_id(0)
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    segq = segq_ref[0]                                     # [BQ, 1] i32
    do = do_ref[0].astype(jnp.float32)
    delta = delta_ref[0]                                   # [BQ, 1]
    m = m_ref[0]                                           # [BQ, 1]
    l_inv = 1.0 / jnp.maximum(l_ref[0], 1e-16)             # [BQ, 1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))

    nk = s_len // BK
    dq = jnp.zeros_like(q)

    def body(kc, dq):
        kb = k_ref[0, pl.dslice(kc * BK, BK), :].astype(jnp.float32)
        vb = v_ref[0, pl.dslice(kc * BK, BK), :].astype(jnp.float32)
        sk = segk_ref[0, :, pl.dslice(kc * BK, BK)]        # [1, BK] i32
        kv = (segq == sk) & (sk >= 0)                      # [BQ, BK]
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype)) * scale
        s = jnp.where(kv, s, _NEG)
        p = jnp.exp(s - m) * l_inv
        p = jnp.where(kv, p, 0.0)
        dov = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype))
        if training and rate > 0.0:
            keep = _dropout_keep((BQ, BK), rate,
                                 seed_ref[0] + (bh * 16384 + qi) * 1024 + kc)
            dov = dov * keep / (1.0 - rate)
        ds = p * (dov - delta)
        dq = dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype)) * scale
        return dq

    dq_ref[0] = jax.lax.fori_loop(0, nk, body, dq).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, segq_ref, segk_ref, do_ref,
                delta_ref, m_ref, l_ref, dk_ref, dv_ref, *, s_len: int,
                rate: float, training: bool):
    from jax.experimental import pallas as pl

    bh = pl.program_id(0)
    ki = pl.program_id(1)
    kb = k_ref[0].astype(jnp.float32)                      # [BK, hd]
    vb = v_ref[0].astype(jnp.float32)
    sk = segk_ref[0]                                       # [1, BK] i32
    scale = 1.0 / jnp.sqrt(jnp.asarray(kb.shape[-1], jnp.float32))

    nq = s_len // BQ
    dk = jnp.zeros_like(kb)
    dv = jnp.zeros_like(vb)

    def body(qc, carry):
        dk, dv = carry
        qb = q_ref[0, pl.dslice(qc * BQ, BQ), :].astype(jnp.float32)
        sq = segq_ref[0, pl.dslice(qc * BQ, BQ), :]        # [BQ, 1] i32
        kv = (sq == sk) & (sk >= 0)                        # [BQ, BK]
        dob = do_ref[0, pl.dslice(qc * BQ, BQ), :].astype(jnp.float32)
        delta = delta_ref[0, pl.dslice(qc * BQ, BQ), :]    # [BQ, 1]
        mb = m_ref[0, pl.dslice(qc * BQ, BQ), :]           # [BQ, 1]
        lb_inv = 1.0 / jnp.maximum(
            l_ref[0, pl.dslice(qc * BQ, BQ), :], 1e-16)
        s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype)) * scale
        s = jnp.where(kv, s, _NEG)
        p = jnp.exp(s - mb) * lb_inv
        p = jnp.where(kv, p, 0.0)                          # [BQ, BK]
        if training and rate > 0.0:
            keep = _dropout_keep((BQ, BK), rate,
                                 seed_ref[0] + (bh * 16384 + qc) * 1024 + ki)
            p_drop = p * keep / (1.0 - rate)
        else:
            keep = None
            p_drop = p
        dv = dv + jax.lax.dot_general(p_drop, dob, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype))
        dov = jax.lax.dot_general(dob, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype))
        if keep is not None:
            dov = dov * keep / (1.0 - rate)
        ds = p * (dov - delta)                             # [BQ, BK]
        dk = dk + jax.lax.dot_general(ds, qb, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                precision=_prec(q_ref.dtype)) * scale
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, nq, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_s(x, s_pad, axis, value=0):
    pad = s_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention(q, k, v, key_valid, seed, rate: float = 0.0,
                    training: bool = False, interpret: bool = False):
    """q,k,v: [BH, S, hd]; key_valid: [BH, S] bool; seed: int32 scalar
    (traced) -> [BH, S, hd].

    Equivalent to masked_softmax(q k^T / sqrt(hd)) @ v with torch-style
    attention dropout; S is padded to a BQ/BK multiple internally. The
    key-padding mask is lowered to the segment form (segq = 0,
    segk = valid - 1), so every query row keeps its current semantics
    (attends all valid keys)."""
    segk = jnp.where(key_valid, 0, -1).astype(jnp.int32)
    return _flash_core(q, k, v, jnp.zeros_like(segk), segk, seed,
                       rate, training, interpret)


def flash_attention_seg(q, k, v, seg, seed, rate: float = 0.0,
                        training: bool = False, interpret: bool = False):
    """Segment-masked flash attention for variable-length packed rows
    (ops/pack.py): token i attends token j iff seg[i] == seg[j] >= 0.
    seg: [BH, S] int32, -1 = padding (fully-masked rows produce zeros).
    q,k,v: [BH, S, hd] -> [BH, S, hd]."""
    seg = seg.astype(jnp.int32)
    return _flash_core(q, k, v, seg, seg, seed, rate, training, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash_core(q, k, v, segq, segk, seed, rate: float = 0.0,
                training: bool = False, interpret: bool = False):
    o, _, _, _ = _fwd(q, k, v, segq, segk, rate, seed, training, interpret)
    return o


def _fwd(q, k, v, segq, segk, rate, seed, training, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BH, S, hd = q.shape
    blk = max(BQ, BK)
    s_pad = -(-S // blk) * blk
    qp = _pad_s(q, s_pad, 1)
    kp = _pad_s(k, s_pad, 1)
    vp = _pad_s(v, s_pad, 1)
    segqp = _pad_s(segq.astype(jnp.int32), s_pad, 1)          # pad q: seg 0
    segkp = _pad_s(segk.astype(jnp.int32), s_pad, 1, value=-1)  # pad k: mask

    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    grid = (BH, s_pad // BQ)
    # key segs ride as [BH, 1, S], query segs and the m/l stats as
    # [BH, S, 1]: 2-D blocks with a leading 1 violate Mosaic's (8,128)
    # last-two-dims rule, a unit dim in the right place satisfies it for free
    o, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, s_len=s_pad, rate=rate,
                          training=training),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((BH, s_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((BH, s_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qp, kp, vp, segqp[:, :, None], segkp[:, None, :])
    return o[:, :S], m, l, (qp, kp, vp, segqp, segkp, s_pad)


def _flash_fwd_rule(q, k, v, segq, segk, seed, rate, training, interpret):
    o, m, l, (qp, kp, vp, segqp, segkp, s_pad) = _fwd(
        q, k, v, segq, segk, rate, seed, training, interpret)
    return o, (qp, kp, vp, segqp, segkp, o, m, l, seed)


def _flash_bwd_rule(rate, training, interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qp, kp, vp, segqp, segkp, o, m, l, seed = res
    BH, s_pad, hd = qp.shape
    S = o.shape[1]
    gp = _pad_s(g, s_pad, 1)
    op = _pad_s(o, s_pad, 1)
    delta = jnp.sum(op.astype(jnp.float32) * gp.astype(jnp.float32),
                    axis=-1, keepdims=True)               # [BH, s_pad, 1]

    seeds = jnp.asarray(seed, jnp.int32).reshape(1)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, s_len=s_pad, rate=rate,
                          training=training),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, s_pad // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, hd), lambda b, i, *_: (b, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((BH, s_pad, hd), qp.dtype),
        interpret=interpret,
    )(seeds, qp, kp, vp, segqp[:, :, None], segkp[:, None, :], gp, delta,
      m, l)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, s_len=s_pad, rate=rate,
                          training=training),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, s_pad // BK),
            in_specs=[
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, s_pad, 1), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, BK), lambda b, i, *_: (b, 0, i)),
                pl.BlockSpec((1, s_pad, hd), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s_pad, 1), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s_pad, 1), lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, s_pad, 1), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BK, hd), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BK, hd), lambda b, i, *_: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, s_pad, hd), kp.dtype),
            jax.ShapeDtypeStruct((BH, s_pad, hd), vp.dtype),
        ],
        interpret=interpret,
    )(seeds, qp, kp, vp, segqp[:, :, None], segkp[:, None, :], gp, delta,
      m, l)

    return dq[:, :S], dk[:, :S], dv[:, :S], None, None, None


_flash_core.defvjp(_flash_fwd_rule, _flash_bwd_rule)
