"""Fused block-diagonal attention over graph-PACKED rows, heads-in-lanes.

The flagship transformer stage runs attention at S ~ 33 over thousands of
graphs. The 'packed' layout (nn/transformer.py) reshapes GB graphs into one
row of S' = GB*S <= 128 tokens with block-diagonal masking, which already
beats per-graph attention — but XLA still materializes the [B, H, S', S']
f32 scores, softmax, u8 dropout masks (plus their layout copies), and
probabilities in HBM: profiled at ~21 ms of the 80.9 ms flagship step
(v5e, bs=4096), against ~0.2 ms of minimal matmul FLOPs.

This kernel fuses score -> masked softmax -> dropout -> AV per VMEM-resident
tile. The earlier per-head formulation (attention_smallS.py, operands
[BH, S, hd=32]) LOST to XLA because Mosaic pads the 32-lane head dim to 128,
quadrupling VMEM traffic. Here operands keep the full d = nhead*hd = 128
lane dim (heads stay in lanes, exactly as the combined QKV projection emits
them) and per-head structure is expressed with a BLOCK-DIAGONAL key/value
construct instead of slicing:

    k2[r, c] = k[r % Sp, c] * (r // Sp == c // hd)     # [H*Sp, d], Sp=128
    scores   = q @ k2^T          # [S', H*Sp]: col h*Sp+j = <q_h[i], k_h[j]>
    softmax per 128-lane block   (slices at lane-tile boundaries — free)
    out      = p @ v2            # v2 built with the SAME tiled mask

so every matmul contracts over 128 or 512 lanes at MXU-native shapes and
nothing but q, k, v and the output crosses HBM. The dropout mask is
regenerated bit-identically in the backward from per-(tile, head) TPU PRNG
seeds. Semantics match nn/transformer.masked_softmax + torch attention
dropout (probabilities normalized by the UNDROPPED denominator; fully-masked
rows produce zeros) — the same contract the parity suite pins on the XLA
dense path (reference: /root/reference/modules/transformer_encoder.py:9-61
via torch nn.MultiheadAttention).

Requires d % 128 == 0 and S' <= 128 (the packed-row regime); the caller
falls back to the XLA dense path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SP_MAX = 384  # largest supported per-head key block (VMEM budget)


def _sp(S):
    """Per-head key block: S padded to the lane-tile multiple so slices at
    h*sp stay tile-aligned; padded keys are masked out of the softmax."""
    return -(-S // 128) * 128


def _bt(S):
    """Batch rows per grid step — scaled down as the [BT, S, H*sp] f32
    score block grows (the f32 backward at sp=384, bt=2 measured 18 MB of
    scoped VMEM; _cparams raises the limit to 64 MB for sp > 128 so bt=4
    fits and the grid halves)."""
    sp = _sp(S)
    return 8 if sp <= 128 else 4


def _cparams(S, interpret):
    if interpret or _sp(S) <= 128:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
_NEG = -1e30


def _prec(dtype):
    """f32: HIGHEST (exact — the parity/exactness contract). bf16: DEFAULT —
    single-pass MXU with f32 accumulation, matching the XLA dense path's
    einsum(preferred_element_type=f32)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _keep_mask(shape, rate, seed, interpret=False):
    from .prng import random_bits_u32

    thresh = jnp.uint32(min(max(1.0 - rate, 0.0), 1.0) * 0xFFFFFFFF)
    bits = random_bits_u32(shape, seed, interpret)
    return (bits < thresh).astype(jnp.float32)


def _tiled_kv(t, nhead, hd, S):
    """[BT, S, d] -> block-diagonal [BT, nhead*SP, d]: row r of block h holds
    k[r % SP] with only head h's hd lanes kept. All-arithmetic masking —
    Mosaic cannot manipulate 1-bit (i1) vectors, so compares feed straight
    into astype multiplies (same workaround as ops/pallas/dense_agg.py)."""
    bt = t.shape[0]
    d = t.shape[2]
    sp = _sp(S)
    # zero-size pads crash compiled Mosaic ("vector types must have positive
    # constant sizes") even though interpret mode tolerates them — S at an
    # exact lane-tile multiple (128/256/384) must skip the concat
    if sp > S:
        tp = jnp.concatenate([t, jnp.zeros((bt, sp - S, d), t.dtype)], axis=1)
    else:
        tp = t
    tiled = jnp.concatenate([tp] * nhead, axis=1)          # [BT, H*sp, d]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, nhead * sp, d), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nhead * sp, d), 2)
    return tiled * (row // sp == lane // hd).astype(t.dtype)


def _head_masks(valid, S, block, b_total):
    """[BT, S] key validity -> f32 0/1 softmax mask [BT, S, SP] shared by all
    heads (key j attendable by query i iff j < S, valid, same graph block).
    b_total masks batch rows past the ragged tail: the grid may overrun B,
    OOB loads are undefined, so the mask must not trust them. Arithmetic
    combination only — no i1 vector ops (Mosaic limitation)."""
    from jax.experimental import pallas as pl

    bt = valid.shape[0]
    sp = _sp(S)
    v = valid.astype(jnp.float32)
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, S, sp), 2)
    m = (kj < S).astype(jnp.float32)
    if block > 0:
        qi = jax.lax.broadcasted_iota(jnp.int32, (1, S, sp), 1)
        m = m * (qi // block == kj // block).astype(jnp.float32)
    vpad = (jnp.concatenate([v, jnp.zeros((bt, sp - S), jnp.float32)], axis=1)
            if sp > S else v)  # zero-size concat crashes compiled Mosaic
    base = pl.program_id(0) * bt
    bi = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1), 0) + base
    ok = (bi < b_total).astype(jnp.float32)
    return m * vpad[:, None, :] * ok


def _head_masks_seg(seg, S, b_total):
    """[BT, S] i32 segment ids (-1 = padding) -> f32 0/1 softmax mask
    [BT, S, SP]: key j attendable by query i iff seg[i] == seg[j] >= 0 —
    the variable-length packed-row (ops/pack.py) mask. Same arithmetic-only
    construction constraints as _head_masks."""
    from jax.experimental import pallas as pl

    bt = seg.shape[0]
    sp = _sp(S)
    segp = (jnp.concatenate(
        [seg, jnp.full((bt, sp - S), -1, seg.dtype)], axis=1)
        if sp > S else seg)                                   # [BT, sp]
    eq = (seg[:, :, None] == segp[:, None, :]).astype(jnp.float32)
    kv_ok = (segp >= 0).astype(jnp.float32)[:, None, :]
    base = pl.program_id(0) * bt
    bi = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1), 0) + base
    ok = (bi < b_total).astype(jnp.float32)
    return eq * kv_ok * ok


def _probs_all(q, k2, mask, nhead, hd, rate, training, seed,
               interpret=False):
    """Score + per-head masked softmax (+ dropout). Returns
    (p_drop [BT,S,H*SP] in q.dtype, p_undropped f32) — the latter is what
    the softmax backward normalizes with (torch dropout semantics)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    s_full = jax.lax.dot_general(
        q, k2, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_prec(q.dtype)) * scale
    sp = k2.shape[1] // nhead
    ps, pds = [], []
    for h in range(nhead):
        sh = jax.lax.slice_in_dim(s_full, h * sp, (h + 1) * sp, axis=2)
        # mask is arithmetic 0/1 f32 (no i1 vectors in Mosaic)
        sh = sh * mask - (1.0 - mask) * (-_NEG)
        m = jnp.max(sh, axis=-1, keepdims=True)
        e = jnp.exp(sh - m) * mask
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-16)
        p = e / denom
        ps.append(p)
        if training and rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed + h, interpret)
            pds.append(p * keep * (1.0 / (1.0 - rate)))
        else:
            pds.append(p)
    p_all = jnp.concatenate(ps, axis=2)
    pd_all = p_all if pds is ps else jnp.concatenate(pds, axis=2)
    return pd_all.astype(q.dtype), p_all


def _split_qkv(qkv):
    """[BT, S, 3d] -> q, k, v (lane slices at d boundaries — d%128==0 keeps
    them tile-aligned; the combined layout is what the QKV projection emits,
    so no XLA split/concat copies surround the kernel)."""
    d = qkv.shape[2] // 3
    return (jax.lax.slice_in_dim(qkv, 0, d, axis=2),
            jax.lax.slice_in_dim(qkv, d, 2 * d, axis=2),
            jax.lax.slice_in_dim(qkv, 2 * d, 3 * d, axis=2))


def attn_fwd_math(qkv, mask, nhead, rate, training, seed, interpret=False):
    """Pure in-VMEM attention forward on the combined qkv value: returns
    o [BT, S, d] in qkv.dtype. mask comes from _head_masks. Shared by the
    standalone kernel and the fused transformer-layer kernel."""
    q, k, v = _split_qkv(qkv)
    _, S, d = q.shape
    hd = d // nhead
    k2 = _tiled_kv(k, nhead, hd, S)
    v2 = _tiled_kv(v, nhead, hd, S)
    pd, _ = _probs_all(q, k2, mask, nhead, hd, rate, training, seed,
                       interpret)
    return jax.lax.dot_general(
        pd, v2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(q.dtype)).astype(q.dtype)


def _fwd_kernel(seed_ref, qkv_ref, valid_ref, o_ref, *,
                nhead, rate, training, block, b_total, interpret=False,
                use_seg=False):
    from jax.experimental import pallas as pl

    qkv = qkv_ref[...]
    S = qkv.shape[1]
    seed = seed_ref[0] + pl.program_id(0) * nhead
    valid = jax.lax.squeeze(valid_ref[...], (1,))
    mask = (_head_masks_seg(valid, S, b_total) if use_seg
            else _head_masks(valid, S, block, b_total))
    o_ref[...] = attn_fwd_math(qkv, mask, nhead, rate, training, seed,
                               interpret).astype(o_ref.dtype)


def _fold_blocks(t2, nhead, hd, S, out_dtype):
    """Adjoint of _tiled_kv: [BT, H*SP, d] f32 -> [BT, S, d]: sum the nhead
    sublane blocks with each head's lane mask applied."""
    d = t2.shape[2]
    sp = t2.shape[1] // nhead
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sp, d), 2)
    acc = None
    for h in range(nhead):
        blk = jax.lax.slice_in_dim(t2, h * sp, (h + 1) * sp, axis=1)
        blk = blk * (lane // hd == h).astype(blk.dtype)
        acc = blk if acc is None else acc + blk
    return jax.lax.slice_in_dim(acc, 0, S, axis=1).astype(out_dtype)


def attn_bwd_math(qkv, mask, g, nhead, rate, training, seed,
                  interpret=False):
    """Pure in-VMEM attention backward: returns dqkv [BT, S, 3d] in
    qkv.dtype (the dropout mask regenerates from the same seed)."""
    q, k, v = _split_qkv(qkv)
    _, S, d = q.shape
    hd = d // nhead
    prec = _prec(q.dtype)
    k2 = _tiled_kv(k, nhead, hd, S)
    v2 = _tiled_kv(v, nhead, hd, S)
    pd, p = _probs_all(q, k2, mask, nhead, hd, rate, training, seed,
                       interpret)

    # dv2 = pd^T g  (contract the query dim)
    dv2 = jax.lax.dot_general(
        pd, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [BT,H*SP,d]
    dv = _fold_blocks(dv2, nhead, hd, S, q.dtype)

    dp = jax.lax.dot_general(
        g, v2, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [BT,S,H*SP]
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    sp = k2.shape[1] // nhead
    ds = []
    for h in range(nhead):
        ph = jax.lax.slice_in_dim(p, h * sp, (h + 1) * sp, axis=2)
        dph = jax.lax.slice_in_dim(dp, h * sp, (h + 1) * sp, axis=2)
        if training and rate > 0.0:
            keep = _keep_mask(ph.shape, rate, seed + h, interpret)
            dph = dph * keep * (1.0 / (1.0 - rate))
        # normalization denominator came from the UNDROPPED p:
        # ds = p * (dp - sum(p * dp)), then the score scale folds in here
        delta = jnp.sum(ph * dph, axis=-1, keepdims=True)
        ds.append((ph * (dph - delta)) * scale)
    ds_all = jnp.concatenate(ds, axis=2).astype(q.dtype)   # [BT,S,H*SP]

    # dq = ds @ k2 (head h's contribution lands only in its lanes via the
    # mask baked into k2 — no extra masking needed)
    dq = jax.lax.dot_general(
        ds_all, k2, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec).astype(q.dtype)
    dk2 = jax.lax.dot_general(
        ds_all, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [BT,H*SP,d]
    dk = _fold_blocks(dk2, nhead, hd, S, q.dtype)
    return jnp.concatenate([dq, dk, dv], axis=2)


def _bwd_kernel(seed_ref, qkv_ref, valid_ref, g_ref,
                dqkv_ref, *, nhead, rate, training, block,
                b_total, interpret=False, use_seg=False):
    from jax.experimental import pallas as pl

    qkv = qkv_ref[...]
    S = qkv.shape[1]
    seed = seed_ref[0] + pl.program_id(0) * nhead
    valid = jax.lax.squeeze(valid_ref[...], (1,))
    mask = (_head_masks_seg(valid, S, b_total) if use_seg
            else _head_masks(valid, S, block, b_total))
    dqkv_ref[...] = attn_bwd_math(qkv, mask, g_ref[...], nhead, rate,
                                  training, seed, interpret).astype(
        dqkv_ref.dtype)


def _specs(S, d):
    from jax.experimental import pallas as pl

    bt = _bt(S)

    def blk3(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    return {
        "qkv": pl.BlockSpec((bt, S, 3 * d), blk3),
        "x": pl.BlockSpec((bt, S, d), blk3),
        # valid rides as [B, 1, S]: a (bt, S) 2-D block violates Mosaic's
        # (8,128) last-two-dims rule once bt < 8 (medium-S shrinks bt);
        # the unit dim satisfies it for free (same trick as
        # flash_attention.py)
        "val": pl.BlockSpec((bt, 1, S), blk3),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def attention_packed_qkv(qkv, key_valid, seed, nhead: int, rate: float = 0.0,
                         training: bool = False, interpret: bool = False,
                         block: int = 0):
    """qkv: [B, S, 3d] combined projection output, heads in lanes (lane c of
    each d-slice belongs to head c // (d//nhead)); key_valid: [B,S]; seed:
    int32 scalar. block > 0 restricts attention to `block`-sized diagonal
    token groups (graph-packed rows). Returns [B, S, d]; the backward emits
    the combined dqkv so no XLA split/concat copies surround the kernel.
    Requires S <= 384 (SP_MAX) and d % 128 == 0."""
    return _call_fwd(qkv, key_valid, seed, nhead, rate, training,
                     interpret, block)


def attention_packed(q, k, v, key_valid, seed, nhead: int, rate: float = 0.0,
                     training: bool = False, interpret: bool = False,
                     block: int = 0):
    """Split-operand convenience wrapper (tests / non-combined callers)."""
    return attention_packed_qkv(
        jnp.concatenate([q, k, v], axis=2), key_valid, seed, nhead, rate,
        training, interpret, block)


def _call_fwd(qkv, key_valid, seed, nhead, rate, training, interpret,
              block, use_seg=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, d3 = qkv.shape
    d = d3 // 3
    assert S <= SP_MAX and d % 128 == 0 and d % nhead == 0, (S, d, nhead)
    # ragged grid: the last tile may overrun B — in-kernel range masking
    # keeps OOB garbage inert and Pallas masks the OOB stores, so no HBM
    # pad/slice copies are needed
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    sp = _specs(S, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nhead=nhead, rate=rate,
                          training=training, block=block, b_total=B,
                          interpret=interpret, use_seg=use_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-B // _bt(S)),),
            in_specs=[sp["qkv"], sp["val"]],
            out_specs=sp["x"],
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, d), qkv.dtype),
        compiler_params=_cparams(S, interpret),
        interpret=interpret,
    )(seed, qkv, key_valid[:, None, :])


def _fwd_rule(qkv, key_valid, seed, nhead, rate, training, interpret,
              block):
    o = _call_fwd(qkv, key_valid, seed, nhead, rate, training, interpret,
                  block)
    return o, (qkv, key_valid, seed)


def _call_bwd(qkv, key_valid, seed, g, nhead, rate, training, interpret,
              block, use_seg=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, d3 = qkv.shape
    d = d3 // 3
    seeds = jnp.asarray(seed, jnp.int32).reshape(1)
    sp = _specs(S, d)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nhead=nhead, rate=rate,
                          training=training, block=block, b_total=B,
                          interpret=interpret, use_seg=use_seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-B // _bt(S)),),
            in_specs=[sp["qkv"], sp["val"], sp["x"]],
            out_specs=sp["qkv"],
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, 3 * d), qkv.dtype),
        compiler_params=_cparams(S, interpret),
        interpret=interpret,
    )(seeds, qkv, key_valid[:, None, :], g)


def _bwd_rule(nhead, rate, training, interpret, block, res, g):
    qkv, key_valid, seed = res
    dqkv = _call_bwd(qkv, key_valid, seed, g, nhead, rate, training,
                     interpret, block)
    return dqkv, None, None


attention_packed_qkv.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def attention_packed_seg_qkv(qkv, seg, seed, nhead: int, rate: float = 0.0,
                             training: bool = False,
                             interpret: bool = False):
    """Variable-length packed-row variant (ops/pack.py): seg [B, S] int32
    segment ids (-1 = padding) replace the fixed block-diagonal structure —
    token i attends token j iff seg[i] == seg[j] >= 0. Same heads-in-lanes
    construct (full d-lane contractions — the fix for flash's hd=32
    lane-padding tax at medium S), same torch dropout semantics. Requires
    S <= 384 (SP_MAX) and d % 128 == 0."""
    return _call_fwd(qkv, seg, seed, nhead, rate, training, interpret,
                     0, use_seg=True)


def _seg_fwd_rule(qkv, seg, seed, nhead, rate, training, interpret):
    o = _call_fwd(qkv, seg, seed, nhead, rate, training, interpret, 0,
                  use_seg=True)
    return o, (qkv, seg, seed)


def _seg_bwd_rule(nhead, rate, training, interpret, res, g):
    qkv, seg, seed = res
    dqkv = _call_bwd(qkv, seg, seed, g, nhead, rate, training, interpret,
                     0, use_seg=True)
    return dqkv, None, None


attention_packed_seg_qkv.defvjp(_seg_fwd_rule, _seg_bwd_rule)
