"""Fully fused post-norm transformer ENCODER LAYER for packed rows.

One kernel per layer direction computes the entire torch
TransformerEncoderLayer body (reference semantics:
/root/reference/modules/transformer_encoder.py:9-61 composing
torch nn.TransformerEncoderLayer):

    qkv = x @ Wqkv + b
    a   = drop1( attn(qkv) @ Wout + b )      (block-diagonal packed attention,
                                              ops/pallas/attention_packed.py)
    y1  = LN1(x + a)
    f   = drop2( act(y1 @ W1 + b1) )
    y   = LN2(y1 + drop3(f @ W2 + b2))

with every intermediate VMEM-resident: the XLA version moves ~15
[B, S', *] tensors per layer through HBM (LN stats, dropout bits and their
layout copies, residuals, qkv/FF activations) and computes weight grads as
VPU multiply-reduce fusions — profiled at ~23 ms of the 58.6 ms flagship
step against ~3.5 ms of matmul FLOPs. The backward is a single kernel that
recomputes the forward from x (flash-style) and emits dx plus ALL weight
and bias cotangents, accumulated across grid steps in revisited f32 blocks
(same pattern as gin_agg's table grad); weight-grad matmuls flatten the
(batch, token) dims so K = BT*S' on the MXU instead of row-reductions.
Dropout masks regenerate from per-(tile, stream) TPU PRNG seeds (threshold
dropout — the XLA path's ByteDropout quantizes keep to 1/256; both honor
torch semantics, attention probabilities normalized by the undropped
denominator).

LayerNorm matches the module's torch-parity eps 1e-5 (fast variance,
f32 statistics). Requires d % 128 == 0 and packed S' <= 128; the caller
(nn/transformer.TransformerEncoderLayer) falls back to the unfused path
otherwise. Parity-tested against the unfused composition with shared
params in interpret mode.

MEASURED RESULT (v5e, bs=4096 flagship, bf16): SLOWER than the production
mix — 73.7 ms step (BT=8, 32 MB scoped VMEM) / 74.3 (BT=4) vs 57.4 for
fused-attention + fused-aggregation + XLA-for-the-rest. The monolithic
kernel serializes the layer's whole dependency chain per tile where XLA
overlaps ~30 independent fusions (DMA/compute and multiple matmuls in
flight), and the flash-style backward recompute adds ~50% matmul FLOPs;
VMEM caps the tile at BT=8. Kept as an opt-in backend
(set_attn_backend('packed_layer')) — the same negative-result status as
attention_smallS; the winning grain on this chip is op-level fusion
(attention, aggregation), not layer-level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .attention_packed import (_head_masks, _keep_mask, _prec, attn_bwd_math,
                               attn_fwd_math)

BT = 8        # batch rows (packed graph-rows) per grid step (f32 keep
              # masks put the BT=8 backward at 17.96 MB vs the 16 MB scoped
              # VMEM limit; bf16 keep masks bring it back under)
EPS = 1e-5    # torch nn.LayerNorm default (reference semantics)
STREAMS = 3   # dropout streams beyond the attention heads


def _flat(t):
    """[BT, S, d] -> [BT*S, d] (merge dims 0,1 — free row-major)."""
    b, s, d = t.shape
    return t.reshape(b * s, d)


def _ln_fwd(h, scale, bias):
    """h [BT,S,d] f32 -> (y f32, mu, iv, xhat). flax fast-variance formula,
    f32 statistics."""
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu, 0.0)
    iv = jax.lax.rsqrt(var + EPS)
    xhat = (h - mu) * iv
    return xhat * scale + bias, mu, iv, xhat


def _ln_bwd(dy, iv, xhat, scale):
    """Input grad of LayerNorm (scale/bias grads are row-sums done by the
    caller on the flattened tensors)."""
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return iv * (dxhat - m1 - xhat * m2)


def _act_fwd(x, act):
    if act == "relu":
        return jnp.maximum(x, 0.0)
    return jax.nn.gelu(x)          # tanh approximation — matches nn.gelu


def _act_bwd(x, act):
    if act == "relu":
        return (x > 0).astype(jnp.float32)
    c = 0.7978845608028654          # sqrt(2/pi)
    inner = c * (x + 0.044715 * x ** 3)
    t = jnp.tanh(inner)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * c * (
        1.0 + 3 * 0.044715 * x * x)


def _keep(shape, rate, training, seed, interpret):
    if not training or rate <= 0.0:
        return None
    # bf16 keep masks: 0/1 exact, halves the [BT,S,ff]-sized live buffers
    return _keep_mask(shape, rate, seed, interpret).astype(jnp.bfloat16)


def _drop(t, keep, rate):
    if keep is None:
        return t
    return t * keep * (1.0 / (1.0 - rate))


def _zero_oob(t, b_total):
    """NaN-safe zeroing of batch rows past the ragged grid tail."""
    from jax.experimental import pallas as pl

    bt = t.shape[0]
    base = pl.program_id(0) * bt
    bi = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1), 0) + base
    return jnp.where(bi < b_total, t, jnp.zeros_like(t))


def _layer_fwd_core(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1,
                    w2, bf2, s2, b2, *, nhead, rate, act, training, block,
                    b_total, interpret):
    """Shared forward trace. Returns every intermediate the backward needs
    (all recomputed there — this is also called from the bwd kernel)."""
    dt = x.dtype
    prec = _prec(dt)
    S = x.shape[1]
    x = _zero_oob(x, b_total)
    xf32 = x.astype(jnp.float32)

    qkv = (jax.lax.dot_general(x, wqkv, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)
           + bqkv[None].astype(jnp.float32)).astype(dt)
    mask = _head_masks(valid, S, block, b_total)
    ao = attn_fwd_math(qkv, mask, nhead, rate, training, seed, interpret)
    a = (jax.lax.dot_general(ao, wout, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
         + bout[None].astype(jnp.float32))
    keep1 = _keep(a.shape, rate, training, seed + nhead, interpret)
    h1 = xf32 + _drop(a, keep1, rate)
    y1, _, iv1, xhat1 = _ln_fwd(h1, s1[None].astype(jnp.float32),
                                b1[None].astype(jnp.float32))
    y1dt = y1.astype(dt)

    fpre = (jax.lax.dot_general(y1dt, w1, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec)
            + bf1[None].astype(jnp.float32))
    f = _act_fwd(fpre, act)
    keep2 = _keep(f.shape, rate, training, seed + nhead + 1, interpret)
    fd = _drop(f, keep2, rate).astype(dt)
    f2 = (jax.lax.dot_general(fd, w2, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
          + bf2[None].astype(jnp.float32))
    keep3 = _keep(f2.shape, rate, training, seed + nhead + 2, interpret)
    h2 = y1 + _drop(f2, keep3, rate)
    y, _, iv2, xhat2 = _ln_fwd(h2, s2[None].astype(jnp.float32),
                               b2[None].astype(jnp.float32))
    return dict(x=x, qkv=qkv, mask=mask, ao=ao, keep1=keep1, iv1=iv1,
                xhat1=xhat1, y1dt=y1dt, fpre=fpre, keep2=keep2, fd=fd,
                keep3=keep3, iv2=iv2, xhat2=xhat2, y=y)


def _fwd_kernel(seed_ref, x_ref, valid_ref, wqkv_ref, bqkv_ref, wout_ref,
                bout_ref, s1_ref, b1_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
                s2_ref, b2_ref, y_ref, *, nhead, rate, act, training, block,
                b_total, interpret):
    from jax.experimental import pallas as pl

    seed = seed_ref[0] + pl.program_id(0) * (nhead + STREAMS)
    valid = jax.lax.squeeze(valid_ref[...], (1,))
    r = _layer_fwd_core(
        x_ref[...], valid, seed, wqkv_ref[...], bqkv_ref[...],
        wout_ref[...], bout_ref[...], s1_ref[...], b1_ref[...], w1_ref[...],
        bf1_ref[...], w2_ref[...], bf2_ref[...], s2_ref[...], b2_ref[...],
        nhead=nhead, rate=rate, act=act, training=training, block=block,
        b_total=b_total, interpret=interpret)
    y_ref[...] = r["y"].astype(y_ref.dtype)


def _rowsum(t32):
    """[R, d] f32 -> [1, d] via a ones-row matmul (MXU, not a VPU
    cross-sublane reduction)."""
    ones = jnp.ones((1, t32.shape[0]), jnp.float32)
    return jax.lax.dot_general(ones, t32, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dw(a_dt, g32, dt):
    """dW = a^T g with K = flattened rows on the MXU; the cotangent side is
    cast to the compute dtype first (exactly what the XLA bf16 path's dW
    GEMMs consume)."""
    g = g32.astype(dt)
    return jax.lax.dot_general(a_dt, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec(dt))


def _bwd_kernel(seed_ref, x_ref, valid_ref, wqkv_ref, bqkv_ref, wout_ref,
                bout_ref, s1_ref, b1_ref, w1_ref, bf1_ref, w2_ref, bf2_ref,
                s2_ref, b2_ref, g_ref, dx_ref, dwqkv_ref, dbqkv_ref,
                dwout_ref, dbout_ref, ds1_ref, db1_ref, dw1_ref, dbf1_ref,
                dw2_ref, dbf2_ref, ds2_ref, db2_ref, *, nhead, rate, act,
                training, block, b_total, interpret):
    from jax.experimental import pallas as pl

    seed = seed_ref[0] + pl.program_id(0) * (nhead + STREAMS)
    x = x_ref[...]
    dt = x.dtype
    prec = _prec(dt)
    valid = jax.lax.squeeze(valid_ref[...], (1,))
    r = _layer_fwd_core(
        x, valid, seed, wqkv_ref[...], bqkv_ref[...],
        wout_ref[...], bout_ref[...], s1_ref[...], b1_ref[...], w1_ref[...],
        bf1_ref[...], w2_ref[...], bf2_ref[...], s2_ref[...], b2_ref[...],
        nhead=nhead, rate=rate, act=act, training=training, block=block,
        b_total=b_total, interpret=interpret)

    g = _zero_oob(g_ref[...], b_total).astype(jnp.float32)

    # LN2 backward
    s2f = s2_ref[...][None].astype(jnp.float32)
    ds2 = _rowsum(_flat(g * r["xhat2"]))
    db2 = _rowsum(_flat(g))
    dh2 = _ln_bwd(g, r["iv2"], r["xhat2"], s2f)
    dy1 = dh2                                   # residual branch
    df2 = _drop(dh2, r["keep3"], rate)
    # FF second linear
    dw2 = _dw(_flat(r["fd"]), _flat(df2), dt)
    dbf2 = _rowsum(_flat(df2))
    dfd = jax.lax.dot_general(df2.astype(dt), w2_ref[...],
                              (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec)
    df = _drop(dfd, r["keep2"], rate)
    dfpre = df * _act_bwd(r["fpre"], act)
    dw1 = _dw(_flat(r["y1dt"]), _flat(dfpre), dt)
    dbf1 = _rowsum(_flat(dfpre))
    dy1 = dy1 + jax.lax.dot_general(dfpre.astype(dt), w1_ref[...],
                                    (((2,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)

    # LN1 backward
    s1f = s1_ref[...][None].astype(jnp.float32)
    ds1 = _rowsum(_flat(dy1 * r["xhat1"]))
    db1 = _rowsum(_flat(dy1))
    dh1 = _ln_bwd(dy1, r["iv1"], r["xhat1"], s1f)
    dx = dh1                                    # residual branch
    da = _drop(dh1, r["keep1"], rate)
    # out projection
    dwout = _dw(_flat(r["ao"]), _flat(da), dt)
    dbout = _rowsum(_flat(da))
    dao = jax.lax.dot_general(da.astype(dt), wout_ref[...],
                              (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=prec).astype(dt)
    # attention backward (dropout masks regenerate from the same seed)
    dqkv = attn_bwd_math(r["qkv"], r["mask"], dao, nhead, rate, training,
                         seed, interpret)
    # r["x"] (OOB rows zeroed), NOT the raw ref load — ragged-tail NaN
    dwqkv = _dw(_flat(r["x"]), _flat(dqkv.astype(jnp.float32)), dt)
    dbqkv = _rowsum(_flat(dqkv.astype(jnp.float32)))
    dx = dx + jax.lax.dot_general(dqkv.astype(dt), wqkv_ref[...],
                                  (((2,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, ds1_ref,
                    db1_ref, dw1_ref, dbf1_ref, dw2_ref, dbf2_ref, ds2_ref,
                    db2_ref):
            ref[...] = jnp.zeros_like(ref)

    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwout_ref[...] += dwout
    dbout_ref[...] += dbout
    ds1_ref[...] += ds1
    db1_ref[...] += db1
    dw1_ref[...] += dw1
    dbf1_ref[...] += dbf1
    dw2_ref[...] += dw2
    dbf2_ref[...] += dbf2
    ds2_ref[...] += ds2
    db2_ref[...] += db2


def _cparams(interpret):
    """The backward's live set (~18 MB at BT=8) exceeds the default 16 MB
    scoped-VMEM limit — raise it for this kernel (v5e has headroom)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _pspecs(d, ff):
    from jax.experimental import pallas as pl

    def pin(i, *_):
        return (0, 0)

    return [
        pl.BlockSpec((d, 3 * d), pin),   # wqkv
        pl.BlockSpec((1, 3 * d), pin),   # bqkv
        pl.BlockSpec((d, d), pin),       # wout
        pl.BlockSpec((1, d), pin),       # bout
        pl.BlockSpec((1, d), pin),       # s1
        pl.BlockSpec((1, d), pin),       # b1
        pl.BlockSpec((d, ff), pin),      # w1
        pl.BlockSpec((1, ff), pin),      # bf1
        pl.BlockSpec((ff, d), pin),      # w2
        pl.BlockSpec((1, d), pin),       # bf2
        pl.BlockSpec((1, d), pin),       # s2
        pl.BlockSpec((1, d), pin),       # b2
    ]


def _p2d(t):
    """[N] bias/scale -> [1, N] (Mosaic wants >= 2-D operands)."""
    return t.reshape(1, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def fused_transformer_layer(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1,
                            w1, bf1, w2, bf2, s2, b2, nhead: int,
                            rate: float, act: str, training: bool,
                            block: int, interpret: bool = False):
    """x [B,S',d]; valid [B,S']; seed int32 scalar; weights in compute
    dtype ([N]-shaped biases/LN params). Returns [B,S',d]. Post-norm torch
    TransformerEncoderLayer semantics with block-diagonal packed attention;
    see module docstring."""
    return _call_fwd(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1,
                     bf1, w2, bf2, s2, b2, nhead, rate, act, training,
                     block, interpret)


def _call_fwd(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1, w2,
              bf2, s2, b2, nhead, rate, act, training, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, d = x.shape
    ff = w1.shape[1]
    assert d % 128 == 0 and S <= 128 and d % nhead == 0, (S, d, nhead)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)

    def blk3(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    y = pl.pallas_call(
        functools.partial(_fwd_kernel, nhead=nhead, rate=rate, act=act,
                          training=training, block=block, b_total=B,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-B // BT),),
            in_specs=[pl.BlockSpec((BT, S, d), blk3),
                      pl.BlockSpec((BT, 1, S), blk3)] + _pspecs(d, ff),
            out_specs=pl.BlockSpec((BT, S, d), blk3),
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, d), x.dtype),
        compiler_params=_cparams(interpret),
        interpret=interpret,
    )(seed, x, valid[:, None, :], wqkv, _p2d(bqkv), wout, _p2d(bout),
      _p2d(s1), _p2d(b1), w1, _p2d(bf1), w2, _p2d(bf2), _p2d(s2), _p2d(b2))
    return y


def _fwd_rule(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1, w2,
              bf2, s2, b2, nhead, rate, act, training, block, interpret):
    y = _call_fwd(x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1,
                  w2, bf2, s2, b2, nhead, rate, act, training, block,
                  interpret)
    return y, (x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1, w2,
               bf2, s2, b2)


def _bwd_rule(nhead, rate, act, training, block, interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (x, valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1, w2, bf2, s2,
     b2) = res
    B, S, d = x.shape
    ff = w1.shape[1]
    seeds = jnp.asarray(seed, jnp.int32).reshape(1)

    def blk3(i, *_):
        return (i, 0, 0)

    def blk2(i, *_):
        return (i, 0)

    def pin(i, *_):
        return (0, 0)

    accs = [
        ((d, 3 * d)), ((1, 3 * d)), ((d, d)), ((1, d)), ((1, d)), ((1, d)),
        ((d, ff)), ((1, ff)), ((ff, d)), ((1, d)), ((1, d)), ((1, d)),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nhead=nhead, rate=rate, act=act,
                          training=training, block=block, b_total=B,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-B // BT),),
            in_specs=[pl.BlockSpec((BT, S, d), blk3),
                      pl.BlockSpec((BT, 1, S), blk3)] + _pspecs(d, ff)
            + [pl.BlockSpec((BT, S, d), blk3)],
            out_specs=[pl.BlockSpec((BT, S, d), blk3)]
            + [pl.BlockSpec(shape, pin) for shape in accs],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, S, d), x.dtype)]
        + [jax.ShapeDtypeStruct(shape, jnp.float32) for shape in accs],
        compiler_params=_cparams(interpret),
        interpret=interpret,
    )(seeds, x, valid[:, None, :], wqkv, _p2d(bqkv), wout, _p2d(bout),
      _p2d(s1), _p2d(b1), w1, _p2d(bf1), w2, _p2d(bf2), _p2d(s2), _p2d(b2),
      g)
    (dx, dwqkv, dbqkv, dwout, dbout, ds1, db1, dw1, dbf1, dw2, dbf2, ds2,
     db2) = outs
    return (dx, None, None,
            dwqkv.astype(wqkv.dtype), dbqkv[0].astype(bqkv.dtype),
            dwout.astype(wout.dtype), dbout[0].astype(bout.dtype),
            ds1[0].astype(s1.dtype), db1[0].astype(b1.dtype),
            dw1.astype(w1.dtype), dbf1[0].astype(bf1.dtype),
            dw2.astype(w2.dtype), dbf2[0].astype(bf2.dtype),
            ds2[0].astype(s2.dtype), db2[0].astype(b2.dtype))


fused_transformer_layer.defvjp(_fwd_rule, _bwd_rule)
