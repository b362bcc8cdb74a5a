"""Fused dense aggregation with IN-KERNEL edge-embedding lookup.

The strided one-hot-matmul aggregation (ops/dense_mp.py) is scatter-free,
but per GIN/GCN layer it still moves the [G, Em, d] edge-embedding tensor
(the BondEncoder output, ~200 MB at flagship shapes) through HBM in the
forward AND its cotangent in the backward — profiled at ~14 ms of the
80.9 ms flagship step while the bond vocabulary is 13 rows. This kernel
consumes the RAW integer edge features instead: a tile of graphs stays
resident in VMEM and

  out[g] = one_hot(dst_g)^T @ ( w_g * relu( one_hot(src_g) @ x_g
                                            + multi_hot(attr_g) @ T ) )

where T is the CONCATENATED per-feature embedding table ([sum(dims), d],
padded to 128 rows — it rides in VMEM across all grid steps) and
multi_hot(attr)[e, v] = sum_f 1[v == offset_f + attr_f(e)], so the
embedding lookup is one tiny matmul and its backward is an accumulated
matmul into the table — the [G, Em, d] tensor never exists. The earlier
fused kernel (dense_agg.py) lost to XLA at bf16 because it forced
f32-internal HIGHEST matmuls; here matmuls run in the NATIVE dtype
(DEFAULT precision for bf16 = single-pass MXU, HIGHEST for f32 = the
exactness contract) — one-hot/multi-hot operands are exact in any dtype.

Replaces the torch-scatter + nn.Embedding role of the reference's conv
message path (/root/reference/modules/conv.py:10-36 with
ogb mol_encoder.BondEncoder) for the dense layout; parity-tested against
ops/dense_mp.py + nn.encoders.BondEncoder in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GT = 16   # graphs per grid step
QK_CAP = 128  # max packed contraction K = QG*Sm (one-hot build cost grows
              # linearly with it, MXU efficiency saturates at 128)
VP = 128  # padded concatenated-vocab rows (lane alignment of the multi-hot)


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _multi_hot(attr, vp, dtype):
    """attr [GT, F, Em] (pre-clipped, offset-folded) -> [GT, Em, vp] with
    one 1 per feature column."""
    nf = attr.shape[1]
    em = attr.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (attr.shape[0], em, vp), 2)
    m = None
    for f in range(nf):
        # explicit slice+expand — advanced indexing with a mixed int/None
        # subscript lowers as an (unsupported) gather in Mosaic
        af = jax.lax.squeeze(
            jax.lax.slice_in_dim(attr, f, f + 1, axis=1), (1,))  # [GT, Em]
        hit = (jnp.expand_dims(af, 2) == iota).astype(dtype)
        m = hit if m is None else m + hit
    return m


def _range_mask(emask, g_total):
    """emask [GT, Em] (any dtype) -> f32 0/1 with rows past the ragged
    grid tail zeroed: the grid may overrun G, OOB loads are undefined, so
    nothing may trust them. Downstream maskings use NaN-safe where-selects
    (garbage can be NaN, and 0*NaN = NaN would pollute the accumulated
    table gradient)."""
    from jax.experimental import pallas as pl

    gt = emask.shape[0]
    base = pl.program_id(0) * gt
    gi = jax.lax.broadcasted_iota(jnp.int32, emask.shape, 0) + base
    return emask.astype(jnp.float32) * (gi < g_total).astype(jnp.float32)


def _qg(gt, sm):
    """Graphs packed per matmul group: the per-graph one-hot contraction is
    K = Sm (e.g. 32 -> ~25%% MXU ceiling); packing QG graphs block-diagonally
    lifts K to QG*Sm (<= 256) with 3-D dim0/1 reshapes only (free in
    row-major — no 2-D retiling, which Mosaic would have to shuffle)."""
    qg = 1
    while qg * 2 <= gt and gt % (qg * 2) == 0 and (qg * 2) * sm <= QK_CAP:
        qg *= 2
    return qg


def _grp(t, qg):
    """[GT, A, B] -> [GT/qg, qg*A, B] (merge dims 0,1 — free)."""
    g, a, b = t.shape
    return t.reshape(g // qg, qg * a, b)


def _ungrp(t, qg):
    """[GT/qg, qg*A, B] -> [GT, A, B] (split dim 1 back — free)."""
    g4, a4, b = t.shape
    return t.reshape(g4 * qg, a4 // qg, b)


def _one_hot_grouped(idx, emask, sm, qg, dtype):
    """[GT, Em] indices -> grouped block-diagonal one-hot
    [GT/qg, qg*Em, qg*Sm]: graph g's edges hit columns (g%%qg)*Sm + idx."""
    gt = idx.shape[0]
    gl = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    idx4 = idx + (gl % qg) * sm
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (qg * sm,), 2)
    oh = (jnp.expand_dims(idx4, 2) == iota).astype(dtype)
    oh = oh * emask.astype(jnp.float32)[..., None].astype(dtype)
    return _grp(oh, qg)


def _zero_oob_rows(t, g_total):
    """NaN-safe zeroing of graph rows past the ragged tail: grouped matmuls
    contract across QG graphs, so OOB garbage (NaN in interpret mode,
    arbitrary on chip) would leak into valid graphs via 0*NaN."""
    from jax.experimental import pallas as pl

    gt = t.shape[0]
    base = pl.program_id(0) * gt
    gi = jax.lax.broadcasted_iota(jnp.int32, (gt, 1, 1), 0) + base
    return jnp.where(gi < g_total, t, jnp.zeros_like(t))


def _messages(x, src, emask, attr, tbl, sm, qg):
    dt = x.dtype
    prec = _prec(dt)
    oh_src = _one_hot_grouped(src, emask, sm, qg, dt)  # [GT/qg,qg*Em,qg*Sm]
    mh = _grp(_multi_hot(attr, tbl.shape[0], dt), qg)  # [GT/qg,qg*Em,VP]
    emb = jax.lax.dot_general(
        mh, tbl, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    xg = _grp(x, qg)                                   # [GT/qg,qg*Sm,d]
    xs = jax.lax.dot_general(
        oh_src, xg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)
    return oh_src, mh, _ungrp(xs + emb, qg)            # pre: [GT,Em,d]


def _fwd_kernel(x_ref, src_ref, dst_ref, emask_ref, attr_ref, tbl_ref, w_ref,
                scale_ref, out_ref, *, relu: bool, has_w: bool,
                prologue: bool, g_total: int):
    x = x_ref[...]
    dt = x.dtype
    emask = _range_mask(emask_ref[...], g_total)
    x = _zero_oob_rows(x, g_total)
    sm = x.shape[1]
    qg = _qg(x.shape[0], sm)
    _, _, pre = _messages(x, src_ref[...], emask, attr_ref[...], tbl_ref[...],
                          sm, qg)
    m = jnp.maximum(pre, 0) if relu else pre
    if has_w:
        m = m * w_ref[...].astype(jnp.float32)[..., None]
    m = jnp.where(emask[..., None] > 0, m, 0.0)
    oh_dst = _one_hot_grouped(dst_ref[...], emask, sm, qg, dt)
    out = _ungrp(jax.lax.dot_general(
        oh_dst, _grp(m.astype(dt), qg), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_prec(dt)), qg)                # [GT, Sm, d]
    if prologue:
        # GIN epilogue fused in: out = (1+eps)*x + agg — the aggregation
        # alone never materializes (pad rows of x are zero, so the
        # padded-rows-zero invariant holds)
        out = out + scale_ref[0, 0] * x.astype(jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, src_ref, dst_ref, emask_ref, attr_ref, tbl_ref, w_ref,
                scale_ref, g_ref, dx_ref, dtbl_ref, dw_ref, dscale_ref, *,
                relu: bool, has_w: bool, prologue: bool, g_total: int):
    from jax.experimental import pallas as pl

    x = x_ref[...]
    dt = x.dtype
    emask = _range_mask(emask_ref[...], g_total)
    x = _zero_oob_rows(x, g_total)
    sm = x.shape[1]
    qg = _qg(x.shape[0], sm)
    prec = _prec(dt)
    oh_src, mh, pre = _messages(x, src_ref[...], emask, attr_ref[...],
                                tbl_ref[...], sm, qg)
    oh_dst = _one_hot_grouped(dst_ref[...], emask, sm, qg, dt)
    gz = _zero_oob_rows(g_ref[...], g_total)
    # dmsg = one_hot(dst) @ gout (invalid-edge rows are zero via the masked
    # one-hot, so dw/dtbl are implicitly edge-masked)
    dmsg = _ungrp(jax.lax.dot_general(
        oh_dst, _grp(gz, qg),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec), qg)  # [GT,Em,d]
    if has_w:
        m0 = jnp.maximum(pre, 0) if relu else pre
        dw_ref[...] = jnp.sum(dmsg * m0, axis=-1).astype(dw_ref.dtype)
        dmsg = dmsg * w_ref[...].astype(jnp.float32)[..., None]
    if relu:
        dmsg = jnp.where(pre > 0, dmsg, 0.0)
    dmsg = jnp.where(emask[..., None] > 0, dmsg, 0.0).astype(dt)
    dmsg_g = _grp(dmsg, qg)                          # [GT/qg, qg*Em, d]
    dx = _ungrp(jax.lax.dot_general(
        oh_src, dmsg_g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec), qg)                         # [GT, Sm, d]
    if prologue:
        dx = dx + scale_ref[0, 0] * gz.astype(jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # table grad accumulates across grid steps in the revisited f32 block
    dtp = jax.lax.dot_general(
        mh, dmsg_g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [GT/qg,Vp,d]
    dtp = jnp.sum(dtp, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dtbl_ref[...] = jnp.zeros_like(dtbl_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)

    dtbl_ref[...] += dtp
    if prologue:
        # d(scale) = sum g .* x — OOB rows are zeroed in both operands, pad
        # rows of x are zero, so the sum covers exactly the valid entries
        part = jnp.sum(gz.astype(jnp.float32) * x.astype(jnp.float32))
        dscale_ref[...] += jnp.broadcast_to(part, dscale_ref.shape)


def _specs(G, Sm, Em, F, Vp, d, n_extra):
    from jax.experimental import pallas as pl

    node = pl.BlockSpec((GT, Sm, d), lambda i: (i, 0, 0))
    edge = pl.BlockSpec((GT, Em), lambda i: (i, 0))
    attr = pl.BlockSpec((GT, F, Em), lambda i: (i, 0, 0))
    tblb = pl.BlockSpec((Vp, d), lambda i: (0, 0))
    scb = pl.BlockSpec((8, 128), lambda i: (0, 0))
    return [node, edge, edge, edge, attr, tblb, edge, scb] + [node] * n_extra


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_gin_agg(xd, src, dst, emask, attr, tbl, w, scale,
                  relu: bool = True, prologue: bool = False,
                  interpret: bool = False):
    """xd [G,Sm,d]; src/dst/emask [G,Em]; attr [G,F,Em] int32 pre-clipped
    with per-feature vocab offsets folded in; tbl [VP,d] concatenated
    (zero-padded) embedding tables; w [G,Em] or None -> [G,Sm,d].
    With prologue=True, `scale` (a traced f32 scalar, typically 1+eps)
    fuses the GIN combine: returns scale*xd + agg instead of agg alone
    (reference /root/reference/modules/conv.py:26-36's (1+eps)x + sum).
    The graph axis may be ragged (in-kernel range masking — no pads)."""
    if tbl.shape[0] != VP:
        raise ValueError(f"tbl must be padded to {VP} rows, got {tbl.shape}")
    return _call_fwd(xd, src, dst, emask, attr, tbl, w, scale, relu,
                     prologue, interpret)


def _scale_arr(scale):
    s = jnp.asarray(0.0 if scale is None else scale, jnp.float32)
    return jnp.broadcast_to(s, (8, 128))


def _call_fwd(xd, src, dst, emask, attr, tbl, w, scale, relu, prologue,
              interpret):
    from jax.experimental import pallas as pl

    G, Sm, d = xd.shape
    Em = src.shape[1]
    F = attr.shape[1]
    has_w = w is not None
    wa = w if has_w else jnp.zeros((G, Em), xd.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, relu=relu, has_w=has_w,
                          prologue=prologue, g_total=G),
        grid=(-(-G // GT),),
        in_specs=_specs(G, Sm, Em, F, VP, d, 0),
        out_specs=pl.BlockSpec((GT, Sm, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, Sm, d), xd.dtype),
        interpret=interpret,
    )(xd, src, dst, emask, attr, tbl, wa, _scale_arr(scale))


def _call_bwd(xd, src, dst, emask, attr, tbl, w, scale, gout, relu,
              prologue, interpret):
    from jax.experimental import pallas as pl

    G, Sm, d = xd.shape
    Em = src.shape[1]
    F = attr.shape[1]
    has_w = w is not None
    wa = w if has_w else jnp.zeros((G, Em), xd.dtype)
    dx, dtbl, dw, dsc = pl.pallas_call(
        functools.partial(_bwd_kernel, relu=relu, has_w=has_w,
                          prologue=prologue, g_total=G),
        grid=(-(-G // GT),),
        in_specs=_specs(G, Sm, Em, F, VP, d, 1),
        out_specs=[
            pl.BlockSpec((GT, Sm, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((VP, d), lambda i: (0, 0)),
            pl.BlockSpec((GT, Em), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Sm, d), xd.dtype),
            jax.ShapeDtypeStruct((VP, d), jnp.float32),
            jax.ShapeDtypeStruct((G, Em), wa.dtype),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(xd, src, dst, emask, attr, tbl, wa, _scale_arr(scale), gout)
    dscale = None
    if prologue:
        dscale = dsc[0, 0].astype(
            jnp.float32 if scale is None else jnp.asarray(scale).dtype)
    return dx, dtbl.astype(tbl.dtype), (dw if has_w else None), dscale


def _fwd_rule(xd, src, dst, emask, attr, tbl, w, scale, relu, prologue,
              interpret):
    out = _call_fwd(xd, src, dst, emask, attr, tbl, w, scale, relu,
                    prologue, interpret)
    return out, (xd, src, dst, emask, attr, tbl, w, scale)


def _bwd_rule(relu, prologue, interpret, res, gout):
    xd, src, dst, emask, attr, tbl, w, scale = res
    dx, dtbl, dw, dscale = _call_bwd(xd, src, dst, emask, attr, tbl, w,
                                     scale, gout, relu, prologue, interpret)
    return dx, None, None, None, None, dtbl, dw, dscale


fused_gin_agg.defvjp(_fwd_rule, _bwd_rule)
