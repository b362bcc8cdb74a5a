"""Blocked-CSR one-hot SpMM — the flat-path aggregation kernel.

out[dst] += msg(x[src], emb_e) over dst-sorted padded edges, decomposed
into (dst_block, src_block) pairs of 128 node rows (ops/block_plan.py).
Per chunk the gather AND the scatter are 128-wide one-hot matmuls — the
MXU formulation proven by ops/pallas/gin_agg.py for the per-graph dense
layout, generalized to graphs of ANY size: the one-hot contraction width
is the block size (128), not the graph's node count, so code2-scale ASTs
pay the same FLOP inflation as molecules.

Forward runs the dst-major plan: chunks grouped by out block, the
accumulator block stays VMEM-resident across its consecutive chunks
(first-visit zero-init via the is_first prefetch flag). Backward is two
passes: d_emb in dst-major order (dmsg = one_hot(dst) @ g, written
linearly per chunk), dx in SRC-major order (the CSC twin — dx[j] must
accumulate consecutively, so the dx kernel runs the src-major plan with
x/g roles swapped and the ReLU mask recomputed from the src-ordered edge
embedding copy; that copy's cotangent is zero — the dst-order copy
carries the full d_emb, and both come from the same encoder so the sum
is exact). Edge weights (GCN's degree norm) are structural constants,
not functions of learnables — this wrapper stop_gradients them and no
dw pass exists.

Replaces the torch-scatter / MessagePassing.propagate role
(/root/reference/modules/conv.py:26-36) for flat-layout batches on TPU;
parity-tested against ops/scatter.gather_message_scatter in interpret
mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..block_plan import EB, NB


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _one_hot(loc, mask, dt):
    """[EB] int32 rows-in-block + [EB] f32 mask -> [EB, NB] one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], NB), 1)
    oh = (loc[:, None] == iota).astype(jnp.float32) * mask[:, None]
    return oh.astype(dt)


def _gather(oh, blk, dt):
    """[EB, NB] one-hot @ [NB, d] block -> [EB, d] f32."""
    return jax.lax.dot_general(
        oh, blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(dt))


def _scatter(oh, rows, dt):
    """[EB, NB]^T one-hot @ [EB, d] rows -> [NB, d] f32."""
    return jax.lax.dot_general(
        oh, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(dt))


def _fwd_kernel(bo_ref, bi_ref, first_ref, x_ref, locin_ref, locout_ref,
                mask_ref, emb_ref, w_ref, out_ref, *, message, has_w):
    from jax.experimental import pallas as pl

    c = pl.program_id(0)
    dt = x_ref.dtype
    mask = mask_ref[0, 0]                              # [EB] f32
    oh_in = _one_hot(locin_ref[0, 0], mask, dt)        # [EB, NB]
    pre = _gather(oh_in, x_ref[0], dt) + emb_ref[0].astype(jnp.float32)
    m = jnp.maximum(pre, 0.0) if message == "relu_add" else pre
    if has_w:
        m = m * w_ref[0, 0].astype(jnp.float32)[:, None]
    m = jnp.where(mask[:, None] > 0, m, 0.0)
    oh_out = _one_hot(locout_ref[0, 0], mask, dt)
    part = _scatter(oh_out, m.astype(dt), dt)       # [NB, d]

    @pl.when(first_ref[c] == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part[None].astype(out_ref.dtype)


def _demb_kernel(bo_ref, bi_ref, first_ref, x_ref, g_ref, locin_ref,
                 locout_ref, mask_ref, emb_ref, w_ref, demb_ref, *,
                 message, has_w):
    """dst-major: dmsg_e = (one_hot(dst) @ g)[e] * w * relu'(pre), written
    linearly per chunk — the full per-edge embedding cotangent."""
    dt = x_ref.dtype
    mask = mask_ref[0, 0]
    oh_out = _one_hot(locout_ref[0, 0], mask, dt)
    dmsg = _gather(oh_out, g_ref[0], dt)            # [EB, d]
    if has_w:
        dmsg = dmsg * w_ref[0, 0].astype(jnp.float32)[:, None]
    if message == "relu_add":
        oh_in = _one_hot(locin_ref[0, 0], mask, dt)
        pre = _gather(oh_in, x_ref[0], dt) + emb_ref[0].astype(jnp.float32)
        dmsg = jnp.where(pre > 0, dmsg, 0.0)
    dmsg = jnp.where(mask[:, None] > 0, dmsg, 0.0)
    demb_ref[...] = dmsg[None].astype(demb_ref.dtype)


def _dx_kernel(bo_ref, bi_ref, first_ref, g_ref, x_ref, locin_ref,
               locout_ref, mask_ref, emb_ref, w_ref, dx_ref, *, message,
               has_w):
    """src-major: out block = dx[src block] (accumulates consecutively),
    in block = g[dst block]; loc_out = src row, loc_in = dst row. x is read
    at the MAJOR (src) block to recompute the ReLU mask with the src-order
    emb copy."""
    from jax.experimental import pallas as pl

    c = pl.program_id(0)
    dt = g_ref.dtype
    mask = mask_ref[0, 0]
    oh_dst = _one_hot(locin_ref[0, 0], mask, dt)
    oh_src = _one_hot(locout_ref[0, 0], mask, dt)
    dmsg = _gather(oh_dst, g_ref[0], dt)            # [EB, d]
    if has_w:
        dmsg = dmsg * w_ref[0, 0].astype(jnp.float32)[:, None]
    if message == "relu_add":
        pre = _gather(oh_src, x_ref[0], dt) + emb_ref[0].astype(jnp.float32)
        dmsg = jnp.where(pre > 0, dmsg, 0.0)
    dmsg = jnp.where(mask[:, None] > 0, dmsg, 0.0)
    part = _scatter(oh_src, dmsg.astype(dt), dt)    # [NB, d]

    @pl.when(first_ref[c] == 1)
    def _init():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    dx_ref[...] += part[None].astype(dx_ref.dtype)


def _call(kernel, plan, node_arrs, w, emb, out_shape, message, has_w,
          interpret, linear_out=False):
    """node_arrs: list of ([NBLK, NB, d] array, 'in'|'out') — 'in' blocks
    index by blk_in, 'out' by blk_out. Edge operands ride chunk-indexed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = out_shape[-1]
    C = plan["blk_out"].shape[0]

    def node_spec(by):
        if by == "in":
            return pl.BlockSpec((1, NB, d),
                                lambda c, bo, bi, first: (bi[c], 0, 0))
        return pl.BlockSpec((1, NB, d),
                            lambda c, bo, bi, first: (bo[c], 0, 0))

    edge2 = pl.BlockSpec((1, 1, EB), lambda c, bo, bi, first: (c, 0, 0))
    edge3 = pl.BlockSpec((1, EB, d), lambda c, bo, bi, first: (c, 0, 0))
    in_specs = [node_spec(by) for _, by in node_arrs]
    in_specs += [edge2, edge2, edge2, edge3, edge2]
    args = [a for a, _ in node_arrs]
    def _r3(a):
        return a.reshape(a.shape[0], 1, a.shape[1])

    args += [_r3(plan["loc_in"]), _r3(plan["loc_out"]),
             _r3(plan["mask"]), emb, _r3(w)]
    if linear_out:
        out_spec = pl.BlockSpec((1, EB, d),
                                lambda c, bo, bi, first: (c, 0, 0))
    else:
        out_spec = pl.BlockSpec((1, NB, d),
                                lambda c, bo, bi, first: (bo[c], 0, 0))
    return pl.pallas_call(
        functools.partial(kernel, message=message, has_w=has_w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(C,),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, node_arrs[0][0].dtype),
        interpret=interpret,
    )(plan["blk_out"], plan["blk_in"], plan["is_first"], *args)


def blocked_gather_message_scatter(x, emb_fwd, emb_bwd, plan_fwd, plan_bwd,
                                   w_fwd=None, w_bwd=None,
                                   message: str = "relu_add",
                                   interpret: bool = False):
    """x [N, d] (N % 128 == 0); emb_fwd/emb_bwd [C*EB, d] edge embeddings
    in dst-major / src-major chunk order; plans from
    ops/block_plan.build_block_plan (as device arrays); w_* [C*EB] or None
    (stop-gradiented here — edge weights are structural). Returns [N, d]
    with gather_message_scatter semantics."""
    d = x.shape[1]
    Cf = plan_fwd["blk_out"].shape[0]
    Cb = plan_bwd["blk_out"].shape[0]
    has_w = w_fwd is not None
    wf = (jax.lax.stop_gradient(w_fwd).astype(jnp.float32).reshape(Cf, EB)
          if has_w else jnp.zeros((Cf, EB), jnp.float32))
    wb = (jax.lax.stop_gradient(w_bwd).astype(jnp.float32).reshape(Cb, EB)
          if has_w else jnp.zeros((Cb, EB), jnp.float32))
    return _spmm(x, emb_fwd.reshape(Cf, EB, d), emb_bwd.reshape(Cb, EB, d),
                 wf, wb, plan_fwd, plan_bwd, message, has_w, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _spmm(x, emb_fwd, emb_bwd, wf, wb, plan_fwd, plan_bwd, message, has_w,
          interpret):
    N, d = x.shape
    assert N % NB == 0, (N, NB)
    xb = x.reshape(N // NB, NB, d)
    out = _call(_fwd_kernel, plan_fwd, [(xb, "in")], wf, emb_fwd,
                (N // NB, NB, d), message, has_w, interpret)
    return out.reshape(N, d)


def _spmm_fwd(x, emb_fwd, emb_bwd, wf, wb, plan_fwd, plan_bwd, message,
              has_w, interpret):
    out = _spmm(x, emb_fwd, emb_bwd, wf, wb, plan_fwd, plan_bwd, message,
                has_w, interpret)
    return out, (x, emb_fwd, emb_bwd, wf, wb, plan_fwd, plan_bwd)


def _spmm_bwd(message, has_w, interpret, res, g):
    x, emb_fwd, emb_bwd, wf, wb, plan_fwd, plan_bwd = res
    N, d = x.shape
    xb = x.reshape(N // NB, NB, d)
    gb = g.reshape(N // NB, NB, d)
    Cf = emb_fwd.shape[0]
    demb = _call(_demb_kernel, plan_fwd, [(xb, "in"), (gb, "out")], wf,
                 emb_fwd, (Cf, EB, d), message, has_w, interpret,
                 linear_out=True)
    dx = _call(_dx_kernel, plan_bwd, [(gb, "in"), (xb, "out")], wb,
               emb_bwd, (N // NB, NB, d), message, has_w, interpret)
    # emb_bwd's cotangent is zero by construction (the dst-order copy
    # carries the full d_emb); w/plan args are structural constants
    return (dx.reshape(N, d), demb.astype(emb_fwd.dtype), None, None, None,
            None, None)


_spmm.defvjp(_spmm_fwd, _spmm_bwd)
