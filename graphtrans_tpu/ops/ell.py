"""ELL-layout segment max/min — the two reductions no one-hot matmul can
express.

PNA's aggregator zoo (mean/max/min/std over tower messages) lowered to
row-serialized XLA scatters on the flat path — profiled at ~350 ms of the
674 ms PNA-transformer code2 step (min/max 16 ms EACH per layer). The fix
has two parts:

1. PNA's pre-linear message is LINEAR in (x_center, x_neighbor):
   msg = W_i x_i + W_j x_j + b = xiproj[dst] + xjproj[src]. So
   sum/mean are segment sums of the NODE-level xjproj (the existing
   scatter-free one-hot matmuls, ops/scatter_free.py), and
   var(xiproj + xjproj[src]) = var(xjproj[src]) — std needs only the
   segment sums of xjproj and xjproj^2. max/min split as
   xiproj + segment_max/min(xjproj). All of that plumbing lives in
   nn/pna.py; no per-slot [E, C] message tensor ever exists for them.

2. This module supplies the remaining piece: segment max/min of per-node
   values over incoming edges, in ELLPACK layout
   (ops/block_plan.build_ell_plan: node n's slots [n*K, n*K+deg)).

LAYOUT LESSON (round 3, measured): the [N, K, C] gathered tensor must
NEVER materialize. K separate [N]-row gathers with a RUNNING reduce
measure 4.1 ms vs 11.1 ms for the one-shot [N,K,C] gather+reduce at
[N=82k, K=8, C=272] bf16 — XLA fuses each row gather straight into its
elementwise consumer, so the slot tensor never touches HBM. Tie counts
update in the SAME running pass (new-max resets the count, equal-max
increments), eliminating round 2's second count traversal; the backward
walks the src-major twin's K columns the same way, pulling ONE packed
[N, 4C] node array (mx|mn|gmx/cnt|gmn/cnt) per column. Tie-splitting stays
by VALUE (grad/count — order-independent, unlike argmax picking).

Replaces torch_scatter's min/max role
(/root/reference/modules/pna/aggregators.py:17-24); parity-tested against
ops/segment.segment_max/min through nn/pna.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30
_UNROLL_K = 16  # python-unroll small K (full fusion); fori_loop beyond


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ell_minmax(vals, plan_dst, plan_src, k_in: int, k_out: int):
    """vals [N, C] per-node values -> (mx, mn) [N, C] over each node's
    incoming neighbors (empty rows -> 0, matching segment_max/min's fill).
    plans from ops/block_plan.build_ell_plan (dst-major + src-major)."""
    out, _ = _fwd(vals, plan_dst, plan_src, k_in, k_out)
    return out


def _k_loop(k, carry, body):
    """Run body(j, carry) for j in [0, k): unrolled for small k (lets XLA
    fuse every gather into its consumer), fori_loop for large k (bounded
    HLO size; each iteration is bandwidth-bound so loop overhead is noise)."""
    if k <= _UNROLL_K:
        for j in range(k):
            carry = body(j, carry)
        return carry
    return jax.lax.fori_loop(0, k, body, carry)


def _col(plan, k, N, j):
    """Slot column j of an [N*k] plan field (works for traced j)."""
    idx = plan["other_g"].reshape(N, k)
    msk = plan["mask"].reshape(N, k)
    if isinstance(j, int):
        return idx[:, j], msk[:, j]
    return (jax.lax.dynamic_index_in_dim(idx, j, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(msk, j, 1, keepdims=False))


def _fwd(vals, plan_dst, plan_src, k_in, k_out):
    N, C = vals.shape
    big = jnp.asarray(_BIG, vals.dtype)
    one = jnp.ones((), vals.dtype)

    def body(j, carry):
        mx, cmx, mn, cmn, deg = carry
        idx, m = _col(plan_dst, k_in, N, j)
        g = jnp.take(vals, idx, axis=0)                  # [N, C], fused
        mcol = m[:, None] > 0
        gx = jnp.where(mcol, g, -big)
        gn = jnp.where(mcol, g, big)
        new_hi = gx > mx
        tie_hi = mcol & (gx == mx)
        cmx = jnp.where(new_hi, one, jnp.where(tie_hi, cmx + one, cmx))
        mx = jnp.maximum(mx, gx)
        new_lo = gn < mn
        tie_lo = mcol & (gn == mn)
        cmn = jnp.where(new_lo, one, jnp.where(tie_lo, cmn + one, cmn))
        mn = jnp.minimum(mn, gn)
        deg = deg + m[:, None].astype(vals.dtype)
        return mx, cmx, mn, cmn, deg

    init = (jnp.full((N, C), -big, vals.dtype),
            jnp.ones((N, C), vals.dtype),
            jnp.full((N, C), big, vals.dtype),
            jnp.ones((N, C), vals.dtype),
            jnp.zeros((N, 1), vals.dtype))
    mx, cmx, mn, cmn, deg = _k_loop(k_in, init, body)
    has = deg > 0
    mx = jnp.where(has, mx, 0.0)
    mn = jnp.where(has, mn, 0.0)
    return (mx, mn), (vals, mx, mn, cmx, cmn)


def _fwd_rule(vals, plan_dst, plan_src, k_in, k_out):
    out, res = _fwd(vals, plan_dst, plan_src, k_in, k_out)
    return out, res + (plan_dst, plan_src)


def _bwd_rule(k_in, k_out, res, gs):
    vals, mx, mn, cnt_mx, cnt_mn, plan_dst, plan_src = res
    g_mx, g_mn = gs
    N, C = vals.shape

    # node-level packed pull source: one [N, 4C] array so each src-major
    # slot column is ONE fused row gather (compare keys + pre-divided
    # cotangents travel together)
    packed = jnp.concatenate(
        [mx, mn, (g_mx / cnt_mx).astype(vals.dtype),
         (g_mn / cnt_mn).astype(vals.dtype)], axis=1)

    def body(j, dv):
        idx, m = _col(plan_src, k_out, N, j)
        p = jnp.take(packed, idx, axis=0)                # [N, 4C], fused
        mxj = jax.lax.slice_in_dim(p, 0, C, axis=1)
        mnj = jax.lax.slice_in_dim(p, C, 2 * C, axis=1)
        gxj = jax.lax.slice_in_dim(p, 2 * C, 3 * C, axis=1)
        gnj = jax.lax.slice_in_dim(p, 3 * C, 4 * C, axis=1)
        contrib = (gxj * (vals == mxj).astype(vals.dtype)
                   + gnj * (vals == mnj).astype(vals.dtype))
        return dv + contrib * m[:, None].astype(vals.dtype)

    dv = _k_loop(k_out, jnp.zeros((N, C), vals.dtype), body)
    return (dv.astype(vals.dtype), None, None)


ell_minmax.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# ell_multi: PNA's WHOLE aggregator family in one K-column pass.
#
# The round-3 profile showed the scatter-free sums were paying a 14 ms
# MATERIALIZED [L, C] slot gather per call (the one-hot dot forces its
# operand into HBM; a bare fused gather of the same bytes is ~3.6 ms) — and
# PNA needs sum(xj), sum(xj^2) AND min/max of the SAME xjproj rows. Here one
# running loop shares each column's row gather across s1/s2/max/min/counts/
# deg. The per-edge backward term is
#   dv[v] = sum_c  g1[c] + 2*vals[v]*g2[c]
#           + gmx_c[c]*(vals[v]==mx[c]) + gmn_c[c]*(vals[v]==mn[c])
# Sums accumulate in f32 (bf16 running sums would lose ~2 digits over K).
#
# BACKWARD ROUTE (round 4, measured): when the batch also carries the
# src-major sfa scatter plan (it always does on the production PNA route —
# ELL plans require _sfa_route), the backward runs in SLOT order instead of
# K src-major node columns: gather the 6 center arrays per edge slot
# (L ≈ 1.4·E slots vs k_out·N column rows — at code2 shapes K=8 against
# mean degree 2.8, so the column walk reads ~3.3x the bytes, 70% of them
# masked padding), compute the per-edge term elementwise (every gather
# fuses into it), and reduce onto src rows with the existing one-hot block
# matmul (ops/scatter_free._block_matmul — f32 accumulation, no scatter).
# This also kills the packed [N, 6C] concat+select the column walk needed
# to keep its gathers fused (measured ~14 ms/layer of copy+select alone).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def ell_multi(vals, plan_dst, plan_src, sfa_src, k_in: int, k_out: int,
              want_sumsq: bool = True, want_minmax: bool = True,
              nb: int = 0):
    """vals [N, C] -> (s1, s2, mx, mn), each [N, C] (s2/mx/mn are None when
    not requested). s1 = per-node sum of incoming-neighbor rows, s2 the sum
    of their squares; mx/mn as ell_minmax (empty rows -> 0). sfa_src (the
    src-major scatter plan from plan_expand.sfa_plans, with its nb) routes
    the backward through slot order — pass None to fall back to the
    src-major ELL column walk."""
    out, _ = _multi_fwd(vals, plan_dst, plan_src, k_in, k_out,
                        want_sumsq, want_minmax)
    return out


def _multi_fwd(vals, plan_dst, plan_src, k_in, k_out, want_sumsq,
               want_minmax):
    N, C = vals.shape
    big = jnp.asarray(_BIG, vals.dtype)
    one = jnp.ones((), vals.dtype)

    def body(j, carry):
        s1, s2, mx, cmx, mn, cmn = carry
        idx, m = _col(plan_dst, k_in, N, j)
        g = jnp.take(vals, idx, axis=0)                  # [N, C], fused
        mcol = m[:, None] > 0
        gz = jnp.where(mcol, g, 0).astype(jnp.float32)
        s1 = s1 + gz
        if want_sumsq:
            s2 = s2 + gz * gz
        if want_minmax:
            gx = jnp.where(mcol, g, -big)
            gn = jnp.where(mcol, g, big)
            new_hi = gx > mx
            tie_hi = mcol & (gx == mx)
            cmx = jnp.where(new_hi, one, jnp.where(tie_hi, cmx + one, cmx))
            mx = jnp.maximum(mx, gx)
            new_lo = gn < mn
            tie_lo = mcol & (gn == mn)
            cmn = jnp.where(new_lo, one, jnp.where(tie_lo, cmn + one, cmn))
            mn = jnp.minimum(mn, gn)
        return s1, s2, mx, cmx, mn, cmn

    zf = jnp.zeros((N, C), jnp.float32)
    init = (zf, zf,
            jnp.full((N, C), -big, vals.dtype), jnp.ones((N, C), vals.dtype),
            jnp.full((N, C), big, vals.dtype), jnp.ones((N, C), vals.dtype))
    s1, s2, mx, cmx, mn, cmn = _k_loop(k_in, init, body)
    deg = jnp.sum(plan_dst["mask"].reshape(N, k_in), axis=1)[:, None]
    has = deg > 0
    s1 = s1.astype(vals.dtype)
    s2 = s2.astype(vals.dtype) if want_sumsq else None
    if want_minmax:
        mx = jnp.where(has, mx, 0.0)
        mn = jnp.where(has, mn, 0.0)
    else:
        mx = mn = None
    return (s1, s2, mx, mn), (vals, mx, mn, cmx, cmn)


def _multi_fwd_rule(vals, plan_dst, plan_src, sfa_src, k_in, k_out,
                    want_sumsq, want_minmax, nb):
    out, res = _multi_fwd(vals, plan_dst, plan_src, k_in, k_out,
                          want_sumsq, want_minmax)
    return out, res + (plan_dst, plan_src, sfa_src)


def _multi_bwd_sfa(nb, want_sumsq, want_minmax, res, gs):
    """Slot-order backward: one fused elementwise pass over the src-major
    sfa slots (each center array gathered by the slot's dst row, the slot's
    own value row node-indexed from the plan geometry), then ONE batched
    one-hot matmul onto the src blocks. See the ell_multi block comment."""
    from .scatter_free import _block_matmul, _one_hot_blocks

    vals, mx, mn, cnt_mx, cnt_mn, plan_dst, plan_src, sfa_src = res
    g1, g2, g_mx, g_mn = gs
    N, C = vals.shape
    dt = vals.dtype

    def z(t):
        return jnp.zeros((N, C), dt) if t is None else t.astype(dt)

    L = sfa_src["mask"].shape[0]
    # nb must be the sfa plan's own block rows: a mismatched (plan, nb) pair
    # would silently compute wrong 'own' src indices and corrupt gradients
    # (nb=0 would divide-by-zero at trace time with a cryptic message)
    if nb <= 0 or N % nb != 0 or L % (N // nb) != 0:
        raise ValueError(
            f"ell_multi slot-order backward: nb={nb} inconsistent with "
            f"N={N}, L={L} (need nb > 0, N % nb == 0, L % (N//nb) == 0 — "
            "pass batch.sfa_nb with the matching sfa_src plan)")
    nblk = N // nb
    eb = L // nblk
    ctr = sfa_src["other_g"]                        # [L] center (dst) row
    own = (jnp.arange(L, dtype=jnp.int32) // eb * nb
           + sfa_src["loc"])                        # [L] the slot's src row

    def take(t):
        return jnp.take(t, ctr, axis=0)             # [L, C], fuses

    v = jnp.take(vals, own, axis=0)                 # [L, C], fuses
    contrib = take(z(g1))
    if want_sumsq:
        contrib = contrib + 2.0 * v * take(z(g2))
    if want_minmax:
        contrib = contrib + (take((z(g_mx) / cnt_mx).astype(dt))
                             * (v == take(mx)).astype(dt)
                             + take((z(g_mn) / cnt_mn).astype(dt))
                             * (v == take(mn)).astype(dt))
    contrib = contrib * sfa_src["mask"][:, None].astype(dt)

    oh = _one_hot_blocks(sfa_src["loc"], nblk, eb, nb, dt)
    dv = _block_matmul(oh, contrib, nblk, eb, nb, C, dt)
    return (dv.astype(dt), None, None, None)


def _multi_bwd_rule(k_in, k_out, want_sumsq, want_minmax, nb, res, gs):
    if res[-1] is not None:  # sfa_src present -> slot-order backward
        return _multi_bwd_sfa(nb, want_sumsq, want_minmax, res, gs)
    vals, mx, mn, cnt_mx, cnt_mn, plan_dst, plan_src, _ = res
    g1, g2, g_mx, g_mn = gs
    N, C = vals.shape
    dt = vals.dtype

    def z(t):
        return jnp.zeros((N, C), dt) if t is None else t.astype(dt)

    parts = [z(g1)]
    if want_sumsq:
        parts.append(z(g2))
    if want_minmax:
        parts += [mx, mn, (z(g_mx) / cnt_mx).astype(dt),
                  (z(g_mn) / cnt_mn).astype(dt)]
    packed = jnp.concatenate(parts, axis=1)

    def body(j, dv):
        idx, m = _col(plan_src, k_out, N, j)
        p = jnp.take(packed, idx, axis=0)                # fused row gather
        o = 0
        g1j = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
        contrib = g1j.astype(jnp.float32)
        if want_sumsq:
            g2j = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
            contrib = contrib + 2.0 * (vals * g2j).astype(jnp.float32)
        if want_minmax:
            mxj = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
            mnj = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
            gxj = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
            gnj = jax.lax.slice_in_dim(p, o, o + C, axis=1); o += C
            contrib = contrib + (gxj * (vals == mxj).astype(dt)
                                 + gnj * (vals == mnj).astype(dt)
                                 ).astype(jnp.float32)
        return dv + contrib * m[:, None].astype(jnp.float32)

    dv = _k_loop(k_out, jnp.zeros((N, C), jnp.float32), body)
    return (dv.astype(dt), None, None, None)


ell_multi.defvjp(_multi_fwd_rule, _multi_bwd_rule)


# ---------------------------------------------------------------------------
# ell_gather_message_scatter: GIN/GCN flat aggregation as ELL columns.
#
# Same layout lesson as ell_multi, applied to sum_{j->i} w * relu(x_j + e_ji)
# (the GIN/GCN message, /root/reference/modules/conv.py:26-71): the
# scatter-free one-hot-dot route forces a MATERIALIZED [L, C] slot gather
# (~14 ms at code2 scale); here each dst-major slot column is one row gather
# fused into its relu/weight/accumulate consumer, with the edge embedding
# read as a contiguous [:, j] stride of the ELL-ordered copy. The backward
# never gathers x for dx: at a src-major slot the VALUE node is the row
# itself, so the relu mask is x + emb_src_ell (node-local), and only the
# output cotangent g is gathered per column. d_emb is computed dst-major
# (the center IS the row — no gather of g at all). Edge weights (GCN norms)
# are structural and stop-gradiented, exactly like ops/scatter_free.py.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def ell_gather_message_scatter(x, emb_d, emb_s, w_d, w_s, plan_dst,
                               plan_src, k_in: int, k_out: int,
                               message: str = "relu_add"):
    """x [N, C]; emb_d/emb_s [N*k, C] edge embeddings in ELL slot order
    (dst-major / src-major); w_d/w_s [N*k] or None -> [N, C] per-node sums
    of (masked, weighted, optionally relu'd) messages over incoming edges."""
    out, _ = _gms_fwd(x, emb_d, emb_s, w_d, w_s, plan_dst, plan_src,
                      k_in, k_out, message)
    return out


def _gms_fwd(x, emb_d, emb_s, w_d, w_s, plan_dst, plan_src, k_in, k_out,
             message):
    N, C = x.shape
    emb3 = None if emb_d is None else emb_d.reshape(N, k_in, C)
    w3 = (None if w_d is None
          else jax.lax.stop_gradient(w_d).reshape(N, k_in).astype(x.dtype))

    def body(j, acc):
        idx, m = _col(plan_dst, k_in, N, j)
        pre = jnp.take(x, idx, axis=0)                   # [N, C], fused
        if emb3 is not None:
            pre = pre + emb3[:, j]
        msg = jnp.maximum(pre, 0) if message == "relu_add" else pre
        if w3 is not None:
            msg = msg * w3[:, j][:, None]
        return acc + jnp.where(m[:, None] > 0, msg, 0).astype(jnp.float32)

    acc = _k_loop(k_in, jnp.zeros((N, C), jnp.float32), body)
    return acc.astype(x.dtype), (x, emb_d, emb_s, w_d, w_s)


def _gms_fwd_rule(x, emb_d, emb_s, w_d, w_s, plan_dst, plan_src, k_in,
                  k_out, message):
    out, res = _gms_fwd(x, emb_d, emb_s, w_d, w_s, plan_dst, plan_src,
                        k_in, k_out, message)
    return out, res + (plan_dst, plan_src)


def _gms_bwd_rule(k_in, k_out, message, res, g):
    x, emb_d, emb_s, w_d, w_s, plan_dst, plan_src = res
    N, C = x.shape
    dt = x.dtype
    relu = message == "relu_add"

    # d_emb in dst-major ELL order: slot (n, j)'s center IS row n, so the
    # cotangent is g itself — only x re-gathers (for the relu mask)
    demb = None
    if emb_d is not None:
        emb3 = emb_d.reshape(N, k_in, C)
        w3d = (None if w_d is None
               else jax.lax.stop_gradient(w_d).reshape(N, k_in).astype(dt))
        cols = []
        for j in range(k_in):
            idx, m = _col(plan_dst, k_in, N, j)
            dm = g if w3d is None else g * w3d[:, j][:, None]
            if relu:
                pre = jnp.take(x, idx, axis=0) + emb3[:, j]
                dm = jnp.where(pre > 0, dm, 0)
            cols.append(jnp.where(m[:, None] > 0, dm, 0))
        demb = jnp.stack(cols, axis=1).reshape(N * k_in, C).astype(dt)

    # dx in src-major ELL order: the value node is the row, so the relu
    # mask is node-local (x + emb_src) and only g gathers
    emb3s = None if emb_s is None else emb_s.reshape(N, k_out, C)
    w3s = (None if w_s is None
           else jax.lax.stop_gradient(w_s).reshape(N, k_out).astype(dt))

    def body(j, dv):
        ctr, m = _col(plan_src, k_out, N, j)
        dm = jnp.take(g, ctr, axis=0)
        if w3s is not None:
            dm = dm * w3s[:, j][:, None]
        if relu:
            pre = x if emb3s is None else x + emb3s[:, j]
            dm = jnp.where(pre > 0, dm, 0)
        return dv + jnp.where(m[:, None] > 0, dm, 0).astype(jnp.float32)

    dv = _k_loop(k_out, jnp.zeros((N, C), jnp.float32), body)
    # emb_src only feeds the backward relu mask (zero cotangent — the dst
    # copy carries the full d_emb), weights are structural: both None
    return (dv.astype(dt), demb, None, None, None, None, None)


ell_gather_message_scatter.defvjp(_gms_fwd_rule, _gms_bwd_rule)
