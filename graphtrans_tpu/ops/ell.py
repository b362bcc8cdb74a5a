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
   (ops/block_plan.build_ell_plan: node n's slots [n*K, n*K+deg)) —
   a masked K-axis reduction, no scatter. The backward splits ties by
   VALUE (grad/count over equal entries — order-independent, unlike
   argmax picking) and recomputes the split in the src-major twin so
   d(vals) is also a K-axis reduction: no scatter in either direction.

Replaces torch_scatter's min/max role
(/root/reference/modules/pna/aggregators.py:17-24); parity-tested against
ops/segment.segment_max/min through nn/pna.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ell_minmax(vals, plan_dst, plan_src, k_in: int, k_out: int):
    """vals [N, C] per-node values -> (mx, mn) [N, C] over each node's
    incoming neighbors (empty rows -> 0, matching segment_max/min's fill).
    plans from ops/block_plan.build_ell_plan (dst-major + src-major)."""
    out, _ = _fwd(vals, plan_dst, plan_src, k_in, k_out)
    return out


def _gathered(vals, plan, k):
    N = vals.shape[0]
    g = jnp.take(vals, plan["other_g"], axis=0).reshape(N, k, -1)
    mask = plan["mask"].reshape(N, k)[..., None].astype(vals.dtype)
    return g, mask


def _fwd(vals, plan_dst, plan_src, k_in, k_out):
    g, m = _gathered(vals, plan_dst, k_in)
    deg = jnp.sum(m, axis=1)                      # [N, 1]
    big = jnp.asarray(_BIG, vals.dtype)
    mx = jnp.max(jnp.where(m > 0, g, -big), axis=1)
    mn = jnp.min(jnp.where(m > 0, g, big), axis=1)
    mx = jnp.where(deg > 0, mx, 0.0)
    mn = jnp.where(deg > 0, mn, 0.0)
    # tie counts come from the already-gathered tensor here: saving the two
    # [N, C] count arrays is far cheaper than re-gathering [N*K, C] rows in
    # the backward (profiled ~11 ms per layer at PNA code2 scale)
    cnt_mx = jnp.maximum(jnp.sum((g == mx[:, None]).astype(vals.dtype) * m,
                                 axis=1), 1.0)
    cnt_mn = jnp.maximum(jnp.sum((g == mn[:, None]).astype(vals.dtype) * m,
                                 axis=1), 1.0)
    return (mx, mn), (vals, mx, mn, cnt_mx, cnt_mn)


def _fwd_rule(vals, plan_dst, plan_src, k_in, k_out):
    out, res = _fwd(vals, plan_dst, plan_src, k_in, k_out)
    return out, res + (plan_dst, plan_src)


def _bwd_rule(k_in, k_out, res, gs):
    vals, mx, mn, cnt_mx, cnt_mn, plan_dst, plan_src = res
    g_mx, g_mn = gs
    N = vals.shape[0]

    # d vals in the src-major twin: each slot carries its own value
    # (broadcast) and gathers its center's rows. Cotangents are pre-divided
    # by tie counts at NODE level so the slot pass pulls 4 arrays, not 6.
    gmx_c = g_mx / cnt_mx
    gmn_c = g_mn / cnt_mn
    ctr = plan_src["other_g"]
    m_s = plan_src["mask"].reshape(N, k_out)[..., None].astype(vals.dtype)
    v_s = jnp.broadcast_to(vals[:, None, :], (N, k_out, vals.shape[1]))

    def pull(t):
        return jnp.take(t, ctr, axis=0).reshape(N, k_out, -1)

    dv = (pull(gmx_c) * (v_s == pull(mx)).astype(vals.dtype)
          + pull(gmn_c) * (v_s == pull(mn)).astype(vals.dtype))
    dv = jnp.sum(dv * m_s, axis=1)
    return (dv.astype(vals.dtype), None, None)


ell_minmax.defvjp(_fwd_rule, _bwd_rule)
