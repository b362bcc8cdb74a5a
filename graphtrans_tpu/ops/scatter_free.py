"""Scatter-free flat aggregation: gathers + batched one-hot matmuls, no XLA
scatter anywhere — and no Pallas.

Profiling the code2-shaped step showed the asymmetry that decides the
design: the flat path's GATHER of x[src] is bandwidth-bound (~0.7 ms at
E~229k, d=300, bf16) while every SCATTER-ADD is row-serialized by XLA
(~4.5 ms, dtype-INDEPENDENT). So only the scatter side needs the
one-hot-matmul treatment: group edges by destination block of nb rows
(ops/block_plan.build_scatter_plan; nb as large as divides the node cap —
skew in per-block counts shrinks with block size while the one-hot work
L*nb is invariant) and the entire scatter becomes ONE batched matmul

    out[b]  =  one_hot(dst_local[b])^T  @  messages[b]     # [nb, d]

over all blocks at once — XLA tiles and pipelines it like any dense op.
The backward never scatters either — and never PERMUTES [L, d] tensors
(a random row permutation measured 3.5 ms vs 0.8 for a plain gather):
d_emb comes from the dst plan (dmsg = one_hot @ g, already in the edge
encoder's slot order), and dx RECOMPUTES the message cotangent directly
in the src-major twin's order — g[dst] is a row gather, the ReLU mask
comes from the src-ordered edge-attr copy's embeddings (a cheap encoder
re-application under stop_gradient; the dst-order copy carries the full
d_emb), then one batched one-hot matmul onto the src blocks.

This supersedes the Pallas blocked-CSR kernel (ops/pallas/block_spmm.py),
whose per-grid-step overhead at pair granularity lost to the segment path;
here there is no grid at all. The slot-padding inflation is
max-edges-per-block / mean (bucketed, ~1.2-1.5x at nb=512), paid in cheap
bandwidth instead of serialized rows.

Replaces the torch-scatter / MessagePassing.propagate role
(/root/reference/modules/conv.py:26-36) for flat-layout batches on TPU;
parity-tested against ops/scatter.gather_message_scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _one_hot_blocks(loc, nblk, eb, nb, dt):
    """[L] major-row-in-block -> [nblk, eb, nb] one-hot (pad slots point at
    row 0; callers zero pad MESSAGES, so no mask is needed here)."""
    loc3 = loc.reshape(nblk, eb)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nblk, eb, nb), 2)
    return (loc3[..., None] == iota).astype(dt)


def _block_matmul(oh, rows, nblk, eb, nb, d, dt):
    """[nblk, eb, nb]^T @ [nblk, eb, d] -> flat [nblk*nb, d]."""
    out = jax.lax.dot_general(
        oh, rows.reshape(nblk, eb, d), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_prec(dt))
    return out.astype(dt).reshape(nblk * nb, d)


def _slot_matmul(oh, blocks, nblk, eb, d, dt):
    """[nblk, eb, nb] @ [nblk, nb, d] -> flat [nblk*eb, d] (the adjoint)."""
    out = jax.lax.dot_general(
        oh, blocks, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_prec(dt))
    return out.astype(dt).reshape(nblk * eb, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def scatterfree_gather_message_scatter(x, emb_dst, emb_src, w_dst, w_src,
                                       plan_dst, plan_src, nb: int,
                                       message: str = "relu_add"):
    """x [N, d] (N % nb == 0); emb_dst/emb_src [L, d] edge embeddings in
    each plan's slot order (emb_src only feeds the backward's ReLU mask and
    gets a zero cotangent — the dst copy carries the full d_emb); w_* [L]
    or None (structural — stop-gradiented); plans + nb from
    ops/block_plan.scatter_plan_pair. Returns [N, d] with
    gather_message_scatter semantics."""
    out, _ = _fwd(x, emb_dst, emb_src, w_dst, w_src, plan_dst, plan_src,
                  nb, message)
    return out


def _msg_factors(pre, w, mask, message):
    m = jnp.maximum(pre, 0) if message == "relu_add" else pre
    if w is not None:
        m = m * w[:, None].astype(m.dtype)
    return m * mask[:, None].astype(m.dtype)


def _pre(xs, emb, message):
    # message "copy" sums raw gathered rows (emb may be None — PNA's
    # decomposed sums of node-level projections)
    return xs if message == "copy" else xs + emb


def _fwd(x, emb_dst, emb_src, w_dst, w_src, plan_dst, plan_src, nb,
         message):
    N, d = x.shape
    nblk = N // nb
    eb = plan_dst["mask"].shape[0] // nblk
    w = None if w_dst is None else jax.lax.stop_gradient(w_dst)
    xs = jnp.take(x, plan_dst["other_g"], axis=0)
    m = _msg_factors(_pre(xs, emb_dst, message), w, plan_dst["mask"],
                     message)
    oh = _one_hot_blocks(plan_dst["loc"], nblk, eb, nb, x.dtype)
    out = _block_matmul(oh, m, nblk, eb, nb, d, x.dtype)
    return out, (x, emb_dst, emb_src, w, w_src)


def _fwd_rule(x, emb_dst, emb_src, w_dst, w_src, plan_dst, plan_src, nb,
              message):
    out, res = _fwd(x, emb_dst, emb_src, w_dst, w_src, plan_dst, plan_src,
                    nb, message)
    return out, res + (plan_dst, plan_src)


def _bwd_rule(nb, message, res, g):
    x, emb_dst, emb_src, w, w_src, plan_dst, plan_src = res
    N, d = x.shape
    nblk = N // nb
    eb = plan_dst["mask"].shape[0] // nblk
    dt = x.dtype

    def dmsg_in(plan, ww):
        """Message cotangent in this plan's slot order: g[major-of-edge] is
        recovered via the plan geometry (dst plan: majors ARE the out rows,
        so one_hot @ g; src plan: dst is the OTHER endpoint, a row gather),
        then w / relu'(pre) / mask factors apply."""
        if plan is plan_dst:
            oh = _one_hot_blocks(plan["loc"], nblk, eb, nb, dt)
            dm = _slot_matmul(oh, g.reshape(nblk, nb, d), nblk, eb, d, dt)
        else:
            dm = jnp.take(g, plan["other_g"], axis=0)
        if ww is not None:
            dm = dm * ww[:, None].astype(dt)
        if message == "relu_add":
            # relu mask recomputed in THIS order (both gathers are cheap;
            # permuting an [L, d] tensor between orders measured 3.5 ms)
            if plan is plan_dst:
                xs = jnp.take(x, plan["other_g"], axis=0)
                pre = xs + emb_dst
            else:
                L = plan["loc"].shape[0]
                blk = jnp.arange(L, dtype=jnp.int32) // eb
                src_g = blk * nb + plan["loc"]
                pre = jnp.take(x, src_g, axis=0) + emb_src
            dm = jnp.where(pre > 0, dm, 0)
        return dm * plan["mask"][:, None].astype(dt)

    demb = dmsg_in(plan_dst, w) if emb_dst is not None else None
    dmsg_s = dmsg_in(plan_src,
                     None if w_src is None
                     else jax.lax.stop_gradient(w_src))
    oh_s = _one_hot_blocks(plan_src["loc"], nblk, eb, nb, dt)
    dx = _block_matmul(oh_s, dmsg_s, nblk, eb, nb, d, dt)
    return dx, demb, None, None, None, None, None


scatterfree_gather_message_scatter.defvjp(_fwd_rule, _bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def graph_sum_sfa(h, node_graph, node_mask, plan, num_graphs: int):
    """Per-graph sum of node rows [N, d] -> [G, d] without the forward
    segment-sum's serialized scatter: nodes ride the graph-major slot plan
    (ops/block_plan.build_pool_plan) and the sum is one batched one-hot
    matmul. The backward is the ordinary broadcast gather g[node_graph]
    (the cheap direction). Replaces global_add_pool's torch-scatter role
    (/root/reference/modules/gnn_module.py:217-229 VN update pooling)."""
    return _gs_fwd(h, node_graph, node_mask, plan, num_graphs)[0]


def _gs_fwd(h, node_graph, node_mask, plan, num_graphs):
    from .block_plan import POOL_NB

    d = h.shape[1]
    L = plan["mask"].shape[0]
    g_pad = -(-num_graphs // POOL_NB) * POOL_NB
    nblk = g_pad // POOL_NB
    eb = L // nblk
    rows = jnp.take(h, plan["other_g"], axis=0)
    rows = rows * plan["mask"][:, None].astype(h.dtype)
    oh = _one_hot_blocks(plan["loc"], nblk, eb, POOL_NB, h.dtype)
    out = _block_matmul(oh, rows, nblk, eb, POOL_NB, d, h.dtype)
    return out[:num_graphs], (node_graph, node_mask)


def _gs_fwd_rule(h, node_graph, node_mask, plan, num_graphs):
    out, res = _gs_fwd(h, node_graph, node_mask, plan, num_graphs)
    return out, res


def _gs_bwd_rule(num_graphs, res, g):
    node_graph, node_mask = res
    dh = jnp.take(g, node_graph, axis=0)
    dh = jnp.where(node_mask[:, None], dh, 0)
    return dh, None, None, None


graph_sum_sfa.defvjp(_gs_fwd_rule, _gs_bwd_rule)
