"""GIN / GCN message-passing convolutions.

Semantics mirror /root/reference/modules/conv.py exactly (including the GCN
quirks: degree computed from the SOURCE index +1, and the self-loop term
relu(x + root_emb)/deg), but the implementation is a gather -> message ->
masked segment-reduce over dst-sorted padded edge arrays instead of PyG
``MessagePassing.propagate``. An optional Pallas fused kernel accelerates the
gather/scatter (ops/pallas), parity-tested against this path.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from ..ops import block_plan, dense_mp, plan_expand, scatter
from ..ops.segment import out_degree
from .init import TDense, normal
from .norm import MaskedBatchNorm


def _fused_tables_route(batch, h, edge_encoder, message) -> bool:
    return (batch.edge_src_dense is not None
            and message in ("relu_add", "add")
            and getattr(edge_encoder, "supports_concat_tables", False)
            and h.shape[-1] % 128 == 0
            and dense_mp.fused_tables_enabled())


def _bsp_route(batch, message) -> bool:
    """Blocked-CSR one-hot SpMM (ops/pallas/block_spmm.py): flat-layout
    batches that carry block plans, on TPU."""
    return (batch.edge_src_dense is None
            and getattr(batch, "bsp_fwd", None) is not None
            and message in ("relu_add", "add")
            and block_plan.block_spmm_enabled())


# scatter-free flat aggregation routing: 'auto' = on TPU when the batch
# carries slot plans (pure XLA — correct everywhere, but the slot-padding
# inflation only pays off where XLA serializes scatters, i.e. on TPU)
_SFA = "auto"
_SFA_FORCE = False  # test hook: route off-TPU too


def set_scatter_free(mode: str):
    global _SFA
    assert mode in ("auto", "on", "off"), mode
    _SFA = mode


def _sfa_route(batch, message) -> bool:
    import jax

    if _SFA == "off":
        return False
    return (batch.edge_src_dense is None
            and plan_expand.has_sfa(batch)
            and message in ("relu_add", "add")
            and (_SFA == "on" or _SFA_FORCE
                 or jax.default_backend() == "tpu"))


# ELL-column conv aggregation (ops/ell.ell_gather_message_scatter) inside
# the scatter-free route. MEASURED NEGATIVE on the code2 bench (v5e,
# bs=512, bf16, same-process A/B): ELL columns 155.4 ms/step vs one-hot
# 117.2. The hypothesis (kill the one-hot dot's materialized [L, C] slot
# gather with K fused row-gather columns, as in PNA's ell_multi) does not
# transfer: the conv message is edge-valued (relu(x[src] + emb) per edge),
# so each of the K columns re-reads a full [N, C] gather AND an [N, C]
# embedding stride fwd+bwd — k*N = 2.7x the sfa slot count here — whereas
# PNA's reducers consume NODE-valued projections where the ELL win came
# from never materializing the [N, K, C] tensor. Kept opt-in (set_ell_gms
# 'on'/'auto'; batch fields gated by block_plan.set_ell_edge_fields);
# parity for both arms stays tested in tests/test_scatter_free.py.
_ELL_GMS = "off"
_ELL_GMS_K_CAP = 16


def set_ell_gms(mode: str):
    global _ELL_GMS
    assert mode in ("auto", "on", "off"), mode
    _ELL_GMS = mode


def _ell_gms_route(batch) -> bool:
    if _ELL_GMS == "off":
        return False
    if not plan_expand.has_ell(batch):
        return False
    # legacy explicit-plan batches additionally need the ELL-ordered attr
    # copies; compressed batches derive them on device
    if (getattr(batch, "ell_dst", None) is not None
            and getattr(batch, "edge_attr_ell", None) is None):
        return False
    if _ELL_GMS == "on":
        return True
    k = batch.ell_k_in
    n = batch.node_mask.shape[0]
    return k <= _ELL_GMS_K_CAP and k * n <= 4 * plan_expand.sfa_slots(batch)


def bsp_slot_weight(plan, per_node_vals, major_is_src: bool):
    """Per-edge weight for the blocked kernel from per-node values:
    w_slot = vals[src] * vals[dst], endpoints reconstructed from the plan
    (pad slots hit row 0 in-range; the kernel's mask kills them)."""
    out_g = plan["blk_out"][:, None] * block_plan.NB + plan["loc_out"]
    in_g = plan["blk_in"][:, None] * block_plan.NB + plan["loc_in"]
    src_g, dst_g = (out_g, in_g) if major_is_src else (in_g, out_g)
    return (per_node_vals[src_g.reshape(-1)]
            * per_node_vals[dst_g.reshape(-1)])


def _aggregate(batch, h, edge_encoder, message="relu_add", edge_weight=None,
               eps_scale=None, edge_weight_bsp=None, edge_weight_sfa=None):
    """Route the gather->message->scatter through the strided one-hot-matmul
    path when the batch carries the dense layout (scatter-free fwd AND bwd,
    ops/dense_mp.py), the blocked-CSR one-hot kernel when it carries block
    plans (flat layout at code2 scale, ops/pallas/block_spmm.py), else the
    flat segment path. On TPU, encoders that expose their tables
    (BondEncoder) take the fused-lookup Pallas kernel (ops/pallas/
    gin_agg.py): the edge-embedding tensor never touches HBM.
    eps_scale (only honored on the fused route — callers must check
    _fused_tables_route first) additionally fuses the GIN combine, returning
    eps_scale*h + agg. edge_weight_bsp: (w_fwd, w_bwd) chunk-ordered weights
    for the blocked route (see bsp_slot_weight)."""
    if batch.edge_src_dense is not None:
        if _fused_tables_route(batch, h, edge_encoder, message):
            tables, dims = edge_encoder(batch.edge_attr_dense,
                                        concat_tables=True)
            return dense_mp.gather_message_scatter_dense_tables(
                h, batch, tables, dims, message=message,
                edge_weight=edge_weight, eps_scale=eps_scale)
        edge_emb = edge_encoder(batch.edge_attr_dense).astype(h.dtype)
        return dense_mp.gather_message_scatter_dense(
            h, batch, edge_emb, message=message, edge_weight=edge_weight)
    if _sfa_route(batch, message):
        if _ell_gms_route(batch):
            from ..ops.ell import ell_gather_message_scatter

            ea_d, ea_s = plan_expand.ell_edge_attr(batch)
            emb_d = edge_encoder(ea_d).astype(h.dtype)
            emb_s = edge_encoder(ea_s).astype(h.dtype)
            wd, ws = (plan_expand.ell_gcn_norms(batch)
                      if edge_weight_sfa is not None else (None, None))
            ell_d, ell_s = plan_expand.ell_plans(batch)
            return ell_gather_message_scatter(
                h, emb_d, emb_s, wd, ws, ell_d, ell_s,
                batch.ell_k_in, batch.ell_k_out, message)
        from ..ops.scatter_free import scatterfree_gather_message_scatter

        ea_d, ea_s = plan_expand.sfa_edge_attr(batch)
        emb_d = edge_encoder(ea_d).astype(h.dtype)
        emb_s = edge_encoder(ea_s).astype(h.dtype)
        wd, ws = (edge_weight_sfa if edge_weight_sfa is not None
                  else (None, None))
        plan_d, plan_s = plan_expand.sfa_plans(batch)
        return scatterfree_gather_message_scatter(
            h, emb_d, emb_s, wd, ws, plan_d, plan_s,
            batch.sfa_nb, message)
    if _bsp_route(batch, message):
        from ..ops.pallas.block_spmm import blocked_gather_message_scatter

        emb_f = edge_encoder(batch.edge_attr_bsp_fwd).astype(h.dtype)
        emb_b = edge_encoder(batch.edge_attr_bsp_bwd).astype(h.dtype)
        wf, wb = edge_weight_bsp if edge_weight_bsp is not None else (None,
                                                                      None)
        return blocked_gather_message_scatter(
            h, emb_f, emb_b, batch.bsp_fwd, batch.bsp_bwd, w_fwd=wf,
            w_bwd=wb, message=message,
            interpret=block_plan._BLOCK_SPMM_INTERPRET)
    # compute messages in the node dtype: a float edge encoder (or the
    # zero encoder's f32 zeros) must not promote the aggregation under
    # --precision bf16
    edge_emb = edge_encoder(batch.edge_attr).astype(h.dtype)
    return scatter.gather_message_scatter(
        h, edge_emb, batch.edge_src, batch.edge_dst, batch.edge_mask,
        num_nodes=h.shape[0], message=message, edge_weight=edge_weight)


class GINConv(nn.Module):
    """out = MLP((1+eps) * x + sum_{j->i} relu(x_j + edge_emb)); MLP =
    Linear(d,2d) -> BN -> ReLU -> Linear(2d,d); eps learnable, init 0
    (/root/reference/modules/conv.py:10-36)."""

    emb_dim: int
    edge_encoder: Callable
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, batch, h, training: bool):
        eps = self.param("eps", nn.initializers.zeros, (1,))
        if _fused_tables_route(batch, h, self.edge_encoder, "relu_add"):
            # (1+eps)*h + agg fused into the aggregation kernel — the
            # aggregation tensor never materializes on its own
            out = _aggregate(batch, h, self.edge_encoder, message="relu_add",
                             eps_scale=(1.0 + eps[0]).astype(jnp.float32))
        else:
            agg = _aggregate(batch, h, self.edge_encoder, message="relu_add")
            out = (1 + eps) * h + agg
        out = TDense(2 * self.emb_dim)(out)
        out = MaskedBatchNorm(2 * self.emb_dim, axis_name=self.bn_axis_name, name="mlp_bn")(
            out, batch.node_mask, use_running_average=not training
        )
        out = nn.relu(out)
        out = TDense(self.emb_dim)(out)
        return jnp.where(batch.node_mask[:, None], out, 0)


class GCNConv(nn.Module):
    """OGB-style GCN: x <- Linear(x); deg = out_degree(src)+1;
    norm = deg^-1/2[src] * deg^-1/2[dst];
    out = sum_{j->i} norm * relu(x_j + edge_emb) + relu(x + root_emb) / deg
    (/root/reference/modules/conv.py:40-71)."""

    emb_dim: int
    edge_encoder: Callable

    @nn.compact
    def __call__(self, batch, h, training: bool):
        x = TDense(self.emb_dim)(h)
        x = jnp.where(batch.node_mask[:, None], x, 0)
        norm_bsp = norm_sfa = None
        if batch.edge_gcn_norm is not None:
            # node-sharded execution: degrees are a GLOBAL property the
            # local edge shard cannot see — use the host-precomputed
            # normalization (parallel/hybrid.py)
            norm = batch.edge_gcn_norm
            inv_deg = batch.node_gcn_inv_deg[:, None]
        elif _sfa_route(batch, "relu_add"):
            # scatter-free route: degree normalization is structural —
            # precomputed per slot order (legacy explicit batches) or
            # derived on device from the src row starts (compressed)
            norm = None
            norm_sfa, inv_deg = plan_expand.sfa_gcn(batch)
        elif batch.edge_src_dense is not None:
            # strided layout: degree is an axis reduction of the src
            # one-hots, and the per-edge norm gathers dis through the same
            # one-hot matmul (scatter-free backward)
            G, Sm = batch.num_graph_slots, batch.node_stride
            deg = dense_mp.dense_degree(
                batch.edge_src_dense, batch.edge_mask_dense, Sm, x.dtype) + 1.0
            dis = deg ** -0.5
            dsrc = dense_mp.dense_gather(
                dis[..., None], batch.edge_src_dense, batch.edge_mask_dense)
            ddst = dense_mp.dense_gather(
                dis[..., None], batch.edge_dst_dense, batch.edge_mask_dense)
            norm = (dsrc * ddst)[..., 0]          # [G, Em]
            inv_deg = (1.0 / deg).reshape(G * Sm, 1)
        else:
            deg = out_degree(batch.edge_src, x.shape[0], batch.edge_mask, x.dtype) + 1.0
            dis = jnp.where(deg > 0, deg, 1.0) ** -0.5
            norm = dis[batch.edge_src] * dis[batch.edge_dst]
            inv_deg = 1.0 / deg[:, None]
            if _bsp_route(batch, "relu_add"):
                # chunk-ordered norms for the blocked kernel (both orders)
                norm_bsp = (bsp_slot_weight(batch.bsp_fwd, dis, False),
                            bsp_slot_weight(batch.bsp_bwd, dis, True))
        agg = _aggregate(batch, x, self.edge_encoder, message="relu_add",
                         edge_weight=norm, edge_weight_bsp=norm_bsp,
                         edge_weight_sfa=norm_sfa)
        root_emb = self.param("root_emb", normal(1.0), (self.emb_dim,))
        # inv_deg is structural f32 — cast to the compute dtype HERE or the
        # multiply promotes the conv output (and everything downstream until
        # the next BN) back to f32 under --precision bf16: the profile
        # showed f32[81920,300] VN-pool gathers on the code2 bf16 step
        self_term = nn.relu(x + root_emb) * inv_deg.astype(x.dtype)
        out = agg + self_term
        return jnp.where(batch.node_mask[:, None], out, 0)
