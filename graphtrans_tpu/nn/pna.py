"""Principal Neighbourhood Aggregation (PNA) convolution stack.

Re-implements the semantics of PyG's `PNAConv` as configured by the reference
(/root/reference/modules/pna/pna_module.py:41-54: towers=4, divide_input=True,
pre/post layers=1) — all towers computed as one batched einsum so the MXU sees
a single large contraction instead of PyG's per-tower Python loop. The fused
multi-aggregator segment pass (mean/max/min/std in one edge sweep) replaces
four separate torch_scatter calls (/root/reference/modules/pna/aggregators.py).

Degree-scaler statistics come from the train-set degree histogram exactly as
PyG computes them: avg_log = sum(hist[d] * log(d+1)) / sum(hist); per-node
degree is the in-degree clamped to >=1.

Stack ordering per /root/reference/modules/pna/pna_module.py:72-76:
h = relu(bn(conv(x))); x = (h + x) if residual else x  [reference quirk: the
conv output is DISCARDED when residual=False — defaults set residual=True];
x = dropout(x).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import in_degree, segment_multi_aggregate, segment_sum
from .dropout import ByteDropout
from .norm import MaskedBatchNorm


def avg_degree_stats(deg_histogram) -> dict:
    """PyG PNAConv.__init__ statistics from a degree histogram tensor."""
    import numpy as np

    hist = np.asarray(deg_histogram, dtype=np.float64)
    total = max(hist.sum(), 1.0)
    bins = np.arange(len(hist))
    return {
        "lin": float((bins * hist).sum() / total),
        "log": float((np.log(bins + 1) * hist).sum() / total),
        "exp": float((np.exp(bins) * hist).sum() / total) if len(hist) < 50 else float("inf"),
    }


def _tower_linear_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PNAConv(nn.Module):
    emb_dim: int
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    avg_deg_log: float = 1.0
    avg_deg_lin: float = 1.0
    towers: int = 4
    divide_input: bool = True

    @nn.compact
    def __call__(self, batch, x, training: bool):
        F = self.emb_dim
        T = self.towers
        if F % T != 0:
            raise ValueError(f"emb_dim {F} not divisible by towers {T}")
        Ft = F // T
        N = x.shape[0]
        A, S = len(self.aggregators), len(self.scalers)

        from ..ops.scatter import maybe_halo_extend
        from .conv import _sfa_route

        xt = x.reshape(N, T, Ft)
        w_pre = self.param("pre_w", _tower_linear_init(2 * Ft), (T, 2 * Ft, Ft))
        b_pre = self.param("pre_b", _tower_linear_init(2 * Ft), (T, Ft))

        from ..ops import plan_expand

        _ell_aggs = {"sum", "mean", "std", "var", "max", "min"}
        use_ell = (plan_expand.has_ell(batch)
                   and _sfa_route(batch, "add")
                   and all(a in _ell_aggs for a in self.aggregators))
        if use_ell:
            # Scatter-free PNA aggregation: the pre-linear message is LINEAR
            # in (x_i, x_j) — msg = xiproj[dst] + xjproj[src] with the tower
            # weight split at the concat boundary. Then sum/mean are
            # scatter-free segment sums of the NODE-level xjproj,
            # var(xiproj + xjproj[src]) = var(xjproj[src]) (std from the
            # sums of xjproj and xjproj^2), and max/min = xiproj +
            # ELL-layout K-axis reductions (ops/ell.py). Every [E, C]
            # message tensor and every serialized segment scatter (measured
            # 16 ms EACH for min/max at code2 scale) disappears.
            from ..ops.ell import ell_multi

            C = T * Ft
            xiproj = (jnp.einsum("ntf,tfo->nto", xt, w_pre[:, :Ft])
                      + b_pre).reshape(N, C)
            xjproj = jnp.einsum("ntf,tfo->nto", xt,
                                w_pre[:, Ft:]).reshape(N, C)

            # ONE K-column pass produces every reduction the aggregator set
            # needs (ops/ell.ell_multi): each slot column is a row gather
            # fused into its running update, so no [E, C] or [slots, C]
            # tensor ever materializes — the round-3 profile showed the
            # previous scatter-free sums paying a 14 ms materialized slot
            # gather per call (the one-hot dot forces its operand to HBM).
            want_sq = ("std" in self.aggregators) or ("var" in self.aggregators)
            want_mm = ("max" in self.aggregators) or ("min" in self.aggregators)
            ell_d, ell_s = plan_expand.ell_plans(batch)
            # the src-major sfa plan (always present on this route — ELL
            # requires _sfa_route) sends the backward through slot order:
            # L ≈ 1.2–1.4·E fused gathers (the slot-budget inflation —
            # ~1.23·E measured on code2 per-batch plans, up to ~1.4 with
            # the sampled dataset-wide budgets) + one one-hot matmul
            # instead of a k_out-column walk over 70%-padding ELL slots
            # (259.5 -> see bench code2_pna)
            _, sfa_s = plan_expand.sfa_plans(batch)
            s1, s2, mxb, mnb = ell_multi(
                xjproj, ell_d, ell_s, sfa_s,
                batch.ell_k_in, batch.ell_k_out, want_sq, want_mm,
                batch.sfa_nb)

            deg_raw = ell_d["mask"].reshape(N, -1).sum(axis=1)
            deg_safe = jnp.maximum(deg_raw, 1.0)[:, None].astype(x.dtype)
            has = (deg_raw > 0)[:, None]
            mean_b = s1 / deg_safe
            aggs = {}
            if "sum" in self.aggregators:
                aggs["sum"] = deg_raw[:, None].astype(x.dtype) * xiproj + s1
            if "mean" in self.aggregators:
                aggs["mean"] = jnp.where(has, xiproj + mean_b, 0)
            if want_sq:
                var = jax.nn.relu(s2 / deg_safe - mean_b * mean_b)
                if "std" in self.aggregators:
                    aggs["std"] = jnp.sqrt(var + 1e-5)
                if "var" in self.aggregators:
                    aggs["var"] = var
            if want_mm:
                aggs["max"] = jnp.where(has, xiproj + mxb, 0)
                aggs["min"] = jnp.where(has, xiproj + mnb, 0)
            stacked = []
            deg = jnp.maximum(deg_raw, 1.0)
        else:
            # destination rows are always chip-local (dst-owned edge
            # layout); source rows may live on a peer under node sharding
            xt_ext = maybe_halo_extend(x).reshape(-1, T, Ft)
            x_i = xt[batch.edge_dst]      # [E, T, Ft] (destination / center)
            x_j = xt_ext[batch.edge_src]  # [E, T, Ft] (source / neighbor)
            h = jnp.concatenate([x_i, x_j], axis=-1)  # [E, T, 2Ft]

            msg = jnp.einsum("etf,tfo->eto", h, w_pre) + b_pre  # [E, T, Ft]

            aggs = segment_multi_aggregate(
                msg.reshape(-1, T * Ft), batch.edge_dst, N, mask=batch.edge_mask
            )
            stacked = []
            deg = jnp.maximum(in_degree(batch.edge_dst, N, batch.edge_mask), 1.0)
        # scalers multiply the aggregated features — compute the degree
        # factors (log/ratios) in f32 for accuracy (bf16 log rounds for
        # degrees > 256) and CAST the final per-node factor to the compute
        # dtype before the multiply (an f32 factor would promote the whole
        # downstream model back to f32 under --precision bf16)
        deg_f32 = deg.astype(jnp.float32)
        log_deg_f32 = jnp.log(deg_f32 + 1.0)
        pieces = []
        for agg_name in self.aggregators:
            if agg_name == "sum" and aggs.get(agg_name) is None:
                a = segment_sum(msg.reshape(-1, T * Ft), batch.edge_dst, N, mask=batch.edge_mask)
            else:
                a = aggs[agg_name]
            pieces.append(a.reshape(N, T, Ft))

        def _factor(sc):
            if sc == "identity":
                return None
            if sc == "amplification":
                return log_deg_f32 / self.avg_deg_log
            if sc == "attenuation":
                return self.avg_deg_log / log_deg_f32
            if sc == "linear":
                return deg_f32 / self.avg_deg_lin
            if sc == "inverse_linear":
                return self.avg_deg_lin / deg_f32
            raise ValueError(sc)

        # The post-linear reads concat([xt] + [piece*f for every
        # (scaler, aggregator)]) — but MATERIALIZING that concat cost
        # 12 ms/layer at code2 scale (XLA picks a transposed {0,2,1} layout
        # for the [N, T, (1+S*A)*Ft] tensor). Compute the matmul as a SUM of
        # per-piece einsums against w_post fan-in slices instead, with the
        # per-node scaler factor pulled OUT of the matmul
        # ((a*f) @ W == f * (a @ W), f is per-node scalar): the concat
        # tensor never exists, FLOPs unchanged, fan-in slice order matches
        # the reference concat layout exactly (same params, same math).
        fan = (1 + S * A) * Ft
        w_post = self.param("post_w", _tower_linear_init(fan), (T, fan, Ft))
        b_post = self.param("post_b", _tower_linear_init(fan), (T, Ft))

        def wslice(o):
            return jax.lax.slice_in_dim(w_post, o, o + Ft, axis=1)

        def pe(t3, o):
            return jnp.einsum("ntf,tfo->nto", t3, wslice(o),
                              preferred_element_type=jnp.float32)

        # NEGATIVE RESULT (round 3, measured): converting this layer to flat
        # block-diagonal [C, C] matmuls to kill the T-major relayout copies
        # measured 266 ms vs 259 — the 4x FLOP inflation costs more than the
        # ~24 ms/layer of {0,1}-layout traffic it removes. The per-piece
        # einsum sum below (no materialized concat) is the measured optimum.
        acc = pe(xt, 0)
        bias = b_post.astype(jnp.float32)
        off = Ft
        for sc in self.scalers:
            f = _factor(sc)
            sacc = None
            for piece in pieces:
                y = pe(piece, off)
                sacc = y if sacc is None else sacc + y
                off += Ft
            acc = acc + (sacc if f is None else sacc * f[:, None, None])
        out = (acc + bias).astype(x.dtype)
        out = out.reshape(N, F)

        w_lin = self.param("lin_w", _tower_linear_init(F), (F, F))
        b_lin = self.param("lin_b", _tower_linear_init(F), (F,))
        out = out @ w_lin + b_lin
        return jnp.where(batch.node_mask[:, None], out, 0)


class PNANodeEmbedding(nn.Module):
    num_layer: int
    emb_dim: int
    node_encoder: Optional[nn.Module]
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    avg_deg_log: float = 1.0
    avg_deg_lin: float = 1.0
    drop_ratio: float = 0.3
    residual: bool = True
    bn_axis_name: Optional[str] = None

    def setup(self):
        self.layers = [
            PNAConv(
                self.emb_dim,
                aggregators=tuple(self.aggregators),
                scalers=tuple(self.scalers),
                avg_deg_log=self.avg_deg_log,
                avg_deg_lin=self.avg_deg_lin,
                name=f"conv_{i}",
            )
            for i in range(self.num_layer)
        ]
        self.batch_norms = [
            MaskedBatchNorm(self.emb_dim, axis_name=self.bn_axis_name, name=f"bn_{i}")
            for i in range(self.num_layer)
        ]
        self.dropout = ByteDropout(self.drop_ratio)

    def __call__(self, batch, perturb=None, training: bool = False):
        if self.node_encoder is None:
            x = batch.node_feat.astype(jnp.float32)
        elif getattr(self.node_encoder, "takes_depth", False):
            x = self.node_encoder(batch.node_feat, batch.node_depth)
        else:
            x = self.node_encoder(batch.node_feat)
        if perturb is not None:
            # compute-dtype cast (see nn/gnn.py — FLAG mixed-precision leak)
            x = x + perturb.astype(x.dtype)
        x = jnp.where(batch.node_mask[:, None], x, 0)

        for conv, bn in zip(self.layers, self.batch_norms):
            h = nn.relu(bn(conv(batch, x, training), batch.node_mask,
                           use_running_average=not training))
            if self.residual:
                x = h + x
            # reference quirk: when residual=False the conv output is unused
            x = self.dropout(x, deterministic=not training)
        return jnp.where(batch.node_mask[:, None], x, 0)
