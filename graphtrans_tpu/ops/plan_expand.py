"""Device-side expansion of compressed scatter-free plans.

The host ships only CSR row starts (``sfa_row_start_dst/src`` [N+1] i32),
one src-sorted edge permutation (``edge_perm_src`` [E] i32), and the
structural per-edge GCN norm (``edge_gcn_norm_e`` [E] f32) — see
ops/block_plan.build_sfa_compressed. Everything the scatter-free/ELL/pool
consumers need (slot plans, slot-ordered edge attrs, GCN norms) is derived
on device from those plus the batch's existing edge/node fields:

  * the batch's valid edges are a dst-sorted prefix, so dst-major block b's
    slots are the contiguous edge rows [row_start[b*nb], row_start[(b+1)*nb])
  * src-major twins read the same ranges through ``edge_perm_src``
  * valid nodes are graph-major, so pooling blocks are contiguous node rows
    (starts from cumsum(num_nodes))

TPU LOWERING RULE (measured, v5e): a 1-D dynamic gather lowers to a scalar
SMEM loop (~15 ns/element — 3.5-5 ms per [245k] gather; the profile shows
s32[L] S(1) copy-start staging), while a ROW gather of a 2-D operand runs
vectorized (~1.3 ms for [E,4] i32 at the same index count). So the
expansion packs (src, dst, norm_bits, attrs...) into ONE [E, 3+Fe] i32
operand and does exactly three row gathers: pack[slots_dst],
pack[perm][slots_src] — every per-slot field is a column slice of those.

The production route is ONE expansion per jitted train/eval step
(expand_inline at the step top — per-layer lazy derivation is not CSE'd by
XLA and measured +18 ms/step). A separate prefetch-stage expansion jit was
measured and REJECTED: ~430 ms/batch of per-call RPC overhead through this
environment's network tunnel (the expanded batch returns ~30 device
buffers).

Replaces the host-built plan shipping for the torch-scatter role
(/root/reference/requirement.yml:98) on flat-layout TPU batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .block_plan import POOL_NB


def _take(arr, idx):
    """Gather with promise_in_bounds: every plan index is in-bounds by
    construction (invalid slots are where'd to 0, perm pads are 0), so the
    fill-mode bounds select and the clip clamp are both dead weight."""
    return jnp.asarray(arr).at[idx].get(mode="promise_in_bounds")


def has_sfa(batch) -> bool:
    return (getattr(batch, "sfa_dst", None) is not None
            or getattr(batch, "sfa_row_start_dst", None) is not None)


def has_ell(batch) -> bool:
    if getattr(batch, "ell_dst", None) is not None:
        return True
    return (getattr(batch, "sfa_row_start_dst", None) is not None
            and batch.ell_k_in > 0)


def has_pool(batch) -> bool:
    if getattr(batch, "sfa_pool", None) is not None:
        return True
    return (getattr(batch, "sfa_row_start_dst", None) is not None
            and getattr(batch, "sfa_pool_eb", 0) > 0)


def sfa_slots(batch) -> int:
    """Slot count L of the (expanded) scatter plans."""
    if getattr(batch, "sfa_dst", None) is not None:
        return batch.sfa_dst["mask"].shape[0]
    n = batch.sfa_row_start_dst.shape[0] - 1
    return (n // batch.sfa_nb) * batch.sfa_eb


# ---------------------------------------------------------------------------
# packed row-gather core
# ---------------------------------------------------------------------------


def _block_slots(row_start, nb: int, eb: int):
    """[N+1] row starts -> (edge row per slot [nblk*eb], valid [nblk*eb],
    block id per slot). Block b's slots cover rows
    [row_start[b*nb], row_start[(b+1)*nb)). No gathers — strided slice,
    iota, compare."""
    n1 = row_start.shape[0]
    nblk = (n1 - 1) // nb
    starts = jax.lax.slice(row_start, (0,), (n1,), (nb,))  # [nblk+1]
    i = jax.lax.broadcasted_iota(jnp.int32, (nblk, eb), 1)
    e = starts[:-1, None] + i
    valid = e < starts[1:, None]
    blk = jax.lax.broadcasted_iota(jnp.int32, (nblk, eb), 0)
    return (jnp.where(valid, e, 0).reshape(-1), valid.reshape(-1),
            blk.reshape(-1))


def _edge_pack(batch):
    """[E, 3+Fe] i32: columns (src, dst, gcn_norm bits, attr...). Built
    elementwise (stack + bitcast/cast), consumed by wide ROW gathers."""
    cols = [batch.edge_src.astype(jnp.int32),
            batch.edge_dst.astype(jnp.int32),
            jax.lax.bitcast_convert_type(
                batch.edge_gcn_norm_e.astype(jnp.float32), jnp.int32)]
    ea = batch.edge_attr
    if jnp.issubdtype(ea.dtype, jnp.floating):
        acols = jax.lax.bitcast_convert_type(
            ea.astype(jnp.float32), jnp.int32)
    else:
        acols = ea.astype(jnp.int32)
    return jnp.concatenate([jnp.stack(cols, axis=1), acols], axis=1)


def _unpack(rows, batch):
    """Column views of one gathered pack: (src, dst, norm f32, attr)."""
    src = rows[:, 0]
    dst = rows[:, 1]
    norm = jax.lax.bitcast_convert_type(rows[:, 2], jnp.float32)
    acols = rows[:, 3:]
    ea = batch.edge_attr
    if jnp.issubdtype(ea.dtype, jnp.floating):
        attr = jax.lax.bitcast_convert_type(acols, jnp.float32).astype(
            ea.dtype)
    else:
        attr = acols.astype(ea.dtype)
    return src, dst, norm, attr


def _block_rows(pack, row_start, nb: int, eb: int):
    """Slot rows via nblk dynamic SLICES instead of a gather: block b's
    slot rows are the CONTIGUOUS pack rows [row_start[b*nb], +eb) (tail
    junk is masked by the callers' valid). Beats the equivalent [L, W]
    row gather both standalone and — decisively — inside the train step,
    where the gather fusion measured 3.45 ms at [287k, 5]."""
    n1 = row_start.shape[0]
    nblk = (n1 - 1) // nb
    W = pack.shape[1]
    packp = jnp.concatenate(
        [pack, jnp.zeros((eb, W), pack.dtype)], axis=0)
    starts = jax.lax.slice(row_start, (0,), (n1,), (nb,))

    def body(i, out):
        sl = jax.lax.dynamic_slice(packp, (starts[i], 0), (eb, W))
        return jax.lax.dynamic_update_slice(out, sl, (i * eb, 0))

    return jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((nblk * eb, W), pack.dtype))


def _pack_src(batch, pack):
    """Src-sorted pack: host-shipped (edge_pack_src — free), else derived
    with the one genuine permutation row gather."""
    ps = getattr(batch, "edge_pack_src", None)
    if ps is not None:
        return jnp.asarray(ps)
    if batch.edge_perm_src is None:
        raise ValueError("compressed batch carries neither edge_pack_src "
                         "nor edge_perm_src")
    return _take(pack, batch.edge_perm_src)           # [E, W] row gather


def _packed_rows(batch, pack=None, pack_src=None):
    """((rows_d, valid_d, blk_d), (rows_s, valid_s, blk_s)) — the pack rows
    per slot for both plan orders: two block-contiguous slice expansions
    plus the one genuine permutation gather (pack[edge_perm_src])."""
    nb, eb = batch.sfa_nb, batch.sfa_eb
    if pack is None:
        pack = _edge_pack(batch)
    if pack_src is None:
        pack_src = _pack_src(batch, pack)
    _, val_d, blk_d = _block_slots(batch.sfa_row_start_dst, nb, eb)
    _, val_s, blk_s = _block_slots(batch.sfa_row_start_src, nb, eb)
    rows_d = _block_rows(pack, batch.sfa_row_start_dst, nb, eb)
    rows_s = _block_rows(pack_src, batch.sfa_row_start_src, nb, eb)
    return (rows_d, val_d, blk_d), (rows_s, val_s, blk_s)


def _plans_from_rows(batch, rd, rs):
    (rows_d, val_d, blk_d), (rows_s, val_s, blk_s) = rd, rs
    nb = batch.sfa_nb
    src_d, dst_d, _, _ = _unpack(rows_d, batch)
    src_s, dst_s, _, _ = _unpack(rows_s, batch)
    plan_d = {"other_g": jnp.where(val_d, src_d, 0),
              "loc": jnp.where(val_d, dst_d - blk_d * nb, 0),
              "mask": val_d.astype(jnp.float32)}
    plan_s = {"other_g": jnp.where(val_s, dst_s, 0),
              "loc": jnp.where(val_s, src_s - blk_s * nb, 0),
              "mask": val_s.astype(jnp.float32)}
    return plan_d, plan_s


def _inv_deg(batch):
    """GCN structural degree: out_degree(src)+1 over valid edges
    (/root/reference/modules/conv.py:57), from the src row starts."""
    rs = batch.sfa_row_start_src
    deg = (rs[1:] - rs[:-1]).astype(jnp.float32) + 1.0
    return 1.0 / deg


# ---------------------------------------------------------------------------
# per-consumer helpers (lazy fallback when the batch was not pre-expanded;
# the production path expands once per step via expand_inline below)
# ---------------------------------------------------------------------------


def sfa_plans(batch):
    """(plan_dst, plan_src) dicts for ops/scatter_free.py."""
    if getattr(batch, "sfa_dst", None) is not None:
        return batch.sfa_dst, batch.sfa_src
    rd, rs = _packed_rows(batch)
    return _plans_from_rows(batch, rd, rs)


def sfa_edge_attr(batch):
    """Slot-ordered edge_attr copies (dst, src). Pad slots carry edge 0's
    REAL attrs (consumers mask messages, and real attrs keep integer
    encoders in-vocab)."""
    if getattr(batch, "edge_attr_sfa", None) is not None:
        return batch.edge_attr_sfa, batch.edge_attr_sfa_src
    rd, rs = _packed_rows(batch)
    return _unpack(rd[0], batch)[3], _unpack(rs[0], batch)[3]


def sfa_gcn(batch):
    """((norm_dst, norm_src), inv_deg [N,1]) — the GCN normalization in
    each plan's slot order plus the self-term scale."""
    if getattr(batch, "sfa_gcn_norm_dst", None) is not None:
        return ((batch.sfa_gcn_norm_dst, batch.sfa_gcn_norm_src),
                batch.sfa_inv_deg[:, None])
    rd, rs = _packed_rows(batch)
    return ((_unpack(rd[0], batch)[2], _unpack(rs[0], batch)[2]),
            _inv_deg(batch)[:, None])


def _ell_rows(batch, pack=None, pack_src=None):
    if pack is None:
        pack = _edge_pack(batch)
    if pack_src is None:
        pack_src = _pack_src(batch, pack)
    pe_d, val_d, _ = _block_slots(batch.sfa_row_start_dst, 1,
                                  batch.ell_k_in)
    ps, val_s, _ = _block_slots(batch.sfa_row_start_src, 1,
                                batch.ell_k_out)
    return (_take(pack, pe_d), val_d), (_take(pack_src, ps), val_s)


def ell_plans(batch, _rows=None):
    """(plan_dst, plan_src) for ops/ell.py: node n's incoming (dst plan) /
    outgoing (src plan) edges at slots [n*K, n*K+deg)."""
    if getattr(batch, "ell_dst", None) is not None:
        return batch.ell_dst, batch.ell_src
    (rows_d, val_d), (rows_s, val_s) = _rows or _ell_rows(batch)
    return ({"other_g": jnp.where(val_d, rows_d[:, 0], 0),
             "mask": val_d.astype(jnp.float32)},
            {"other_g": jnp.where(val_s, rows_s[:, 1], 0),
             "mask": val_s.astype(jnp.float32)})


def ell_edge_attr(batch):
    """ELL-slot-ordered edge attrs (dst, src) for the opt-in ELL conv
    aggregation route (nn/conv._ELL_GMS)."""
    if getattr(batch, "edge_attr_ell", None) is not None:
        return batch.edge_attr_ell, batch.edge_attr_ell_src
    (rows_d, _), (rows_s, _) = _ell_rows(batch)
    return _unpack(rows_d, batch)[3], _unpack(rows_s, batch)[3]


def ell_gcn_norms(batch):
    if getattr(batch, "ell_gcn_norm_dst", None) is not None:
        return batch.ell_gcn_norm_dst, batch.ell_gcn_norm_src
    (rows_d, _), (rows_s, _) = _ell_rows(batch)
    return _unpack(rows_d, batch)[2], _unpack(rows_s, batch)[2]


def in_degree_f32(batch):
    """[N] valid in-degree from the dst row starts (PNA's scaler input)."""
    rs = batch.sfa_row_start_dst
    return (rs[1:] - rs[:-1]).astype(jnp.float32)


def pool_plan(batch):
    """Graph-major node slot plan for ops/scatter_free.graph_sum_sfa: valid
    nodes are graph-major, so pooling block b's slots are the contiguous
    node rows [node_start[b*POOL_NB], node_start[(b+1)*POOL_NB))."""
    if getattr(batch, "sfa_pool", None) is not None:
        return batch.sfa_pool
    g = batch.num_nodes.shape[0]
    g_pad = -(-g // POOL_NB) * POOL_NB
    nn = batch.num_nodes.astype(jnp.int32)
    if g_pad > g:
        nn = jnp.concatenate([nn, jnp.zeros(g_pad - g, jnp.int32)])
    node_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nn)])
    pe, valid, blk = _block_slots(node_start, POOL_NB, batch.sfa_pool_eb)
    # row-gather form: 1-D gathers lower to scalar SMEM loops on TPU
    ng = _take(batch.node_graph[:, None], pe)[:, 0]
    loc = jnp.where(valid, ng - blk * POOL_NB, 0)
    return {"other_g": jnp.where(valid, pe, 0), "loc": loc,
            "mask": valid.astype(jnp.float32)}


# ---------------------------------------------------------------------------
# once-per-step expansion (the production route)
# ---------------------------------------------------------------------------


def needs_expansion(batch) -> bool:
    return (getattr(batch, "sfa_row_start_dst", None) is not None
            and getattr(batch, "sfa_dst", None) is None)


def _expand_one(batch, want_ell: bool = True):
    import dataclasses

    pack = _edge_pack(batch)
    pack_src = _pack_src(batch, pack)
    rd, rs = _packed_rows(batch, pack, pack_src)
    plan_d, plan_s = _plans_from_rows(batch, rd, rs)
    _, _, nd, ea_d = _unpack(rd[0], batch)
    _, _, ns, ea_s = _unpack(rs[0], batch)
    fields = dict(sfa_dst=plan_d, sfa_src=plan_s,
                  edge_attr_sfa=ea_d, edge_attr_sfa_src=ea_s,
                  sfa_gcn_norm_dst=nd, sfa_gcn_norm_src=ns,
                  sfa_inv_deg=_inv_deg(batch))
    if (want_ell and batch.ell_k_in > 0
            and getattr(batch, "ell_dst", None) is None):
        fields["ell_dst"], fields["ell_src"] = ell_plans(
            batch, _rows=_ell_rows(batch, pack, pack_src))
    if getattr(batch, "sfa_pool_eb", 0) > 0:
        fields["sfa_pool"] = pool_plan(batch)
    return dataclasses.replace(batch, **fields)


@functools.cache
def _expand_jit(stacked: bool, want_ell: bool):
    fn = functools.partial(_expand_one, want_ell=want_ell)
    if stacked:
        fn = jax.vmap(fn)
    return jax.jit(fn)


def expand_batch(batch, want_ell: bool = True):
    """Standalone jitted expansion (tests / tools). Handles both flat and
    shard-stacked batches (leading axis). NOT used by the trainers: a
    separate expansion jit pays per-call RPC overhead through tunneled
    backends — they call expand_inline inside their own jit instead."""
    if not needs_expansion(batch):
        return batch
    stacked = batch.node_graph.ndim == 2
    return _expand_jit(stacked, want_ell)(batch)


def expand_inline(batch, want_ell: bool = True):
    """Trace-time expansion for use INSIDE an already-jitted step/forward:
    expands once per step so the per-layer consumers find explicit plans
    (lazy per-layer derivation is not CSE'd across layers by XLA —
    measured +18 ms/step on the code2 bench). The presence check is on
    pytree STRUCTURE, so it resolves at trace time. Pass want_ell=False
    for models that never touch the ELL reducers (everything but PNA) —
    the ELL row gathers are the largest single expansion cost ([N*K, W])."""
    if not needs_expansion(batch):
        return batch
    return _expand_one(batch, want_ell=want_ell)
