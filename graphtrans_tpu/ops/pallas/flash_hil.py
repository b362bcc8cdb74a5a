"""Streaming heads-in-lanes segment-masked attention (flash x packed hybrid).

The packed transformer stage at heavy-tailed code2 shapes runs flash
attention at [R*H, W=1024, hd=32]: Mosaic pads the 32-lane head dim to 128,
quadrupling the kernel's HBM traffic, and XLA adds head-split/merge copies
around it — profiled at ~38 ms of the 101.6 ms step (fwd 10.9 + dq 9.0 +
dkv 18.2), ~6x the matmul-FLOP floor.

This kernel combines the two proven designs:
  - flash_attention.py's ONLINE-SOFTMAX STREAMING over key blocks (O(S)
    memory, never materializing [S, S] scores), and
  - attention_packed.py's HEADS-IN-LANES construct: operands stay
    [B, S, d=H*hd] with the per-head structure expressed by a
    block-diagonal key/value construct built in VMEM —
        k2[r, c] = k[kc*BK + r % BK, c] * (r // BK == c // hd)
        s_full   = q @ k2^T          # [BQ, H*BK], head h at lanes h*BK..
    so every HBM operand moves exactly once at full 128-lane tiles, and
    the combined qkv/dqkv I/O kills XLA's split/concat copies (the same
    interface trick that won attention_packed its 10 ms).

Per-head online stats (m, l, alpha) are [BQ, 1] columns; lane-broadcast
factors (alpha / 1/l per head's lanes) are built arithmetically with
iota compares — no sub-tile lane slicing (Mosaic cannot concat/slice at
32-lane offsets).

Masking is by SEGMENT ID (ops/pack.py rows): query i attends key j iff
seg[i] == seg[j] >= 0. Dropout matches torch semantics (probabilities
normalized by the undropped denominator) with the mask regenerated
bit-identically in the backward from per-(row, head, q-block, k-block)
TPU PRNG seeds. Requires d % 128 == 0, S % 256 == 0 after padding
(handled here), any W >= 256 — the production route for packed rows too
wide for attention_packed (SP_MAX=384).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BQ = 512   # query rows per grid step (large: the block-diagonal k2/v2
           # constructs are per-(q-block, k-block) VPU work — fewer q
           # blocks amortize them; s_full [BQ, H*BK] f32 = 1 MB fits VMEM)
BK = 128   # key rows per inner loop step (= one lane tile per head block)

_NEG = -1e30


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _keep_mask(shape, rate, seed, interpret=False):
    from .prng import random_bits_u32

    thresh = jnp.uint32(min(max(1.0 - rate, 0.0), 1.0) * 0xFFFFFFFF)
    bits = random_bits_u32(shape, seed, interpret)
    return (bits < thresh).astype(jnp.float32)


def _lane_bcast(cols, hd, d):
    """cols: list of H [BQ, 1] f32 -> [BQ, d] with cols[h] broadcast over
    head h's hd lanes (arithmetic build — no sub-tile lane concat)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    acc = None
    for h, c in enumerate(cols):
        term = c * (lane // hd == h).astype(jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _tile_k2(kb, nhead, hd):
    """[BK, d] -> block-diagonal [H*BK, d] (head h's rows keep only its
    lanes). Same construct as attention_packed._tiled_kv, per key block."""
    d = kb.shape[1]
    tiled = jnp.concatenate([kb] * nhead, axis=0)        # [H*BK, d]
    row = jax.lax.broadcasted_iota(jnp.int32, (nhead * BK, d), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nhead * BK, d), 1)
    return tiled * (row // BK == lane // hd).astype(kb.dtype)


def _load(ref, pl, r0, rlen, c0, clen):
    """Dynamic ref load [1, S, C] -> [rlen, clen] (Mosaic supports dynamic
    slicing on REFS only — never dynamic_slice a materialized value)."""
    return ref[0, pl.dslice(r0, rlen), pl.dslice(c0, clen)]


def _fwd_kernel(seed_ref, qkv_ref, segq_ref, segk_ref, o_ref, m_ref, l_ref,
                *, s_len, nhead, rate, training, interpret=False):
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    qi = pl.program_id(1)
    d = qkv_ref.shape[2] // 3
    hd = d // nhead
    q = _load(qkv_ref, pl, qi * BQ, BQ, 0, d).astype(jnp.float32)
    segq = segq_ref[0]                                     # [BQ, 1] i32
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    nk = s_len // BK
    ms = [jnp.full((BQ, 1), _NEG, jnp.float32) for _ in range(nhead)]
    ls = [jnp.zeros((BQ, 1), jnp.float32) for _ in range(nhead)]
    acc = jnp.zeros((BQ, d), jnp.float32)

    def body(kc, carry):
        ms, ls, acc = carry
        kb = _load(qkv_ref, pl, kc * BK, BK, d, d).astype(jnp.float32)
        vb = _load(qkv_ref, pl, kc * BK, BK, 2 * d, d).astype(jnp.float32)
        sk = segk_ref[0, :, pl.dslice(kc * BK, BK)]        # [1, BK] i32
        kv = ((segq == sk) & (sk >= 0)).astype(jnp.float32)  # [BQ, BK]
        k2 = _tile_k2(kb, nhead, hd)
        s_full = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype)) * scale        # [BQ, H*BK]
        new_ms, new_ls, alphas, ps = [], [], [], []
        for h in range(nhead):
            sh = jax.lax.slice_in_dim(s_full, h * BK, (h + 1) * BK, axis=1)
            sh = sh * kv - (1.0 - kv) * (-_NEG)
            m_new = jnp.maximum(ms[h], jnp.max(sh, axis=-1, keepdims=True))
            alpha = jnp.exp(ms[h] - m_new)
            p = jnp.exp(sh - m_new) * kv
            new_ms.append(m_new)
            new_ls.append(ls[h] * alpha + jnp.sum(p, axis=-1, keepdims=True))
            alphas.append(alpha)
            if training and rate > 0.0:
                keep = _keep_mask(
                    p.shape, rate,
                    seed_ref[0] + ((b * nhead + h) * 16384 + qi) * 1024 + kc,
                    interpret)
                p = p * keep * (1.0 / (1.0 - rate))
            ps.append(p)
        p2 = jnp.concatenate(ps, axis=1).astype(jnp.float32)  # [BQ, H*BK]
        v2 = _tile_k2(vb, nhead, hd)
        alane = _lane_bcast(alphas, hd, d)
        acc = acc * alane + jax.lax.dot_general(
            p2, v2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))
        return new_ms, new_ls, acc

    ms, ls, acc = jax.lax.fori_loop(0, nk, body, (ms, ls, acc))
    linv = _lane_bcast([1.0 / jnp.maximum(l, 1e-16) for l in ls], hd, d)
    o_ref[0] = (acc * linv).astype(o_ref.dtype)
    m_ref[0] = jnp.concatenate(ms, axis=1)                 # [BQ, H]
    l_ref[0] = jnp.concatenate(ls, axis=1)


def _bwd_p(q, qkv_ref, d, segq, segk_ref, ms, ls, kc, nhead, hd, scale, dt,
           pl):
    """Recompute per-head probabilities for key block kc (shared by dq/dkv
    backward bodies)."""
    kb = _load(qkv_ref, pl, kc * BK, BK, d, d).astype(jnp.float32)
    sk = segk_ref[0, :, pl.dslice(kc * BK, BK)]
    kv = ((segq == sk) & (sk >= 0)).astype(jnp.float32)
    k2 = _tile_k2(kb, nhead, hd)
    s_full = jax.lax.dot_general(
        q, k2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(dt)) * scale
    ps = []
    for h in range(nhead):
        sh = jax.lax.slice_in_dim(s_full, h * BK, (h + 1) * BK, axis=1)
        sh = sh * kv - (1.0 - kv) * (-_NEG)
        l_inv = 1.0 / jnp.maximum(
            jax.lax.slice_in_dim(ls, h, h + 1, axis=1), 1e-16)
        p = jnp.exp(sh - jax.lax.slice_in_dim(ms, h, h + 1, axis=1)) * l_inv
        ps.append(p * kv)
    return ps, kv, k2


def _dq_kernel(seed_ref, qkv_ref, segq_ref, segk_ref, do_ref, delta_ref,
               m_ref, l_ref, dq_ref, *, s_len, nhead, rate, training,
               interpret=False):
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    qi = pl.program_id(1)
    d = qkv_ref.shape[2] // 3
    hd = d // nhead
    q = _load(qkv_ref, pl, qi * BQ, BQ, 0, d).astype(jnp.float32)
    segq = segq_ref[0]
    do = do_ref[0].astype(jnp.float32)                     # [BQ, d]
    delta = delta_ref[0]                                   # [BQ, H]
    ms = m_ref[0]                                          # [BQ, H]
    ls = l_ref[0]
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    nk = s_len // BK
    dq = jnp.zeros((BQ, d), jnp.float32)

    def body(kc, dq):
        ps, kv, k2 = _bwd_p(q, qkv_ref, d, segq, segk_ref, ms, ls, kc,
                            nhead, hd, scale, qkv_ref.dtype, pl)
        vb = _load(qkv_ref, pl, kc * BK, BK, 2 * d, d).astype(jnp.float32)
        v2 = _tile_k2(vb, nhead, hd)
        dp_full = jax.lax.dot_general(
            do, v2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))                # [BQ, H*BK]
        dss = []
        for h in range(nhead):
            dov = jax.lax.slice_in_dim(dp_full, h * BK, (h + 1) * BK, axis=1)
            if training and rate > 0.0:
                keep = _keep_mask(
                    dov.shape, rate,
                    seed_ref[0] + ((b * nhead + h) * 16384 + qi) * 1024 + kc,
                    interpret)
                dov = dov * keep * (1.0 / (1.0 - rate))
            dh = jax.lax.slice_in_dim(delta, h, h + 1, axis=1)
            dss.append(ps[h] * (dov - dh) * scale)
        ds2 = jnp.concatenate(dss, axis=1).astype(jnp.float32)
        # head h's term lands in its lanes through k2's baked-in lane mask
        return dq + jax.lax.dot_general(
            ds2, k2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))

    dq_ref[0] = jax.lax.fori_loop(0, nk, body, dq).astype(dq_ref.dtype)


def _fold_blocks(t2, nhead, hd):
    """[H*BK, d] f32 -> [BK, d]: sum head blocks with their lane masks."""
    d = t2.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (BK, d), 1)
    acc = None
    for h in range(nhead):
        blk = jax.lax.slice_in_dim(t2, h * BK, (h + 1) * BK, axis=0)
        blk = blk * (lane // hd == h).astype(blk.dtype)
        acc = blk if acc is None else acc + blk
    return acc


def _dkv_kernel(seed_ref, qkv_ref, segq_ref, segk_ref, do_ref, delta_ref,
                m_ref, l_ref, dk_ref, dv_ref, *, s_len, nhead, rate,
                training, interpret=False):
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    ki = pl.program_id(1)
    d = qkv_ref.shape[2] // 3
    hd = d // nhead
    kb = _load(qkv_ref, pl, ki * BK, BK, d, d).astype(jnp.float32)
    vb = _load(qkv_ref, pl, ki * BK, BK, 2 * d, d).astype(jnp.float32)
    sk = segk_ref[0, :, pl.dslice(ki * BK, BK)]            # [1, BK]
    k2 = _tile_k2(kb, nhead, hd)
    v2 = _tile_k2(vb, nhead, hd)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))

    nq = s_len // BQ
    dk2 = jnp.zeros((nhead * BK, d), jnp.float32)
    dv2 = jnp.zeros((nhead * BK, d), jnp.float32)

    def body(qc, carry):
        dk2, dv2 = carry
        qb = _load(qkv_ref, pl, qc * BQ, BQ, 0, d).astype(jnp.float32)
        sq = segq_ref[0, pl.dslice(qc * BQ, BQ), :]        # [BQ, 1]
        kv = ((sq == sk) & (sk >= 0)).astype(jnp.float32)  # [BQ, BK]
        dob = do_ref[0, pl.dslice(qc * BQ, BQ), :].astype(jnp.float32)
        deltab = delta_ref[0, pl.dslice(qc * BQ, BQ), :]
        msb = m_ref[0, pl.dslice(qc * BQ, BQ), :]
        lsb = l_ref[0, pl.dslice(qc * BQ, BQ), :]
        s_full = jax.lax.dot_general(
            qb, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype)) * scale
        dp_full = jax.lax.dot_general(
            dob, v2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))
        ps_drop, dss = [], []
        for h in range(nhead):
            sh = jax.lax.slice_in_dim(s_full, h * BK, (h + 1) * BK, axis=1)
            sh = sh * kv - (1.0 - kv) * (-_NEG)
            l_inv = 1.0 / jnp.maximum(
                jax.lax.slice_in_dim(lsb, h, h + 1, axis=1), 1e-16)
            p = (jnp.exp(sh - jax.lax.slice_in_dim(msb, h, h + 1, axis=1))
                 * l_inv) * kv
            dov = jax.lax.slice_in_dim(dp_full, h * BK, (h + 1) * BK, axis=1)
            if training and rate > 0.0:
                keep = _keep_mask(
                    p.shape, rate,
                    seed_ref[0] + ((b * nhead + h) * 16384 + qc) * 1024 + ki,
                    interpret)
                ps_drop.append(p * keep * (1.0 / (1.0 - rate)))
                dov = dov * keep * (1.0 / (1.0 - rate))
            else:
                ps_drop.append(p)
            dh = jax.lax.slice_in_dim(deltab, h, h + 1, axis=1)
            dss.append(p * (dov - dh) * scale)
        p2d = jnp.concatenate(ps_drop, axis=1).astype(jnp.float32)
        ds2 = jnp.concatenate(dss, axis=1).astype(jnp.float32)
        dv2 = dv2 + jax.lax.dot_general(
            p2d, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))                # [H*BK, d]
        dk2 = dk2 + jax.lax.dot_general(
            ds2, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(qkv_ref.dtype))
        return dk2, dv2

    dk2, dv2 = jax.lax.fori_loop(0, nq, body, (dk2, dv2))
    dk_ref[0] = _fold_blocks(dk2, nhead, hd).astype(dk_ref.dtype)
    dv_ref[0] = _fold_blocks(dv2, nhead, hd).astype(dv_ref.dtype)


def _pad_s(x, s_pad, axis, value=0):
    pad = s_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_hil_seg_qkv(qkv, seg, seed, nhead: int, rate: float = 0.0,
                      training: bool = False, interpret: bool = False):
    """qkv: [B, S, 3d] combined projection output (heads in lanes);
    seg: [B, S] int32 segment ids (-1 = padding); seed: int32 scalar.
    Returns [B, S, d]; the backward emits combined dqkv. Requires
    d % 128 == 0; S padded to a 256 multiple internally."""
    o, _, _ = _fwd(qkv, seg, seed, nhead, rate, training, interpret)
    return o


def _fwd(qkv, seg, seed, nhead, rate, training, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, d3 = qkv.shape
    d = d3 // 3
    assert d % 128 == 0 and d % nhead == 0, (d, nhead)
    s_pad = -(-S // BQ) * BQ
    qkvp = _pad_s(qkv, s_pad, 1)
    segp = _pad_s(seg.astype(jnp.int32), s_pad, 1, value=-1)

    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    grid = (B, s_pad // BQ)
    H = nhead
    o, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, s_len=s_pad, nhead=nhead, rate=rate,
                          training=training, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # full row resident: q is sliced per block inside
                pl.BlockSpec((1, s_pad, 3 * d),
                             lambda b, i, *_: (b, 0, 0)),
                pl.BlockSpec((1, BQ, 1), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, s_pad), lambda b, i, *_: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, H), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BQ, H), lambda b, i, *_: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, s_pad, d), qkv.dtype),
            jax.ShapeDtypeStruct((B, s_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((B, s_pad, H), jnp.float32),
        ],
        interpret=interpret,
    )(seed, qkvp, segp[:, :, None], segp[:, None, :])
    return o[:, :S], m, l


def _fwd_rule(qkv, seg, seed, nhead, rate, training, interpret):
    o, m, l = _fwd(qkv, seg, seed, nhead, rate, training, interpret)
    return o, (qkv, seg, o, m, l, seed)


def _bwd_rule(nhead, rate, training, interpret, res, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qkv, seg, o, m, l, seed = res
    B, S, d3 = qkv.shape
    d = d3 // 3
    hd = d // nhead
    s_pad = -(-S // BQ) * BQ
    qkvp = _pad_s(qkv, s_pad, 1)
    segp = _pad_s(seg.astype(jnp.int32), s_pad, 1, value=-1)
    gp = _pad_s(g, s_pad, 1)
    op = _pad_s(o, s_pad, 1)
    # per-head delta: sum over head h's lanes of do * o -> [B, s_pad, H]
    do_o = (op.astype(jnp.float32) * gp.astype(jnp.float32))
    delta = do_o.reshape(B, s_pad, nhead, hd).sum(axis=-1)

    seeds = jnp.asarray(seed, jnp.int32).reshape(1)
    H = nhead
    row = lambda b, i, *_: (b, 0, 0)
    qrow = lambda b, i, *_: (b, i, 0)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, s_len=s_pad, nhead=nhead, rate=rate,
                          training=training, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, s_pad // BQ),
            in_specs=[
                pl.BlockSpec((1, s_pad, 3 * d), row),
                pl.BlockSpec((1, BQ, 1), qrow),
                pl.BlockSpec((1, 1, s_pad), row),
                pl.BlockSpec((1, BQ, d), qrow),
                pl.BlockSpec((1, BQ, H), qrow),
                pl.BlockSpec((1, BQ, H), qrow),
                pl.BlockSpec((1, BQ, H), qrow),
            ],
            out_specs=pl.BlockSpec((1, BQ, d), qrow),
        ),
        out_shape=jax.ShapeDtypeStruct((B, s_pad, d), qkv.dtype),
        interpret=interpret,
    )(seeds, qkvp, segp[:, :, None], segp[:, None, :], gp, delta, m, l)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, s_len=s_pad, nhead=nhead, rate=rate,
                          training=training, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, s_pad // BK),
            in_specs=[
                pl.BlockSpec((1, s_pad, 3 * d), row),
                pl.BlockSpec((1, s_pad, 1), row),
                pl.BlockSpec((1, 1, s_pad), row),
                pl.BlockSpec((1, s_pad, d), row),
                pl.BlockSpec((1, s_pad, H), row),
                pl.BlockSpec((1, s_pad, H), row),
                pl.BlockSpec((1, s_pad, H), row),
            ],
            out_specs=[
                pl.BlockSpec((1, BK, d), lambda b, i, *_: (b, i, 0)),
                pl.BlockSpec((1, BK, d), lambda b, i, *_: (b, i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, s_pad, d), qkv.dtype),
            jax.ShapeDtypeStruct((B, s_pad, d), qkv.dtype),
        ],
        interpret=interpret,
    )(seeds, qkvp, segp[:, :, None], segp[:, None, :], gp, delta, m, l)

    dqkv = jnp.concatenate([dq[:, :S], dk[:, :S], dv[:, :S]], axis=2)
    return dqkv, None, None


flash_hil_seg_qkv.defvjp(_fwd_rule, _bwd_rule)
