"""Chip-side kernel regression smoke: run every production Pallas kernel
COMPILED on the real TPU against an XLA reference and assert exactness.

VERDICT r2 weak #5: the fused kernels' on-chip parity lived in one-off
harnesses; tests/ run interpret mode only, so a Mosaic/layout regression
would hide until a perf run. This tool is the mechanical catch: it exercises

  - ops/pallas/dense_agg.fused_dense_agg     (fwd + x/emb/w grads)
  - ops/pallas/gin_agg.fused_gin_agg         (in-kernel table lookup,
                                              fwd + x/table/w grads)
  - ops/pallas/attention_packed              (small-S block-diagonal AND
                                              medium-S, fwd + q/k/v grads)
  - ops/pallas/flash_attention               (S=1024, fwd + q/k/v grads)

at f32 with dropout off, compares against dense XLA math at HIGHEST
precision, and prints ONE JSON line (also written to SMOKE_TPU.json when
--out is given). bench.py runs this as part of the bench flow (--smoke,
default on for TPU) so every benched build re-proves kernel exactness.

Skips (with ok=false, reason) when the backend is not TPU — compiled Mosaic
is the thing under test; interpret-mode parity already lives in tests/.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _ref_heads_in_lanes(jnp, masked_softmax, q, k, v, valid, nhead, block):
    import jax
    hi = jax.lax.Precision.HIGHEST
    B, S, d = q.shape
    hd = d // nhead

    def split(t):
        return t.reshape(B, S, nhead, hd).transpose(0, 2, 1, 3)

    qs, ks, vs = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qs, ks, precision=hi) / np.sqrt(hd)
    mask = valid[:, None, None, :]
    if block:
        grp = jnp.arange(S) // block
        mask = mask & (grp[:, None] == grp[None, :])[None, None]
    a = masked_softmax(s, mask)
    y = jnp.einsum("bhqk,bhkd->bhqd", a, vs, precision=hi)
    return y.transpose(0, 2, 1, 3).reshape(B, S, d)


def _check(name, got, want, bound, results):
    err = float(np.max(np.abs(np.asarray(got) - np.asarray(want))))
    results[name] = {"max_abs_err": err, "bound": bound, "ok": err <= bound}
    return results[name]["ok"]


def run_all():
    import jax
    import jax.numpy as jnp

    results, ok = {}, True
    rng = np.random.default_rng(0)

    # ---- dense_agg: strided-layout one-hot aggregation -------------------
    from jax.lax import Precision

    from graphtrans_tpu.ops.pallas.dense_agg import fused_dense_agg

    G, Sm, Em, d = 32, 40, 64, 128
    xd = jnp.asarray(rng.standard_normal((G, Sm, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    emask = jnp.asarray(rng.random((G, Em)) > 0.2)
    emb = jnp.asarray(rng.standard_normal((G, Em, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((G, Em)).astype(np.float32))

    def dense_ref(xd, emb, wa, relu=True):
        iota = jnp.arange(Sm)
        oh_s = ((src[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        oh_d = ((dst[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        xs = jax.lax.dot_general(oh_s, xd, (((2,), (1,)), ((0,), (0,))),
                                 precision=Precision.HIGHEST)
        m = jnp.maximum(xs + emb, 0) if relu else xs + emb
        if wa is not None:
            m = m * wa[..., None]
        m = jnp.where(emask[..., None], m, 0)
        return jax.lax.dot_general(oh_d, m, (((1,), (1,)), ((0,), (0,))),
                                   precision=Precision.HIGHEST)

    o = jax.jit(lambda x, e, wa: fused_dense_agg(x, src, dst, emask, e, wa))(
        xd, emb, w)
    ok &= _check("dense_agg_fwd", o, dense_ref(xd, emb, w), 1e-5, results)
    gk = jax.jit(jax.grad(lambda x, e, wa: jnp.sum(
        fused_dense_agg(x, src, dst, emask, e, wa) ** 2), argnums=(0, 1, 2)))(
        xd, emb, w)
    gr = jax.grad(lambda x, e, wa: jnp.sum(dense_ref(x, e, wa) ** 2),
                  argnums=(0, 1, 2))(xd, emb, w)
    for nm, a, b in zip(("dx", "demb", "dw"), gk, gr):
        ok &= _check(f"dense_agg_{nm}", a, b, 2e-4, results)

    # ---- gin_agg: fused-tables aggregation -------------------------------
    from graphtrans_tpu.ops.pallas.gin_agg import VP, fused_gin_agg

    F, vocab = 3, 24
    attr = jnp.asarray(
        (rng.integers(0, vocab, (G, F, Em))
         + (np.arange(F) * vocab)[None, :, None]).astype(np.int32))
    tbl_small = jnp.asarray(
        rng.standard_normal((F * vocab, d)).astype(np.float32))

    def pad_tbl(t):
        return jnp.concatenate([t, jnp.zeros((VP - t.shape[0], d), t.dtype)])

    def gin_ref(x, t, wa):
        e = t[attr.transpose(0, 2, 1)].sum(2)  # [G, Em, d] summed features
        return dense_ref(x, e, wa)

    o = jax.jit(lambda x, t, wa: fused_gin_agg(
        x, src, dst, emask, attr, pad_tbl(t), wa, None))(xd, tbl_small, w)
    ok &= _check("gin_agg_fwd", o, gin_ref(xd, tbl_small, w), 1e-5, results)
    gk = jax.jit(jax.grad(lambda x, t, wa: jnp.sum(fused_gin_agg(
        x, src, dst, emask, attr, pad_tbl(t), wa, None) ** 2),
        argnums=(0, 1, 2)))(xd, tbl_small, w)
    gr = jax.grad(lambda x, t, wa: jnp.sum(gin_ref(x, t, wa) ** 2),
                  argnums=(0, 1, 2))(xd, tbl_small, w)
    for nm, a, b in zip(("dx", "dtbl", "dw"), gk, gr):
        ok &= _check(f"gin_agg_{nm}", a, b, 5e-4, results)

    # ---- attention_packed: small-S block-diagonal + medium-S -------------
    from graphtrans_tpu.nn.transformer import masked_softmax
    from graphtrans_tpu.ops.pallas.attention_packed import attention_packed

    for tag, (B, S, H, block) in (("smalls", (11, 99, 4, 33)),
                                  ("medium", (8, 256, 4, 0))):
        q = jnp.asarray(rng.standard_normal((B, S, 128)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, S, 128)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, S, 128)).astype(np.float32))
        valid = np.ones((B, S), bool)
        valid[0, S - 10:] = False
        valid[B - 1, :] = False
        vj = jnp.asarray(valid)
        want = _ref_heads_in_lanes(jnp, masked_softmax, q, k, v, vj, H, block)
        got = jax.jit(lambda q, k, v: attention_packed(
            q, k, v, vj, 0, H, 0.0, False, False, block))(q, k, v)
        ok &= _check(f"attn_packed_{tag}_fwd", got, want, 2e-5, results)
        gk = jax.jit(jax.grad(lambda q, k, v: jnp.sum(attention_packed(
            q, k, v, vj, 0, H, 0.0, False, False, block) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(_ref_heads_in_lanes(
            jnp, masked_softmax, q, k, v, vj, H, block) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for nm, a, b in zip(("dq", "dk", "dv"), gk, gr):
            ok &= _check(f"attn_packed_{tag}_{nm}", a, b, 5e-4, results)

    # ---- flash attention at S=1024 ---------------------------------------
    from graphtrans_tpu.ops.pallas.flash_attention import flash_attention

    BH, S, hd = 8, 1024, 64
    q = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, S, hd)).astype(np.float32))
    valid = np.ones((BH, S), bool)
    valid[0, 700:] = False
    vj = jnp.asarray(valid)

    def flash_ref(q, k, v):
        hi = jax.lax.Precision.HIGHEST
        s = jnp.einsum("bqd,bkd->bqk", q, k, precision=hi) / np.sqrt(hd)
        a = masked_softmax(s, vj[:, None, :])
        return jnp.einsum("bqk,bkd->bqd", a, v, precision=hi)

    got = jax.jit(lambda q, k, v: flash_attention(q, k, v, vj, 0))(q, k, v)
    ok &= _check("flash_fwd", got, flash_ref(q, k, v), 2e-5, results)
    gk = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, vj, 0) ** 2), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(flash_ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for nm, a, b in zip(("dq", "dk", "dv"), gk, gr):
        ok &= _check(f"flash_{nm}", a, b, 5e-4, results)

    # ---- segment-masked variants (variable-length packed rows, round 5) --
    from graphtrans_tpu.ops.pallas.attention_packed import (
        attention_packed_seg_qkv)
    from graphtrans_tpu.ops.pallas.flash_attention import flash_attention_seg

    seg_np = np.where(rng.random((BH, S)) < 0.1, -1,
                      rng.integers(0, 37, (BH, S))).astype(np.int32)
    segj = jnp.asarray(seg_np)

    def flash_seg_ref(q, k, v):
        hi = jax.lax.Precision.HIGHEST
        s = jnp.einsum("bqd,bkd->bqk", q, k, precision=hi) / np.sqrt(hd)
        m = ((segj[:, :, None] == segj[:, None, :])
             & (segj >= 0)[:, None, :])
        a = masked_softmax(s, m)
        return jnp.einsum("bqk,bkd->bqd", a, v, precision=hi)

    got = jax.jit(lambda q, k, v: flash_attention_seg(
        q, k, v, segj, 0))(q, k, v)
    ok &= _check("flash_seg_fwd", got, flash_seg_ref(q, k, v), 2e-5, results)
    gk = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        flash_attention_seg(q, k, v, segj, 0) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(flash_seg_ref(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for nm, a, b in zip(("dq", "dk", "dv"), gk, gr):
        ok &= _check(f"flash_seg_{nm}", a, b, 5e-4, results)

    B2, S2, H2 = 7, 256, 4
    qkv = jnp.asarray(rng.standard_normal((B2, S2, 384)).astype(np.float32))
    seg2 = np.where(rng.random((B2, S2)) < 0.12, -1,
                    rng.integers(0, 9, (B2, S2))).astype(np.int32)
    seg2j = jnp.asarray(seg2)

    def pseg_ref(qkv):
        hi = jax.lax.Precision.HIGHEST
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(B2, S2, H2, 32).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=hi) / np.sqrt(32)
        m = ((seg2j[:, :, None] == seg2j[:, None, :])
             & (seg2j >= 0)[:, None, :])[:, None]
        a = masked_softmax(s, m)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v, precision=hi)
        return o.transpose(0, 2, 1, 3).reshape(B2, S2, 128)

    got = jax.jit(lambda qkv: attention_packed_seg_qkv(
        qkv, seg2j, 0, H2))(qkv)
    ok &= _check("attn_packed_seg_fwd", got, pseg_ref(qkv), 2e-5, results)
    gk = jax.jit(jax.grad(lambda qkv: jnp.sum(attention_packed_seg_qkv(
        qkv, seg2j, 0, H2) ** 2)))(qkv)
    gr = jax.grad(lambda qkv: jnp.sum(pseg_ref(qkv) ** 2))(qkv)
    ok &= _check("attn_packed_seg_dqkv", gk, gr, 5e-4, results)

    # ---- streaming heads-in-lanes seg attention (wide packed rows) -------
    from graphtrans_tpu.ops.pallas.flash_hil import flash_hil_seg_qkv

    B3, S3, H3 = 3, 1024, 4
    qkv3 = jnp.asarray(rng.standard_normal((B3, S3, 384)).astype(np.float32))
    seg3 = np.where(rng.random((B3, S3)) < 0.1, -1,
                    rng.integers(0, 29, (B3, S3))).astype(np.int32)
    seg3j = jnp.asarray(seg3)

    def hil_ref(qkv):
        hi = jax.lax.Precision.HIGHEST
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = lambda t: t.reshape(B3, S3, H3, 32).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=hi) / np.sqrt(32)
        m = ((seg3j[:, :, None] == seg3j[:, None, :])
             & (seg3j >= 0)[:, None, :])[:, None]
        a = masked_softmax(s, m)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v, precision=hi)
        return o.transpose(0, 2, 1, 3).reshape(B3, S3, 128)

    got = jax.jit(lambda qkv: flash_hil_seg_qkv(qkv, seg3j, 0, H3))(qkv3)
    ok &= _check("flash_hil_fwd", got, hil_ref(qkv3), 2e-5, results)
    gk = jax.jit(jax.grad(lambda qkv: jnp.sum(flash_hil_seg_qkv(
        qkv, seg3j, 0, H3) ** 2)))(qkv3)
    gr = jax.grad(lambda qkv: jnp.sum(hil_ref(qkv) ** 2))(qkv3)
    ok &= _check("flash_hil_dqkv", gk, gr, 5e-4, results)

    return {"smoke": "tpu_kernels", "device": str(jax.devices()[0]),
            "ok": bool(ok), "checks": results}


def main():
    import jax

    from graphtrans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if jax.default_backend() not in ("tpu", "axon"):
        out = {"smoke": "tpu_kernels", "ok": False,
               "reason": f"backend is {jax.default_backend()}, not TPU — "
                         "compiled Mosaic is the thing under test"}
    else:
        out = run_all()
    line = json.dumps(out)
    print(line)
    if "--out" in sys.argv:
        path = sys.argv[sys.argv.index("--out") + 1]
        with open(path, "w") as f:
            f.write(line + "\n")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
