"""Global-attention transformer encoder over packed node sequences.

Re-implements the semantics of torch `nn.TransformerEncoder` as configured by
the reference (/root/reference/modules/transformer_encoder.py:9-61):
post-norm layers (attn -> add -> LN -> FF -> add -> LN), a final LayerNorm,
key-padding masking, optional input LayerNorm (--transformer_norm_input), and
a learnable CLS token. The reference concatenates CLS at the END of its
front-padded [S,B,d] sequence; here sequences are batch-major back-padded
[B,S,d] and CLS occupies a dedicated final column — the same readout position
(index -1) and the same set of attended keys.

Layout is [B, S, d] throughout (TPU/MXU-friendly batched matmuls; XLA fuses
the softmax chain). The attention uses a numerically-safe masked softmax so
fully-padded rows (possible for padding graphs in a static batch — impossible
in the reference's dynamic batches) produce zeros, not NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dropout import ByteDropout
from .init import TDense, kaiming_uniform, normal


def masked_softmax(scores, key_valid, axis=-1):
    """softmax over `axis` with invalid keys excluded; all-invalid rows -> 0."""
    neg = jnp.asarray(-1e30, scores.dtype)
    scores = jnp.where(key_valid, scores, neg)
    m = jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m))
    e = jnp.where(key_valid, e, 0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


def chunked_masked_attention(q, k, v, key_valid, key_chunk: int,
                             dropout: float = 0.0, dropout_rng=None):
    """Memory-efficient attention: lax.scan over key blocks with an online
    softmax (running max/denominator), O(S_q * chunk) live memory instead of
    the full [B,H,Sq,Sk] score tensor. Matches masked_softmax semantics
    (all-masked rows -> zeros). Attention dropout keeps torch semantics —
    probabilities normalized by the UNDROPPED denominator, then dropped —
    by accumulating denom from p and the value sum from dropped p.
    q,k,v: [B,H,S,hd]; key_valid: [B,S]."""
    B, H, S, hd = q.shape
    nchunks = -(-S // key_chunk)
    pad = nchunks * key_chunk - S
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))
    kc = k.reshape(B, H, nchunks, key_chunk, hd).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(B, H, nchunks, key_chunk, hd).transpose(2, 0, 1, 3, 4)
    mc = key_valid.reshape(B, nchunks, key_chunk).transpose(1, 0, 2)

    scale = 1.0 / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    neg = jnp.asarray(-1e30, jnp.float32)
    use_dropout = dropout > 0.0 and dropout_rng is not None

    def body(carry, blk):
        m_run, denom, acc = carry
        kb, vb, maskb, idx = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(maskb[:, None, None, :], s, neg)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(maskb[:, None, None, :], p, 0)
        denom = denom * alpha + jnp.sum(p, axis=-1)
        if use_dropout:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, idx), 1.0 - dropout, p.shape
            )
            p = jnp.where(keep, p / (1.0 - dropout), 0)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb.astype(p.dtype))
        return (m_new, denom, acc), None

    init = (
        jnp.full((B, H, S), neg, jnp.float32),
        jnp.zeros((B, H, S), jnp.float32),
        jnp.zeros((B, H, S, hd), jnp.float32),
    )
    (m_run, denom, acc), _ = jax.lax.scan(
        body, init, (kc, vc, mc, jnp.arange(nchunks)))
    return acc / jnp.maximum(denom, 1e-16)[..., None]


_ATTN_BACKEND = "auto"
# S at which 'auto' leaves the dense XLA path for flash (TPU) / chunked
# (elsewhere). Module-global so benches can A/B without re-plumbing every
# model constructor; a module's explicit chunk_threshold field overrides.
_CHUNK_THRESHOLD = 512
# test hook: route 'packed_fused' through interpret-mode kernels off-TPU
_PFUSED_INTERPRET = False
# test hook: route the seg-masked flash kernel through interpret mode
_FLASH_INTERPRET = False


def set_attn_backend(name: str):
    """Process-wide attention backend (trace-time). 'auto': the flash
    Pallas kernel on TPU for S >= chunk_threshold, chunked lax.scan off-TPU,
    dense XLA below the threshold (the fused small-S kernel measured slower
    there and is opt-in only). Or force one of
    'flash' | 'smalls' | 'chunked' | 'dense' | 'packed'.

    'packed' (short sequences): TransformerNodeEncoder reshapes GB graphs'
    rows into one packed row [B/GB, GB*S, d] (free, row-major) and runs the
    WHOLE layer stack in that layout — LayerNorm/FF/projections are row-wise
    so only attention changes, becoming block-diagonal (each graph attends
    within its own S-token block), still on XLA's dense batched-matmul path.
    Addresses the profiled failure mode of the flagship step: XLA lowers
    S~33 attention as ~16k tiny [33,32] matmuls at <1% MXU utilization
    (latency-bound). MEASURED (v5e, bs=4096 flagship, bf16): 80.9 ms step
    vs 97.7 dense — 'auto' therefore packs on TPU whenever GB > 1.
    'packed_smalls' routes the packed rows through the fused Pallas
    block-diagonal kernel instead (ops/pallas/attention_smallS.py, block>0)
    — measured SLOWER (101.5 ms: hd=32 pads to 128 VMEM lanes, 4x the DMA
    bytes) and kept opt-in for experimentation.
    'packed_fused' routes the packed rows through the heads-in-lanes fused
    Pallas kernel (ops/pallas/attention_packed.py): per-head structure is a
    block-diagonal K/V construct so every matmul contracts over the full
    d=128 lanes — the fix for packed_smalls' lane-padding loss. Requires
    d_model % 128 == 0 (other widths fall back to the XLA dense path).
    'packed_layer' fuses the ENTIRE encoder layer into one Pallas kernel
    per direction (ops/pallas/transformer_layer.py) — measured SLOWER
    (73.7 vs 57.4 ms step: a monolithic kernel serializes what XLA runs
    as overlapping fusions) and kept opt-in as a documented negative
    result."""
    global _ATTN_BACKEND
    assert name in ("auto", "flash", "smalls", "chunked", "dense",
                    "packed", "packed_smalls", "packed_fused",
                    "packed_layer"), name
    _ATTN_BACKEND = name


def _block_mask(key_valid, block: int, S: int):
    """[..., S] key mask -> [..., S, S] block-diagonal attention mask."""
    grp = jnp.arange(S, dtype=jnp.int32) // block
    same = grp[:, None] == grp[None, :]
    return key_valid[..., None, :] & same


class MultiheadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention-equivalent self-attention (combined QKV
    projection, xavier-uniform init, zero-init projection biases).

    For long node sequences (S >= chunk_threshold) the score tensor is never
    materialized: on TPU a flash-attention Pallas kernel (online-softmax
    fwd + two-pass bwd, ops/pallas/flash_attention.py), elsewhere a chunked
    online-softmax lax.scan — the TPU-native answer to code2-scale graphs
    (S=1000 would otherwise allocate [B,H,S,S] ~ hundreds of MB per layer).
    Both long-sequence paths keep torch attention-dropout semantics
    (probabilities normalized by the undropped denominator)."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    chunk_threshold: int = 0   # 0 = module default _CHUNK_THRESHOLD
    key_chunk: int = 128

    @nn.compact
    def __call__(self, x, key_valid, training: bool, attn_bias=None,
                 block: int = 0, seg=None):
        """block > 0: x holds graph-packed rows (see set_attn_backend
        'packed') — attention is restricted to `block`-sized diagonal
        groups. Runs in the fused Pallas kernel on TPU, dense XLA with a
        block-diagonal mask elsewhere.

        seg is not None: x holds VARIABLE-length packed rows (ops/pack.py)
        — token i attends token j iff seg[i] == seg[j] >= 0 (-1 = padding).
        Flash kernel with in-kernel segment masking on TPU; dense XLA with
        the materialized segment mask elsewhere/small-S."""
        B, S, d = x.shape
        assert d == self.d_model and d % self.nhead == 0
        hd = d // self.nhead
        in_proj = self.param("in_proj", nn.initializers.xavier_uniform(), (d, 3 * d))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = x @ in_proj + in_bias
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B,S,d] -> [B,H,S,hd]
            return t.reshape(B, S, self.nhead, hd).transpose(0, 2, 1, 3)

        if seg is not None:
            on_tpu = jax.default_backend() == "tpu"
            if ((on_tpu or _PFUSED_INTERPRET) and d % 128 == 0
                    and S <= 384
                    and _ATTN_BACKEND in ("auto", "packed_fused")):
                # variable-length packed rows at medium S: the heads-in-
                # lanes fused kernel with segment masking (full d-lane
                # contractions — flash at hd=32 pays a 4x lane-padding tax)
                from ..ops.pallas.attention_packed import (
                    attention_packed_seg_qkv)

                rate = self.dropout if training else 0.0
                seed = (
                    jax.random.randint(self.make_rng("dropout"), (), 0,
                                       2**31 - 1)
                    if rate > 0.0 else jnp.zeros((), jnp.int32)
                )
                y = attention_packed_seg_qkv(
                    qkv, seg.astype(jnp.int32), seed, self.nhead, rate,
                    training, _PFUSED_INTERPRET)
                out_w = self.param("out_proj", kaiming_uniform(), (d, d))
                out_b = self.param("out_proj_bias", nn.initializers.zeros,
                                   (d,))
                return y.astype(x.dtype) @ out_w + out_b
            if ((on_tpu or _FLASH_INTERPRET) and d % 128 == 0 and S > 384
                    and _ATTN_BACKEND in ("auto", "flash")):
                # wide packed rows (heavy-tailed datasets, W up to 1024+):
                # streaming heads-in-lanes kernel — flash's O(S) memory with
                # attention_packed's full-128-lane operand layout and
                # combined qkv/dqkv I/O (the per-head flash arm at hd=32
                # profiled 38 ms/step of 4x-lane-padded DMA + head copies)
                from ..ops.pallas.flash_hil import flash_hil_seg_qkv

                rate = self.dropout if training else 0.0
                seed = (
                    jax.random.randint(self.make_rng("dropout"), (), 0,
                                       2**31 - 1)
                    if rate > 0.0 else jnp.zeros((), jnp.int32)
                )
                y = flash_hil_seg_qkv(qkv, seg.astype(jnp.int32), seed,
                                      self.nhead, rate, training,
                                      _FLASH_INTERPRET)
                out_w = self.param("out_proj", kaiming_uniform(), (d, d))
                out_b = self.param("out_proj_bias", nn.initializers.zeros,
                                   (d,))
                return y.astype(x.dtype) @ out_w + out_b
            if ((on_tpu or _FLASH_INTERPRET) and S >= 256
                    and _ATTN_BACKEND in ("auto", "flash")):
                from ..ops.pallas.flash_attention import flash_attention_seg

                rate = self.dropout if training else 0.0
                seed = (
                    jax.random.randint(self.make_rng("dropout"), (), 0,
                                       2**31 - 1)
                    if rate > 0.0 else jnp.zeros((), jnp.int32)
                )
                q, k, v = heads(q), heads(k), heads(v)
                segh = jnp.broadcast_to(
                    seg[:, None, :], (B, self.nhead, S)).reshape(-1, S)
                o = flash_attention_seg(
                    q.reshape(-1, S, hd), k.reshape(-1, S, hd),
                    v.reshape(-1, S, hd), segh, seed, rate, training,
                    _FLASH_INTERPRET)
                y = o.reshape(B, self.nhead, S, hd)
                y = y.transpose(0, 2, 1, 3).reshape(B, S, d).astype(x.dtype)
            else:
                q, k, v = heads(q), heads(k), heads(v)
                mask = ((seg[:, :, None] == seg[:, None, :])
                        & (seg >= 0)[:, None, :])[:, None]
                scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                    preferred_element_type=jnp.float32)
                scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
                att = masked_softmax(scores, mask).astype(x.dtype)
                att = ByteDropout(self.dropout)(att,
                                                deterministic=not training)
                y = jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(att.dtype))
                y = y.transpose(0, 2, 1, 3).reshape(B, S, d).astype(x.dtype)
            out_w = self.param("out_proj", kaiming_uniform(), (d, d))
            out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
            return y @ out_w + out_b

        backend = _ATTN_BACKEND
        if block > 0:
            # packed rows: the fused heads-in-lanes Pallas kernel when the
            # shape fits (d % 128 == 0), else XLA dense block-mask attention;
            # 'packed_smalls' = opt-in per-head Pallas kernel arm (slower)
            on_tpu = jax.default_backend() == "tpu"
            if on_tpu and backend == "packed_smalls":
                backend = "smalls"
            elif ((on_tpu or _PFUSED_INTERPRET) and d % 128 == 0
                  and S <= 384 and backend in ("packed_fused", "auto")):
                # 'auto' takes the fused kernel: measured 67.5 ms flagship
                # step vs 78.1 ms XLA dense-packed (v5e, bs=4096, bf16);
                # 'packed' stays the XLA arm for A/B comparisons
                backend = "pfused"
            else:
                backend = "dense"
        elif backend == "auto":
            # short sequences stay on the dense XLA path: the fused small-S
            # kernel (attention_smallS) measured SLOWER on v5e (hd=32 lane
            # padding quadruples its VMEM traffic; XLA's batched path wins
            # at S~33) — kept as a forceable backend for experimentation
            on_tpu = jax.default_backend() == "tpu"
            if S >= (self.chunk_threshold or _CHUNK_THRESHOLD):
                backend = "flash" if on_tpu else "chunked"
            elif ((on_tpu or _PFUSED_INTERPRET) and d % 128 == 0
                  and 128 < S <= 384):
                # medium-S window (code2-shaped batches, S ~ 130-384): the
                # XLA dense path materializes f32 [B,H,S,S] scores in HBM
                # (~50 ms/step at bs=512, S=257) while flash at hd=32 pays
                # a 4x lane-padding tax (374 vs 235 ms measured) — the
                # heads-in-lanes fused kernel keeps full 128 lanes and
                # everything VMEM-resident
                backend = "pfused"
            else:
                backend = "dense"
        if attn_bias is not None:
            backend = "dense"
        if backend == "pfused":
            from ..ops.pallas.attention_packed import attention_packed_qkv

            rate = self.dropout if training else 0.0
            seed = (
                jax.random.randint(self.make_rng("dropout"), (), 0, 2**31 - 1)
                if rate > 0.0 else jnp.zeros((), jnp.int32)
            )
            # the combined projection output goes straight in ([B,S,3d],
            # heads-in-lanes) and dqkv comes straight out — no XLA
            # split/concat copies or head transposes around the kernel
            y = attention_packed_qkv(qkv, key_valid, seed, self.nhead,
                                     rate, training, _PFUSED_INTERPRET, block)
            out_w = self.param("out_proj", kaiming_uniform(), (d, d))
            out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
            return y.astype(x.dtype) @ out_w + out_b
        q, k, v = heads(q), heads(k), heads(v)
        if backend == "smalls":
            from ..ops.pallas.attention_smallS import attention_smallS

            rate = self.dropout if training else 0.0
            seed = (
                jax.random.randint(self.make_rng("dropout"), (), 0, 2**31 - 1)
                if rate > 0.0 else jnp.zeros((), jnp.int32)
            )
            kv_mask = jnp.broadcast_to(
                key_valid[:, None, :], (B, self.nhead, S)).reshape(-1, S)
            o = attention_smallS(
                q.reshape(-1, S, hd), k.reshape(-1, S, hd),
                v.reshape(-1, S, hd), kv_mask, seed, rate, training,
                False, block)
            y = o.reshape(B, self.nhead, S, hd)
        elif backend == "flash":
            from ..ops.pallas.flash_attention import flash_attention

            rate = self.dropout if training else 0.0
            seed = (
                jax.random.randint(self.make_rng("dropout"), (), 0, 2**31 - 1)
                if rate > 0.0 else jnp.zeros((), jnp.int32)
            )
            kv_mask = jnp.broadcast_to(
                key_valid[:, None, :], (B, self.nhead, S)).reshape(-1, S)
            o = flash_attention(
                q.reshape(-1, S, hd), k.reshape(-1, S, hd),
                v.reshape(-1, S, hd), kv_mask, seed, rate, training)
            y = o.reshape(B, self.nhead, S, hd)
        elif backend == "chunked":
            drop_rng = (
                self.make_rng("dropout")
                if training and self.dropout > 0.0 else None
            )
            y = chunked_masked_attention(
                q, k, v, key_valid, self.key_chunk,
                dropout=self.dropout if training else 0.0,
                dropout_rng=drop_rng,
            )
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
            if attn_bias is not None:
                scores = scores + attn_bias
            mask = (key_valid[:, None, None, :] if block <= 0
                    else _block_mask(key_valid, block, S)[:, None])
            att = masked_softmax(scores, mask)
            # store the probabilities in the compute dtype (bf16 in the
            # production bf16 path — halves the [B,H,S,S] HBM traffic of the
            # dropout/AV consumers; exact no-op in f32 parity mode)
            att = att.astype(x.dtype)
            att = ByteDropout(self.dropout)(att, deterministic=not training)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v.astype(att.dtype))
        y = y.transpose(0, 2, 1, 3).reshape(B, S, d).astype(x.dtype)
        out_w = self.param("out_proj", kaiming_uniform(), (d, d))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
        return y @ out_w + out_b


class _AttnParams(nn.Module):
    """Parameter surface of MultiheadSelfAttention (same names/shapes/inits)
    for the fused-layer kernel — instantiated with the SAME submodule name,
    so the variable tree is identical to the unfused path."""

    d: int

    @nn.compact
    def __call__(self):
        return (
            self.param("in_proj", nn.initializers.xavier_uniform(),
                       (self.d, 3 * self.d)),
            self.param("in_proj_bias", nn.initializers.zeros, (3 * self.d,)),
            self.param("out_proj", kaiming_uniform(), (self.d, self.d)),
            self.param("out_proj_bias", nn.initializers.zeros, (self.d,)),
        )


class _DenseParams(nn.Module):
    """Parameter surface of TDense (torch nn.Linear init)."""

    fan_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", kaiming_uniform(),
                            (self.fan_in, self.features))
        bound = 1.0 / float(self.fan_in) ** 0.5

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return kernel, self.param("bias", bias_init, (self.features,))


class _LNParams(nn.Module):
    """Parameter surface of nn.LayerNorm (scale ones, bias zeros)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class TransformerEncoderLayer(nn.Module):
    """Post-norm torch TransformerEncoderLayer: x = LN1(x + Drop(attn(x)));
    x = LN2(x + Drop(lin2(Drop(act(lin1(x)))))). On TPU packed rows the
    whole layer runs as ONE fused Pallas kernel per direction
    (ops/pallas/transformer_layer.py) — identical variable tree, identical
    post-norm semantics."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, key_valid, training: bool, block: int = 0,
                 seg=None):
        d = self.d_model
        S = x.shape[1]
        fused = (block > 0 and seg is None and d % 128 == 0 and S <= 128
                 and (jax.default_backend() == "tpu" or _PFUSED_INTERPRET)
                 and _ATTN_BACKEND == "packed_layer")
        if fused:
            from ..ops.pallas.transformer_layer import fused_transformer_layer

            wqkv, bqkv, wout, bout = _AttnParams(
                d, name="MultiheadSelfAttention_0")()
            s1, b1 = _LNParams(d, name="LayerNorm_0")()
            w1, bf1 = _DenseParams(d, self.dim_feedforward, name="TDense_0")()
            w2, bf2 = _DenseParams(self.dim_feedforward, d, name="TDense_1")()
            s2, b2 = _LNParams(d, name="LayerNorm_1")()
            use_drop = training and self.dropout > 0.0
            seed = (
                jax.random.randint(self.make_rng("dropout"), (), 0, 2**31 - 1)
                if use_drop else jnp.zeros((), jnp.int32)
            )
            return fused_transformer_layer(
                x, key_valid, seed, wqkv, bqkv, wout, bout, s1, b1, w1, bf1,
                w2, bf2, s2, b2, self.nhead, self.dropout, self.activation,
                use_drop, block, _PFUSED_INTERPRET)
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        drop = lambda t: ByteDropout(self.dropout)(t, deterministic=not training)
        a = MultiheadSelfAttention(self.d_model, self.nhead, self.dropout)(
            x, key_valid, training, block=block, seg=seg
        )
        x = nn.LayerNorm(epsilon=1e-5)(x + drop(a))
        f = TDense(self.dim_feedforward)(x)
        f = drop(act(f))
        f = TDense(self.d_model)(f)
        x = nn.LayerNorm(epsilon=1e-5)(x + drop(f))
        return x


class TransformerNodeEncoder(nn.Module):
    d_model: int
    nhead: int = 4
    dim_feedforward: int = 512
    dropout: float = 0.3
    activation: str = "relu"
    num_layers: int = 4
    norm_input: bool = False
    use_cls: bool = False
    # sequence-parallel axis: shard the node/sequence dimension of the dense
    # activations over this mesh axis (GSPMD inserts the K/V all-gathers the
    # attention needs). Requires running under jax.sharding.set_mesh.
    sp_axis: str = None

    def _sp(self, dense):
        if self.sp_axis is None:
            return dense
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or mesh.empty or self.sp_axis not in mesh.axis_names:
            return dense  # no mesh context (e.g. init time): no-op
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            dense, P(None, self.sp_axis, None)
        )

    @nn.compact
    def __call__(self, dense, valid, training: bool, seg=None,
                 cls_mask=None):
        """dense: [B,S,d], valid: [B,S] -> ([B,S(+1),d], [B,S(+1)]).

        seg is not None: variable-length packed rows (ops/pack.py) — dense
        holds many graphs per row, seg [B,S] carries the per-token graph id
        (-1 = padding) and attention masks by segment. Each graph owns its
        OWN CLS slot inside its segment (cls_mask [B,S] marks them; the
        slots arrive zero-gathered and the shared cls_embedding is added
        here), so no CLS column is appended and no fixed-stride gb-packing
        applies. Readout slots are gathered by the caller (pack_cls_slot)."""
        B = dense.shape[0]
        if seg is not None:
            if self.use_cls:
                cls = self.param("cls_embedding", normal(1.0),
                                 (self.d_model,))
                dense = dense + (cls.astype(dense.dtype)
                                 * cls_mask.astype(dense.dtype)[:, :, None])
            if self.norm_input:
                dense = nn.LayerNorm(epsilon=1e-5, name="norm_input")(dense)
            for i in range(self.num_layers):
                dense = TransformerEncoderLayer(
                    self.d_model, self.nhead, self.dim_feedforward,
                    self.dropout, self.activation, name=f"layer_{i}",
                )(dense, valid, training, seg=seg)
            dense = nn.LayerNorm(epsilon=1e-5, name="final_norm")(dense)
            return dense, valid
        if self.use_cls:
            cls = self.param("cls_embedding", normal(1.0), (self.d_model,))
            cls_col = jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(dense.dtype)
            dense = jnp.concatenate([dense, cls_col], axis=1)
            valid = jnp.concatenate([valid, jnp.ones((B, 1), bool)], axis=1)
        if self.norm_input:
            dense = nn.LayerNorm(epsilon=1e-5, name="norm_input")(dense)
        dense = self._sp(dense)

        # graph-packed layout (see set_attn_backend): run the whole stack on
        # [B/GB, GB*S, d] rows with block-diagonal attention. The reshapes
        # are free (row-major); GB*S stays <= 128 so score tiles pad to one
        # lane tile. 'auto' packs on TPU (measured 1.21x whole-step win).
        S = dense.shape[1]
        pack = (_ATTN_BACKEND in ("packed", "packed_smalls", "packed_fused",
                                  "packed_layer")
                or (_ATTN_BACKEND == "auto"
                    and jax.default_backend() == "tpu"))
        gb = max(1, 128 // S) if (pack and self.sp_axis is None) else 1
        block, layer_valid = 0, valid
        if gb > 1:
            pad_b = (-B) % gb
            if pad_b:
                dense = jnp.pad(dense, ((0, pad_b), (0, 0), (0, 0)))
                layer_valid = jnp.pad(valid, ((0, pad_b), (0, 0)))
            dense = dense.reshape(-1, gb * S, self.d_model)
            layer_valid = layer_valid.reshape(-1, gb * S)
            block = S

        for i in range(self.num_layers):
            dense = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, name=f"layer_{i}",
            )(dense, layer_valid, training, block=block)
            dense = self._sp(dense)
        dense = nn.LayerNorm(epsilon=1e-5, name="final_norm")(dense)
        if gb > 1:
            dense = dense.reshape(-1, S, self.d_model)[:B]
        return dense, valid


class PositionalEncoding(nn.Module):
    """Sinusoidal PE ablation (--pos_encoder,
    /root/reference/models/gnn_transformer.py:149-168). Deviation: positions
    are 0-based per graph (batch-composition independent) rather than the
    reference's front-pad offsets."""

    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, dense):
        S = dense.shape[1]
        pos = jnp.arange(S, dtype=jnp.float32)[:, None]
        div = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * (-jnp.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((S, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        return dense + pe[None, :, :]
