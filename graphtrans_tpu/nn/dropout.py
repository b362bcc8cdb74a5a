"""Byte-mask dropout.

flax nn.Dropout draws a full uint32 word per element
(jax.random.bernoulli); at batch scale the mask generation and the sliced
random-bit tensors are a measurable share of the train step (profiled:
u32[G,H,S,S] attention-dropout bits and their async slices, plus ~2 ms per
[196k, 256] mask). This drop-in replacement draws ONE BYTE per element
(jax.random.bits uint8) and thresholds it — 4x fewer random bits and a
4x smaller mask tensor carried to the backward pass. Keep probability is
quantized to 1/256 (e.g. rate 0.3 -> keep 179/256 = 0.69922); the
reference's torch dropout semantics (scale by 1/(1-rate)) are otherwise
identical.

A fused Pallas kernel (ops/pallas/dropout.py) that draws the mask from the
per-core hardware PRNG and regenerates it in the backward exists but is
OFF by default — a measured NEGATIVE result (v5e, bs=4096 flagship, rbg):
routing the big activations through it took the step 57.4 -> 77.9 ms.
Standalone dropout kernels add a full HBM read+write pass per site in fwd
AND bwd (~4.4 GB/step across the 16 flagship sites) and break XLA's fusion
of the mask-apply into neighboring elementwise chains, which together cost
far more than the rbg mask GENERATION they save. In-kernel PRNG dropout
only wins when fused into an already-existing kernel (see
ops/pallas/attention_packed.py). Kept opt-in for future re-evaluation via
`_PALLAS_FUSED = True`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# opt-in: measured SLOWER as a standalone pass (see module docstring)
_PALLAS_FUSED = False
# test hook: route to the Pallas kernel in interpret mode on CPU
_PALLAS_INTERPRET = False
_PALLAS_MIN_SIZE = 1 << 18


def _pallas_route(x) -> bool:
    if x.ndim < 2 or x.shape[-1] % 128 != 0 or x.size < _PALLAS_MIN_SIZE:
        return False
    if _PALLAS_INTERPRET:
        return True
    return _PALLAS_FUSED and jax.default_backend() == "tpu"


class ByteDropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        drop_thresh = int(round(self.rate * 256.0))
        if drop_thresh <= 0:
            return x
        if drop_thresh >= 256:
            return jnp.zeros_like(x)
        if _pallas_route(x):
            from ..ops.pallas.dropout import byte_dropout

            # one word of the (per-site folded) key is the kernel seed
            seed = jax.random.key_data(rng).reshape(-1)[-1].astype(jnp.int32)
            return byte_dropout(x, seed, drop_thresh,
                                interpret=_PALLAS_INTERPRET)
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        keep = bits >= jnp.uint8(drop_thresh)
        scale = 1.0 / (1.0 - drop_thresh / 256.0)
        return jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                         jnp.zeros_like(x))
