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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


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
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
        keep = bits >= jnp.uint8(drop_thresh)
        scale = 1.0 / (1.0 - drop_thresh / 256.0)
        return jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                         jnp.zeros_like(x))
