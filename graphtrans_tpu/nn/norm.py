"""Masked BatchNorm.

The reference applies torch BatchNorm1d over ragged node batches
(/root/reference/modules/gnn_module.py:58,84). Under static-shape padding the
batch statistics must be computed over VALID rows only, so flax's BatchNorm
cannot be used directly. Semantics match torch: normalize with biased
variance, update running_var with the unbiased estimate, momentum 0.1.

`axis_name` enables cross-device statistics (sync-BN) under shard_map data
parallelism so an N-chip step is numerically identical to the single-chip
step on the global batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            xf = x.astype(jnp.float32)
            cnt = jnp.sum(m)
            s1 = jnp.sum(xf * m, axis=0)
            s2 = jnp.sum(xf * xf * m, axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt_safe = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt_safe
            var = jnp.maximum(s2 / cnt_safe - mean * mean, 0.0)  # biased
            unbiased = var * cnt_safe / jnp.maximum(cnt - 1.0, 1.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        # keep the padded-rows-are-zero invariant
        return jnp.where(mask[:, None], y, 0).astype(x.dtype)
