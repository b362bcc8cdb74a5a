"""Initializers matching the reference's PyTorch defaults.

The reference relies on torch defaults everywhere (nn.Linear kaiming-uniform,
nn.Embedding N(0,1), MultiheadAttention xavier-uniform); matching them keeps
training dynamics comparable to the published runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def kaiming_uniform():
    """torch.nn.Linear default weight init: kaiming_uniform(a=sqrt(5)), which
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Kernel shape is (in, out)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(stddev=1.0):
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


xavier_uniform = nn.initializers.xavier_uniform


class TDense(nn.Module):
    """Dense layer with torch.nn.Linear default init (weights AND bias both
    U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", kaiming_uniform(), (fan_in, self.features))
        if (jnp.issubdtype(x.dtype, jnp.floating)
                and x.dtype != kernel.dtype):
            # compute in the PARAM dtype: under --precision bf16 a raw f32
            # input (Linear node/edge encoders on float features) would
            # otherwise promote the matmul — and every consumer downstream —
            # back to f32, silently losing mixed precision for the whole
            # model (caught on the code2 workload: the entire step ran f32)
            x = x.astype(kernel.dtype)
        y = x @ kernel
        if self.use_bias:
            bound = 1.0 / float(fan_in) ** 0.5

            def bias_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias
        return y
