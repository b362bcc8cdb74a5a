"""Shared in-kernel PRNG helpers for Pallas TPU kernels.

Kernels draw dropout bits from the per-core hardware PRNG
(pltpu.prng_seed + prng_random_bits) so no mask tensor ever crosses HBM;
the backward pass re-seeds with the same value and regenerates the exact
mask. Interpret mode (CPU tests) has no pltpu lowering, so a deterministic
integer hash stands in — it preserves the properties the structure relies
on (per-seed determinism, identical fwd/bwd regeneration) without claiming
statistical quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash_bits_u32(shape, seed):
    """Deterministic per-(position, seed) u32 hash — interpret-mode stand-in
    for the hardware PRNG (lowlevel murmur-style finalizer)."""
    pos = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for ax in range(len(shape) - 1, -1, -1):
        pos = pos + jax.lax.broadcasted_iota(
            jnp.uint32, shape, ax) * jnp.uint32(stride)
        stride *= shape[ax]
    x = pos * jnp.uint32(2654435761) + jnp.asarray(
        seed, jnp.int32).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def random_bits_u32(shape, seed, interpret: bool = False):
    """Uniform u32 bits of `shape`, deterministic in `seed` (a traced int32
    scalar). On TPU this seeds the hardware PRNG; calling it twice with the
    same seed in the same kernel yields the same bits."""
    if interpret:
        return _hash_bits_u32(shape, seed)
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def random_bytes_u8(shape, seed, interpret: bool = False):
    """Uniform u8 bytes of 2-D `shape` — generated as u32 words of a
    quarter-height block and unpacked along the second-minor dim
    (pltpu.bitcast), so the hardware PRNG produces exactly ONE byte per
    element instead of four. Requires shape[-2] % 4 == 0 on the TPU path."""
    if interpret:
        return (_hash_bits_u32(shape, seed) >> 24).astype(jnp.uint8)
    from jax.experimental.pallas import tpu as pltpu

    r, c = shape[-2], shape[-1]
    if r % 4 != 0:
        return (random_bits_u32(shape, seed) >> 24).astype(jnp.uint8)
    pltpu.prng_seed(seed)
    words = pltpu.prng_random_bits(shape[:-2] + (r // 4, c))
    return pltpu.bitcast(words, jnp.uint8)
