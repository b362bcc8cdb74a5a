"""Fused byte-dropout with in-kernel hardware PRNG — OPT-IN (negative
result as a standalone pass; see below).

The XLA dropout path (nn/dropout.ByteDropout fallback) materializes a u8
mask tensor per call. This kernel instead draws bits from the per-core
hardware PRNG while the activation tile is VMEM-resident, so the mask
never exists in HBM; the backward pass re-seeds identically and
regenerates it (dropout is elementwise-linear in x, so fwd and bwd are the
SAME kernel applied to x / the cotangent).

MEASURED NEGATIVE RESULT (v5e, bs=4096 flagship, rbg PRNG, slope timing):
routing the 16 big dropout sites through this kernel took the train step
57.4 -> 77.9 ms. As a STANDALONE op each site costs a full HBM read+write
in fwd and again in bwd (~4.4 GB/step total) and forms a fusion barrier,
where the XLA path's mask-apply rides existing elementwise fusions for
free and rbg mask generation is cheaper than profile attribution
suggested. The op-level-fusion lesson of ops/pallas/transformer_layer.py
applies to elementwise ops too: in-kernel PRNG dropout pays off only
inside kernels that already exist (ops/pallas/attention_packed.py).
Kept for re-evaluation (nn/dropout._PALLAS_FUSED) and as the tested home
of the shared prng helpers.

Semantics are bit-identical in distribution to ByteDropout's fallback:
keep iff (bits >> 24) >= drop_thresh with drop_thresh = round(rate*256)
(keep probability quantized to 1/256), survivors scaled by
1/(1 - drop_thresh/256) — the reference torch dropout contract
(/root/reference/modules/gnn_module.py:86-90 et al.) up to the 1/256
quantization documented in nn/dropout.py.

Layout contract: x is viewed as rows x lanes [R, C] over its last axis;
C must be a multiple of 128 (lane tiling). The row grid is ragged —
dropout is pure elementwise, so out-of-range tail rows are garbage-in/
masked-store-out with no cross-row leakage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .prng import random_bytes_u8

BR = 1024  # block rows per grid step ([BR, 512] u8 bytes = 512 KB VMEM)


def _kernel(seed_ref, x_ref, o_ref, *, drop_thresh: int, interpret: bool):
    seed = seed_ref[0] + jax.lax.convert_element_type(
        _pid(interpret), jnp.int32)
    x = x_ref[...]
    bits = random_bytes_u8(x.shape, seed, interpret)
    # Mosaic has no sub-32-bit vector compare ("Target does not support this
    # comparison" on vector<...xi8>) — widen the bytes first
    keep = bits.astype(jnp.int32) >= drop_thresh
    scale = 1.0 / (1.0 - drop_thresh / 256.0)
    o_ref[...] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                           jnp.zeros_like(x))


def _pid(interpret):
    from jax.experimental import pallas as pl

    return pl.program_id(0)


def _apply(x2, seed, drop_thresh, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = x2.shape
    br = min(BR, max(8, -(-R // 8) * 8))
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(_kernel, drop_thresh=drop_thresh,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-R // br),),
            in_specs=[pl.BlockSpec((br, C), lambda i, s: (i, 0))],
            out_specs=pl.BlockSpec((br, C), lambda i, s: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((R, C), x2.dtype),
        interpret=interpret,
    )(seed, x2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def byte_dropout(x, seed, drop_thresh: int, interpret: bool = False):
    """Dropout over x (any rank >= 1, last dim % 128 == 0) with keep
    probability 1 - drop_thresh/256. `seed`: traced int32 scalar; the same
    (seed, shape) always yields the same mask."""
    if x.shape[-1] % 128 != 0:
        raise ValueError(f"last dim must be lane-aligned (128): {x.shape}")
    x2 = x.reshape(-1, x.shape[-1])
    return _apply(x2, seed, drop_thresh, interpret).reshape(x.shape)


def _fwd_rule(x, seed, drop_thresh, interpret):
    return byte_dropout(x, seed, drop_thresh, interpret), seed


def _bwd_rule(drop_thresh, interpret, seed, g):
    g2 = g.reshape(-1, g.shape[-1])
    dx = _apply(g2, seed, drop_thresh, interpret).reshape(g.shape)
    return dx, None


byte_dropout.defvjp(_fwd_rule, _bwd_rule)
