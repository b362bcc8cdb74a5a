"""Pallas MXU scatter kernel: segment-sum of edge messages onto nodes.

Split of responsibilities with XLA: XLA performs the source-row gather
(x[src] — its native gather is efficient on TPU), this kernel performs the
dst-sorted segment reduction as a sequence of one-hot matmuls on the MXU —
the part XLA lowers to a serialized scatter-add. Messages stream from HBM in
double-buffered tiles; each node-row block consumes exactly the aligned tiles
covering its contiguous (dst-sorted) edge range.

out[i] = Σ_{e : dst(e)=i} msg[e]   with   msg precomputed [E, d].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NODE_BLOCK = 256
EDGE_TILE = 256


def _kernel(block_ptr_ref, msg_hbm, dst_hbm, out_ref,
            msg_scratch, dst_scratch, sem, *, nb: int, et: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    base = i * nb

    out_ref[:] = jnp.zeros_like(out_ref)

    t0 = start // et
    t1 = (end + et - 1) // et

    def tile_body(t, _):
        s = t * et
        slot = t % 2
        msg_dma = pltpu.make_async_copy(
            msg_hbm.at[pl.ds(s, et), :], msg_scratch.at[slot], sem.at[slot]
        )
        dst_dma = pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(s, et)], dst_scratch.at[slot], sem.at[2 + slot]
        )
        msg_dma.start()
        dst_dma.start()
        msg_dma.wait()
        dst_dma.wait()

        eidx = jax.lax.broadcasted_iota(jnp.int32, (1, et), 1) + s
        valid = (eidx >= start) & (eidx < end)
        dst_tile = dst_scratch[slot] - base
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, et), 0)
        one_hot = jnp.where(valid & (dst_tile == rows), 1.0, 0.0)
        out_ref[:] += jax.lax.dot_general(
            one_hot, msg_scratch[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(t0, t1, tile_body, 0)


def segment_sum_mxu(msg, edge_dst, num_nodes: int, interpret: bool = False):
    """Pallas path; returns None on unsupported shapes (caller falls back)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, d = msg.shape
    N = num_nodes
    if d % 128 != 0 or N % NODE_BLOCK != 0 or E % EDGE_TILE != 0:
        return None

    nblocks = N // NODE_BLOCK
    boundaries = jnp.arange(0, N + NODE_BLOCK, NODE_BLOCK, dtype=jnp.int32)
    block_ptr = jnp.searchsorted(
        edge_dst.astype(jnp.int32), boundaries, side="left"
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # block_ptr
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # msg (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # dst [1, E] (HBM)
        ],
        out_specs=pl.BlockSpec((NODE_BLOCK, d), lambda i, *_: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, EDGE_TILE, d), jnp.float32),
            pltpu.VMEM((2, 1, EDGE_TILE), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nb=NODE_BLOCK, et=EDGE_TILE),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, d), jnp.float32),
        interpret=interpret,
    )(block_ptr, msg.astype(jnp.float32),
      edge_dst.astype(jnp.int32).reshape(1, E))
    return out
