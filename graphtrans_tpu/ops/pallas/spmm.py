"""Pallas fused gather→message→scatter (SpMM) kernel for message passing.

The TPU-native replacement for the torch-scatter/cuSPARSE role in the
reference (/root/reference/modules/conv.py via MessagePassing.propagate;
SURVEY.md §2.9). Formulation:

  out[i] = Σ_{e : dst(e)=i} w_e · relu(x[src(e)] + edge_emb[e])

Edges arrive destination-sorted (data/batch.py collation), so each
node-row-block owns a contiguous edge range. The kernel walks the aligned
edge tiles covering that range: per-edge source rows are gathered from a
VMEM-resident copy of x (scalar-prefetched indices in SMEM), edge embeddings
are double-buffered in from HBM, the message is formed on the VPU, and the
within-block scatter-add is an MXU matmul against a one-hot(dst) tile — the
"scatter as matmul" trick that keeps the reduction on the systolic array
instead of a serialized scatter.

Capacity gate: x must fit VMEM; oversized/misaligned inputs return None and
the caller falls back to the XLA segment-sum path (ops/scatter.py). Parity
with that path is tested in interpreter mode (tests/test_pallas.py) and
on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NODE_BLOCK = 256
EDGE_TILE = 256
VMEM_X_LIMIT = 8 * 1024 * 1024


def _kernel(block_ptr_ref, src_ref, x_ref, emb_hbm, w_hbm, dst_hbm, out_ref,
            xs_scratch, emb_scratch, w_scratch, dst_scratch, sem, *,
            nb: int, et: int, relu: bool):
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
        s = t * et  # aligned tile start — never out of bounds (E % et == 0)

        emb_dma = pltpu.make_async_copy(
            emb_hbm.at[pl.ds(s, et), :], emb_scratch, sem.at[0]
        )
        w_dma = pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(s, et)], w_scratch, sem.at[1]
        )
        dst_dma = pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(s, et)], dst_scratch, sem.at[2]
        )
        emb_dma.start()
        w_dma.start()
        dst_dma.start()

        def gather_row(j, _):
            @pl.when((s + j >= start) & (s + j < end))
            def _():
                xs_scratch[j, :] = x_ref[src_ref[s + j], :]

            return 0

        jax.lax.fori_loop(0, et, gather_row, 0)

        emb_dma.wait()
        w_dma.wait()
        dst_dma.wait()

        msg = xs_scratch[:] + emb_scratch[:]
        if relu:
            msg = jnp.maximum(msg, 0)

        # within-block scatter as MXU matmul: (one_hot * w)[nb, et] @ msg[et, d]
        # — the per-edge weight (incl. the validity mask) rides the one-hot
        # row, applied exactly once per edge, in lane-major [1, et] layout.
        eidx = jax.lax.broadcasted_iota(jnp.int32, (1, et), 1) + s
        valid = (eidx >= start) & (eidx < end)
        dst_tile = dst_scratch[:] - base
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, et), 0)
        one_hot = jnp.where(valid & (dst_tile == rows), w_scratch[:], 0.0)
        out_ref[:] += jax.lax.dot_general(
            one_hot, msg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(t0, t1, tile_body, 0)


def gather_message_scatter(x, edge_emb, edge_src, edge_dst, edge_mask,
                           num_nodes: int, message: str = "relu_add",
                           edge_weight=None, interpret: bool = False):
    """Pallas path; returns None when the shape doesn't fit the kernel's
    assumptions (caller falls back to XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, d = x.shape
    E = edge_src.shape[0]
    if (N * d * 4 > VMEM_X_LIMIT or d % 128 != 0 or N % NODE_BLOCK != 0
            or E % EDGE_TILE != 0):
        return None
    if message == "copy":
        edge_emb = jnp.zeros_like(edge_emb)

    # fold validity into the per-edge weight: padded edges contribute 0
    w = edge_mask.astype(jnp.float32)
    if edge_weight is not None:
        w = w * edge_weight.astype(jnp.float32)
    w2d = w.reshape(1, E)  # lane-major (Mosaic slice tiling: last dim % 128)

    nblocks = N // NODE_BLOCK
    boundaries = jnp.arange(0, N + NODE_BLOCK, NODE_BLOCK, dtype=jnp.int32)
    block_ptr = jnp.searchsorted(
        edge_dst.astype(jnp.int32), boundaries, side="left"
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ptr, src (scalar loads only)
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((N, d), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),       # x resident
            pl.BlockSpec(memory_space=pl.ANY),           # emb (HBM)
            pl.BlockSpec(memory_space=pl.ANY),           # w (HBM)
            pl.BlockSpec(memory_space=pl.ANY),           # dst as [1, E] (HBM)
        ],
        out_specs=pl.BlockSpec((NODE_BLOCK, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((EDGE_TILE, d), jnp.float32),  # gathered rows
            pltpu.VMEM((EDGE_TILE, d), jnp.float32),  # emb tile
            pltpu.VMEM((1, EDGE_TILE), jnp.float32),  # weight tile
            pltpu.VMEM((1, EDGE_TILE), jnp.int32),    # dst tile
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    kernel = functools.partial(
        _kernel, nb=NODE_BLOCK, et=EDGE_TILE, relu=(message == "relu_add")
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, d), jnp.float32),
        interpret=interpret,
    )(block_ptr, edge_src.astype(jnp.int32),
      x.astype(jnp.float32), edge_emb.astype(jnp.float32), w2d,
      edge_dst.astype(jnp.int32).reshape(1, E))
    return out.astype(x.dtype)
