"""Edge-partitioned message passing across the device mesh.

The scaling axis the reference never had (SURVEY §2.8): for batches whose
edge set dwarfs a single chip, partition the (dst-sorted) edge array across
the 'data' mesh axis; every chip gathers from a replicated node-feature table,
forms messages for its edge shard, segment-reduces locally into a full-size
partial aggregate, and a single psum over ICI combines the partials:

    out = Σ_chips segment_sum(msg(x[src_shard]), dst_shard)

Mathematically identical to the single-chip reduction (addition reassociates),
tested against it on the virtual CPU mesh. Partial aggregates ride one
all-reduce; the gather side stays local because x is replicated — the
node-partitioned variant with all-to-all boundary exchange is the round-2
follow-up.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import segment
from .mesh import make_mesh


def make_edge_parallel_spmm(n_shards: int, message: str = "relu_add") -> Callable:
    """Returns fn(x, edge_emb, edge_src, edge_dst, edge_mask, edge_weight)
    -> [N, d] with edges sharded over the mesh. Edge arrays must have
    length divisible by n_shards (loader capacities are bucketed, so this
    holds by construction)."""
    mesh = make_mesh(dp=n_shards)

    def body(x, edge_emb, edge_src, edge_dst, edge_mask, edge_weight):
        num_nodes = x.shape[0]
        xj = x[edge_src]
        if message == "relu_add":
            m = jnp.maximum(xj + edge_emb, 0)
        elif message == "add":
            m = xj + edge_emb
        else:
            m = xj
        if edge_weight is not None:
            m = m * edge_weight[:, None]
        partial = segment.segment_sum(m, edge_dst, num_nodes, mask=edge_mask)
        return jax.lax.psum(partial, "data")

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P(),
        check_rep=False,
    )

    def fn(x, edge_emb, edge_src, edge_dst, edge_mask, edge_weight=None):
        if edge_weight is None:
            edge_weight = jnp.ones(edge_src.shape[0], x.dtype)
        return sharded(x, edge_emb, edge_src, edge_dst, edge_mask, edge_weight)

    return jax.jit(fn)
