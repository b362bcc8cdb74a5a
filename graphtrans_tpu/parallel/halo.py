"""Node-partitioned message passing with boundary (halo) exchange.

The full north-star formulation (BASELINE.json): node features are SHARDED
over the mesh (each chip owns a contiguous row block), edges live with their
DESTINATION's owner so the segment reduction is chip-local, and the only
cross-chip traffic is the halo — the source rows a chip needs but does not
own — exchanged with one `all_to_all` over ICI. Unlike the replicated-x
edge sharding in parallel/edge_parallel.py (traffic ∝ N per chip), halo
traffic is proportional to the BOUNDARY of the partition, which for batched
graphs (each graph's nodes contiguous, most edges intra-graph) is small.

Host side (`build_halo_partition`): per-shard edge lists with sources
remapped into [local rows | halo slots], plus the send-index table
`send_idx[p, s]` = rows chip p ships to chip s. Device side
(`make_halo_spmm`): shard_map over 'data' —
    send = x_local[send_idx]            # [D, H, d] gather of owned rows
    halo = all_to_all(send)             # one ICI exchange
    x_ext = concat([x_local, halo])     # [Ns + D*H, d]
    out   = segment_sum(msg(x_ext[src_l]), dst_l)   # all local
Parity-tested against the single-chip reduction on the virtual CPU mesh.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _bucket(n: int, m: int = 8) -> int:
    return max(((n + m - 1) // m) * m, m)


@dataclasses.dataclass
class HaloPartition:
    # stacked per-shard arrays (leading dim = n_shards)
    edge_src_local: np.ndarray   # [D, Es] int32 — into [local | halo] rows
    edge_dst_local: np.ndarray   # [D, Es] int32 — into local rows
    edge_perm: np.ndarray        # [D, Es] int32 — original edge row (for emb/w)
    edge_mask: np.ndarray        # [D, Es] bool
    send_idx: np.ndarray         # [D, D, H] int32 — rows p sends to s (local to p)
    n_shards: int
    nodes_per_shard: int
    halo_cap: int

    @property
    def halo_bytes_per_chip(self) -> int:
        return int(self.send_idx.shape[1] * self.send_idx.shape[2])


def build_halo_partition(edge_src, edge_dst, edge_mask, num_nodes: int,
                         n_shards: int, halo_multiple: int = 8,
                         edge_multiple: int = 8) -> HaloPartition:
    """Host-side partition of a padded batch's edge set — fully vectorized
    numpy (one np.unique per destination shard), fast enough to run
    per batch inside the loader."""
    src = np.asarray(edge_src, np.int64)
    dst = np.asarray(edge_dst, np.int64)
    mask = np.asarray(edge_mask, bool)
    D = n_shards
    assert num_nodes % D == 0, f"{num_nodes} nodes not divisible by {D} shards"
    ns = num_nodes // D

    owner_dst = dst // ns
    owner_src = src // ns

    per_shard = []  # (sel, dst_local, src_owner, uk, slot_per_edge, local_src)
    max_halo = 1
    max_edges = 1
    for s in range(D):
        sel = np.nonzero(mask & (owner_dst == s))[0]
        e_src, e_own = src[sel], owner_src[sel]
        remote = e_own != s
        # unique (owner, src) pairs among remote sources, slots numbered
        # 0..count-1 WITHIN each owner group (keys sort owner-major)
        uk, inv = np.unique(e_src[remote] + e_own[remote] * (10 ** 12),
                            return_inverse=True)
        p_of_uk = (uk // (10 ** 12)).astype(np.int64)
        group_start = np.searchsorted(p_of_uk, np.arange(D))
        slot_of_uk = np.arange(len(uk)) - group_start[p_of_uk]
        if len(uk):
            counts = np.bincount(p_of_uk, minlength=D)
            max_halo = max(max_halo, int(counts.max()))
        max_edges = max(max_edges, len(sel))
        per_shard.append((sel, dst[sel] - s * ns, e_own, remote, uk, inv,
                          p_of_uk, slot_of_uk))

    H = _bucket(max_halo, halo_multiple)
    Es = _bucket(max_edges, edge_multiple)

    send_idx = np.zeros((D, D, H), np.int32)
    edge_src_local = np.zeros((D, Es), np.int32)
    edge_dst_local = np.zeros((D, Es), np.int32)
    edge_perm = np.zeros((D, Es), np.int32)
    e_mask = np.zeros((D, Es), bool)
    for s, (sel, d_l, e_own, remote, uk, inv, p_of_uk, slot_of_uk) in enumerate(per_shard):
        n = len(sel)
        s_l = src[sel] - e_own * ns  # local index within the owner
        # remote sources address their halo row ns + p*H + slot
        if len(uk):
            halo_rows = ns + p_of_uk[inv] * H + slot_of_uk[inv]
            s_l = s_l.copy()
            s_l[remote] = halo_rows
            # what each owner p ships to this shard s
            send_idx[p_of_uk, s, slot_of_uk] = (uk % (10 ** 12) - p_of_uk * ns).astype(np.int32)
        edge_src_local[s, :n] = s_l
        edge_dst_local[s, :n] = d_l
        edge_perm[s, :n] = sel
        e_mask[s, :n] = True

    return HaloPartition(
        edge_src_local=edge_src_local, edge_dst_local=edge_dst_local,
        edge_perm=edge_perm, edge_mask=e_mask, send_idx=send_idx,
        n_shards=D, nodes_per_shard=ns, halo_cap=H,
    )


def make_halo_spmm(part: HaloPartition, message: str = "relu_add"):
    """Returns fn(x [N,d], edge_emb [E,de], edge_weight [E] or None) -> [N,d]
    running the halo-exchange SpMM over the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import segment
    from .mesh import make_mesh

    D, ns, H = part.n_shards, part.nodes_per_shard, part.halo_cap
    mesh = make_mesh(dp=D)

    def body(x_local, send_idx, e_src, e_dst, e_perm_emb, e_mask, e_w):
        # squeeze shard_map's leading singleton
        x_local = x_local[0]          # [ns, d]
        send_idx = send_idx[0]        # [D, H]
        e_src = e_src[0]
        e_dst = e_dst[0]
        emb = e_perm_emb[0]           # [Es, de] (pre-gathered per shard)
        e_mask_l = e_mask[0]
        e_w_l = e_w[0]

        send = x_local[send_idx]      # [D, H, d]
        halo = jax.lax.all_to_all(send, "data", split_axis=0, concat_axis=0,
                                  tiled=False)
        # all_to_all with split_axis=0 over a [D,H,d] local array: row j of
        # the result is the [H,d] block this chip received from chip j
        x_ext = jnp.concatenate([x_local, halo.reshape(D * H, x_local.shape[-1])])

        xj = x_ext[e_src]
        if message == "relu_add":
            m = jnp.maximum(xj + emb, 0)
        elif message == "add":
            m = xj + emb
        else:
            m = xj
        m = m * e_w_l[:, None]
        out = segment.segment_sum(m, e_dst, ns, mask=e_mask_l)
        return out[None]

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=P("data"),
        check_rep=False,
    )

    def fn(x, edge_emb, edge_weight=None):
        N, d = x.shape
        assert N == D * ns
        x_sh = x.reshape(D, ns, d)
        emb_per_shard = jnp.asarray(edge_emb)[part.edge_perm]  # [D, Es, de]
        if edge_weight is None:
            w = jnp.ones(edge_emb.shape[0], x.dtype)
        else:
            w = jnp.asarray(edge_weight)
        w_per_shard = w[part.edge_perm] * part.edge_mask
        out = sharded(
            x_sh, jnp.asarray(part.send_idx),
            jnp.asarray(part.edge_src_local),
            jnp.asarray(part.edge_dst_local),
            emb_per_shard, jnp.asarray(part.edge_mask),
            w_per_shard,
        )
        return out.reshape(N, d)

    return jax.jit(fn)
