"""Host-side batching: shuffle, chunk into graph batches, collate to padded
GraphBatch (optionally stacked per-device for shard_map data parallelism).

Replaces the reference's PyG DataLoader (/root/reference/main.py:142-153).
Capacities are bucketed per batch (see data/batch.bucket_size) so XLA sees a
small, bounded set of shapes; pass fixed_caps to pin one shape for the whole
epoch (zero recompiles — the production setting).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .batch import GraphBatch, bucket_size, collate


def dataset_caps(graphs: Sequence[dict], batch_size: int,
                 node_multiple: int = 256, edge_multiple: int = 512):
    """Fixed capacities for `batch_size`-graph batches of this dataset.

    Statistical bound, not worst-case: a shuffled batch's node/edge sum is
    a sum of batch_size draws without replacement, so mean + 5 sigma (plus
    one max-graph of headroom) covers it with overflow probability ~1e-6 —
    and an overflow is BENIGN: the packing planner (_plan_chunks) simply
    closes the batch early at the cap, so shapes never change and nothing
    is dropped. The previous bs*p95*1.3 worst-case sizing padded every
    code2 batch ~2x, which doubled EVERY [N,*] tensor in the step
    (measured: 259 vs 117 ms/step on the segment path)."""
    nodes = np.array([g["x"].shape[0] for g in graphs], np.float64)
    edges = np.array([g["edge_index"].shape[1] for g in graphs], np.float64)

    def bound(sizes):
        n = len(sizes)
        frac = min(batch_size / max(n, 1), 1.0)
        sig = float(sizes.std()) * np.sqrt(batch_size * max(1.0 - frac, 0.0))
        return int(min(sizes.sum(),
                       batch_size * sizes.mean() + 5.0 * sig
                       + max(sizes.max(initial=1), 1)))

    return (bucket_size(max(bound(nodes), 1), node_multiple),
            bucket_size(max(bound(edges), 1), edge_multiple))


class GraphLoader:
    def __init__(
        self,
        graphs: Sequence[dict],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        num_tasks: int = 1,
        max_seq_len: Optional[int] = None,
        y_dtype: str = "int32",
        max_input_len: int = 1000,
        with_dense_adj: bool = False,
        fixed_caps: Optional[tuple] = None,
        drop_overflow: bool = True,
        num_shards: int = 1,
        process_count: int = 1,
        process_index: int = 0,
        use_native: bool = True,
        collate_workers: int = 1,
        native_threads: int = 0,
        hybrid_shards: int = 0,
        dense_layout: bool = False,
        dense_caps: Optional[tuple] = None,
        scatter_free: bool = False,
        ell_explicit: bool = False,
        seq_pack: bool = False,
        pack_rows_cap: int = 0,
    ):
        self.collate_workers = collate_workers
        # intra-batch parallelism INSIDE the native collate call (the call
        # releases the GIL, so this scales with cores where Python-thread
        # multi-batch collation cannot); 0 = auto by batch size
        if native_threads <= 0:
            import os

            native_threads = (
                min(4, os.cpu_count() or 1) if batch_size >= 256 else 1
            )
        self.native_threads = native_threads
        # hybrid node-sharded mode: each batch is halo-partitioned into
        # per-chip local views (parallel/hybrid.py)
        self.hybrid_shards = hybrid_shards
        # scatter-free flat aggregation (ops/scatter_free.py): attach slot
        # plans to every batch. Gated off under hybrid partitioning and the
        # dense layout (which has its own scatter-free formulation). Under
        # shard stacking (and for one-compiled-shape epochs generally) the
        # slot budgets are PINNED dataset-wide from composition-independent
        # bounds (ops/block_plan.dataset_sfa_caps), so every batch's plans
        # stack tree-wise.
        self.scatter_free = (scatter_free and not dense_layout
                             and hybrid_shards <= 1)
        # ship host-built explicit ELL plans (PNA consumes the ELL reducers
        # every layer; deriving on device costs ~6 ms/step in row gathers)
        self.ell_explicit = ell_explicit
        self._sfa_caps = None
        # variable-length sequence packing for the transformer stage
        # (ops/pack.py): flat layout only. Row budget is sampled from the
        # real packer lazily (pack_rows_cap pins it explicitly — required
        # for sharded stacking to keep one tree shape).
        # both layouts pack: the strided (mol) layout keeps its one-hot
        # aggregation and only the transformer stage changes (measured
        # 56.5 -> 51.7 ms on the flagship step)
        self.seq_pack = (seq_pack and hybrid_shards <= 1
                         and not with_dense_adj)
        # normalized to a (tier1, tier2, tier3) tuple; int pins tier 1 only
        if isinstance(pack_rows_cap, tuple):
            self._pack_rows_cap = (pack_rows_cap + (0,) * 3)[:3]
        else:
            self._pack_rows_cap = ((pack_rows_cap, 0, 0)
                                   if pack_rows_cap > 0 else None)
        self.graphs = [dict(g, _id=i) for i, g in enumerate(graphs)]
        # size table for the vectorized planning pass (numpy cumsum per
        # batch instead of a Python loop over every graph every epoch)
        self._sizes_n = np.array(
            [int(g["x"].shape[0]) for g in self.graphs], np.int64)
        self._sizes_e = np.array(
            [int(g["edge_index"].shape[1]) for g in self.graphs], np.int64)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_tasks = num_tasks
        self.max_seq_len = max_seq_len
        self.y_dtype = y_dtype
        self.max_input_len = max_input_len
        self.with_dense_adj = with_dense_adj
        self.num_shards = num_shards
        # multi-host data sharding (parallel/multihost.py): num_shards is the
        # GLOBAL shard count; each process collates only its own slice of the
        # deterministic global batch plan and stacks num_shards/process_count
        # local sub-batches.
        if process_count > 1 and num_shards % process_count != 0:
            raise ValueError(f"num_shards {num_shards} must divide evenly "
                             f"over {process_count} processes")
        self.process_count = process_count
        self.process_index = process_index
        if fixed_caps is None:
            fixed_caps = dataset_caps(self.graphs, batch_size)
        self.node_cap, self.edge_cap = fixed_caps
        self.drop_overflow = drop_overflow
        # pin the dense transformer width dataset-wide: one compiled shape
        # per epoch, and shard batches stay stackable
        max_n = max((int(g["x"].shape[0]) for g in self.graphs), default=1)
        self.dense_cap = min(bucket_size(max_n, 16), max_input_len)
        # pack width: the largest kept graph + its CLS token, lane-bucketed;
        # heavy-tailed datasets (wide rows) get a second narrow tier for
        # small graphs (attention cost ~ sum_rows W_r^2)
        self.pack_w = bucket_size(min(max_n, max_input_len) + 1, 128)
        # 384 = the fused seg kernel's SP_MAX: more tokens ride the
        # efficient medium-S kernel and fewer wide flash_hil rows remain
        # (measured 71.0 vs 73.3 ms at W2=256 on the code2 tail bench)
        self.pack_w2 = 384 if self.pack_w > 384 else 0
        # third W=128 tier for the distribution's bulk (heavy-tailed
        # datasets: mean ~125 nodes) — 1/9 the per-token attention cost of
        # the W2 tier, same fused seg kernel class
        self.pack_w3 = 128 if self.pack_w2 > 0 else 0

        # strided (dense) node layout: graph i owns rows [i*stride, ...) so
        # aggregation runs scatter-free as one-hot matmuls (ops/dense_mp.py).
        # Only valid when every graph fits the stride (no truncation).
        self.node_stride = 0
        self.dense_edge_cap = 0
        if dense_layout:
            # dense_caps pins (stride, edge slots) dataset-wide so every
            # split loader compiles to the same shapes
            stride = (dense_caps[0] if dense_caps is not None
                      else bucket_size(max_n, 16))
            if stride > max_input_len or hybrid_shards > 1 or with_dense_adj:
                from ..utils.logging import logger

                logger.warning("dense_layout requested but unsupported here "
                               f"(stride {stride} vs max_input_len "
                               f"{max_input_len}, hybrid={hybrid_shards}, "
                               f"adj={with_dense_adj}) — using flat layout")
            else:
                max_e = max((int(g["edge_index"].shape[1])
                             for g in self.graphs), default=1)
                self.node_stride = stride
                self.dense_cap = stride
                self.dense_edge_cap = (dense_caps[1] if dense_caps is not None
                                       else bucket_size(max_e, 8))
                self.node_cap = (batch_size + 1) * stride

        # native C++ batcher path (csrc/graph_batcher.cpp): pack once, then
        # each batch is one native call; python collate is the fallback
        self.packed = None
        self._ring = None
        if use_native and not with_dense_adj and len(self.graphs) > 0:
            from . import native

            if native.native_available():
                self.packed = native.PackedDataset(self.graphs)
                # Reusable output buffers (a yielded batch's arrays are
                # overwritten 8 batches later; prefetch keeps ≤2 in flight).
                # ONLY when transfers copy: on the CPU backend
                # jax.device_put zero-copy ALIASES numpy memory, so reuse
                # would corrupt in-flight batches — allocate per batch there.
                import jax

                try:
                    on_cpu = jax.default_backend() == "cpu"
                except Exception:
                    on_cpu = True
                if not on_cpu:
                    self._ring = native.BufferRing(
                        self.packed, self.node_cap, self.edge_cap,
                        self.batch_size + 1, size=8,
                        dense_edge_cap=self.dense_edge_cap,
                    )

    def __len__(self):
        per = self.batch_size * self.num_shards
        return (len(self.graphs) + per - 1) // per

    def _plan_chunks(self, order):
        """Size-only planning pass: split the epoch's graph sequence into
        per-batch index arrays honoring the caps. Oversized graphs are
        dropped (loudly) up front; each chunk takes up to batch_size graphs
        and breaks early at the first cumulative cap violation (the sizes
        are nonnegative, so the fit mask is a prefix and the break point is
        its count). Vectorized: numpy cumsums per batch instead of a Python
        loop over every graph every epoch."""
        n_arr = self._sizes_n[order]
        e_arr = self._sizes_e[order]
        over = (n_arr > self.node_cap) | (e_arr > self.edge_cap)
        if self.node_stride > 0:
            # strided layout: every graph must fit its stride / edge slot cap
            over |= (n_arr > self.node_stride) | (e_arr > self.dense_edge_cap)
        if over.any():
            if not self.drop_overflow:
                raise ValueError("graph exceeds fixed caps")
            # never silently narrow coverage ("no silent caps")
            from ..utils.logging import logger

            for i in order[over]:
                logger.warning(
                    f"dropping graph id={i} ({self._sizes_n[i]} nodes/"
                    f"{self._sizes_e[i]} edges) exceeding caps "
                    f"({self.node_cap}/{self.edge_cap})"
                )
            keep = ~over
            order, n_arr, e_arr = order[keep], n_arr[keep], e_arr[keep]
        plans = []
        i, total = 0, len(order)
        while i < total:
            j = min(i + self.batch_size, total)
            cn = np.cumsum(n_arr[i:j])
            ce = np.cumsum(e_arr[i:j])
            k = int(np.count_nonzero(
                (cn <= self.node_cap) & (ce <= self.edge_cap)))
            plans.append(np.asarray(order[i:i + k], np.int64))
            i += k
        return plans

    @property
    def _sfa_split_ok(self) -> bool:
        """Split-retry on slot-cap overflow is only sound when batches are
        consumed one at a time: sharded/multi-host groups need an equal
        batch count and identical tree structure on every shard."""
        return (self.num_shards == 1 and self.process_count == 1
                and self.hybrid_shards <= 1)

    def _sample_sfa_caps(self, samples: int = 4, plans_per: int = 16):
        """Empirical slot budgets: run the real packing planner over a few
        shuffled epochs and take the exact per-batch block/pool needs' max
        (bucketed, +10% headroom). The composition-independent LP bound
        (dataset_sfa_caps) over-provisioned the one-hot work ~2.3x on code2
        — with split-retry handling the rare tail overflow, budgets only
        need to cover the TYPICAL batch. ell_k stays the dataset max
        (per-graph-local, composition cannot change it)."""
        from ..ops.block_plan import (POOL_NB, dataset_sfa_caps,
                                      sfa_block_rows)

        caps = dataset_sfa_caps(self.graphs, self.node_cap)
        nb = caps["nb"] = sfa_block_rows(self.node_cap)
        nblk = self.node_cap // nb
        g_cap = self.batch_size + 1
        g_pad = -(-g_cap // POOL_NB) * POOL_NB
        eb_need, pool_need = 1, 1
        for s in range(samples):
            order = np.arange(len(self.graphs))
            np.random.default_rng(self.seed + 7919 * (s + 1)).shuffle(order)
            for plan in self._plan_chunks(order)[:plans_per]:
                n = self._sizes_n[plan]
                offs = np.zeros(len(plan) + 1, np.int64)
                np.cumsum(n, out=offs[1:])
                eis = [np.asarray(self.graphs[int(i)]["edge_index"])
                       + offs[k] for k, i in enumerate(plan)]
                if eis:
                    ei = np.concatenate(eis, axis=1)
                    eb_need = max(
                        eb_need,
                        int(np.bincount(ei[1] // nb, minlength=nblk).max()),
                        int(np.bincount(ei[0] // nb, minlength=nblk).max()))
                cnt = np.zeros(g_pad, np.int64)
                cnt[:len(plan)] = n
                pool_need = max(pool_need,
                                int(cnt.reshape(-1, POOL_NB).sum(1).max()))
        caps["eb"] = min(caps["eb"],
                         bucket_size(int(eb_need * 1.1) + 1, 64))
        caps["pool_eb"] = min(caps["pool_eb"],
                              bucket_size(int(pool_need * 1.1) + 1, 64))
        return caps

    def _attach_sfa(self, batch):
        if not self.scatter_free or batch is None:
            return batch
        import dataclasses

        from ..ops.block_plan import build_sfa_compressed, dataset_sfa_caps

        if self._sfa_caps is None:
            # single-consumer loaders get tight sampled budgets (overflow ->
            # split-retry); sharded/multi-host loaders keep the
            # composition-independent LP bound (every shard's plans must
            # share one shape and never overflow)
            self._sfa_caps = (self._sample_sfa_caps() if self._sfa_split_ok
                              else dataset_sfa_caps(self.graphs,
                                                    self.node_cap))
        caps = self._sfa_caps
        fields = build_sfa_compressed(batch.edge_src, batch.edge_dst,
                                      batch.edge_mask,
                                      batch.num_node_slots,
                                      eb=caps["eb"],
                                      node_graph=batch.node_graph,
                                      node_mask=batch.node_mask,
                                      num_graphs=batch.num_graph_slots,
                                      ell_k=caps["ell_k"],
                                      pool_eb=caps["pool_eb"],
                                      ell_explicit=self.ell_explicit,
                                      edge_attr=batch.edge_attr)
        if fields is None:
            return batch  # caller splits or falls back to the segment path
        return dataclasses.replace(batch, **fields)

    def _sample_pack_rows(self, samples: int = 4, plans_per: int = 16):
        """Empirical pack-row budgets (both tiers): run the real packer over
        a few shuffled epochs' batch plans and take the max rows (+10%,
        bucketed). Same philosophy as the sfa slot budgets — cover the
        TYPICAL batch tightly; the rare overflow splits (single consumers)
        or strips the pack fields for that shard group (stacked
        consumers)."""
        from ..ops.pack import plan_seq_pack

        max_keep = min(self.pack_w - 1, self.max_input_len)
        widths = [w for w in (self.pack_w, self.pack_w2, self.pack_w3) if w]
        need = [1] * len(widths)
        for s in range(samples):
            order = np.arange(len(self.graphs))
            np.random.default_rng(self.seed + 104729 * (s + 1)).shuffle(order)
            for plan in self._plan_chunks(order)[:plans_per]:
                tokens = np.minimum(self._sizes_n[plan], max_keep) + 1
                # each graph to the NARROWEST tier that fits (ops/pack.py)
                tier = np.zeros(len(tokens), np.int32)
                for t, Wt in enumerate(widths[1:], start=1):
                    tier = np.where(tokens <= Wt, t, tier)
                for t, Wt in enumerate(widths):
                    need[t] = max(need[t],
                                  plan_seq_pack(tokens[tier == t], Wt)[0])
        slack = 1.1 if self._sfa_split_ok else 1.25
        rup = lambda x: -(-int(x * slack + 1) // 4) * 4
        return tuple(rup(n) for n in need) + (0,) * (3 - len(widths))

    def _attach_pack(self, batch):
        if not self.seq_pack or batch is None:
            return batch
        import dataclasses

        if self._pack_rows_cap is None:
            self._pack_rows_cap = self._sample_pack_rows()
        nn_ = np.asarray(batch.num_nodes, np.int64)
        if batch.node_stride > 0:
            offs = np.arange(len(nn_), dtype=np.int64) * batch.node_stride
        else:
            offs = np.zeros(len(nn_), np.int64)
            np.cumsum(nn_[:-1], out=offs[1:])
        from ..ops.pack import build_pack_fields_tiers

        widths = [w for w in (self.pack_w, self.pack_w2, self.pack_w3) if w]
        fields = build_pack_fields_tiers(
            nn_, np.asarray(batch.graph_mask), offs, batch.num_node_slots,
            tuple(widths), self.max_input_len,
            self._pack_rows_cap[:len(widths)])
        if fields is None:
            return batch  # caller splits (single consumer) or strips (group)
        return dataclasses.replace(batch, **fields)

    @staticmethod
    def _strip_pack(batch):
        import dataclasses

        if batch is None or batch.pack_node is None:
            return batch
        return dataclasses.replace(
            batch, pack_node=None, pack_seg=None, pack_cls_slot=None,
            pack_inv=None, pack_w=0, pack_rows=0,
            pack2_node=None, pack2_seg=None, pack2_inv=None,
            pack2_w=0, pack2_rows=0,
            pack3_node=None, pack3_seg=None, pack3_inv=None,
            pack3_w=0, pack3_rows=0)

    def _collate_one(self, plan):
        if self.packed is not None:
            batch = self._native_collate(plan)
            if batch is not None:
                return self._attach_pack(self._attach_sfa(batch))
        return self._attach_pack(self._attach_sfa(collate(
            [self.graphs[i] for i in plan],
            num_graphs_cap=self.batch_size + 1,
            num_nodes_cap=self.node_cap,
            num_edges_cap=self.edge_cap,
            max_input_len=self.max_input_len,
            num_tasks=self.num_tasks,
            max_seq_len=self.max_seq_len,
            y_dtype=self.y_dtype,
            with_dense_adj=self.with_dense_adj,
            dense_cap=self.dense_cap,
            node_stride=self.node_stride,
            dense_edge_cap=self.dense_edge_cap,
        )))

    def _collate_kept(self, plan, depth: int = 0):
        """Collate one plan into a LIST of batches: if a batch's edge
        distribution overflows the tight sampled slot budgets (rare by
        construction — mean+5sigma caps + 10% headroom), SPLIT it and retry
        so every emitted batch keeps the one compiled shape. Only active
        for single-consumer loaders (_sfa_split_ok)."""
        batch = self._collate_one(plan)
        overflow = batch is not None and (
            (self.scatter_free and batch.sfa_row_start_dst is None)
            or (self.seq_pack and batch.pack_node is None))
        if self._sfa_split_ok and overflow:
            if len(plan) > 1 and depth < 4:
                mid = len(plan) // 2
                return (self._collate_kept(plan[:mid], depth + 1)
                        + self._collate_kept(plan[mid:], depth + 1))
            # never silently narrow the fast path ("no silent caps")
            if not getattr(self, "_sfa_fallback_warned", False):
                from ..utils.logging import logger

                logger.warning(
                    "scatter-free slot / pack-row budgets overflowed even "
                    "after splitting — that batch uses the fallback path (a "
                    "one-off recompile)")
                self._sfa_fallback_warned = True
        return [batch]

    def _native_collate(self, plan):
        from . import native

        G = self.batch_size + 1
        S = min(self.dense_cap, self.max_input_len)
        raw = native.native_collate(
            self.packed, plan, self.node_cap, self.edge_cap, G, S,
            buffers=self._ring.next() if self._ring else None,
            num_threads=self.native_threads,
            node_stride=self.node_stride,
            dense_edge_cap=self.dense_edge_cap,
        )
        if raw is None:
            return None
        # labels were filled inside the native call
        if self.max_seq_len is not None and raw["y_arr"] is not None \
                and raw["y_arr"].shape[1] >= self.max_seq_len:
            y_arr = raw["y_arr"][:, : self.max_seq_len]
        else:
            y_arr = np.zeros((G, self.max_seq_len or 0), np.int32)
        if self.y_dtype == "int32":
            y = raw["y_int"] if raw["y_int"] is not None else np.zeros(G, np.int32)
        elif raw["y_float"] is not None and raw["y_float"].shape[1] == self.num_tasks:
            y = raw["y_float"]
        else:
            y = np.full((G, self.num_tasks), np.nan, np.float32)
            if raw["y_float"] is not None:
                y[:, : raw["y_float"].shape[1]] = raw["y_float"]
        return GraphBatch(
            node_feat=raw["node_feat"], node_graph=raw["node_graph"],
            node_pos=raw["node_pos"], node_mask=raw["node_mask"],
            node_depth=raw["node_depth"], edge_src=raw["edge_src"],
            edge_dst=raw["edge_dst"], edge_attr=raw["edge_attr"],
            edge_mask=raw["edge_mask"], graph_mask=raw["graph_mask"],
            num_nodes=raw["num_nodes"], y=y, y_arr=y_arr, dense_adj=None,
            graph_ids=raw["graph_ids"], max_nodes_dense=S,
            edge_src_dense=(raw["edge_src_dense"] if self.node_stride else None),
            edge_dst_dense=(raw["edge_dst_dense"] if self.node_stride else None),
            edge_mask_dense=(raw["edge_mask_dense"] if self.node_stride else None),
            edge_attr_dense=(raw["edge_attr_dense"] if self.node_stride else None),
            node_stride=self.node_stride,
        )

    def __iter__(self):
        import jax

        order = np.arange(len(self.graphs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1

        plans = self._plan_chunks(order)
        stack_n = self.num_shards
        if self.process_count > 1:
            plans = self._local_plans(plans)
            stack_n = self.num_shards // self.process_count
        kept = lambda p: [None] if p is None else self._collate_kept(p)

        def flat(lists):
            for lst in lists:
                yield from lst

        if self.collate_workers > 1 and len(plans) > 1:
            # parallel ordered collation: numpy and the native batcher both
            # release the GIL, so worker threads scale with cores
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.collate_workers) as ex:
                yield from self._emit(flat(ex.map(kept, plans)), jax, stack_n)
        else:
            yield from self._emit(flat(map(kept, plans)), jax, stack_n)

    def _local_plans(self, plans):
        """Multi-host slice of the global batch plan: group the epoch's plans
        into global steps of num_shards, drop globally-degenerate tail groups
        (every process must agree on the step count — a locally-empty shard
        is safe under sync-BN, a globally <=1-graph batch is not), and keep
        only this process's shard slots, padding short tails with `None`
        (emitted as all-masked zero batches)."""
        D = self.num_shards
        L = D // self.process_count
        lo = self.process_index * L
        local = []
        for i in range(0, len(plans), D):
            group = plans[i:i + D]
            if sum(len(p) for p in group) <= 1:
                continue  # deterministic on every process: sizes only
            mine = list(group[lo:lo + L])
            while len(mine) < L:
                mine.append(None)
            local.extend(mine)
        if not local:
            raise ValueError(
                "dataset too small for one global multi-host batch group "
                f"({len(plans)} plans for {D} global shards)")
        return local

    def _emit(self, batches, jax, stack_n=None):
        stack_n = self.num_shards if stack_n is None else stack_n
        template = None  # zeroed sub-batch: all-False masks contribute nothing
        shard_buf = []
        for batch in batches:
            if batch is not None and template is None:
                template = jax.tree_util.tree_map(np.zeros_like, batch)
            if self.hybrid_shards > 1:
                from ..parallel.hybrid import shard_batch_for_hybrid

                # coarse buckets keep the per-(Es,H)-shape recompile count low
                local, _ = shard_batch_for_hybrid(
                    batch, self.hybrid_shards,
                    halo_multiple=256, edge_multiple=1024,
                )
                yield local
            elif stack_n == 1 and self.process_count == 1:
                yield batch
            else:
                shard_buf.append(batch)
                if len(shard_buf) == stack_n:
                    if template is None:
                        raise ValueError(
                            "multi-host shard group with no real local batch "
                            "before any template — dataset too small for "
                            "this process grid")
                    # a pack-row overflow in ANY member strips the pack
                    # fields from the whole group (stacking needs one tree);
                    # the persistent template keeps its fields for later
                    # fully-packed groups
                    group = [b if b is not None else template
                             for b in shard_buf]
                    if self.seq_pack and any(b.pack_node is None
                                             for b in group):
                        group = [self._strip_pack(b) for b in group]
                    yield jax.tree_util.tree_map(
                        lambda *xs: np.stack(xs, axis=0), *group)
                    shard_buf = []
        # tail: pad missing shards with an all-masked-out empty batch
        # (zeroed arrays have all-False masks, so they contribute nothing)
        if shard_buf:
            if template is None:
                raise ValueError("shard tail with no real batch to zero-pad")
            shard_buf = [b if b is not None else template for b in shard_buf]
            while len(shard_buf) < stack_n:
                shard_buf.append(template)
            if self.seq_pack and any(b.pack_node is None for b in shard_buf):
                shard_buf = [self._strip_pack(b) for b in shard_buf]
            yield jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *shard_buf)
