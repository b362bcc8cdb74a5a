"""End-to-end trainer epoch A/B for --scatter_free over the REAL host link.

bench.py measures the scatter-free aggregation win on device-resident
batches; this tool answers the round-3 open question — does the production
default also win END TO END on this host, where every batch rides the
host->device link (through the axon tunnel, H2D is the trainer bottleneck)?
It runs the code2-shaped flagship through the production pipeline
(GraphLoader -> device_prefetch -> jitted trainer step) with scatter-free
plans ON vs OFF and reports warm epoch wall times and per-batch H2D bytes.

Round-4 context: the compressed plan format (ops/block_plan.
build_sfa_compressed + ops/plan_expand.py) cut the code2 batch from
~30 MB to ~5.8 MB, of which the plans are only ~1.6 MB (row starts + one
src-sort permutation) — so the H2D tax that made this question open is
mostly gone.

Usage: python tools/tunnel_epoch_ab.py [epochs] [batch_size] [n_batches]
Prints one JSON line per arm plus a verdict line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def batch_nbytes(b) -> int:
    import dataclasses

    return sum(np.asarray(l).nbytes
               for f in dataclasses.fields(b)
               if getattr(b, f.name) is not None
               and not f.metadata.get("static")
               for l in jax.tree_util.tree_leaves(getattr(b, f.name)))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from graphtrans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    import bench
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.prefetch import device_prefetch
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import (augment_edge, encode_seq_to_arr,
                                           get_vocab_mapping)

    raw = make_code_dataset(num_graphs=bs * n_batches, vocab_size=5000,
                            seq_len_max=6, min_nodes=50, max_nodes=250,
                            seed=0)
    vocab2idx, _ = get_vocab_mapping([g["y_seq"] for g in raw], 5000)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["y_arr"] = encode_seq_to_arr(g["y_seq"], vocab2idx, 5)
        graphs.append(g)

    # model/state/step from the bench flagship config (GCN-virtual JK=cat);
    # the loader below reproduces the same dataset-wide caps, so the step
    # compiled against the bench batch reuses for loader batches
    state0, step, _bench_batch = bench.build_code2(batch_size=bs, seed=0,
                                                   precision="bf16")

    results = {}
    for arm in ("scatter_free", "segment"):
        loader = GraphLoader(graphs, batch_size=bs, shuffle=False, seed=0,
                             num_tasks=len(vocab2idx), max_seq_len=5,
                             y_dtype="int32",
                             scatter_free=(arm == "scatter_free"))
        state = state0
        rng = jax.random.key(7)
        epoch_times = []
        h2d = None
        edges = 0
        for epoch in range(epochs):
            t0 = time.perf_counter()
            loss = None
            for i, b in enumerate(device_prefetch(iter(loader), size=2)):
                rng = jax.random.fold_in(rng, epoch * 1000 + i)
                state, loss = step(state, b, rng)
            lv = float(loss)  # force the epoch to finish on-device
            dt = time.perf_counter() - t0
            epoch_times.append(dt)
            if h2d is None:
                hb = next(iter(loader))
                h2d = batch_nbytes(hb)
                edges = sum(int(np.asarray(g["edge_index"]).shape[1])
                            for g in graphs)
            print(f"{arm}: epoch {epoch} {dt:.2f}s loss {lv:.4f}",
                  file=sys.stderr)
        warm = epoch_times[1:] if len(epoch_times) > 1 else epoch_times
        results[arm] = {
            "warm_epoch_s": round(float(np.mean(warm)), 3),
            "epoch_times_s": [round(t, 3) for t in epoch_times],
            "h2d_bytes_per_batch": int(h2d),
            "edges_per_sec": round(edges / float(np.mean(warm)), 1),
            "final_loss": round(lv, 4),
        }
        print(json.dumps({"arm": arm, **results[arm]}))

    sf, seg = results["scatter_free"], results["segment"]
    print(json.dumps({
        "verdict": "scatter_free_wins" if sf["warm_epoch_s"]
        < seg["warm_epoch_s"] else "segment_wins",
        "speedup_e2e": round(seg["warm_epoch_s"] / sf["warm_epoch_s"], 3),
        "h2d_ratio": round(sf["h2d_bytes_per_batch"]
                           / seg["h2d_bytes_per_batch"], 3),
    }))


if __name__ == "__main__":
    main()
