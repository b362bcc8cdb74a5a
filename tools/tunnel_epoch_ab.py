"""End-to-end trainer epoch A/B over the REAL host link.

bench.py measures kernels on device-resident batches; this tool answers the
production-routing questions end to end, where every batch rides the
host->device link (through the axon tunnel, H2D is the trainer bottleneck):
it runs the production pipeline (GraphLoader -> device_prefetch -> jitted
trainer step) arm vs arm and reports warm epoch wall times and per-batch
H2D bytes.

Workloads / arms:
  --workload code2 (GCN-virtual JK=cat seq-head flagship):
      scatter_free vs segment (VERDICT r04 #6 — the routing wash), and
      nopack (seq_pack off) to price the packed transformer stage e2e.
  --workload pna (PNA-transformer):
      ell_explicit (host-built ELL plans, eb79587's H2D trade) vs
      ell_device (derived on device from the compressed plans) —
      VERDICT r04 #5.

Sizes follow the real ogbg-code2 heavy tail by default (--sizes uniform
restores the round-4 50-250 shape).

Usage: python tools/tunnel_epoch_ab.py [--workload code2] [--epochs 4]
       [--bs 512] [--n_batches 4] [--sizes code2]
Prints one JSON line per arm plus a verdict line.
"""

from __future__ import annotations

import argparse
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


def build_step_for(batch, model_key, vocab_n, deg, precision="bf16"):
    """Model/state/jitted-step initialized against a LOADER batch (the
    compiled tree must match what the loader emits — pack/plan fields and
    their static row caps included)."""
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import ASTNodeEncoder, LinearEdgeEncoder
    from graphtrans_tpu.train import losses
    from graphtrans_tpu.train.optim import build_optimizer
    from graphtrans_tpu.train.state import TrainState
    from graphtrans_tpu.trainers import TRAINER_REGISTRY
    from __graft_entry__ import _flagship_args

    emb = 272 if model_key == "pna-transformer" else 300
    args = _flagship_args(
        gnn_type="gcn" if model_key == "gnn-transformer" else "pna",
        gnn_virtual_node=(model_key == "gnn-transformer"),
        gnn_JK="cat" if model_key == "gnn-transformer" else "last",
        gnn_residual=(model_key == "pna-transformer"),
        gnn_emb_dim=emb, d_model=128, gnn_dropout=0.0, max_seq_len=5,
        transformer_norm_input=True)
    args.precision = precision
    model = MODELS[model_key].build(
        vocab_n, args,
        ASTNodeEncoder(emb, num_nodetypes=20, num_nodeattributes=100,
                       max_depth=20),
        lambda e: LinearEdgeEncoder(e), deg=deg)
    variables = jax.jit(lambda r, b: model.init(r, b, None, False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch)
    tx, _ = build_optimizer(args, 100)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}),
                              tx.init(variables["params"]))
    step = TRAINER_REGISTRY["baseline"].make_train_step(
        model, losses.seq_token_loss, tx, args, donate=False)
    return state, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["code2", "pna"], default="code2")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--n_batches", type=int, default=4)
    ap.add_argument("--sizes", choices=["code2", "uniform"], default="code2")
    ap.add_argument("--arms", nargs="+", default=None)
    opts = ap.parse_args()

    from graphtrans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from graphtrans_tpu.data.code import degree_histogram
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.prefetch import device_prefetch
    from graphtrans_tpu.data.synthetic import make_code_dataset
    from graphtrans_tpu.data.vocab import (augment_edge, encode_seq_to_arr,
                                           get_vocab_mapping)

    raw = make_code_dataset(num_graphs=opts.bs * opts.n_batches,
                            vocab_size=5000, seq_len_max=6, min_nodes=50,
                            max_nodes=250, seed=0, size_dist=opts.sizes)
    vocab2idx, _ = get_vocab_mapping([g["y_seq"] for g in raw], 5000)
    graphs = []
    for g in raw:
        g = augment_edge(g)
        g["y_arr"] = encode_seq_to_arr(g["y_seq"], vocab2idx, 5)
        graphs.append(g)

    if opts.workload == "pna":
        model_key = "pna-transformer"
        deg = degree_histogram(graphs, bins=800)
        arms = opts.arms or ["ell_explicit", "ell_device"]
    else:
        model_key = "gnn-transformer"
        deg = None
        arms = opts.arms or ["scatter_free", "segment", "nopack"]

    def loader_for(arm):
        kw = dict(num_tasks=len(vocab2idx), max_seq_len=5, y_dtype="int32",
                  shuffle=False, seed=0, seq_pack=(arm != "nopack"))
        if opts.workload == "pna":
            kw.update(scatter_free=True, ell_explicit=(arm == "ell_explicit"))
        else:
            kw.update(scatter_free=(arm == "scatter_free"))
        return GraphLoader(graphs, batch_size=opts.bs, **kw)

    results = {}
    edges = sum(int(np.asarray(g["edge_index"]).shape[1]) for g in graphs)
    for arm in arms:
        try:
            results[arm] = _run_arm(arm, loader_for, model_key, vocab2idx,
                                    deg, opts, edges)
            print(json.dumps({"arm": arm, **results[arm]}))
        except Exception as e:  # e.g. nopack OOMs at heavy-tail bs=512 —
            # that IS the finding; record it and keep the other arms
            results[arm] = {"error": repr(e)[:300]}
            print(json.dumps({"arm": arm, "error": repr(e)[:300]}))

    timed = {a: r for a, r in results.items() if "warm_epoch_s" in r}
    if len(timed) >= 2:
        ranked = sorted(timed, key=lambda a: timed[a]["warm_epoch_s"])
        best, second = ranked[0], ranked[1]
        print(json.dumps({
            "workload": opts.workload, "sizes": opts.sizes,
            "verdict": f"{best}_wins",
            "speedup_vs_next": round(timed[second]["warm_epoch_s"]
                                     / timed[best]["warm_epoch_s"], 3),
            "h2d_ratio_best_vs_next": round(
                timed[best]["h2d_bytes_per_batch"]
                / timed[second]["h2d_bytes_per_batch"], 3),
        }))


def _run_arm(arm, loader_for, model_key, vocab2idx, deg, opts, edges):
    import time

    from graphtrans_tpu.data.prefetch import device_prefetch

    loader = loader_for(arm)
    first = next(iter(loader))
    state, step = build_step_for(first, model_key, len(vocab2idx), deg)
    rng = jax.random.key(7)
    epoch_times = []
    for epoch in range(opts.epochs):
        t0 = time.perf_counter()
        loss = None
        for i, b in enumerate(device_prefetch(iter(loader), size=2)):
            rng = jax.random.fold_in(rng, epoch * 1000 + i)
            state, loss = step(state, b, rng)
        lv = float(loss)  # force the epoch to finish on-device
        dt = time.perf_counter() - t0
        epoch_times.append(dt)
        print(f"{arm}: epoch {epoch} {dt:.2f}s loss {lv:.4f}",
              file=sys.stderr)
    warm = epoch_times[1:] if len(epoch_times) > 1 else epoch_times
    return {
        "warm_epoch_s": round(float(np.mean(warm)), 3),
        "epoch_times_s": [round(t, 3) for t in epoch_times],
        "h2d_bytes_per_batch": int(batch_nbytes(first)),
        "edges_per_sec": round(edges / float(np.mean(warm)), 1),
        "final_loss": round(lv, 4),
    }


if __name__ == "__main__":
    main()
