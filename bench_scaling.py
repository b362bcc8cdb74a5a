"""Multi-chip scaling-efficiency harness (BASELINE north star: >80% edges/s
scaling efficiency). Runs the shard_map data-parallel train step at growing
shard counts over the available devices and reports per-shard-count edges/s
and efficiency vs linear scaling from 1 shard.

On this single-chip environment it runs on the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python bench_scaling.py) — numbers there measure collective/SPMD overhead,
not TPU compute; on a real pod slice the same harness measures true scaling.
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per_shard_batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--shards", type=int, nargs="+", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    from graphtrans_tpu.data.batch import collate
    from graphtrans_tpu.data.loader import dataset_caps
    from graphtrans_tpu.data.synthetic import make_mol_dataset
    from graphtrans_tpu.models import MODELS
    from graphtrans_tpu.nn.encoders import AtomEncoder, BondEncoder
    from graphtrans_tpu.parallel.dp import make_dp_train_step
    from graphtrans_tpu.train import losses
    from graphtrans_tpu.train.optim import build_optimizer
    from graphtrans_tpu.train.state import TrainState
    from graphtrans_tpu.trainers import TRAINER_REGISTRY
    from graphtrans_tpu.utils.cache import enable_compilation_cache
    from __graft_entry__ import _flagship_args

    enable_compilation_cache()
    n_dev = len(jax.devices())
    shard_counts = args.shards or [s for s in (1, 2, 4, 8) if s <= n_dev]

    results = {}
    for n in shard_counts:
        margs = _flagship_args(gnn_type="gin", gnn_virtual_node=True,
                               gnn_JK="cat", gnn_emb_dim=128, d_model=128,
                               gnn_dropout=0.3,
                               bn_axis_name="data" if n > 1 else None)
        shard_graphs = [
            make_mol_dataset(num_graphs=args.per_shard_batch, num_tasks=32,
                             min_nodes=20, max_nodes=32, seed=i)
            for i in range(n)
        ]
        caps = dataset_caps(sum(shard_graphs, []), args.per_shard_batch)
        shard_batches = [
            collate(graphs, args.per_shard_batch + 1, caps[0], caps[1],
                    num_tasks=32, y_dtype="float32")
            for graphs in shard_graphs
        ]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *shard_batches)
        edges = int(np.asarray(stacked.edge_mask).sum())

        model = MODELS["gnn-transformer"].build(
            32, margs, AtomEncoder(margs.gnn_emb_dim), lambda e: BondEncoder(e))
        variables = jax.jit(lambda r, b: model.init(r, b, None, False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            shard_batches[0])
        tx, _ = build_optimizer(margs, 100)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}),
                                  tx.init(variables["params"]))
        trainer = TRAINER_REGISTRY["baseline"]
        step = make_dp_train_step(trainer, model, losses.binary_multitask_loss,
                                  tx, margs, "gnn_node", n, donate=False)
        stacked = jax.device_put(stacked)
        rng = jax.random.key(0)
        from bench import time_steps

        dt = time_steps(step, state, stacked, rng, iters=args.iters)
        results[n] = {"edges": edges, "step_ms": round(dt * 1e3, 2),
                      "edges_per_s": round(edges / dt, 1)}

    base = results[shard_counts[0]]["edges_per_s"] / shard_counts[0]
    for n in shard_counts:
        results[n]["efficiency_vs_linear"] = round(
            results[n]["edges_per_s"] / (base * n), 3)

    note = None
    if jax.devices()[0].platform == "cpu":
        note = ("virtual CPU devices share one host's cores: efficiency here "
                "reflects core oversubscription, not interconnect scaling — "
                "run on a real slice for meaningful numbers")
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "device": str(jax.devices()[0]),
        "note": note,
        "shards": results,
    }))


if __name__ == "__main__":
    main()
