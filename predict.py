"""Batch inference driver: load a trained checkpoint and write predictions
for a dataset split as JSONL (the serving-side counterpart of main.py —
the reference has no inference entry point at all).

usage: python predict.py --configs <same config as training> \
           --checkpoint exps/<run>/<id>/best_model.ckpt \
           --split test --out preds.jsonl
"""

from __future__ import annotations

import json

import numpy as np

from graphtrans_tpu.data import DATASET_UTILS
from graphtrans_tpu.models import get_model_and_parser
from graphtrans_tpu.train import checkpoint as ckpt
from graphtrans_tpu.trainers import get_trainer_and_parser
from graphtrans_tpu.utils.logging import logger
from main import build_parser, make_loaders


def main():
    import jax

    from graphtrans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, required=False, default=None)
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "valid", "test"])
    parser.add_argument("--out", type=str, default="predictions.jsonl")
    args, _ = parser.parse_known_args()

    dataset_util = DATASET_UTILS[args.dataset]()
    dataset_util.add_args(parser)
    args, _ = parser.parse_known_args()
    get_trainer_and_parser(args, parser)
    model_cls = get_model_and_parser(args, parser)
    args = parser.parse_args()
    args.bn_axis_name = None
    jax.config.update("jax_default_prng_impl", args.prng_impl)
    from main import resolve_dense_layout

    args.use_dense_layout = resolve_dense_layout(args)

    bundle = dataset_util.preprocess(args, model_cls, seed=args.seed)
    loaders = make_loaders(bundle, args)
    loader = {"train": loaders[1], "valid": loaders[2], "test": loaders[3]}[args.split]

    node_encoder = bundle.node_encoder_cls()
    model = model_cls.build(bundle.num_tasks, args, node_encoder,
                            bundle.edge_encoder_cls, deg=bundle.deg)
    sample = next(iter(loader))
    variables = jax.jit(lambda r, b: model.init(r, b, None, False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.checkpoint:
        blob = ckpt.load_checkpoint(args.checkpoint)
        if blob is None:
            raise FileNotFoundError(args.checkpoint)
        params, batch_stats = ckpt.restore_params(blob, params, batch_stats)
        logger.info(f"restored {args.checkpoint} (epoch {blob['epoch']})")
    else:
        logger.warning("no --checkpoint given: predicting with random init")

    from graphtrans_tpu.ops.plan_expand import expand_inline

    fwd = jax.jit(lambda batch: model.apply(
        {"params": params, "batch_stats": batch_stats},
        expand_inline(batch), None, False))

    n = 0
    with open(args.out, "w") as f:
        for batch in loader:
            pred = np.asarray(fwd(batch))
            pred = pred.reshape((-1,) + pred.shape[len(pred.shape) - (2 if bundle.max_seq_len else 1):])
            mask = np.asarray(batch.graph_mask).reshape(-1)
            ids = np.asarray(batch.graph_ids).reshape(-1)
            for i in np.nonzero(mask)[0]:
                rec = {"graph_id": int(ids[i])}
                if bundle.max_seq_len is not None:
                    tokens = pred[i].argmax(-1)
                    rec["tokens"] = [int(t) for t in tokens]
                    if bundle.arr_to_seq is not None:
                        rec["seq"] = bundle.arr_to_seq(tokens)
                else:
                    rec["logits"] = [float(v) for v in pred[i]]
                f.write(json.dumps(rec) + "\n")
                n += 1
    metric = dataset_util.eval(lambda b: fwd(b), loader)
    logger.info(f"wrote {n} predictions to {args.out}; split metrics: {metric}")


if __name__ == "__main__":
    main()
