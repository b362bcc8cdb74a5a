"""Experiment driver — the single entry point, mirroring the reference CLI
(`python main.py --configs <yml> [flags]`, /root/reference/main.py:29-276):
three-stage registry parsing (dataset util -> trainer -> model each extend the
parser), multi-run loop with mean±std aggregation, per-epoch train/eval with
gated evaluation, plateau scheduling on the valid metric, last/best
checkpointing with auto-resume, and GNN freeze/pretrained-restore hooks.

TPU-native differences: the train step is one jitted XLA program (optionally
shard_map data-parallel over a device Mesh via --dp_shards), batches are
static-shape bucketed pads, and checkpoints are JAX pytrees.
"""

from __future__ import annotations

import os
import random
import time
from datetime import datetime

import numpy as np

from graphtrans_tpu.data import DATASET_UTILS
from graphtrans_tpu.data.loader import GraphLoader, dataset_caps
from graphtrans_tpu.ops import plan_expand
from graphtrans_tpu.models import get_model_and_parser
from graphtrans_tpu.train import checkpoint as ckpt
from graphtrans_tpu.train.optim import PlateauScheduler, build_optimizer, read_lr, set_lr
from graphtrans_tpu.train.state import TrainState
from graphtrans_tpu.trainers import get_trainer_and_parser
from graphtrans_tpu.utils.config import ConfigArgumentParser
from graphtrans_tpu.utils.logging import MetricsLogger, count_params, logger


def build_parser():
    parser = ConfigArgumentParser(
        description="GraphTrans on TPU (JAX/XLA/Pallas)")
    parser.add_argument("--wandb_run_idx", type=str, default=None)
    parser.add_argument("--wandb", action="store_true", default=False,
                        help="mirror metrics to wandb (reference main.py:24; "
                             "optional import — warns and continues when the "
                             "package is absent)")
    parser.add_argument("--wandb_project", type=str, default="graph-aug")
    parser.add_argument("--data_root", type=str, default="data_root")
    parser.add_argument("--dataset", type=str, default="ogbg-code",
                        help="dataset name (default: ogbg-code)")
    parser.add_argument("--aug", type=str, default="baseline",
                        help="augment method to use [baseline|flag]")
    parser.add_argument("--max_seq_len", type=int, default=None,
                        help="maximum sequence length to predict (default: None)")
    group = parser.add_argument_group("model")
    group.add_argument("--model_type", type=str, default="gnn",
                       help="gnn|pna|gnn-transformer|transformer|pna-transformer|transformer-gnn")
    group.add_argument("--graph_pooling", type=str, default="mean")
    group = parser.add_argument_group("gnn")
    group.add_argument("--gnn_type", type=str, default="gcn")
    group.add_argument("--gnn_virtual_node", action="store_true")
    group.add_argument("--gnn_dropout", type=float, default=0)
    group.add_argument("--gnn_num_layer", type=int, default=5)
    group.add_argument("--gnn_emb_dim", type=int, default=300)
    group.add_argument("--gnn_JK", type=str, default="last")
    group.add_argument("--gnn_residual", action="store_true", default=False)
    group = parser.add_argument_group("training")
    group.add_argument("--batch_size", type=int, default=128)
    group.add_argument("--eval_batch_size", type=int, default=None)
    group.add_argument("--epochs", type=int, default=30)
    group.add_argument("--num_workers", type=int, default=0,
                       help="host collation parallelism (threads inside the "
                            "native batcher; 0 = auto by batch size)")
    group.add_argument("--scheduler", type=str, default=None)
    group.add_argument("--pct_start", type=float, default=0.3)
    group.add_argument("--weight_decay", type=float, default=0.0)
    group.add_argument("--grad_clip", type=float, default=None)
    group.add_argument("--lr", type=float, default=0.001)
    group.add_argument("--max_lr", type=float, default=0.001)
    group.add_argument("--runs", type=int, default=10)
    group.add_argument("--test-freq", type=int, default=1, dest="test_freq")
    group.add_argument("--start-eval", type=int, default=15, dest="start_eval")
    group.add_argument("--resume", type=str, default=None)
    group.add_argument("--seed", type=int, default=None)
    group = parser.add_argument_group("tpu")
    group.add_argument("--dp_shards", type=int, default=1,
                       help="data-parallel shards over the device mesh")
    group.add_argument("--tp_shards", type=int, default=1,
                       help="tensor-parallel (megatron) shards for the "
                            "transformer stage; composes with --dp_shards on "
                            "one dp×tp mesh via GSPMD")
    group.add_argument("--sp", action="store_true", default=False,
                       help="sequence parallelism: shard the dense "
                            "transformer activations along the node axis "
                            "over the 'model' mesh axis (requires "
                            "--tp_shards > 1)")
    group.add_argument("--multihost", action="store_true", default=False,
                       help="multi-process (multi-host / DCN) execution: "
                            "jax.distributed.initialize + per-process data "
                            "sharding + DP over the GLOBAL device mesh "
                            "(parallel/multihost.py). Every process runs "
                            "this same command; --dp_shards is the GLOBAL "
                            "shard count")
    group.add_argument("--coordinator_address", type=str, default=None,
                       help="host:port of process 0's coordinator (omit on "
                            "TPU pods for metadata auto-discovery)")
    group.add_argument("--num_processes", type=int, default=None)
    group.add_argument("--process_id", type=int, default=None)
    group.add_argument("--hybrid_shards", type=int, default=1,
                       help="node-sharded (halo-exchange) execution over the "
                            "mesh — gnn-transformer with gnn_type=gin only")
    group.add_argument("--use_pallas", action="store_true", default=False,
                       help="route aggregation through the Pallas fused "
                            "kernels (dense layout: ops/pallas/dense_agg, "
                            "f32-exact, measured at par with the default "
                            "XLA one-hot path; flat layout: ops/pallas/"
                            "spmm, slower — both opt-in)")
    group.add_argument("--attn_backend", type=str, default="auto",
                       choices=["auto", "flash", "smalls", "chunked", "dense",
                                "packed", "packed_smalls"],
                       help="attention path: auto = graph-packed block-"
                            "diagonal rows for short S on TPU (measured "
                            "1.21x whole-step), flash Pallas kernel on TPU "
                            "for S >= 512, chunked scan off-TPU, dense "
                            "otherwise; or force one backend explicitly")
    group.add_argument("--scatter_free", type=str, default="auto",
                       choices=["auto", "off"],
                       help="flat-layout aggregation via per-dst-block "
                            "one-hot matmuls instead of XLA's serialized "
                            "scatter-adds (ops/scatter_free.py); auto = on "
                            "for flat layouts incl. DP shard stacking "
                            "(pinned dataset-wide caps); gated off only "
                            "under hybrid partitioning / dense layout. "
                            "NOTE: the plans add ~7 MB/batch H2D — "
                            "negligible on a PCIe-fed host (<0.5 ms), but "
                            "on a slow host link (this image's tunnel: "
                            "segment measured 1.24x faster e2e at the "
                            "round-5 step times) prefer 'off'")
    group.add_argument("--ell_explicit", action="store_true", default=False,
                       help="ship host-built explicit ELL plans for PNA "
                            "instead of deriving them on device (~6 ms/step "
                            "cheaper on-chip but ~2x the batch H2D bytes — "
                            "measured 1.26x SLOWER e2e on this tunnel-bound "
                            "host; enable on hosts with fast PCIe feeds)")
    group.add_argument("--seq_pack", type=str, default="auto",
                       choices=["auto", "on", "off"],
                       help="variable-length sequence packing for the "
                            "transformer stage (ops/pack.py): graphs' kept "
                            "nodes + their own CLS token pack into [R, W] "
                            "rows with segment-masked attention instead of "
                            "padding every graph to the dataset max. auto = "
                            "on for flat-layout CLS-pooling transformer "
                            "models on datasets whose dense width is >= 256 "
                            "(heavy-tailed regimes — measured 5.3x e2e on "
                            "code2-shaped data at bs=512, which OOMs "
                            "unpacked)")
    group.add_argument("--dense_layout", type=str, default="auto",
                       choices=["auto", "on", "off"],
                       help="strided per-graph node layout: aggregation runs "
                            "scatter-free as one-hot MXU matmuls (3x+ faster "
                            "fwd+bwd than XLA's serialized scatter, f32-"
                            "exact). auto = on for gin/gcn models on small-"
                            "graph datasets; the loader falls back to the "
                            "flat layout when graphs exceed the stride")
    group.add_argument("--synthetic_num_graphs", type=int, default=400)
    group.add_argument("--synthetic_seed", type=int, default=0)
    group.add_argument("--profile_dir", type=str, default=None,
                       help="write a jax.profiler trace of one epoch here")
    group.add_argument("--precision", type=str, default="f32",
                       choices=["f32", "bf16"],
                       help="bf16: forward/backward in bfloat16 with f32 "
                            "master params, losses and BN stats in f32 — "
                            "measured ~1.3x faster per step on TPU v5e "
                            "(memory-bound stages halve their traffic). "
                            "f32 stays the default for strict reference "
                            "parity; use bf16 for throughput")
    group.add_argument("--prng_impl", type=str, default="rbg",
                       choices=["rbg", "threefry2x32"],
                       help="dropout RNG: rbg (XLA hardware RngBitGenerator, "
                            "~2x faster masks, ~20 ms/step here) or "
                            "threefry2x32 (stream-stable across JAX "
                            "versions/backends)")
    group.add_argument("--ckpt_backend", type=str, default="pickle",
                       choices=["pickle", "orbax"],
                       help="orbax: async array writes (training continues "
                            "while checkpoint IO lands)")
    group.add_argument("--checkpoint_every_epoch", action="store_true",
                       default=False,
                       help="checkpoint after every epoch (default keeps the "
                            "reference's eval-gated granularity)")
    return parser


def resolve_dense_layout(args) -> bool:
    """Single source of truth for the strided-layout routing (main.py and
    predict.py both consult it): on when forced, or automatically for
    gin/gcn conv models outside hybrid/masked-encoder modes (the loader
    additionally falls back when graphs exceed the measured-win stride)."""
    return (args.dense_layout == "on"
            or (args.dense_layout == "auto"
                and args.model_type in ("gnn", "gnn-transformer")
                and args.gnn_type in ("gin", "gcn")
                and getattr(args, "hybrid_shards", 1) == 1
                and getattr(args, "num_encoder_layers_masked", 0) == 0))


def resolve_seq_pack(args, max_n: int) -> bool:
    """Single source of truth for the variable-length packed transformer
    route (ops/pack.py): on when forced, or automatically for flat-layout
    CLS-pooling transformer compositions whose dense width reaches 256 —
    the regime where [G, S_max] padding burns real memory/FLOPs. The model
    additionally gates per batch (models/gnn_transformer.use_seq_pack)."""
    mode = getattr(args, "seq_pack", "auto")
    if mode == "off":
        return False
    eligible = (args.model_type in ("gnn-transformer", "pna-transformer")
                and getattr(args, "graph_pooling", "cls") == "cls"
                and getattr(args, "num_encoder_layers", 0) > 0
                and getattr(args, "num_encoder_layers_masked", 0) == 0
                and not getattr(args, "pos_encoder", False)
                and getattr(args, "hybrid_shards", 1) == 1
                and getattr(args, "sp_axis", None) is None)
    if mode == "on":
        if not eligible:
            logger.warning("--seq_pack on requested but the composition "
                           "cannot pack (non-CLS pooling, masked/positional "
                           "encoder, hybrid or sp) — off")
        return eligible
    from graphtrans_tpu.data.batch import bucket_size

    max_input_len = int(getattr(args, "max_input_len", 1000))
    # auto: always on for the strided layout (transformer tokens drop ~2x,
    # measured 56.5 -> 51.7 ms on the mol flagship); for the flat layout
    # only where the dense width is wide enough to matter
    if getattr(args, "use_dense_layout", False):
        return eligible
    return eligible and bucket_size(min(max_n, max_input_len) + 1, 128) >= 256


def make_loaders(bundle, args, num_shards=1, process_count=1, process_index=0):
    all_graphs = sum(bundle.splits.values(), [])
    eval_bs = args.batch_size if args.eval_batch_size is None else args.eval_batch_size
    caps = dataset_caps(all_graphs, max(args.batch_size, eval_bs))
    with_adj = getattr(args, "num_encoder_layers_masked", 0) > 0
    max_n_all = max((int(g["x"].shape[0]) for g in all_graphs), default=1)
    common = dict(
        num_tasks=bundle.num_tasks,
        max_seq_len=bundle.max_seq_len,
        y_dtype=bundle.y_dtype,
        max_input_len=int(getattr(args, "max_input_len", 1000)),
        with_dense_adj=with_adj,
        fixed_caps=caps,
        hybrid_shards=getattr(args, "hybrid_shards", 1),
        # reference --num_workers (DataLoader worker processes) maps to
        # native collation threads here (0 = auto by batch size)
        native_threads=getattr(args, "num_workers", 0),
        # scatter-free flat aggregation (ops/scatter_free.py): default on
        # for flat layouts. Only hybrid partitioning and the dense layout
        # gate it off; under DP shard stacking the plans are built with
        # pinned dataset-wide caps so shards stack tree-wise (tested in
        # tests/test_sharding.py). Measured 108.5 vs 116.8 ms on the code2
        # bench arm (120.0 vs 117.9 at sampled epoch-wide slot budgets —
        # a wash at code2 shapes; see tools/tunnel_epoch_ab.py)
        scatter_free=getattr(args, "scatter_free", "auto") != "off",
        # PNA (need_deg) consumes the ELL reducers every layer. Deriving
        # them on device costs ~6 ms/step in row gathers, but shipping the
        # explicit plans DOUBLES the batch's host->device bytes — measured
        # e2e (tools/tunnel_epoch_ab.py --workload pna, heavy-tail bs=512):
        # device-derived 1.48 s/epoch vs explicit 1.87 (1.26x), 13.1 vs
        # 25.7 MB/batch. Default derive-on-device; --ell_explicit opts back
        # in for hosts whose H2D is not the bottleneck.
        ell_explicit=(bool(getattr(args, "_model_need_deg", False))
                      and getattr(args, "ell_explicit", False)),
        # variable-length sequence packing for the transformer stage
        seq_pack=resolve_seq_pack(args, max_n_all),
    )
    if common["seq_pack"]:
        logger.info("seq_pack: transformer stage runs variable-length "
                    "packed rows (ops/pack.py)")
    if getattr(args, "use_dense_layout", False):
        from graphtrans_tpu.data.batch import bucket_size

        max_n = max((int(g["x"].shape[0]) for g in all_graphs), default=1)
        max_e = max((int(g["edge_index"].shape[1]) for g in all_graphs),
                    default=1)
        # the one-hot formulation's FLOP inflation is the stride, so auto
        # only engages in the measured-win regime (molecule/NCI-scale
        # graphs); --dense_layout on overrides for experimentation
        if args.dense_layout == "auto" and max_n > 128:
            logger.info(f"dense_layout auto: off (largest graph {max_n} "
                        "nodes > 128 — flat segment path wins there)")
        else:
            if max_n > 128:
                logger.warning(f"dense_layout forced on with {max_n}-node "
                               "graphs: one-hot aggregation cost grows with "
                               "the stride")
            common["dense_layout"] = True
            common["dense_caps"] = (bucket_size(max_n, 16),
                                    bucket_size(max_e, 8))
    train_loader = GraphLoader(bundle.splits["train"], args.batch_size,
                               shuffle=True, seed=args.seed or 0,
                               num_shards=num_shards,
                               process_count=process_count,
                               process_index=process_index, **common)
    # evaluation always runs on plain (unsharded) batches — hybrid node
    # sharding is a training-scale concern. Under multi-host, eval runs
    # LOCALLY on every process over the full split (identical metrics
    # everywhere, no cross-process collectives to keep in lockstep).
    common_eval = dict(common, hybrid_shards=1)
    eval_shards = 1 if process_count > 1 else num_shards
    train_eval = GraphLoader(bundle.splits["train"], eval_bs,
                             num_shards=eval_shards, **common_eval)
    valid_loader = GraphLoader(bundle.splits["valid"], eval_bs,
                               num_shards=eval_shards, **common_eval)
    test_loader = GraphLoader(bundle.splits["test"], eval_bs,
                              num_shards=eval_shards, **common_eval)
    return train_loader, train_eval, valid_loader, test_loader


def main():
    import jax

    parser = build_parser()
    args, _ = parser.parse_known_args()
    jax.config.update("jax_default_prng_impl", args.prng_impl)

    dataset_util = DATASET_UTILS[args.dataset]()
    dataset_util.add_args(parser)
    args, _ = parser.parse_known_args()

    trainer = get_trainer_and_parser(args, parser)
    model_cls = get_model_and_parser(args, parser)
    args = parser.parse_args()
    # loaders ship explicit ELL plans for models that consume the ELL
    # reducers every layer (PNA — exactly the need_deg() discriminator)
    args._model_need_deg = bool(model_cls.need_deg())

    # Three mutually-composable-or-exclusive parallel modes:
    #   shard_map DP (--dp_shards alone): stacked per-shard batches, sync-BN
    #   GSPMD dp×tp[×sp] (--tp_shards/--sp): one logical batch, sharded
    #     weights/activations, BN statistics globally exact by construction
    #   hybrid node-sharded (--hybrid_shards): halo-exchange GNN
    args.use_gspmd = args.tp_shards > 1 or args.sp
    if args.sp and args.tp_shards <= 1:
        raise SystemExit("--sp shards the node axis over the 'model' mesh "
                         "axis; it requires --tp_shards > 1")
    if args.use_gspmd and args.hybrid_shards > 1:
        raise SystemExit("--tp_shards/--sp and --hybrid_shards are exclusive")
    args.sp_axis = "model" if args.sp else None
    if args.multihost:
        if args.use_gspmd or args.hybrid_shards > 1:
            raise SystemExit("--multihost currently composes with shard_map "
                             "DP only (--dp_shards)")
        # must run before the backend initializes (first device access)
        from graphtrans_tpu.parallel.multihost import initialize, is_primary

        initialize(args)
        if args.dp_shards % jax.process_count() != 0:
            raise SystemExit(f"--dp_shards {args.dp_shards} must divide "
                             f"evenly over {jax.process_count()} processes")
        if not is_primary():
            # one process owns logging/checkpoints/metrics; the others train
            logger.remove()
    args.bn_axis_name = "data" if ((args.dp_shards > 1 and not args.use_gspmd)
                                   or args.hybrid_shards > 1
                                   or args.multihost) else None
    # after jax.distributed.initialize (backend probing inits the runtime)
    from graphtrans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args.graph_reduce_axis = "data" if args.hybrid_shards > 1 else None
    # GSPMD consumes ONE logical batch (jit shards it over 'data'); only the
    # shard_map DP path wants loader-side stacked shard batches
    args.loader_shards = 1 if args.use_gspmd else args.dp_shards
    args.use_dense_layout = resolve_dense_layout(args)
    if args.hybrid_shards > 1:
        if args.dp_shards > 1:
            raise SystemExit("--hybrid_shards and --dp_shards are exclusive")
        ok = (args.model_type == "gnn-transformer" and args.gnn_type in ("gin", "gcn")) \
            or args.model_type == "pna-transformer"
        if not ok:
            raise SystemExit("--hybrid_shards currently supports "
                             "gnn-transformer (gin|gcn) and pna-transformer")
    if args.use_pallas:
        from graphtrans_tpu.ops import scatter

        scatter.enable_pallas(True)
    if args.attn_backend != "auto":
        from graphtrans_tpu.nn.transformer import set_attn_backend

        set_attn_backend(args.attn_backend)

    run_name = f"{args.dataset}+{model_cls.name(args)}"
    run_name += f"+{trainer.name(args)}+lr={args.lr}+wd={args.weight_decay}"
    if args.scheduler is not None:
        run_name += f"+sch={args.scheduler}"
    if args.seed:
        run_name += f"+seed{args.seed}"
    if args.wandb_run_idx is not None:
        run_name = args.wandb_run_idx + "_" + run_name

    now = datetime.now().strftime("%m_%d-%H_%M_%S")
    args.save_path = f"exps/{run_name}-{now}"
    if args.resume is not None:
        args.save_path = args.resume
    os.makedirs(args.save_path, exist_ok=True)
    logger.info(f"run: {run_name}")
    logger.info(f"save path: {args.save_path}")
    logger.info(f"devices: {jax.devices()}")

    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    sink = None
    if getattr(args, "wandb", False):
        from graphtrans_tpu.utils.logging import WandbSink

        sink = WandbSink(args.wandb_project, run_name, config=vars(args))
    metrics_log = MetricsLogger(os.path.join(args.save_path, "metrics.jsonl"),
                                run_name, sink=sink)

    bundle = dataset_util.preprocess(args, model_cls, seed=args.seed)
    calc_loss = dataset_util.loss_fn(bundle.task_type)

    # trainer data transform (None for baseline/flag). Reference semantics:
    # the transform applies to the train/test dataset copy but NOT the valid
    # copy, and degree histograms come from the untransformed data
    # (/root/reference/main.py:126-131 two-dataset trick) — preprocess() has
    # already computed `deg` by the time we transform here.
    data_transform = trainer.transform(args)
    if data_transform is not None:
        for split in ("train", "test"):
            bundle.splits[split] = [data_transform(g) for g in bundle.splits[split]]

    mh_pc = jax.process_count() if args.multihost else 1
    mh_pi = jax.process_index() if args.multihost else 0
    loaders = make_loaders(bundle, args, num_shards=args.loader_shards,
                           process_count=mh_pc, process_index=mh_pi)

    def run(run_id):
        nonlocal bundle, loaders
        if getattr(dataset_util, "resplit_per_run", False) and run_id > 0:
            bundle = dataset_util.preprocess(args, model_cls, seed=(args.seed or 0) + run_id)
            loaders = make_loaders(bundle, args, num_shards=args.loader_shards,
                                   process_count=mh_pc, process_index=mh_pi)
        train_loader, train_eval, valid_loader, test_loader = loaders

        node_encoder = bundle.node_encoder_cls()
        model = model_cls.build(bundle.num_tasks, args, node_encoder,
                                bundle.edge_encoder_cls, deg=bundle.deg)

        sample = next(iter(GraphLoader(
            bundle.splits["train"][: args.batch_size], args.batch_size,
            num_tasks=bundle.num_tasks, max_seq_len=bundle.max_seq_len,
            y_dtype=bundle.y_dtype,
            max_input_len=int(getattr(args, "max_input_len", 1000)),
            with_dense_adj=getattr(args, "num_encoder_layers_masked", 0) > 0,
            fixed_caps=(train_loader.node_cap, train_loader.edge_cap),
        )))
        seed = (args.seed or 0) * 1000 + run_id
        init_rng = jax.random.key(seed)
        # initialize through an axis-free twin: collective axis names are
        # unbound outside shard_map (param structure is identical)
        init_model = model
        if args.bn_axis_name or getattr(args, "graph_reduce_axis", None):
            import copy

            ia = copy.copy(args)
            ia.bn_axis_name = None
            ia.graph_reduce_axis = None
            init_model = model_cls.build(bundle.num_tasks, ia, node_encoder,
                                         bundle.edge_encoder_cls, deg=bundle.deg)
        # jit the init: eager init dispatches thousands of tiny ops
        # (painfully slow through a networked device)
        variables = jax.jit(lambda r, b: init_model.init(r, b, None, False))(
            {"params": jax.random.fold_in(init_rng, 0),
             "dropout": jax.random.fold_in(init_rng, 1)},
            sample,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if getattr(args, "pretrained_gnn", None):
            params = ckpt.load_pretrained_gnn(params, args.pretrained_gnn,
                                              model_cls.gnn_subtree)
            logger.info(f"loaded pretrained GNN from {args.pretrained_gnn}")

        mesh = None
        if args.use_gspmd:
            from graphtrans_tpu.parallel import gspmd
            from graphtrans_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(dp=args.dp_shards, tp=args.tp_shards)
            params = gspmd.shard_params(params, mesh)

        steps_per_epoch = max(len(train_loader), 1)
        tx, uses_plateau = build_optimizer(args, steps_per_epoch)
        state = TrainState.create(params, batch_stats, tx.init(params))
        plateau = PlateauScheduler(args.lr) if uses_plateau else None

        logger.info(f"Model parameters: {count_params(params)}")

        if args.hybrid_shards > 1:
            import copy

            from graphtrans_tpu.parallel.hybrid import make_hybrid_train_step

            step_fn = make_hybrid_train_step(model, calc_loss, tx,
                                             args.hybrid_shards,
                                             model_cls.gnn_subtree)
            # eval: plain batches through an unsharded twin (same params)
            eval_args = copy.copy(args)
            eval_args.bn_axis_name = None
            eval_args.graph_reduce_axis = None
            eval_model = model_cls.build(bundle.num_tasks, eval_args,
                                         node_encoder, bundle.edge_encoder_cls,
                                         deg=bundle.deg)
            fwd = jax.jit(lambda params, batch_stats, batch: eval_model.apply(
                {"params": params, "batch_stats": batch_stats},
                plan_expand.expand_inline(batch), None, False))
        elif args.use_gspmd:
            from graphtrans_tpu.parallel import gspmd

            step_inner = gspmd.make_gspmd_train_step(
                trainer, model, calc_loss, tx, args, model_cls.gnn_subtree,
                mesh)

            def step_fn(state, batch, rng):
                return step_inner(state, gspmd.place_batch(batch, mesh), rng)

            fwd = gspmd.make_gspmd_eval_fn(model, mesh)
        elif args.multihost:
            import copy

            from graphtrans_tpu.parallel import multihost

            step_fn = multihost.make_mh_dp_train_step(
                trainer, model, calc_loss, tx, args, model_cls.gnn_subtree,
                args.dp_shards)
            # eval runs LOCALLY per process on a host copy of the replicated
            # params (identical metrics everywhere, no collectives to keep in
            # lockstep); the eval twin unbinds the sync-BN axis name
            eval_args = copy.copy(args)
            eval_args.bn_axis_name = None
            eval_model = model_cls.build(bundle.num_tasks, eval_args,
                                         node_encoder, bundle.edge_encoder_cls,
                                         deg=bundle.deg)
            eval_jit = jax.jit(lambda p, bs, b: eval_model.apply(
                {"params": p, "batch_stats": bs},
                plan_expand.expand_inline(b), None, False))
            host_cache = {}

            def fwd(params, batch_stats, batch):
                if host_cache.get("ref") is not params:
                    host_cache["ref"] = params
                    host_cache["host"] = (multihost.host_copy(params),
                                          multihost.host_copy(batch_stats))
                hp_, hbs_ = host_cache["host"]
                return eval_jit(hp_, hbs_, batch)
        elif args.dp_shards > 1:
            from graphtrans_tpu.parallel.dp import make_dp_train_step, make_dp_eval_fn

            step_fn = make_dp_train_step(trainer, model, calc_loss, tx, args,
                                         model_cls.gnn_subtree, args.dp_shards)
            fwd = make_dp_eval_fn(model, args.dp_shards)
        else:
            step_fn = trainer.make_train_step(model, calc_loss, tx, args,
                                              gnn_subtree=model_cls.gnn_subtree)
            fwd = jax.jit(lambda params, batch_stats, batch: model.apply(
                {"params": params, "batch_stats": batch_stats},
                plan_expand.expand_inline(batch), None, False))

        # multi-host: one process owns checkpoint writes (all processes
        # compute identical replicated state; non-primary writes would race
        # on a shared filesystem)
        if args.multihost:
            from graphtrans_tpu.parallel.multihost import is_primary

            save_ckpt = (ckpt.save_checkpoint if is_primary()
                         else lambda *a, **k: None)
        else:
            save_ckpt = ckpt.save_checkpoint

        run_dir = os.path.join(args.save_path, str(run_id))
        os.makedirs(run_dir, exist_ok=True)
        last_path = os.path.join(run_dir, "last_model.ckpt")
        best_path = os.path.join(run_dir, "best_model.ckpt")

        start_epoch = 1
        blob = ckpt.load_checkpoint(last_path)
        if blob is not None:
            state = ckpt.restore_state(state, blob)
            start_epoch = blob["epoch"] + 1
            if plateau and "plateau" in blob["extra"]:
                plateau.load_state_dict(blob["extra"]["plateau"])
                state = state.replace(opt_state=set_lr(state.opt_state, plateau.lr))
            logger.info(f"[Resume] {last_path} epoch: {start_epoch}")

        def maybe_freeze(state, epoch):
            fz = getattr(args, "freeze_gnn", None)
            if fz is not None and epoch >= fz and not bool(state.freeze_gnn_active):
                logger.info(f"Freeze GNN weight after epoch: {epoch}")
                import jax.numpy as jnp

                state = state.replace(freeze_gnn_active=jnp.ones((), bool))
            return state

        class PrefetchedLoader:
            """Iterates a GraphLoader with device prefetch (overlap H2D with
            eval compute); passes attribute access through (CodeUtil reads
            loader.graphs for gold sequences)."""

            def __init__(self, inner):
                self._inner = inner

            def __iter__(self):
                from graphtrans_tpu.data.prefetch import device_prefetch

                return device_prefetch(iter(self._inner), size=2)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        def run_eval(loader):
            def forward(batch):
                return fwd(state.params, state.batch_stats, batch)

            return dataset_util.eval(forward, PrefetchedLoader(loader))

        state = maybe_freeze(state, start_epoch - 1)
        best_val, final_test = 0.0, 0.0
        rng = jax.random.key(seed + 17)

        # failure tolerance beyond the reference's eval-gated saves
        # (main.py:249-252 only checkpoints on eval epochs): a SIGTERM (e.g.
        # preemption) checkpoints before exiting, and --checkpoint_every_epoch
        # tightens recovery granularity to one epoch.
        import signal

        term_requested = {"flag": False}

        def _on_term(signum, frame):
            if term_requested["flag"]:
                # second SIGTERM: hard-exit now (the graceful path waits for
                # the epoch boundary, which may never come mid-compile).
                # os._exit: raising through interrupted native XLA frames
                # segfaults; skip interpreter teardown entirely.
                os._exit(143)
            term_requested["flag"] = True

        old_handler = signal.signal(signal.SIGTERM, _on_term)

        watch_prev = None
        for epoch in range(start_epoch, args.epochs + 1):
            t_ep = time.perf_counter()
            stats: dict = {}
            prof_ctx = None
            if args.profile_dir and epoch == start_epoch + 1:
                from jax import profiler as _jprof

                prof_ctx = _jprof.trace(args.profile_dir)
                prof_ctx.__enter__()
            state, loss = trainer.train(step_fn, state, train_loader, rng,
                                        stats=stats,
                                        prefetch=0 if args.multihost else 2,
                                        skip_degenerate=not args.multihost)
            if prof_ctx is not None:
                prof_ctx.__exit__(None, None, None)
                logger.info(f"profiler trace written to {args.profile_dir}")
            state = maybe_freeze(state, epoch)
            lr_now = read_lr(state.opt_state)
            dt_ep = time.perf_counter() - t_ep
            eps = stats.get("edges", 0) / max(dt_ep, 1e-9)
            epoch_metrics = {"epoch": epoch,
                             f"train/loss-runs{run_id}": loss,
                             "train/lr": lr_now, "epoch_seconds": dt_ep,
                             "train/edges_per_s": eps,
                             "train/graphs_per_s": stats.get("graphs", 0) / max(dt_ep, 1e-9)}
            if getattr(args, "wandb", False):
                # wandb.watch(model) equivalent (reference main.py:176):
                # per-subtree param + epoch-update norms
                from graphtrans_tpu.utils.logging import watch_norms

                epoch_metrics.update(watch_norms(
                    state.params, prev_params=watch_prev))
                watch_prev = state.params
            metrics_log.log(epoch_metrics)
            from graphtrans_tpu.utils.logging import count_trainable_params

            trainable = count_trainable_params(
                state.params, bool(state.freeze_gnn_active), model_cls.gnn_subtree)
            logger.info(f"Epoch {epoch} loss {loss:.4f} lr {lr_now:.2e} "
                        f"({dt_ep:.1f}s, {eps/1e6:.2f}M edges/s, "
                        f"trainable {trainable})")

            if args.checkpoint_every_epoch or term_requested["flag"]:
                extra = {"plateau": plateau.state_dict()} if plateau else {}
                save_ckpt(last_path, state, epoch, extra,
                                     backend=args.ckpt_backend)
                if term_requested["flag"]:
                    ckpt.wait_for_async()
                    logger.warning("SIGTERM received — checkpointed, exiting")
                    signal.signal(signal.SIGTERM, old_handler)
                    raise SystemExit(143)

            valid_perf = None
            if plateau is not None:
                valid_perf = run_eval(valid_loader)
                new_lr = plateau.step(valid_perf[bundle.eval_metric])
                state = state.replace(opt_state=set_lr(state.opt_state, new_lr))

            if (epoch > args.start_eval and epoch % args.test_freq == 0) or epoch in (1, args.epochs):
                train_perf = run_eval(train_eval)
                if valid_perf is None:
                    valid_perf = run_eval(valid_loader)
                test_perf = run_eval(test_loader)
                tm, vm, sm = (train_perf[bundle.eval_metric],
                              valid_perf[bundle.eval_metric],
                              test_perf[bundle.eval_metric])
                metrics_log.log({
                    "epoch": epoch,
                    f"train/{bundle.eval_metric}-runs{run_id}": tm,
                    f"valid/{bundle.eval_metric}-runs{run_id}": vm,
                    f"test/{bundle.eval_metric}-runs{run_id}": sm,
                })
                logger.info(f"Run {run_id} - train: {tm:.4f}, val: {vm:.4f}, test: {sm:.4f}")
                extra = {"plateau": plateau.state_dict()} if plateau else {}
                save_ckpt(last_path, state, epoch, extra,
                                     backend=args.ckpt_backend)
                if best_val < vm:
                    best_val, final_test = vm, sm
                    metrics_log.set_summary(f"best/valid/{bundle.eval_metric}-runs{run_id}", vm)
                    metrics_log.set_summary(f"best/test/{bundle.eval_metric}-runs{run_id}", sm)
                    save_ckpt(best_path, state, epoch, extra,
                                         backend=args.ckpt_backend)

        signal.signal(signal.SIGTERM, old_handler)
        ckpt.wait_for_async()
        blob = ckpt.load_checkpoint(best_path)
        if blob is not None:
            state = ckpt.restore_state(state, blob)
        best_valid_perf = run_eval(valid_loader)
        best_test_perf = run_eval(test_loader)
        return (best_valid_perf[bundle.eval_metric],
                best_test_perf[bundle.eval_metric])

    vals, tests = [], []
    for run_id in range(args.runs):
        v, t = run(run_id)
        vals.append(v)
        tests.append(t)
        logger.info(f"Run {run_id} - val: {v}, test: {t}")
    logger.info(f"Average val: {np.mean(vals)} ± {np.std(vals)}")
    logger.info(f"Average test: {np.mean(tests)} ± {np.std(tests)}")
    metrics_log.set_summary("avg/valid", float(np.mean(vals)))
    metrics_log.set_summary("avg/test", float(np.mean(tests)))
    if sink is not None:
        sink.finish()
    return np.mean(vals), np.mean(tests)


if __name__ == "__main__":
    main()
