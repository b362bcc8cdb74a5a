"""Baseline trainer: one fully-jitted train step (forward -> loss -> grad ->
clip -> AdamW -> schedule), and the host-side epoch loop.

Mirrors /root/reference/trainers/base_trainer.py:7-51: degenerate batches
(<=1 valid node or <=1 valid graph) are skipped for BatchNorm safety; per-step
scheduler stepping is implicit in the optax chain. The whole step is one XLA
program — no per-step host sync except the scalar loss fetch for logging.

Trainers expose `make_grad_fn` (the trainer-specific gradient computation) so
the same body serves the single-chip jit path and the shard_map data-parallel
path (parallel/dp.py), which inserts psums between grad and update.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
import optax

from ..train.state import TrainState, keep_subtree_where, zero_subtree_where


def make_param_cast(args):
    """Identity for f32; bf16 down-cast of float params for --precision bf16."""
    import jax.numpy as jnp

    if getattr(args, "precision", "f32") != "bf16":
        return lambda p: p

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    return cast


def apply_update(state: TrainState, grads, new_bs, loss, tx, gnn_subtree: str):
    # freeze-GNN = torch requires_grad=False: the frozen subtree gets no
    # update AND its Adam moments stay exactly where they were (grads are
    # zeroed BEFORE tx.update, residual weight-decay updates zeroed after,
    # and the subtree's optimizer state is pinned to its previous value).
    grads = zero_subtree_where(state.freeze_gnn_active, grads, gnn_subtree)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    updates = zero_subtree_where(state.freeze_gnn_active, updates, gnn_subtree)
    new_opt = keep_subtree_where(state.freeze_gnn_active, new_opt,
                                 state.opt_state, gnn_subtree)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt,
    ), loss


class BaseTrainer:
    name_str = "baseline"

    @staticmethod
    def transform(args):
        return None

    @staticmethod
    def add_args(parser):
        pass

    @staticmethod
    def name(args):
        return "baseline"

    @staticmethod
    def make_grad_fn(model, calc_loss: Callable, args) -> Callable:
        """Returns fn(state, batch, rng) -> (grads, new_batch_stats, loss).

        Mixed precision (--precision bf16): master params stay f32; the
        forward runs on a bf16 copy (MXU native dtype on TPU), autodiff
        through the cast yields f32 gradients; losses and BN statistics
        compute in f32."""
        cast = make_param_cast(args)

        # ELL plans only feed PNA's min/max reducers — skip their [N*K]
        # row gathers for every other model
        want_ell = ("PNA" in type(model).__name__
                    or getattr(args, "gnn_type", "") == "pna")

        def grad_fn(state: TrainState, batch, rng):
            # expand compressed scatter-free plans ONCE per step (in-jit;
            # per-layer lazy derivation is not CSE'd by XLA — measured)
            from ..ops.plan_expand import expand_inline

            batch = expand_inline(batch, want_ell=want_ell)
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": cast(params), "batch_stats": state.batch_stats},
                    batch, None, True,
                    rngs={"dropout": rng},
                    mutable=["batch_stats"],
                )
                return calc_loss(out, batch), mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return grads, new_bs, loss

        return grad_fn

    @classmethod
    def make_train_step(cls, model, calc_loss: Callable, tx, args,
                        gnn_subtree: str = "gnn_node",
                        donate: bool = True) -> Callable:
        grad_fn = cls.make_grad_fn(model, calc_loss, args)

        def train_step(state: TrainState, batch, rng):
            grads, new_bs, loss = grad_fn(state, batch, rng)
            return apply_update(state, grads, new_bs, loss, tx, gnn_subtree)

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # ---- host epoch loop ----
    @classmethod
    def train(cls, step_fn, state, loader, rng, log_every: int = 50,
              log_fn: Optional[Callable] = None, stats: Optional[dict] = None,
              prefetch: int = 2, skip_degenerate: bool = True):
        """One epoch. The degenerate-batch check and throughput counters run
        on the HOST numpy batch; a worker thread then device_puts upcoming
        batches (`prefetch` in flight) so H2D transfer overlaps the current
        step, and the loss stays an on-device scalar until the epoch mean —
        steps dispatch asynchronously.

        skip_degenerate=False is the multi-host mode: a LOCAL check could
        skip a step on one process but not another and deadlock the
        collectives; there the loader already drops globally-degenerate
        batch groups (GraphLoader._local_plans) and sync-BN makes locally
        empty shards safe."""
        from ..data.prefetch import device_prefetch

        def host_side():
            for i, batch in enumerate(loader):
                n_nodes = int(np.asarray(batch.node_mask).sum())
                n_graphs = int(np.asarray(batch.graph_mask).sum())
                if skip_degenerate and (n_nodes <= 1 or n_graphs <= 1):
                    continue
                if stats is not None:
                    stats["edges"] = stats.get("edges", 0) + int(np.asarray(batch.edge_mask).sum())
                    stats["nodes"] = stats.get("nodes", 0) + n_nodes
                    stats["graphs"] = stats.get("graphs", 0) + n_graphs
                    stats["steps"] = stats.get("steps", 0) + 1
                yield batch

        losses = []
        it = device_prefetch(host_side(), size=prefetch) if prefetch else host_side()
        for i, batch in enumerate(it):
            state, loss = step_fn(state, batch, rng)
            losses.append(loss)
            if log_fn is not None and i % log_every == 0:
                log_fn(i, float(loss))
        mean_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        return state, mean_loss
