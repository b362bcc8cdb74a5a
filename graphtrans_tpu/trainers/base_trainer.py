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

from ..train.state import TrainState, zero_subtree_where


def apply_update(state: TrainState, grads, new_bs, loss, tx, gnn_subtree: str):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    updates = zero_subtree_where(state.freeze_gnn_active, updates, gnn_subtree)
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
        """Returns fn(state, batch, rng) -> (grads, new_batch_stats, loss)."""

        def grad_fn(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
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
              log_fn: Optional[Callable] = None):
        losses = []
        for i, batch in enumerate(loader):
            if int(batch.node_mask.sum()) <= 1 or int(batch.graph_mask.sum()) <= 1:
                continue
            state, loss = step_fn(state, batch, rng)
            losses.append(loss)
            if log_fn is not None and i % log_every == 0:
                log_fn(i, float(loss))
        mean_loss = float(np.mean([float(l) for l in losses])) if losses else 0.0
        return state, mean_loss
