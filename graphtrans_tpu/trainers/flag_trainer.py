"""FLAG adversarial-augmentation trainer.

Reference semantics (/root/reference/trainers/flag_trainer.py:19-56): start
from perturb ~ U(-step_size, step_size) over (num_nodes, gnn_emb_dim); run m
forward/backwards of loss/m; after each of the first m-1,
perturb += step_size * sign(d loss/d perturb); torch's backward() ACCUMULATES
parameter gradients across all m passes, so the applied gradient is
sum_k grad(loss_k / m). BatchNorm running stats update on every pass. Here
the whole m-step inner loop is a lax.scan inside the single jitted step.

Deviation (documented): the reference's FlagTrainer.train signature is missing
the scheduler argument and raises TypeError whenever a scheduler is configured
(flag_trainer.py:20 vs main.py:216); our per-step schedule lives in the optax
chain so FLAG + cosine/onecycle works.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..train.state import TrainState
from . import register_trainer
from .base_trainer import BaseTrainer, apply_update, make_param_cast


@register_trainer("flag")
class FlagTrainer(BaseTrainer):
    name_str = "flag"

    @staticmethod
    def add_args(parser):
        parser.add_argument("--step-size", type=float, default=8e-3, dest="step_size")
        parser.add_argument("-m", "--m", type=int, dest="m", default=3)

    @staticmethod
    def name(args):
        return "flag"

    @staticmethod
    def make_grad_fn(model, calc_loss: Callable, args) -> Callable:
        step_size = args.step_size
        m_steps = args.m
        emb_dim = args.gnn_emb_dim
        cast = make_param_cast(args)

        want_ell = ("PNA" in type(model).__name__
                    or getattr(args, "gnn_type", "") == "pna")

        def grad_fn(state: TrainState, batch, rng, perturb0=None):
            # expand compressed plans once — OUTSIDE the m-step ascent scan
            from ..ops.plan_expand import expand_inline

            batch = expand_inline(batch, want_ell=want_ell)
            rng = jax.random.fold_in(rng, state.step)
            pk, dk = jax.random.split(rng)
            n_nodes = batch.node_mask.shape[0]
            if perturb0 is not None:
                # caller-supplied initial noise (cross-framework parity
                # harness, tools/train_parity.py) — the ascent itself is
                # unchanged
                perturb = perturb0
            else:
                perturb = jax.random.uniform(
                    pk, (n_nodes, emb_dim), jnp.float32, -step_size, step_size
                )

            def loss_fn(params, perturb, batch_stats, drop_rng):
                out, mut = model.apply(
                    {"params": cast(params), "batch_stats": batch_stats},
                    batch, perturb, True,
                    rngs={"dropout": drop_rng},
                    mutable=["batch_stats"],
                )
                return calc_loss(out, batch, m_steps), mut["batch_stats"]

            vg = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

            def body(carry, k):
                perturb, acc, bs = carry
                (loss, new_bs), (gp, gperturb) = vg(
                    state.params, perturb, bs, jax.random.fold_in(dk, k)
                )
                acc = jax.tree_util.tree_map(jnp.add, acc, gp)
                perturb = perturb + step_size * jnp.sign(gperturb)
                return (perturb, acc, new_bs), loss

            (_, grads, new_bs), losses = jax.lax.scan(
                body, (perturb, zero_grads, state.batch_stats), jnp.arange(m_steps)
            )
            return grads, new_bs, losses[-1]

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
