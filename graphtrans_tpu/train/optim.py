"""Optimizer + LR schedules.

AdamW with optional global-norm clipping (reference: optim.AdamW +
clip_grad_norm_, /root/reference/main.py:178, base_trainer.py:34-35).
Schedules as in /root/reference/main.py:179-196:
  - cosine: CosineAnnealingLR over epochs*steps_per_epoch, eta_min=0
  - onecycle: OneCycleLR(max_lr, pct_start; torch defaults div_factor=25,
    final_div_factor=1e4, cosine anneal)
  - plateau: ReduceLROnPlateau(mode='min', factor=0.5, patience=20,
    min_lr=1e-4) — host-side, stepping on the VALID metric exactly as the
    reference does (quirk: mode='min' on a quality metric; reproduced).
Per-step schedules live inside the optax chain; plateau mutates the injected
learning_rate hyperparameter between epochs without recompilation.
"""

from __future__ import annotations

import optax


def build_optimizer(args, steps_per_epoch: int):
    """Returns (tx, uses_plateau). tx is an optax GradientTransformation whose
    learning_rate hyperparam is injectable (for plateau / inspection)."""
    sched = getattr(args, "scheduler", None)
    if sched == "cosine":
        lr = optax.cosine_decay_schedule(
            init_value=args.lr, decay_steps=max(args.epochs * steps_per_epoch, 1), alpha=0.0
        )
    elif sched == "onecycle":
        lr = optax.cosine_onecycle_schedule(
            transition_steps=max(args.epochs * steps_per_epoch, 1),
            peak_value=args.max_lr,
            pct_start=args.pct_start,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    elif sched in (None, "plateau", "none"):
        lr = args.lr
    else:
        raise NotImplementedError(f"scheduler {sched}")

    adamw = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=args.weight_decay,
    )
    if getattr(args, "grad_clip", None):
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), adamw)
    else:
        tx = adamw
    return tx, sched == "plateau"


def get_lr_state(opt_state):
    """Locate the inject_hyperparams state inside a possibly-chained tx."""
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        for s in opt_state:
            if hasattr(s, "hyperparams"):
                return s
        raise ValueError("no injectable hyperparams found")
    return opt_state


def read_lr(opt_state) -> float:
    return float(get_lr_state(opt_state).hyperparams["learning_rate"])


def set_lr(opt_state, new_lr: float):
    """Functionally set the injected learning rate (plateau scheduler)."""
    import jax.numpy as jnp

    def rewrite(s):
        hp = dict(s.hyperparams)
        hp["learning_rate"] = jnp.asarray(new_lr, jnp.float32)
        return s._replace(hyperparams=hp)

    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        return tuple(rewrite(s) if hasattr(s, "hyperparams") else s for s in opt_state)
    return rewrite(opt_state)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau with torch semantics (threshold rel 1e-4)."""

    def __init__(self, init_lr, mode="min", factor=0.5, patience=20, min_lr=1e-4):
        self.lr = init_lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.num_bad = 0

    def is_better(self, metric):
        if self.best is None:
            return True
        if self.mode == "min":
            return metric < self.best * (1 - 1e-4)
        return metric > self.best * (1 + 1e-4)

    def step(self, metric) -> float:
        if self.is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr

    def state_dict(self):
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d):
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]
