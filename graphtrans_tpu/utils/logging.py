"""Console + metrics logging (loguru/wandb-equivalent surface,
/root/reference/main.py observability: run naming, per-iter loss, per-epoch
loss/lr, per-split metrics, best summaries, parameter counts, plus throughput
counters the reference never had)."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class Logger:
    def __init__(self, name: str = "graphtrans_tpu", logfile: Optional[str] = None):
        self.name = name
        self.logfile = logfile
        if logfile:
            os.makedirs(os.path.dirname(logfile), exist_ok=True)

    def remove(self):
        """Silence this logger (multi-host non-primary processes)."""
        self._silenced = True

    def _emit(self, level, msg):
        if getattr(self, "_silenced", False):
            return
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        line = f"{ts} | {level:<7} | {msg}"
        print(line, file=sys.stderr, flush=True)
        if self.logfile:
            with open(self.logfile, "a") as f:
                f.write(line + "\n")

    def info(self, msg, *a):
        self._emit("INFO", str(msg).format(*a) if a else msg)

    def debug(self, msg, *a):
        self._emit("DEBUG", str(msg).format(*a) if a else msg)

    def warning(self, msg, *a):
        self._emit("WARNING", str(msg).format(*a) if a else msg)


logger = Logger()


class WandbSink:
    """Optional wandb adapter reproducing the reference's exact surface
    (/root/reference/main.py:24,107,115,219,238-245: init(project), run
    name, config.update(args), per-iter/per-epoch log dicts, best-metric
    summaries). Degrades to a warning no-op when wandb is not importable
    or init fails (this image is zero-egress and ships no wandb)."""

    def __init__(self, project: str, run_name: str, config: Optional[dict] = None):
        self._run = None
        try:
            import wandb  # noqa: F401 — optional dependency
        except ImportError:
            logger.warning("--wandb requested but the wandb package is not "
                           "installed; metrics go to metrics.jsonl only")
            return
        try:
            self._run = wandb.init(project=project)
            self._run.name = run_name
            if config:
                self._run.config.update(config, allow_val_change=True)
        except Exception as e:  # offline/unauthenticated hosts
            logger.warning(f"wandb.init failed ({e}); metrics go to "
                           "metrics.jsonl only")
            self._run = None

    def log(self, metrics: dict):
        if self._run is not None:
            self._run.log(metrics)

    def set_summary(self, key, value):
        if self._run is not None:
            self._run.summary[key] = value

    def finish(self):
        if self._run is not None:
            self._run.finish()
            self._run = None


class MetricsLogger:
    """Append-only JSONL metrics stream (the wandb.log equivalent), with an
    optional wandb mirror (`sink`) for hosts that have wandb installed."""

    def __init__(self, path: Optional[str] = None, run_name: str = "",
                 sink: Optional[WandbSink] = None):
        self.path = path
        self.run_name = run_name
        self.summary: dict = {}
        self.sink = sink
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def log(self, metrics: dict):
        rec = {"ts": time.time(), **metrics}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.sink is not None:
            self.sink.log(metrics)

    def set_summary(self, key, value):
        self.summary[key] = value
        if self.path:
            with open(self.path + ".summary", "w") as f:
                json.dump(self.summary, f, indent=2)
        if self.sink is not None:
            self.sink.set_summary(key, value)


def count_params(tree) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def watch_norms(params, prev_params=None, prefix="watch") -> dict:
    """wandb.watch(model) equivalent (/root/reference/main.py:176): per
    top-level-subtree parameter L2 norms, plus per-subtree UPDATE norms
    ||p_t - p_{t-1}|| when the previous epoch's params are supplied (the
    gradient-histogram signal, integrated over the epoch — per-step grads
    never leave the jitted step). Scalars only: one D2H per subtree."""
    import jax
    import jax.numpy as jnp

    def l2(tree):
        return float(jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree))))

    out = {}
    for key, sub in params.items():
        out[f"{prefix}/param_norm/{key}"] = l2(sub)
        if prev_params is not None and key in prev_params:
            delta = jax.tree_util.tree_map(
                lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
                sub, prev_params[key])
            out[f"{prefix}/update_norm/{key}"] = l2(delta)
    return out


def count_trainable_params(params, freeze_active: bool = False,
                           frozen_subtree: str = "gnn_node") -> int:
    """Total minus the frozen GNN subtree when --freeze_gnn is active
    (reference logs total and trainable each epoch, main.py:214-215)."""
    total = count_params(params)
    if freeze_active and frozen_subtree in params:
        total -= count_params(params[frozen_subtree])
    return total
