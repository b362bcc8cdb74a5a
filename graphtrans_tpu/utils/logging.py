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

    def _emit(self, level, msg):
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


class MetricsLogger:
    """Append-only JSONL metrics stream (the wandb.log equivalent)."""

    def __init__(self, path: Optional[str] = None, run_name: str = ""):
        self.path = path
        self.run_name = run_name
        self.summary: dict = {}
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def log(self, metrics: dict):
        rec = {"ts": time.time(), **metrics}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def set_summary(self, key, value):
        self.summary[key] = value
        if self.path:
            with open(self.path + ".summary", "w") as f:
                json.dump(self.summary, f, indent=2)


def count_params(tree) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def count_trainable_params(params, freeze_active: bool = False,
                           frozen_subtree: str = "gnn_node") -> int:
    """Total minus the frozen GNN subtree when --freeze_gnn is active
    (reference logs total and trainable each epoch, main.py:214-215)."""
    total = count_params(params)
    if freeze_active and frozen_subtree in params:
        total -= count_params(params[frozen_subtree])
    return total
