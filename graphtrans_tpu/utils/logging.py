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


class Throughput:
    """edges/s / nodes/s / graphs/s counters for the BASELINE metric."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.edges = 0
        self.nodes = 0
        self.graphs = 0
        self.t0 = time.perf_counter()

    def add(self, batch):
        import numpy as np

        self.edges += int(np.asarray(batch.edge_mask).sum())
        self.nodes += int(np.asarray(batch.node_mask).sum())
        self.graphs += int(np.asarray(batch.graph_mask).sum())

    def rates(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "edges_per_s": self.edges / dt,
            "nodes_per_s": self.nodes / dt,
            "graphs_per_s": self.graphs / dt,
            "seconds": dt,
        }
