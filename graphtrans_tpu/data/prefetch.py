"""Threaded device prefetch: overlap host collation + H2D transfer of the
next batches with the current training step (the role of the reference's
DataLoader worker pool + pin_memory, /root/reference/main.py:149-152, rebuilt
for JAX: batches are jax.device_put ahead of consumption on a worker thread
while XLA executes the current step)."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import jax

_SENTINEL = object()


def device_prefetch(iterable: Iterable, size: int = 2, device=None) -> Iterator:
    """Yields device-resident batches, keeping up to `size` in flight.

    Compressed scatter-free plans are deliberately NOT expanded here:
    running the expansion as a separate prefetch-stage jit measured
    ~430 ms/batch of per-call RPC overhead through this environment's
    network tunnel (the expanded batch returns ~30 device buffers). The
    trainers/eval forwards expand INSIDE their jitted step instead
    (ops/plan_expand.expand_inline — once per step, ~4 ms device time)."""
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(jax.device_put(item, device))
        except BaseException as e:  # surface loader errors on the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
