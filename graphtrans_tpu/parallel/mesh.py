"""Device mesh construction for SPMD scale-out.

The reference is single-process, single-GPU (/root/reference/run.sh:3-6;
SURVEY.md §2.8) — parallelism here is new, TPU-native capability: a
`jax.sharding.Mesh` over the slice's chips with named axes
  data  — graph-batch sharding (gradient all-reduce over ICI)
  model — reserved for tensor-parallel transformer shards (later rounds)
All collectives are XLA collectives (psum/all-gather) riding ICI; there is no
NCCL/MPI equivalent to manage.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))
