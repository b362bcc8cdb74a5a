"""Multi-HOST (multi-process / DCN) execution path.

The reference is single-process, single-GPU (/root/reference/run.sh:3-6);
SURVEY §2.8 and BASELINE.md name N>=2 hosts as the scaling axis this
framework must own. TPU-native design — every process runs the SAME program:

  - `jax.distributed.initialize` bootstraps the cross-process runtime
    (TPU pods: ICI within a slice + DCN across hosts; the CPU test harness:
    Gloo over TCP — tests/test_multihost.py runs real 2-process training).
  - The loader builds the SAME deterministic global batch plan on every
    process (seeded shuffle + size-only chunk planning) and collates ONLY its
    own slice of each global group (GraphLoader(process_count, process_index)
    — true per-process data sharding, no duplicated collation).
  - The train step is the shard_map DP body from parallel/dp.py over the
    GLOBAL mesh; per-process local batches are assembled into global arrays
    with jax.make_array_from_process_local_data, gradients/losses reduce with
    the same count-weighted psums, sync-BN statistics psum over the global
    'data' axis. Shard->device assignment may be permuted vs the
    single-process run, but the DP math is permutation-invariant over shards,
    so an N-process step equals the 1-process N-shard step up to float
    reassociation (asserted step-by-step in tests/test_multihost.py).
  - The optimizer update is replicated; params/opt-state live as
    fully-replicated global arrays (numpy inputs auto-commit as replicated —
    every process computes the identical init from the shared seed).

Collective-safety invariant: every process MUST dispatch the same programs in
the same order. The loader guarantees a common step count (global plan +
empty-shard padding and globally-degenerate-group dropping); evaluation and
checkpointing run on host copies (`host_copy`) so no process diverges.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from .dp import make_dp_body
from .mesh import make_mesh

_INITIALIZED = False


def initialize(args=None) -> None:
    """Bootstrap the multi-process runtime. With explicit flags
    (--coordinator_address/--num_processes/--process_id) any cluster works
    (the CPU test harness uses localhost TCP); with none, TPU pod metadata
    auto-discovery applies. Must run before the backend initializes."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    kw = {}
    coord = getattr(args, "coordinator_address", None) if args else None
    if coord:
        kw = dict(coordinator_address=coord,
                  num_processes=args.num_processes,
                  process_id=args.process_id)
    jax.distributed.initialize(**kw)
    _INITIALIZED = True


def is_primary() -> bool:
    """True on the process that owns side effects (checkpoints, metrics)."""
    return jax.process_index() == 0


def host_copy(tree):
    """Pull a fully-REPLICATED global pytree to host numpy (legal because
    every process holds a complete copy); used for local evaluation and
    checkpointing without cross-process resharding."""
    return jax.tree_util.tree_map(
        lambda x: x if x is None else np.asarray(x), tree)


def global_batch(batch, mesh, local_shards: int):
    """Assemble per-process stacked sub-batches [L, ...] into global arrays
    [D, ...] sharded over 'data' (D = L * process_count). Every leaf of a
    stacked GraphBatch carries the leading shard axis by construction."""
    def conv(x):
        if x is None:
            return None
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == local_shards:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:  # replicated leaf: identical on every process by construction
            spec = P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(conv, batch)


def make_mh_dp_train_step(trainer, model, calc_loss, tx, args,
                          gnn_subtree: str, n_shards: int,
                          donate: bool = True) -> Callable:
    """Data-parallel train step over the global (multi-process) mesh.
    Identical math to parallel/dp.make_dp_train_step; inputs are assembled
    from process-local loader shards, and the PRNG key travels as raw key
    data (typed keys cannot be device_put across processes)."""
    from jax.experimental.shard_map import shard_map

    if n_shards % jax.process_count() != 0:
        raise ValueError(f"--dp_shards {n_shards} must divide evenly over "
                         f"{jax.process_count()} processes")
    mesh = make_mesh(dp=n_shards)
    local_shards = n_shards // jax.process_count()
    body = make_dp_body(trainer, model, calc_loss, tx, args, gnn_subtree)

    def body_kd(state, sharded_batch, rng_data):
        return body(state, sharded_batch, jax.random.wrap_key_data(rng_data))

    sharded = shard_map(
        body_kd, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, batch, rng):
        gb = global_batch(batch, mesh, local_shards)
        rng_data = np.asarray(jax.random.key_data(rng))
        return jitted(state, gb, rng_data)

    return step
