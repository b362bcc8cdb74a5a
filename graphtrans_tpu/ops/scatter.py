"""Fused gather -> message -> scatter for message passing.

This is the single hot op of the GNN stage — the role torch-scatter/cuSPARSE
play in the reference (/root/reference/modules/conv.py via
MessagePassing.propagate). The XLA path below formulates it as gather +
masked segment-sum over dst-sorted edges, which XLA compiles to a sorted
scatter-add. `use_pallas` routes to the Pallas CSR kernel
(ops/pallas/spmm.py) when enabled and available.
"""

from __future__ import annotations

import contextlib
import threading

import jax.numpy as jnp

from . import segment

_PALLAS_ENABLED = False
_HALO = threading.local()


@contextlib.contextmanager
def halo_context(send_idx, axis_name: str, halo_cap: int):
    """Trace-time routing for node-sharded execution (parallel/hybrid.py):
    inside this context, gather_message_scatter first extends the LOCAL node
    table with the halo rows fetched from peer chips via all_to_all, so edge
    source indices may address [local rows | halo slots]."""
    _HALO.ctx = (send_idx, axis_name, halo_cap)
    try:
        yield
    finally:
        _HALO.ctx = None


def _halo_extend(x):
    ctx = getattr(_HALO, "ctx", None)
    if ctx is None:
        return x
    import jax

    send_idx, axis_name, H = ctx
    D = send_idx.shape[0]
    send = x[send_idx]  # [D, H, d]
    halo = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    return jnp.concatenate([x, halo.reshape(D * H, x.shape[-1])])


def maybe_halo_extend(x):
    """Public entry for modules that gather source rows themselves (PNA):
    extends the local node table with halo rows when running under a
    halo_context, identity otherwise."""
    return _halo_extend(x)


def enable_pallas(flag: bool = True):
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = flag


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED


def gather_message_scatter(
    x,
    edge_emb,
    edge_src,
    edge_dst,
    edge_mask,
    num_nodes: int,
    message: str = "relu_add",
    edge_weight=None,
):
    """sum_{e: dst(e)=i} w_e * msg(x[src(e)], edge_emb[e]).

    message:
      - "relu_add": relu(x_j + e)   (GIN/GCN message, conv.py:32-35,67-68)
      - "add":      x_j + e
      - "copy":     x_j
    """
    if _PALLAS_ENABLED:
        from .pallas import spmm

        out = spmm.gather_message_scatter(
            x, edge_emb, edge_src, edge_dst, edge_mask, num_nodes,
            message=message, edge_weight=edge_weight,
        )
        if out is not None:
            return out
    x_ext = _halo_extend(x)
    xj = x_ext[edge_src]
    if message == "relu_add":
        m = jnp.maximum(xj + edge_emb, 0)
    elif message == "add":
        m = xj + edge_emb
    elif message == "copy":
        m = xj
    else:
        raise ValueError(message)
    if edge_weight is not None:
        m = m * edge_weight[:, None].astype(m.dtype)
    return segment.segment_sum(m, edge_dst, num_nodes, mask=edge_mask)
