"""Pallas kernel parity tests (interpreter mode on the CPU mesh; the same
kernels run compiled on TPU via --use_pallas)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graphtrans_tpu.ops import scatter
from graphtrans_tpu.ops.pallas import spmm


def make_edges(rng, N, E, d):
    x = rng.standard_normal((N, d)).astype(np.float32)
    emb = rng.standard_normal((E, d)).astype(np.float32)
    src = rng.integers(0, N, size=E).astype(np.int32)
    dst = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    mask = rng.random(E) > 0.2
    # emulate collation: padded edges live at the tail pointing at N-1
    dst[~mask] = N - 1
    order = np.argsort(dst, kind="stable")
    return (jnp.asarray(x), jnp.asarray(emb[order]), jnp.asarray(src[order]),
            jnp.asarray(dst[order]), jnp.asarray(mask[order]))


@pytest.mark.parametrize("message", ["relu_add", "add"])
@pytest.mark.parametrize("weighted", [False, True])
def test_spmm_kernel_matches_xla(rng, message, weighted):
    N, E, d = 512, 1024, 128
    x, emb, src, dst, mask = make_edges(rng, N, E, d)
    ew = jnp.asarray(rng.standard_normal(E).astype(np.float32)) if weighted else None
    ref = scatter.gather_message_scatter(x, emb, src, dst, mask, N,
                                         message=message, edge_weight=ew)
    got = spmm.gather_message_scatter(x, emb, src, dst, mask, N,
                                      message=message, edge_weight=ew,
                                      interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_spmm_kernel_fallback_on_bad_shapes(rng):
    # misaligned d -> kernel declines, caller falls back
    x, emb, src, dst, mask = make_edges(rng, 512, 1024, 100)
    assert spmm.gather_message_scatter(x, emb, src, dst, mask, 512,
                                       interpret=True) is None


def test_spmm_empty_blocks(rng):
    """Node blocks with zero incident edges must produce zero rows."""
    N, E, d = 512, 256, 128
    x = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    emb = jnp.zeros((E, d), jnp.float32)
    # all edges into node 3 (block 0); blocks 1 have no edges
    src = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    dst = jnp.full((E,), 3, jnp.int32)
    mask = jnp.ones((E,), bool)
    got = spmm.gather_message_scatter(x, emb, src, dst, mask, N, interpret=True)
    ref = scatter.gather_message_scatter(x, emb, src, dst, mask, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert np.all(np.asarray(got)[256:] == 0)


def test_scatter_mxu_kernel_matches_xla(rng):
    from graphtrans_tpu.ops import segment
    from graphtrans_tpu.ops.pallas import scatter_mxu

    N, E, d = 512, 1024, 128
    msg = jnp.asarray(rng.standard_normal((E, d)).astype(np.float32))
    dst = jnp.asarray(np.sort(rng.integers(0, N, size=E)).astype(np.int32))
    got = scatter_mxu.segment_sum_mxu(msg, dst, N, interpret=True)
    assert got is not None
    ref = segment.segment_sum(msg, dst, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
