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


def test_fused_dense_agg_matches_xla_dense(rng):
    """ops/pallas/dense_agg (interpret mode): bit-identical to the XLA
    one-hot formulation for fwd and all grads, with and without relu /
    per-edge weights."""
    import jax
    import jax.numpy as jnp
    from jax.lax import Precision

    from graphtrans_tpu.ops.pallas.dense_agg import GT, fused_dense_agg

    G, Sm, Em, d = GT * 2, 24, 40, 128
    xd = jnp.asarray(rng.standard_normal((G, Sm, d)).astype(np.float32))
    src = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, Sm, (G, Em)).astype(np.int32))
    emask = jnp.asarray(rng.random((G, Em)) > 0.2)
    emb = jnp.asarray(rng.standard_normal((G, Em, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((G, Em)).astype(np.float32))

    def ref(xd, emb, wa, relu):
        iota = jnp.arange(Sm)
        oh_s = ((src[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        oh_d = ((dst[..., None] == iota) & emask[..., None]).astype(jnp.float32)
        xs = jax.lax.dot_general(oh_s, xd, (((2,), (1,)), ((0,), (0,))),
                                 precision=Precision.HIGHEST)
        m = jnp.maximum(xs + emb, 0) if relu else xs + emb
        if wa is not None:
            m = m * wa[..., None]
        m = jnp.where(emask[..., None], m, 0)
        return jax.lax.dot_general(oh_d, m, (((1,), (1,)), ((0,), (0,))),
                                   precision=Precision.HIGHEST)

    for relu in (True, False):
        for wa in (None, w):
            o_ref = ref(xd, emb, wa, relu)
            o = fused_dense_agg(xd, src, dst, emask, emb, wa, relu, True)
            np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                       rtol=1e-6, atol=1e-6)
            argn = (0, 1) + ((2,) if wa is not None else ())
            a = (xd, emb) + ((w,) if wa is not None else ())
            gr = jax.grad(lambda x, e, *rest: jnp.sum(
                ref(x, e, rest[0] if rest else None, relu) ** 2),
                argnums=argn)(*a)
            gf = jax.grad(lambda x, e, *rest: jnp.sum(fused_dense_agg(
                x, src, dst, emask, e, rest[0] if rest else None, relu,
                True) ** 2), argnums=argn)(*a)
            for ga, gb in zip(gr, gf):
                np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                           rtol=1e-6, atol=1e-6)
