import jax.numpy as jnp
import numpy as np

from graphtrans_tpu.ops import segment


def test_segment_sum_masked():
    data = jnp.array([[1.0], [2.0], [3.0], [100.0]])
    ids = jnp.array([0, 0, 1, 1])
    mask = jnp.array([True, True, True, False])
    out = segment.segment_sum(data, ids, 3, mask=mask)
    np.testing.assert_allclose(np.asarray(out), [[3.0], [3.0], [0.0]])


def test_segment_mean_min_max_std_vs_numpy(rng):
    n, k = 200, 7
    data = rng.standard_normal((n, 4)).astype(np.float32)
    ids = rng.integers(0, k, size=n).astype(np.int32)
    mask = rng.random(n) > 0.3
    res = segment.segment_multi_aggregate(
        jnp.asarray(data), jnp.asarray(ids), k, mask=jnp.asarray(mask)
    )
    for agg in ["mean", "max", "min"]:
        got = np.asarray(res[agg])
        for s in range(k):
            sel = data[(ids == s) & mask]
            if len(sel) == 0:
                np.testing.assert_allclose(got[s], 0.0)
            else:
                expect = {"mean": sel.mean(0), "max": sel.max(0), "min": sel.min(0)}[agg]
                np.testing.assert_allclose(got[s], expect, rtol=1e-5, atol=1e-5)
    # std follows the reference formula sqrt(relu(E[x^2]-E[x]^2)+1e-5)
    got_std = np.asarray(res["std"])
    for s in range(k):
        sel = data[(ids == s) & mask]
        if len(sel):
            var = np.maximum((sel**2).mean(0) - sel.mean(0) ** 2, 0)
            np.testing.assert_allclose(got_std[s], np.sqrt(var + 1e-5), rtol=1e-4, atol=1e-5)


def test_segment_softmax(rng):
    n, k = 50, 4
    logits = rng.standard_normal(n).astype(np.float32)
    ids = rng.integers(0, k, size=n).astype(np.int32)
    mask = rng.random(n) > 0.2
    out = np.asarray(
        segment.segment_softmax(jnp.asarray(logits), jnp.asarray(ids), k, mask=jnp.asarray(mask))
    )
    for s in range(k):
        sel = (ids == s) & mask
        if sel.sum():
            np.testing.assert_allclose(out[sel].sum(), 1.0, rtol=1e-5)
            e = np.exp(logits[sel] - logits[sel].max())
            np.testing.assert_allclose(out[sel], e / e.sum(), rtol=1e-4, atol=1e-6)
    assert np.all(out[~mask] == 0)


def test_degrees():
    # edges: 0->1, 0->1, 2->1, 1->0, plus one padding edge
    src = jnp.array([0, 0, 2, 1, 3])
    dst = jnp.array([1, 1, 1, 0, 3])
    em = jnp.array([True, True, True, True, False])
    np.testing.assert_allclose(np.asarray(segment.out_degree(src, 4, em)), [2, 1, 1, 0])
    np.testing.assert_allclose(np.asarray(segment.in_degree(dst, 4, em)), [1, 3, 0, 0])


def test_segment_max_min_empty_segments_grads():
    """Regression: jax.ops.segment_max returns -inf for EMPTY segments (not
    the mask sentinel); the fill replacement must catch both or backward
    passes NaN (inf * 0)."""
    import jax

    data = jnp.array([[1.0], [2.0]])
    ids = jnp.array([0, 0])
    mask = jnp.array([True, True])

    for fn in (segment.segment_max, segment.segment_min):
        out = fn(data, ids, 4, mask=mask)  # segments 1..3 are empty
        assert np.all(np.isfinite(np.asarray(out)))
        g = jax.grad(lambda d: jnp.sum(fn(d, ids, 4, mask=mask) ** 2))(data)
        assert np.all(np.isfinite(np.asarray(g)))
