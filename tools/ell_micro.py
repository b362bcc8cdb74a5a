"""Micro-benchmark the PNA ELL min/max path at code2 scale (VERDICT r2 #4).

Slope-timed (chained through the value, one jit, scalar out) on the real
chip. Measures the production ell_minmax fwd and fwd+bwd plus its raw
components (gather, K-axis reduce) so the optimization target is grounded
before touching the kernel. Usage: python tools/ell_micro.py [N] [C] [K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")


def slope_ms(fn_k, x, k_lo=4, k_hi=16, reps=4):
    fns = {k: jax.jit(fn_k(k)) for k in (k_lo, k_hi)}
    for f in fns.values():
        float(f(x))
    best = {}
    for k, f in fns.items():
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        best[k] = min(ts)
    return (best[k_hi] - best[k_lo]) / (k_hi - k_lo) * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 81920
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 272
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from graphtrans_tpu.ops.block_plan import build_ell_plan
    from graphtrans_tpu.ops import ell

    rng = np.random.default_rng(0)
    # synthetic edge list with max in/out degree <= K (drop extras)
    E = N * (K // 2)
    src = rng.integers(0, N, E).astype(np.int64)
    dst = rng.integers(0, N, E).astype(np.int64)
    emask = np.ones(E, bool)
    # cap degrees at K by dropping excess edges (keep it representative)
    for arr in (dst, src):
        order = np.argsort(arr, kind="stable")
        sa = arr[order]
        rank = np.arange(E) - np.searchsorted(sa, sa)
        emask[order[rank >= K]] = False
    pd, _ = build_ell_plan(dst, src, emask, N, k=K)
    ps, _ = build_ell_plan(src, dst, emask, N, k=K)
    assert pd is not None and ps is not None
    pd = jax.device_put(jax.tree_util.tree_map(jnp.asarray, pd))
    ps = jax.device_put(jax.tree_util.tree_map(jnp.asarray, ps))

    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def chain(make_step):
        def fn_k(k):
            def f(x):
                for i in range(k):
                    x = make_step(x)
                return x[0, 0].astype(jnp.float32)
            return f
        return fn_k

    # raw components
    other = pd["other_g"]
    mask = pd["mask"].reshape(N, K)

    def raw_gather(x):
        g = jnp.take(x, other, axis=0).reshape(N, K, C)
        return g.sum(1).astype(x.dtype) * jnp.bfloat16(1e-3) + x

    def raw_maxred(x):
        g = jnp.take(x, other, axis=0).reshape(N, K, C)
        m = mask[..., None]
        mx = jnp.max(jnp.where(m, g, -jnp.inf), axis=1)
        mx = jnp.where(jnp.isfinite(mx), mx, 0)
        return mx.astype(x.dtype) * jnp.bfloat16(1e-3) + x

    def fwd_only(x):
        mx, mn = ell.ell_minmax(x, pd, ps, K, K)
        return (mx + mn).astype(x.dtype) * jnp.bfloat16(1e-3) + x

    def fwd_bwd(x):
        g = jax.grad(lambda v: jnp.sum(
            jnp.stack(ell.ell_minmax(v, pd, ps, K, K)).astype(jnp.float32)
            ** 2) / N)(x)
        return x + g.astype(x.dtype) * jnp.bfloat16(0.01)

    for name, step in (("raw row-gather+sum", raw_gather),
                       ("raw gather+masked max", raw_maxred),
                       ("ell_minmax fwd", fwd_only),
                       ("ell_minmax fwd+bwd", fwd_bwd)):
        ms = slope_ms(chain(step), x)
        print(f"{name:26s} {ms:8.3f} ms   [N={N},K={K},C={C}] bf16")


if __name__ == "__main__":
    main()
