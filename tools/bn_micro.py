"""Measure MaskedBatchNorm against the HBM-pass floor at flagship shapes.

VERDICT r2 'what's weak' #2: the flagship step carries a ~33 ms bandwidth
tail whose largest class is BN/LN stats+apply; this tool answers — with
slope timing (never single dispatches on this tunneled backend) — whether a
fused Pallas masked-BN could beat what XLA already emits.

Method: chain k ops through the value inside ONE jit, force a scalar out,
slope between two k's. The floor unit is a measured read+write "copy pass"
at the same shape/dtype. A train-mode masked-BN forward fundamentally needs
  read x (stats) + read x + write y  = 1.5 copy-passes
and its backward
  read dy+x (reductions) + read dy+x + write dx = 2.5 copy-passes
so fwd+bwd at the floor = ~4 copy-passes. If XLA's measured cost is near
that, a hand kernel has no room and the tail is closed as a negative result.

Usage: python tools/bn_micro.py [N] [C]
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


def slope_ms(make_fn, x, k_lo=8, k_hi=48, reps=5):
    """Wall-clock slope between k_lo and k_hi chained applications."""
    f_lo, f_hi = jax.jit(make_fn(k_lo)), jax.jit(make_fn(k_hi))
    for f in (f_lo, f_hi):
        float(f(x))  # compile + one run
    out = []
    for f, k in ((f_lo, k_lo), (f_hi, k_hi)):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        out.append(min(ts))
    return (out[1] - out[0]) / (k_hi - k_lo) * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 131104
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from graphtrans_tpu.nn.norm import MaskedBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mask = jnp.asarray(rng.random(N) < 0.82)  # dense-layout valid fraction
    bn = MaskedBatchNorm(C)
    variables = bn.init(jax.random.key(0), x, mask, False)
    params, stats = variables["params"], variables["batch_stats"]

    # 1 copy pass = read + write at this shape/dtype. The per-iteration
    # scale is DATA-DEPENDENT (x[1,1]*eps) so XLA cannot fold the chain into
    # one multiply.
    def mk_copy(k):
        def f(x):
            for i in range(k):
                c = x[1, 1] * jnp.bfloat16(1e-8) + jnp.bfloat16(1.0 + 1e-3)
                x = x * c
            return x[0, 0].astype(jnp.float32)
        return f

    # masked reduction only (read x once per iteration; the accumulator
    # feeds back so iterations cannot CSE)
    def mk_red(k):
        m = mask.astype(jnp.float32)[:, None]

        def f(x):
            acc = jnp.zeros((C,), jnp.float32)
            for i in range(k):
                acc = acc + jnp.sum(
                    (x.astype(jnp.float32) + acc[0] * 1e-20) * m, 0)
            return acc[0]
        return f

    def bn_apply(x):
        y, _ = bn.apply({"params": params, "batch_stats": stats}, x, mask,
                        False, mutable=["batch_stats"])
        return y

    def mk_fwd(k):
        def f(x):
            for i in range(k):
                x = bn_apply(x) + x * jnp.bfloat16(1e-3)  # keep scale sane
            return x[0, 0].astype(jnp.float32)
        return f

    def mk_fwdbwd(k):
        def loss(x):
            return jnp.sum(bn_apply(x).astype(jnp.float32) ** 2) / N

        def f(x):
            for i in range(k):
                g = jax.grad(loss)(x)
                x = x + g.astype(x.dtype) * jnp.bfloat16(0.01)
            return x[0, 0].astype(jnp.float32)
        return f

    copy_ms = slope_ms(mk_copy, x)
    red_ms = slope_ms(mk_red, x)
    fwd_ms = slope_ms(mk_fwd, x)
    fb_ms = slope_ms(mk_fwdbwd, x)
    gbps = (N * C * 2 * 2) / (copy_ms / 1e3) / 1e9
    print(f"shape [{N},{C}] bf16   copy-pass {copy_ms:.3f} ms "
          f"(~{gbps:.0f} GB/s)   masked-reduce {red_ms:.3f} ms")
    print(f"BN fwd {fwd_ms:.3f} ms = {fwd_ms / copy_ms:.2f} copy-passes "
          f"(floor ~1.5)")
    print(f"BN fwd+bwd {fb_ms:.3f} ms = {fb_ms / copy_ms:.2f} copy-passes "
          f"(floor ~4)")


if __name__ == "__main__":
    main()
