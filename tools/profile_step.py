"""Capture a jax.profiler trace of a bench train step on TPU.

Builds the same state/step/batch as bench.py (bf16+rbg by default),
warms the compile, then traces a few chained steps. Feed the resulting
directory to tools/profile_summary.py.

Usage: python tools/profile_step.py [outdir] [steps] [workload]
       workload: mol (default) | code2 | code2_pna
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gt_profile"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    workload = sys.argv[3] if len(sys.argv) > 3 else "mol"

    from graphtrans_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # match bench.py's production config — forgetting rbg costs ~17 ms of
    # threefry mask generation and poisons the profile attribution
    jax.config.update("jax_default_prng_impl", "rbg")

    import bench

    if workload in ("code2", "code2_pna"):
        state, step, batch = bench.build_code2(
            batch_size=512, precision="bf16",
            model="pna-transformer" if workload == "code2_pna"
            else "gnn-transformer")
    else:
        state, step, batch = bench.build(batch_size=4096, precision="bf16")
    batch = jax.device_put(batch)
    rng = jax.random.key(7)

    # warm compile + execution
    s = state
    for _ in range(3):
        s, loss = step(s, batch, rng)
    float(loss)

    with jax.profiler.trace(outdir):
        s2, loss = state, None
        for _ in range(nsteps):
            s2, loss = step(s2, batch, rng)
        print("loss", float(loss))
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
