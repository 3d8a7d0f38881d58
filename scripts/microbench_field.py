"""Microbenchmark Fr primitive throughput on the current JAX platform.

Usage: python scripts/microbench_field.py [n]
Times a CHAIN of k dependent ops inside one jit (dispatch amortized, no
dead-code elimination possible) and reports per-op throughput. These are the
speed-of-light numbers BASELINE.json asks us to record (Fr muls/s per chip).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAIN = int(os.environ.get("MB_CHAIN", "8"))
ONLY = os.environ.get("MB_ONLY", "")


def _sync(out):
    """True device sync: block_until_ready is unreliable over the axon tunnel —
    force a host readback of a tiny slice of every output leaf."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[:1])


def bench(label, fn, *args, iters=10, per_call=CHAIN, n=0):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters / per_call
    print(f"{label:24s}: {dt*1e3:8.3f} ms/op  {n/dt/1e6:9.1f} M elems/s", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    import jax
    import jax.numpy as jnp

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    print(f"backend={jax.default_backend()} n={n} chain={CHAIN}", flush=True)

    from zkdl_tpu.field import fr
    from zkdl_tpu.tensor import fr_ops

    key = jax.random.PRNGKey(0)
    a = fr.mont(fr_ops.random_fr(key, n))
    b = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(1), n))
    jax.block_until_ready((a, b))

    @jax.jit
    def mul_chain(a, b):
        for _ in range(CHAIN):
            a = fr.mul(a, b)
        return a

    @jax.jit
    def add_chain(a, b):
        for _ in range(CHAIN):
            a = fr.add(a, b)
        return a

    if ONLY != "planar":
        bench("fr.mul chain (n,8)", mul_chain, a, b, n=n)
        bench("fr.add chain (n,8)", add_chain, a, b, n=n)

    # planar variants if available
    try:
        from zkdl_tpu.field import planar

        ap = planar.to_planar(a)
        bp = planar.to_planar(b)
        jax.block_until_ready((ap, bp))

        @jax.jit
        def mul_chain_p(a, b):
            for _ in range(CHAIN):
                a = planar.mul(a, b)
            return a

        @jax.jit
        def add_chain_p(a, b):
            for _ in range(CHAIN):
                a = planar.add(a, b)
            return a

        bench("planar.mul chain (8,n)", mul_chain_p, ap, bp, n=n)
        bench("planar.add chain (8,n)", add_chain_p, ap, bp, n=n)

        @jax.jit
        def dot_p(a, b):
            return planar.dot(a, b)

        bench("planar.dot (8,n)", dot_p, ap, bp, per_call=1, n=n)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
