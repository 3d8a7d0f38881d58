"""Microbenchmark commitment/opening throughput (BASELINE.json: MSM pts/s).

Usage: python scripts/microbench_commit.py [gen_size] [m_rows]
Writes one JSON line per metric; `python scripts/record_microbench.py` collects
everything into MICROBENCH.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import dataclasses

    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if dataclasses.is_dataclass(leaf):
            _sync({f.name: getattr(leaf, f.name) for f in dataclasses.fields(leaf)})
        elif leaf is not None:
            np.asarray(leaf.ravel()[:1])


def bench(label, fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    gen_size = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 12
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 10
    import jax

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from zkdl_tpu.commit import pedersen
    from zkdl_tpu.curve import g1
    from zkdl_tpu.field import fr
    from zkdl_tpu.tensor import fr_ops

    n = gen_size * m
    gens = pedersen.setup(jax.random.PRNGKey(0), gen_size)
    t = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(1), n))
    _sync((gens.points.x, t))

    results = {"backend": jax.default_backend(), "gen_size": gen_size, "m_rows": m, "n": n}

    dt = bench("commit_fast", lambda: pedersen.commit(gens, t))
    results["commit_fast_pts_per_s"] = n / dt
    results["commit_fast_s"] = dt

    com = pedersen.commit(gens, t)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(2), fr_ops.ceil_log2(n)))
    dt = bench("open_planar", lambda: pedersen.open_planar(gens, t, com, u))
    results["open_planar_pts_per_s"] = n / dt
    results["open_planar_s"] = dt

    # raw fixed-base comb exponentiation throughput (G^x per second)
    scalars = fr_ops.random_fr(jax.random.PRNGKey(3), m)
    dt = bench("generator_pow", lambda: g1.generator_pow_jit(scalars))
    results["generator_pow_per_s"] = m / dt

    # reference-algorithm double-and-add for comparison (per-element G1 mul)
    dt = bench("scalar_mul_256", lambda: g1.scalar_mul_jit(g1.generator((m,)), scalars))
    results["scalar_mul_256_per_s"] = m / dt

    print(json.dumps(results))


if __name__ == "__main__":
    main()
