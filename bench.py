"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: prover seconds per data point (the reference's benchmark unit,
/root/reference/demo.cu:140). Baseline: 0.1 s/point for the 18M-param
batch-256 zkDL-256 config on a V100 (BASELINE.md). vs_baseline is
baseline_seconds / our_seconds (>1 means faster than the reference).

The benchmark config is chosen by BENCH_CONFIG env:
  zkdl256 — 8-layer 18M-param model, batch 256 (the HEADLINE benchmark;
            default). Reference: <0.1 s/pt claimed, 0.03 s/pt on the
            benchmark figure (BASELINE.md).
  zkdl1   — same 18M model, batch 1 (reference benchmark.png: 7.21 s).
  micro   — 2-layer 64-wide MLP, batch 4 (fast smoke).
  mid     — 4-layer, batch 32.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    config = os.environ.get("BENCH_CONFIG", "zkdl256")
    import jax

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import mlp, quantize

    ZKDL_DIMS = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]
    rng = np.random.default_rng(0)
    if config == "zkdl256":
        dims, batch = ZKDL_DIMS, 256
        baseline_spp = 0.1  # README.md:30 claim (figure point: 0.03)
    elif config == "zkdl1":
        dims, batch = ZKDL_DIMS, 1
        baseline_spp = 7.21  # reference images/benchmark.png, batch-1 point
    elif config == "mid":
        dims, batch = [128, 256, 256, 128], 32
        baseline_spp = 0.1  # scaled proxy; recorded for trend tracking only
    else:
        dims, batch = [64, 64, 64], 4
        baseline_spp = 0.1  # proxy

    t0 = time.perf_counter()
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.3).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    jax.block_until_ready(model.layers[-1].com.points.x)
    log(f"model built ({model.n_params} params): {time.perf_counter() - t0:.1f}s")
    X_np = rng.standard_normal((batch, dims[0])).astype(np.float32)
    X = fr.mont(quantize.load_input(X_np))

    # warmup (compile)
    t0 = time.perf_counter()
    proof, spp = mlp.prove_timed(model, X, batch)
    log(f"warmup (compile) done: {time.perf_counter() - t0:.1f}s, spp={spp:.4f}")
    # timed run
    proof, spp = mlp.prove_timed(model, X, batch)
    log(f"steady-state spp={spp:.4f}")

    print(json.dumps({
        "metric": f"prover_seconds_per_data_point[{config}]",
        "value": spp,
        "unit": "s/point",
        "vs_baseline": baseline_spp / spp if spp > 0 else None,
    }))


if __name__ == "__main__":
    main()
