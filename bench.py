"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: prover seconds per data point (the reference's benchmark unit,
/root/reference/demo.cu:140). Baseline: 0.1 s/point for the 18M-param
batch-256 zkDL-256 config on a V100 (BASELINE.md). vs_baseline is
baseline_seconds / our_seconds (>1 means faster than the reference).

The benchmark config is chosen by BENCH_CONFIG env:
  micro   — 2-layer 64-wide MLP, batch 4 (fast smoke; default until the full
            model path is optimized)
  zkdl256 — 8-layer 18M-param model, batch 256 (the headline benchmark)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    config = os.environ.get("BENCH_CONFIG", "micro")
    import jax

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import mlp, quantize

    rng = np.random.default_rng(0)
    if config == "zkdl256":
        dims = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]
        batch = 256
        baseline_spp = 0.1
    elif config == "mid":
        dims = [128, 256, 256, 128]
        batch = 32
        baseline_spp = 0.1  # scaled proxy; recorded for trend tracking only
    else:
        dims = [64, 64, 64]
        batch = 4
        baseline_spp = 0.1  # proxy

    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.3).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X_np = rng.standard_normal((batch, dims[0])).astype(np.float32)
    X = fr.mont(quantize.load_input(X_np))

    # warmup (compile)
    proof, spp = mlp.prove_timed(model, X, batch)
    # timed run
    proof, spp = mlp.prove_timed(model, X, batch)

    print(json.dumps({
        "metric": f"prover_seconds_per_data_point[{config}]",
        "value": spp,
        "unit": "s/point",
        "vs_baseline": baseline_spp / spp if spp > 0 else None,
    }))


if __name__ == "__main__":
    main()
