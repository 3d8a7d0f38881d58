"""Stage-level timing of the proving pipeline on the current JAX platform.

Usage: python scripts/profile_stages.py [micro|mid|zkdl256]
Prints wall time of: jax init, model setup (quantize+commit), inference,
prove (compile) and prove (steady-state), per proof phase.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def log(msg):
    print(f"[{time.time() - t0:8.2f}s] {msg}", flush=True)


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "micro"
    import jax

    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import mlp, quantize

    rng = np.random.default_rng(0)
    if config == "zkdl256":
        dims = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]
        batch = 256
    elif config == "mid":
        dims = [128, 256, 256, 128]
        batch = 32
    else:
        dims = [64, 64, 64]
        batch = 4

    # torch-default Linear init (see bench.py): keeps pre-activations inside
    # the protocol's 2^47 magnitude bound at every depth
    weights = [
        rng.uniform(-1.0, 1.0, (dims[i], dims[i + 1])).astype(np.float32)
        / np.sqrt(dims[i]).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    log("weights generated")
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    jax.block_until_ready(model.layers[-1].com.points.x)
    log("model setup (quantize + commit) done")

    X_np = rng.standard_normal((batch, dims[0])).astype(np.float32)
    X = fr.mont(quantize.load_input(X_np))
    jax.block_until_ready(X)
    log("input quantized")

    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    jax.block_until_ready(Y_hat)
    log("inference done (incl compile)")

    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    jax.block_until_ready(Y_hat)
    log("inference steady-state")

    t1 = time.time()
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list)
    proof.block_until_ready()
    log(f"prove #1 (incl compile): {time.time() - t1:.2f}s")

    t1 = time.time()
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list)
    proof.block_until_ready()
    dt = time.time() - t1
    log(f"prove #2 steady: {dt:.2f}s = {dt / batch * 1000:.1f} ms/point")


if __name__ == "__main__":
    main()
