"""Pre-flight range validation: check a model + input batch against the
protocol's magnitude bound BEFORE proving.

The zkReLU decomposition (models/zkrelu.py, reference zkrelu.cu:18-27) is
exact only while every pre-activation magnitude stays inside
(-2^(Q+R-1), 2^(Q+R-1)) — 2^47 at the reference widths. A model whose
weights are scaled too aggressively (per-layer gain > 1 compounds
exponentially with depth) silently violates the bound; the prover still
emits an internally-consistent proof, and the VERIFIER rejects it at the
recombination identity ("recombination identity failed at v_a"). Run this
script to locate the offending layers first.

Usage:
    python scripts/check_model_range.py                # zkdl256 bench config
    python scripts/check_model_range.py model.pt in.pt # a TorchScript pair

Exit code 0 when every layer is in range, 1 otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    from zkdl_tpu.field import fr
    from zkdl_tpu.models import mlp, quantize, zkrelu
    from zkdl_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    if len(sys.argv) >= 3:
        from zkdl_tpu.io import pt_loader

        weights = pt_loader.load_model(sys.argv[1])
        X_np = pt_loader.load_tensor(sys.argv[2])
    else:
        dims = [784, 1000, 1773, 1773, 1773, 1773, 1773, 1124, 1000]
        rng = np.random.default_rng(0)
        weights = [
            rng.uniform(-1.0, 1.0, (dims[i], dims[i + 1])).astype(np.float32)
            / np.sqrt(dims[i]).astype(np.float32)
            for i in range(len(dims) - 1)
        ]
        X_np = rng.standard_normal((256, dims[0])).astype(np.float32)

    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(X_np))
    Y_hat, Z_list, _, _ = model.infer(X)
    jax.block_until_ready(Y_hat)

    bound_bits = zkrelu.Q + zkrelu.R - 1
    bound = 1 << bound_bits
    P = fr.P_INT
    bad = 0
    for i, Z in enumerate(list(Z_list) + [Y_hat]):
        ints = fr.to_ints(np.asarray(fr.unmont(Z)))
        mags = [min(v, P - v) for v in ints]
        mx = max(mags)
        over = sum(1 for m in mags if m >= bound)
        tag = "OK" if over == 0 else "OUT OF RANGE"
        print(
            f"layer {i}: max |z| = 2^{mx.bit_length() - 1}"
            f" (bound 2^{bound_bits}), over-bound elements = {over}  [{tag}]"
        )
        bad += over
    if bad:
        print(
            f"\n{bad} elements exceed the 2^{bound_bits} bound: proofs of this "
            "model will be REJECTED at the recombination identity. Rescale the "
            "weights (per-layer gain <= 1; torch's default Linear init is safe) "
            "or raise the widths via zkdl_tpu.config (quant Q/R)."
        )
        return 1
    print("\nall layers within the protocol magnitude bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
