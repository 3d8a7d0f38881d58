"""End-to-end demo CLI, mirroring the reference demo (/root/reference/demo.cu:99-143).

Usage: python -m zkdl_tpu.demo traced_model.pt sample_input.pt [--out demo.out]

Loads a TorchScript MLP, quantizes and commits the weights, runs quantized
inference, writes the raw field output to demo.out (hex limb dump like the
reference's FrTensor operator<<), then times the backwards proving loop and
prints seconds per data point. Additionally verifies the proof (the reference
cannot)."""

from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

from .field import fr
from .io import pt_loader
from .models import mlp, quantize


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model")
    parser.add_argument("input")
    parser.add_argument("--out", default="demo.out")
    parser.add_argument("--verify", action="store_true")
    parser.add_argument("--commit-aux", action="store_true",
                        help="committed-aux soundness tier (NUMS witness "
                             "commitments + revealed-fold openings)")
    parser.add_argument("--interleave", action="store_true",
                        help="round-interleaved Fiat-Shamir (textbook sumcheck "
                             "FS order; one host round-trip per round)")
    args = parser.parse_args(argv)

    from .utils.runtime import enable_compile_cache

    enable_compile_cache()

    weights = pt_loader.load_mlp_weights(args.model)
    n_params = sum(w.size for w in weights)
    print(f"Total number of parameters: {n_params}")

    t0 = time.perf_counter()
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    print(f"Commit/setup time: {time.perf_counter() - t0:.2f}s")

    x_np = pt_loader.load_tensor(args.input)
    batch = x_np.shape[0]
    X = fr.mont(quantize.load_input(x_np))

    t0 = time.perf_counter()
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    jax.block_until_ready(Y_hat)
    print(f"Inference time: {time.perf_counter() - t0:.2f}s")

    with open(args.out, "w") as f:
        vals = np.asarray(fr.unmont(Y_hat))
        for row in vals:
            f.write("".join(f"{int(v):08x}" for v in reversed(row)) + "\n")

    t0 = time.perf_counter()
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list,
                        commit_aux=args.commit_aux or None,
                        interleave=args.interleave)
    proof.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"Proof time: {dt / batch} seconds per data point.")

    if args.verify:
        from .sumcheck.transcript import FiatShamir

        t0 = time.perf_counter()
        # chained verify with public anchors (claim chain walked from the
        # public output Y_hat down to the public input X) + full Fiat-Shamir
        # transcript replay (every challenge re-derived and compared)
        ok, msg = model.verify(proof, X=X, Y_hat=Y_hat, transcript=FiatShamir(),
                               interleaved=args.interleave)
        print(f"Verification: {'OK' if ok else 'FAILED: ' + msg} ({time.perf_counter() - t0:.2f}s)")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
