"""Quantized MLP container: inference, backwards proving loop, full verification.

Rebuild of the reference driver (/root/reference/demo.cu):
- `infer`: fcnn_inference (demo.cu:23-38) — threads A_i = ReLU(Z_i),
  Z_i = A_{i-1} @ W_i, keeping all intermediates; final FC without ReLU.
- `prove`: the timed loop (demo.cu:124-138): output layer first, then backwards
  (relu_i, fc_i) per layer.
- `verify` is NEW (the reference emits-and-discards): checks every layer proof
  and the cross-layer chaining the reference leaves implicit.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..sumcheck.transcript import ChallengeSource, FiatShamir
from ..tensor import fr_ops
from . import zkfc, zkrelu

# Planar/pallas prover path (bit-reversed storage + lazy-reduction pallas
# kernels): identical proof streams, ~15x the field throughput on TPU. The
# (n, 8) path remains for cross-validation and as the tail/small-size engine.
USE_PLANAR_PROVER = True


@dataclasses.dataclass
class MLP:
    layers: list[zkfc.ZkFC]

    @classmethod
    def from_float_weights(cls, weights: Sequence[np.ndarray], key: jax.Array) -> "MLP":
        """weights: list of float (in, out) matrices (already transposed like
        load_model, demo.cu:72-78). Sizes must chain (demo.cu:88)."""
        layers = []
        keys = jax.random.split(key, len(weights))
        for i, w in enumerate(weights):
            layers.append(zkfc.ZkFC.from_float(w, keys[i]))
            if i > 0 and layers[i - 1].out_size != layers[i].in_size:
                raise ValueError("Incompatible layer sizes")
        return cls(layers)

    @property
    def n_params(self) -> int:
        return sum(l.weights.shape[0] for l in self.layers)

    def infer(self, X: jax.Array):
        """X: (batch*in, 8) Montgomery. Returns (Y_hat, Z_list, A_list, aux_list).

        Z_list[i] are pre-activations, A_list[i] post-activations
        (fcnn_inference, demo.cu:23-38). With the planar prover the aux
        witnesses are kept compact (one u32 per element per tensor instead of
        Montgomery bit tensors — the 18M-param model's aux would otherwise
        exceed HBM)."""
        Z_list, A_list, aux_list = [], [], []
        relu_fwd = zkrelu.forward_compact if USE_PLANAR_PROVER else zkrelu.forward
        A = X
        for i, layer in enumerate(self.layers[:-1]):
            Z = layer(A)
            A, aux = relu_fwd(Z)
            Z_list.append(Z)
            A_list.append(A)
            aux_list.append(aux)
        Y_hat = self.layers[-1](A)
        return Y_hat, Z_list, A_list, aux_list

    def prove(self, X, Y_hat, Z_list, A_list, aux_list, challenges: ChallengeSource | None = None):
        """Backwards proving loop (demo.cu:128-137). Returns MLPProof."""
        if challenges is None:
            challenges = FiatShamir()
        fc_prove = zkfc.prove_planar if USE_PLANAR_PROVER else zkfc.prove
        relu_prove = zkrelu.prove_planar if USE_PLANAR_PROVER else zkrelu.prove
        n = len(self.layers)
        fc_proofs: list = [None] * n
        relu_proofs: list = [None] * (n - 1)
        fc_proofs[n - 1] = fc_prove(self.layers[n - 1], A_list[n - 2] if n >= 2 else X, Y_hat, challenges)
        for i in range(n - 2, -1, -1):
            relu_proofs[i] = relu_prove(Z_list[i], aux_list[i], challenges)
            A_prev = A_list[i - 1] if i > 0 else X
            fc_proofs[i] = fc_prove(self.layers[i], A_prev, Z_list[i], challenges)
        return MLPProof(fc_proofs, relu_proofs)

    def verify(self, proof: "MLPProof") -> tuple[bool, str]:
        n = len(self.layers)
        for i in range(n):
            ok, msg = zkfc.verify(self.layers[i].com, proof.fc_proofs[i])
            if not ok:
                return False, f"fc[{i}]: {msg}"
        for i in range(n - 1):
            ok, msg = zkrelu.verify(proof.relu_proofs[i])
            if not ok:
                return False, f"relu[{i}]: {msg}"
        return True, ""


@dataclasses.dataclass
class MLPProof:
    fc_proofs: list
    relu_proofs: list

    def block_until_ready(self):
        """True completion barrier. block_until_ready alone is unreliable over
        remote-device tunnels (observed: returns before execution), so force a
        tiny host readback of the last-produced leaf of every layer proof —
        device queues are in-order, so this fences everything before it."""
        for p in self.fc_proofs:
            np.asarray(p.opening.final_scalar)
            np.asarray(p.opening.final_gen.x)  # G1 batch is the layer's last dispatch
        for p in self.relu_proofs:
            np.asarray(p.hp_polys[-1])
        return self


def prove_timed(model: MLP, X, batch_size: int, challenges=None):
    """End-to-end like demo main (demo.cu:99-143): inference (untimed), then the
    timed proving loop; returns (proof, seconds_per_data_point)."""
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    jax.block_until_ready(Y_hat)
    t0 = time.perf_counter()
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list, challenges)
    proof.block_until_ready()
    dt = time.perf_counter() - t0
    return proof, dt / batch_size
