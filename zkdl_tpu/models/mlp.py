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

# Default for the committed-aux soundness tier (MLP.prove(commit_aux=...)):
# off matches the reference's uncommitted aux witnesses; config._apply can
# flip it (config.commit_aux).
COMMIT_AUX = False


def absorb_statement(challenges: ChallengeSource, layers, X, Y_hat) -> None:
    """Bind the Fiat-Shamir transcript to the public statement before any
    challenge is drawn: every layer's weight row-commitments (the model), the
    public input X and the claimed output Y_hat. A no-op for non-absorbing
    challenge modes (SeededRng/Replay), so reference-compatible streams are
    unchanged. The verifier replays this in `MLP.verify(transcript=...)`."""
    for layer in layers:
        challenges.absorb_array(layer.com.points.x)
        challenges.absorb_array(layer.com.points.y)
        challenges.absorb_array(layer.com.points.z)
    challenges.absorb_array(X)
    challenges.absorb_array(Y_hat)


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

    def prove(self, X, Y_hat, Z_list, A_list, aux_list, challenges: ChallengeSource | None = None,
              chain: bool | None = None, commit_aux: bool | None = None,
              interleave: bool = False):
        """Backwards proving loop (demo.cu:128-137). Returns MLPProof.

        chain=True (default on the planar path) produces a GKR-style chained
        proof: every FC's output claim shares its evaluation point with the
        adjacent ReLU's sumchecks, so `verify` can walk a single claim chain
        from the public output down to the public input. chain=False matches
        the reference's independent per-layer proofs (and the (n, 8) prover's
        stream bit-for-bit).

        commit_aux=True additionally Pedersen-commits every ReLU's auxiliary
        witness tensors (sign/mag_bin/rem_bin) before that layer's challenges
        are drawn and opens them at every point where the proof claims their
        evaluations — the highest soundness tier (docs/SOUNDNESS.md gap #1
        closed). Default comes from config (off: matches the reference's
        uncommitted aux).

        interleave=True uses the round-interleaved Fiat-Shamir schedule: each
        sumcheck round polynomial is absorbed before the next fold challenge
        is drawn (textbook sumcheck FS). One host round-trip per round; the
        stream differs from the grouped default. Verify with
        MLP.verify(transcript=..., interleaved=True)."""
        if challenges is None:
            challenges = FiatShamir()
        if chain is None:
            chain = USE_PLANAR_PROVER
        if chain and not USE_PLANAR_PROVER:
            raise ValueError("chained proofs require the planar prover")
        if commit_aux is None:
            commit_aux = COMMIT_AUX
        if commit_aux and not chain:
            raise ValueError("committed aux requires chained mode")
        if interleave and not USE_PLANAR_PROVER:
            raise ValueError("interleaved FS requires the planar prover")
        absorb_statement(challenges, self.layers, X, Y_hat)
        fc_prove = zkfc.prove_planar if USE_PLANAR_PROVER else zkfc.prove
        relu_prove = zkrelu.prove_planar if USE_PLANAR_PROVER else zkrelu.prove
        n = len(self.layers)
        fc_proofs: list = [None] * n
        relu_proofs: list = [None] * (n - 1)
        if USE_PLANAR_PROVER:
            fc_proofs[n - 1] = fc_prove(
                self.layers[n - 1], A_list[n - 2] if n >= 2 else X, Y_hat, challenges,
                interleave=interleave,
            )
        else:
            fc_proofs[n - 1] = fc_prove(self.layers[n - 1], A_list[n - 2] if n >= 2 else X, Y_hat, challenges)
        for i in range(n - 2, -1, -1):
            A_prev = A_list[i - 1] if i > 0 else X
            if chain:
                w = jnp.concatenate([fc_proofs[i + 1].u_in, fc_proofs[i + 1].u_bs], axis=0)
                aux_com = zkrelu.commit_aux(aux_list[i]) if commit_aux else None
                relu_proofs[i] = zkrelu.prove_planar(
                    Z_list[i], aux_list[i], challenges, chain_point=w, aux_com=aux_com,
                    interleave=interleave,
                )
                fc_proofs[i] = zkfc.prove_planar(
                    self.layers[i], A_prev, Z_list[i], challenges,
                    z_point=relu_proofs[i].u_recover, interleave=interleave,
                )
            else:
                if USE_PLANAR_PROVER:
                    relu_proofs[i] = relu_prove(Z_list[i], aux_list[i], challenges,
                                                interleave=interleave)
                    fc_proofs[i] = fc_prove(self.layers[i], A_prev, Z_list[i], challenges,
                                            interleave=interleave)
                else:
                    relu_proofs[i] = relu_prove(Z_list[i], aux_list[i], challenges)
                    fc_proofs[i] = fc_prove(self.layers[i], A_prev, Z_list[i], challenges)
        return MLPProof(fc_proofs, relu_proofs)

    def verify(self, proof: "MLPProof", X=None, Y_hat=None,
               transcript: ChallengeSource | None = None,
               interleaved: bool = False) -> tuple[bool, str]:
        """Verify every layer proof, and — for chained proofs — the cross-layer
        claim chain: Y_hat's MLE anchors fc[n-1]'s z-claim (public output);
        each fc[i+1]'s X-side final is the initial claim of relu[i]'s
        A = sign (.) mag sumcheck; relu[i]'s emitted X(v_a) is fc[i]'s z-claim
        at the shared point; fc[0]'s X-side final is checked against the public
        input X's MLE. Pass X / Y_hat to enable the public end anchors.

        transcript: a FRESH ChallengeSource of the same mode used at prove time
        (e.g. `FiatShamir()` for the default prover). When given, the verifier
        re-derives the entire challenge stream — statement absorption, every
        draw, every proof-message absorb — and rejects if any challenge vector
        in the proof differs from the re-derived one. Without it, evaluation
        points are taken from the (attacker-supplied) proof on trust, which is
        only sound against data tampering, not a malicious prover
        (docs/SOUNDNESS.md gap #0)."""
        from ..sumcheck import protocols as sc

        n = len(self.layers)
        if transcript is not None:
            if X is None or Y_hat is None:
                return False, "transcript replay requires the public X and Y_hat"
            ok, msg = self._verify_transcript(proof, X, Y_hat, transcript, interleaved)
            if not ok:
                return False, f"transcript: {msg}"
        for i in range(n):
            ok, msg = zkfc.verify(self.layers[i].com, proof.fc_proofs[i])
            if not ok:
                return False, f"fc[{i}]: {msg}"
        for i in range(n - 1):
            ok, msg = zkrelu.verify(proof.relu_proofs[i])
            if not ok:
                return False, f"relu[{i}]: {msg}"
            if proof.relu_proofs[i].aux_coms is not None:
                ok, msg = zkrelu.verify_committed(proof.relu_proofs[i])
                if not ok:
                    return False, f"relu[{i}] committed-aux: {msg}"
        chained = n >= 2 and proof.relu_proofs[0].a_polys is not None
        # The public-output anchor needs only the top FC's z-claim, so it is
        # checked for chained AND unchained proofs; the input anchor rides the
        # claim chain, so an unchained proof cannot honor it — reject rather
        # than silently skip (a malicious prover could otherwise downgrade to
        # chain=False to dodge the anchors).
        if Y_hat is not None:
            top = proof.fc_proofs[n - 1]
            pt = jnp.concatenate([top.u_out, top.u_bs], axis=0)
            y_eval = fr_ops.me_eval(fr_ops.pad_to(Y_hat, 1 << pt.shape[0]), pt)
            if sc.scalars_to_ints(y_eval[None]) != sc.scalars_to_ints(top.z_claim[None]):
                return False, "fc[-1]: output claim != Y_hat MLE (public anchor)"
        if X is not None and n >= 2 and not chained:
            return False, "input anchor requires a chained proof"
        if chained:
            for i in range(n - 2, -1, -1):
                rp = proof.relu_proofs[i]
                nxt = proof.fc_proofs[i + 1]
                w = jnp.concatenate([nxt.u_in, nxt.u_bs], axis=0)
                if not np.array_equal(np.asarray(rp.a_point), np.asarray(w)):
                    return False, f"relu[{i}]: chain point != fc[{i+1}]'s X point"
                a_claim = sc.scalars_to_ints(nxt.ip_finals)[0]
                ok, msg = zkrelu.verify_chained(rp, a_claim)
                if not ok:
                    return False, f"relu[{i}]: {msg}"
                fcp = proof.fc_proofs[i]
                zp = jnp.concatenate([fcp.u_out, fcp.u_bs], axis=0)
                if not np.array_equal(np.asarray(zp), np.asarray(rp.u_recover)):
                    return False, f"fc[{i}]: z point not chained to relu[{i}].v_a"
                if sc.scalars_to_ints(fcp.z_claim[None]) != sc.scalars_to_ints(rp.x_at_va[None]):
                    return False, f"fc[{i}]: z claim != relu[{i}].X(v_a)"
            if X is not None:
                bot = proof.fc_proofs[0]
                pt = jnp.concatenate([bot.u_in, bot.u_bs], axis=0)
                x_eval = fr_ops.me_eval(fr_ops.pad_to(X, 1 << pt.shape[0]), pt)
                if sc.scalars_to_ints(x_eval[None]) != [sc.scalars_to_ints(bot.ip_finals)[0]]:
                    return False, "fc[0]: input claim != X MLE (public anchor)"
        return True, ""

    def _verify_transcript(self, proof: "MLPProof", X, Y_hat,
                           transcript: ChallengeSource,
                           interleaved: bool = False) -> tuple[bool, str]:
        """Re-derive the full challenge stream and compare with the proof.

        Mirrors the prove() schedule exactly: statement absorption, then the
        output layer's draws, then per layer (backwards) the ReLU draws and the
        FC draws, absorbing each proof's messages where the prover did. In
        chained mode fc[i<n-1] draws only u_in (its z-point is relu[i]'s
        u_recover — equality is enforced by the chain checks in verify).

        interleaved=True replays the round-interleaved FS schedule instead
        (see zkrelu._prove_planar_interleaved / zkfc.prove_planar): every fold
        challenge is re-derived AFTER absorbing the corresponding round
        polynomial, so a prover that chose any round poly after seeing the
        fold challenge is caught."""

        def draw_eq(name: str, stored) -> bool:
            got = transcript.random_vec(stored.shape[0])
            return np.array_equal(np.asarray(got), np.asarray(stored))

        def rounds_eq(name: str, polys, stored_vec) -> bool:
            """Interleaved sumcheck replay: absorb poly[i], re-derive fold i."""
            sp = np.asarray(stored_vec)
            for i in range(sp.shape[0]):
                transcript.absorb_array(polys[i])
                got = np.asarray(transcript.random_vec(1))[0]
                if not np.array_equal(got, sp[i]):
                    return False
            return True

        absorb_statement(transcript, self.layers, X, Y_hat)
        n = len(self.layers)
        chained = n >= 2 and proof.relu_proofs[0].a_polys is not None

        def fc_replay(i: int, draw_all: bool) -> str | None:
            p = proof.fc_proofs[i]
            if interleaved:
                if draw_all:
                    for name, stored in (("u_bs", p.u_bs), ("u_out", p.u_out)):
                        if not draw_eq(name, stored):
                            return f"fc[{i}].{name} not derived from the transcript"
                transcript.absorb_array(p.z_claim)
                if not rounds_eq("u_in", p.ip_polys, p.u_in):
                    return f"fc[{i}].u_in not derived round-interleaved"
                return None
            vecs = [("u_bs", p.u_bs), ("u_in", p.u_in), ("u_out", p.u_out)] if draw_all \
                else [("u_in", p.u_in)]
            for name, stored in vecs:
                if not draw_eq(name, stored):
                    return f"fc[{i}].{name} not derived from the transcript"
            transcript.absorb_array(p.ip_polys)
            transcript.absorb_array(p.z_claim)
            return None

        def relu_replay(i: int) -> str | None:
            p = proof.relu_proofs[i]
            if p.aux_coms is not None:
                zkrelu._absorb_aux_coms(transcript, p.aux_coms)
            if interleaved:
                if not draw_eq("u_z_bin", p.u_z_bin):
                    return f"relu[{i}].u_z_bin not derived from the transcript"
                if not rounds_eq("v_z", p.mag_polys, p.v_z_bin):
                    return f"relu[{i}].v_z_bin not derived round-interleaved"
                if not draw_eq("u_r_bin", p.u_r_bin):
                    return f"relu[{i}].u_r_bin not derived from the transcript"
                if not rounds_eq("v_r", p.rem_polys, p.v_r_bin):
                    return f"relu[{i}].v_r_bin not derived round-interleaved"
                if p.a_polys is not None:
                    if not rounds_eq("v_a", p.a_polys, p.u_recover):
                        return f"relu[{i}].u_recover not derived round-interleaved"
                else:
                    if not draw_eq("u_recover", p.u_recover):
                        return f"relu[{i}].u_recover not derived from the transcript"
                if not draw_eq("u_hp", p.u_hp):
                    return f"relu[{i}].u_hp not derived from the transcript"
                transcript.absorb_array(p.mag_bits_at_u)
                transcript.absorb_array(p.rem_bits_at_u)
                transcript.absorb_array(p.hp_claim)
                if p.x_at_va is None:
                    return f"relu[{i}]: interleaved proof missing x_at_va"
                transcript.absorb_array(p.x_at_va)
                if not rounds_eq("v_hp", p.hp_polys, p.v_hp):
                    return f"relu[{i}].v_hp not derived round-interleaved"
                if p.aux_coms is not None:
                    for name, stored in (("w_q", p.w_q), ("w_r", p.w_r)):
                        if not draw_eq(name, stored):
                            return f"relu[{i}].{name} not derived from the transcript"
                return None
            vecs = [("u_z_bin", p.u_z_bin), ("v_z_bin", p.v_z_bin),
                    ("u_r_bin", p.u_r_bin), ("v_r_bin", p.v_r_bin),
                    ("u_recover", p.u_recover), ("u_hp", p.u_hp),
                    ("v_hp", p.v_hp)]
            if p.aux_coms is not None:
                vecs += [("w_q", p.w_q), ("w_r", p.w_r)]
            for name, stored in vecs:
                if not draw_eq(name, stored):
                    return f"relu[{i}].{name} not derived from the transcript"
            transcript.absorb_array(p.mag_polys)
            transcript.absorb_array(p.rem_polys)
            transcript.absorb_array(p.hp_polys)
            if p.a_polys is not None:
                transcript.absorb_array(p.a_polys)
            return None

        err = fc_replay(n - 1, draw_all=True)
        if err:
            return False, err
        for i in range(n - 2, -1, -1):
            err = relu_replay(i) or fc_replay(i, draw_all=not chained)
            if err:
                return False, err
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
            if p.a_polys is not None:
                np.asarray(p.a_polys[-1])
        return self


def prove_timed(model: MLP, X, batch_size: int, challenges=None, **prove_kwargs):
    """End-to-end like demo main (demo.cu:99-143): inference (untimed), then the
    timed proving loop; returns (proof, seconds_per_data_point).
    prove_kwargs forward to MLP.prove (chain/commit_aux/interleave)."""
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    jax.block_until_ready(Y_hat)
    t0 = time.perf_counter()
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list, challenges, **prove_kwargs)
    proof.block_until_ready()
    dt = time.perf_counter() - t0
    return proof, dt / batch_size
