"""Verifier-side challenge re-derivation (Fiat-Shamir transcript replay).

The per-layer verifiers check sumcheck algebra against the proof's OWN stored
evaluation points; `MLP.verify(..., transcript=...)` additionally re-derives
every challenge from the statement-seeded transcript and rejects proofs whose
points were not forced by the hash chain (docs/SOUNDNESS.md). These tests
cover: honest accept (FiatShamir and SeededRng modes), rejection of a proof
whose per-layer algebra is fully valid but whose challenges came from a
different source (the "prover picks its own points" forgery), and statement
binding (same proof, different claimed public input).
"""

import jax
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.models import mlp, quantize
from zkdl_tpu.sumcheck.transcript import FiatShamir, SeededRng


@pytest.fixture(scope="module")
def tiny_model():
    rng = np.random.default_rng(11)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(1))
    X = fr.mont(quantize.load_input(rng.standard_normal((2, dims[0])).astype(np.float32)))
    return model, X


def test_fiat_shamir_replay_accepts_honest(tiny_model):
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir())
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir())
    assert ok, msg


def test_seeded_rng_replay_accepts_honest(tiny_model):
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, SeededRng(123))
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=SeededRng(123))
    assert ok, msg


def test_replay_requires_public_statement(tiny_model):
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir())
    ok, msg = model.verify(proof, transcript=FiatShamir())
    assert not ok and "transcript replay requires" in msg


def test_replay_rejects_prover_chosen_points(tiny_model):
    """A proof whose per-layer algebra, chain, and anchors all verify — it is
    an honest proof for this (model, X, Y) — but whose challenges came from a
    source the prover controls. Without replay it passes; with replay it must
    be rejected."""
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, SeededRng(7))
    ok, msg = model.verify(proof, X=X, Y_hat=Y)
    assert ok, f"sanity: proof is internally valid ({msg})"
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir())
    assert not ok and msg.startswith("transcript:"), msg


def test_replay_binds_statement(tiny_model):
    """The same internally-valid proof presented for a different public input
    must fail: the transcript is seeded by (commitments, X, Y_hat)."""
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir())
    xb = np.asarray(X).copy()
    xb[0, 0] ^= 1
    import jax.numpy as jnp

    ok, msg = model.verify(proof, X=jnp.asarray(xb), Y_hat=Y, transcript=FiatShamir())
    assert not ok and msg.startswith("transcript:"), msg


def test_replay_rejects_tampered_challenge_vector(tiny_model):
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir())
    forged = np.asarray(proof.fc_proofs[-1].u_in).copy()
    forged[0, 0] ^= 1
    import jax.numpy as jnp

    proof.fc_proofs[-1].u_in = jnp.asarray(forged)
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir())
    assert not ok and "transcript" in msg


def test_unchained_proof_cannot_claim_input_anchor(tiny_model):
    """ADVICE r3: an unchained proof presented with X must be rejected, not
    silently skipped; the Y_hat anchor is checked even for unchained proofs."""
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir(), chain=False)
    ok, msg = model.verify(proof, X=X, Y_hat=Y)
    assert not ok and "chained" in msg
    # Y_hat-only: the output anchor holds for unchained proofs
    ok, msg = model.verify(proof, Y_hat=Y)
    assert ok, msg
    yb = np.asarray(Y).copy()
    yb[0, 0] ^= 1
    import jax.numpy as jnp

    ok, msg = model.verify(proof, Y_hat=jnp.asarray(yb))
    assert not ok and "output claim" in msg
