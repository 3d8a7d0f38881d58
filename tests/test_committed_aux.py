"""Committed-aux soundness tier (docs/SOUNDNESS.md gap #1).

With commit_aux=True the prover Pedersen-commits every ReLU's sign/mag_bin/
rem_bin tensors BEFORE that layer's challenges are drawn, and opens them at
every point where the proof claims their evaluations. These tests check the
honest path (including full Fiat-Shamir transcript replay over the extended
draw/absorb schedule) and that each opening actually gates verification.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.models import mlp, quantize, zkrelu
from zkdl_tpu.sumcheck.transcript import FiatShamir


@pytest.fixture(scope="module")
def committed_proof():
    rng = np.random.default_rng(21)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(2))
    X = fr.mont(quantize.load_input(rng.standard_normal((2, dims[0])).astype(np.float32)))
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, FiatShamir(), commit_aux=True)
    return model, X, Y, proof


def _clone(proof):
    fc = [dataclasses.replace(p) for p in proof.fc_proofs]
    relu = [dataclasses.replace(p) for p in proof.relu_proofs]
    return mlp.MLPProof(fc, relu)


def test_committed_honest_with_replay(committed_proof):
    model, X, Y, proof = committed_proof
    assert all(p.aux_coms is not None for p in proof.relu_proofs)
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir())
    assert ok, msg


def test_committed_rejects_tampered_opening(committed_proof):
    model, X, Y, proof = committed_proof
    bad = _clone(proof)
    op = bad.relu_proofs[0].open_mag_bin
    fs = np.asarray(op.t_folded).copy()
    fs[0, 0] ^= 1
    bad.relu_proofs[0].open_mag_bin = dataclasses.replace(op, t_folded=jnp.asarray(fs))
    ok, msg = model.verify(bad, X=X, Y_hat=Y)
    assert not ok and "committed-aux" in msg, msg


def test_committed_rejects_swapped_commitment(committed_proof):
    model, X, Y, proof = committed_proof
    bad = _clone(proof)
    coms = bad.relu_proofs[0].aux_coms
    bad.relu_proofs[0].aux_coms = zkrelu.AuxCommitments(
        sign=coms.sign, mag=coms.rem, rem=coms.mag
    )
    ok, msg = model.verify(bad, X=X, Y_hat=Y)
    assert not ok and "committed-aux" in msg, msg


def test_committed_rejects_tampered_sign_opening(committed_proof):
    model, X, Y, proof = committed_proof
    bad = _clone(proof)
    op = bad.relu_proofs[0].open_sign_rec
    fs = np.asarray(op.t_folded).copy()
    fs[0, 0] ^= 1
    bad.relu_proofs[0].open_sign_rec = dataclasses.replace(op, t_folded=jnp.asarray(fs))
    ok, msg = model.verify(bad, X=X, Y_hat=Y)
    assert not ok and "sign@v_a" in msg, msg


def test_committed_rejects_forged_recombination_claims(committed_proof):
    """The attack the commitments exist to stop: claim recombination folds
    that don't come from the committed bit tensor. Forging mag_bits_at_u must
    now break the eq-weighted opening at w_q||u_rec (not just the
    recombination identity, which a malicious prover could satisfy with a
    second, non-bit witness)."""
    model, X, Y, proof = committed_proof
    bad = _clone(proof)
    rp = bad.relu_proofs[0]
    claims = np.asarray(rp.mag_bits_at_u).copy()
    # a consistent-looking forgery: swap two bit-row claims
    claims[[0, 1]] = claims[[1, 0]]
    rp.mag_bits_at_u = jnp.asarray(claims)
    ok, msg = zkrelu.verify_committed(rp)
    assert not ok and "mag_bin@w||u_rec" in msg, msg


def test_uncommitted_proof_has_no_aux_fields(committed_proof):
    model, X, Y, _ = committed_proof
    Yh, Z, A, aux = model.infer(X)
    proof = model.prove(X, Yh, Z, A, aux, FiatShamir(), commit_aux=False)
    assert all(p.aux_coms is None for p in proof.relu_proofs)
    ok, msg = model.verify(proof, X=X, Y_hat=Yh, transcript=FiatShamir())
    assert ok, msg
