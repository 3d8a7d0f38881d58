"""Round-interleaved Fiat-Shamir mode (textbook sumcheck FS order).

The grouped default draws all of a sumcheck's fold challenges before its round
polynomials are absorbed (documented grinding surface); interleave=True
absorbs round i's polynomial before deriving fold challenge i — these tests
pin the honest path (prove + full transcript replay), the challenge-dependency
property (changing a round poly changes the next challenge), and that the
replay verifier rejects a tampered round polynomial.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.models import mlp, quantize
from zkdl_tpu.sumcheck import planar_protocols as pp
from zkdl_tpu.sumcheck.transcript import FiatShamir
from zkdl_tpu.tensor import planar_ops as pops


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(31)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(4))
    X = fr.mont(quantize.load_input(rng.standard_normal((2, dims[0])).astype(np.float32)))
    wit = model.infer(X)
    return model, X, wit


def test_interleaved_prove_verify_replay(tiny):
    model, X, (Y, Zs, As, auxs) = tiny
    proof = model.prove(X, Y, Zs, As, auxs, FiatShamir(), interleave=True)
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir(), interleaved=True)
    assert ok, msg


def test_interleaved_committed_aux(tiny):
    model, X, (Y, Zs, As, auxs) = tiny
    proof = model.prove(X, Y, Zs, As, auxs, FiatShamir(), commit_aux=True, interleave=True)
    assert all(p.aux_coms is not None for p in proof.relu_proofs)
    ok, msg = model.verify(proof, X=X, Y_hat=Y, transcript=FiatShamir(), interleaved=True)
    assert ok, msg


def test_interleaved_stream_differs_from_grouped(tiny):
    model, X, (Y, Zs, As, auxs) = tiny
    p1 = model.prove(X, Y, Zs, As, auxs, FiatShamir(), interleave=True)
    p2 = model.prove(X, Y, Zs, As, auxs, FiatShamir(), interleave=False)
    assert not np.array_equal(
        np.asarray(p1.relu_proofs[0].v_z_bin), np.asarray(p2.relu_proofs[0].v_z_bin)
    )


def test_interleaved_replay_rejects_grouped_proof(tiny):
    model, X, (Y, Zs, As, auxs) = tiny
    grouped = model.prove(X, Y, Zs, As, auxs, FiatShamir(), interleave=False)
    ok, msg = model.verify(grouped, X=X, Y_hat=Y, transcript=FiatShamir(), interleaved=True)
    assert not ok, "grouped-draw proof must fail the interleaved replay"


def test_interleaved_replay_rejects_tampered_round_poly(tiny):
    model, X, (Y, Zs, As, auxs) = tiny
    proof = model.prove(X, Y, Zs, As, auxs, FiatShamir(), interleave=True)
    bad = mlp.MLPProof(
        [dataclasses.replace(p) for p in proof.fc_proofs],
        [dataclasses.replace(p) for p in proof.relu_proofs],
    )
    poly = np.asarray(bad.relu_proofs[0].mag_polys).copy()
    poly[0, 0, 0] ^= 1
    bad.relu_proofs[0].mag_polys = jnp.asarray(poly)
    ok, msg = model.verify(bad, X=X, Y_hat=Y, transcript=FiatShamir(), interleaved=True)
    assert not ok and "round-interleaved" in msg, msg


def test_challenge_depends_on_round_poly():
    """Grinding property at the protocol level: two tensors that differ only
    in round 0's polynomial get different round-0 fold challenges."""
    bits1 = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 0, 0], np.uint32))
    bits2 = jnp.asarray(np.array([1, 1, 1, 1, 0, 1, 0, 0], np.uint32))
    u = fr.mont(jnp.asarray(np.random.default_rng(7).integers(0, 1 << 30, (3, 8)).astype(np.uint32)))
    ch1, ch2 = FiatShamir(), FiatShamir()
    _, _, v1 = pp.binary_prove_bits_interleaved(bits1, u, ch1)
    _, _, v2 = pp.binary_prove_bits_interleaved(bits2, u, ch2)
    assert not np.array_equal(np.asarray(v1[0]), np.asarray(v2[0]))


def test_interleaved_protocol_streams_match_grouped_math():
    """The interleaved drivers emit the same (polys, finals) as the grouped
    planar provers when fed the challenges the interleaved run derived —
    i.e. only the challenge SCHEDULE differs, not the sumcheck math."""
    rng = np.random.default_rng(3)
    n = 16
    bits = jnp.asarray(rng.integers(0, 2, n).astype(np.uint32))
    u = fr.mont(jnp.asarray(rng.integers(0, 1 << 30, (4, 8)).astype(np.uint32)))
    ch = FiatShamir()
    polys_i, final_i, v = pp.binary_prove_bits_interleaved(bits, u, ch)
    polys_g, final_g = pp.binary_prove_bits(bits, u, v)
    assert np.array_equal(np.asarray(polys_i), np.asarray(polys_g))
    assert np.array_equal(np.asarray(final_i), np.asarray(final_g))
