"""Exp-consistent quantized softmax proof: completeness + soundness probes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, mp
from zkdl_tpu.models import quantize, zksoftmax
from zkdl_tpu.sumcheck.transcript import SeededRng

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles; excluded from the smoke tier


ROWS, COLS, DM = 4, 8, 16


@pytest.fixture(scope="module")
def scores():
    rng = np.random.default_rng(11)
    # signed scores at scale 2^16, well within the 48-bit bound
    vals = (rng.standard_normal((ROWS, COLS)) * 2.0 * quantize.SCALE).astype(np.int64)
    limbs = np.stack(
        [mp.limbs_from_int(int(v) % fr.P_INT, 8) for v in vals.reshape(-1)]
    )
    return jnp.asarray(limbs) if False else fr.mont(jnp.asarray(limbs)), vals


def test_witness_is_quantized_softmax(scores):
    S, vals = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    P = wit["P"].reshape(ROWS, COLS).astype(np.float64) / quantize.SCALE
    # compare against float softmax of the same logits
    logits = vals.astype(np.float64) / quantize.SCALE / np.sqrt(DM)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    ref = e / e.sum(axis=1, keepdims=True)
    # bucket quantum 2^-8 in the exponent + flooring: generous tolerance
    assert np.abs(P - ref).max() < 0.01
    # row sums in (2^16 - cols, 2^16]
    sums = wit["P"].reshape(ROWS, COLS).sum(axis=1)
    assert ((sums > quantize.SCALE - COLS) & (sums <= quantize.SCALE)).all()


def test_softmax_prove_verify(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove(S, wit, ROWS, COLS, DM, SeededRng(7))
    ok, msg = zksoftmax.verify(proof)
    assert ok, msg


def test_softmax_tampered_e_fails(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    wit = dict(wit)
    e = wit["e"].copy()
    e[3] += 5  # not the table value for its bucket anymore
    wit["e"] = e
    proof = zksoftmax.prove(S, wit, ROWS, COLS, DM, SeededRng(7))
    ok, msg = zksoftmax.verify(proof)
    assert not ok


def test_softmax_tampered_P_fails(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    wit = dict(wit)
    P = wit["P"].copy()
    P[0] += 123  # break the division relation
    wit["P"] = P
    wit["P_mont"] = zksoftmax._mont_from_u64(jnp.asarray(P))
    proof = zksoftmax.prove(S, wit, ROWS, COLS, DM, SeededRng(7))
    ok, msg = zksoftmax.verify(proof)
    assert not ok


# ---------------------------------------------------------------------------
# committed-witness tier (commit/witness.py): every forwarded claim is a
# verified Pedersen opening
# ---------------------------------------------------------------------------


def test_softmax_committed_prove_verify(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove_committed(S, wit, ROWS, COLS, DM, SeededRng(7))
    assert proof.witness is not None and len(proof.witness.openings) > 20
    ok, msg = zksoftmax.verify(proof)
    assert ok, msg


def test_softmax_committed_tampered_opening_fails(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove_committed(S, wit, ROWS, COLS, DM, SeededRng(7))
    op = proof.witness.openings["sm.e@lk"]
    op.proof.t_folded = op.proof.t_folded.at[0, 0].add(jnp.uint32(1))
    ok, msg = zksoftmax.verify(proof)
    assert not ok and "binding" in msg


def test_softmax_committed_missing_opening_fails(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove_committed(S, wit, ROWS, COLS, DM, SeededRng(7))
    del proof.witness.openings["sm.S@u_rec"]
    ok, msg = zksoftmax.verify(proof)
    assert not ok and "binding" in msg


def test_softmax_committed_transcript_replay(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove_committed(S, wit, ROWS, COLS, DM, SeededRng(7))
    ok, msg = zksoftmax.verify(proof, transcript=SeededRng(7))
    assert ok, msg
    # swapped challenge point: replay must reject
    proof.u_rec = proof.u_rec.at[0, 0].add(jnp.uint32(1))
    ok, msg = zksoftmax.verify(proof, transcript=SeededRng(7))
    assert not ok and "transcript" in msg, msg


def test_softmax_committed_swapped_commitment_fails(scores):
    S, _ = scores
    wit = zksoftmax.softmax_witness(S, ROWS, COLS, DM)
    proof = zksoftmax.prove_committed(S, wit, ROWS, COLS, DM, SeededRng(7))
    # claim the 'e' tensor commitment is actually the 'P' commitment: every
    # opening of e must now fail the commitment-evaluation check
    proof.witness.coms["sm.e"] = proof.witness.coms["sm.P"]
    ok, msg = zksoftmax.verify(proof)
    assert not ok and "binding" in msg
