"""Tests for zkRescale and the zkAttention block."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.field import fr, host
from zkdl_tpu.models import quantize, zkattention, zkfc, zkrescale
from zkdl_tpu.sumcheck.transcript import FiatShamir
from zkdl_tpu.tensor import fr_ops

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles; excluded from the smoke tier

HF = host.fr


def _to_signed(v):
    half = fr.P_INT // 2
    return v if v <= half else v - fr.P_INT


def test_rescale_forward_semantics():
    # values at combined scale 2^32; rescale must round-to-nearest to 2^16
    floats = np.array([1.5, -2.25, 0.0, 1e-6, -1e-6, 123.456, -0.5], dtype=np.float64)
    n = 8
    raw = np.zeros((n, 8), dtype=np.uint32)
    vals = [int(round(abs(f) * 2**32)) for f in floats]
    ints = []
    for i, f in enumerate(floats):
        v = vals[i] if f >= 0 else (fr.P_INT - vals[i]) % fr.P_INT
        ints.append(v)
    ints.append(0)
    X = fr.mont(jnp.asarray(fr.from_ints(ints)))
    Z, aux = zkrescale.forward(X)
    out = [_to_signed(HF.unmont(v)) for v in fr.to_ints(np.asarray(Z))]
    for i, f in enumerate(floats):
        expect = abs(round(f * 2**16))  # |round-to-nearest|
        got = out[i]
        assert abs(got) <= 2**32
        # round-to-nearest of the magnitude, sign preserved
        assert abs(abs(got) - expect) <= 1, (f, got, expect)
        if abs(got) > 0 and abs(f) > 2**-17:
            assert (got < 0) == (f < 0), (f, got)


def test_rescale_prove_verify():
    rng = np.random.default_rng(0)
    floats = rng.standard_normal(16) * 5
    ints = []
    for f in floats:
        v = int(round(abs(f) * 2**32))
        ints.append(v if f >= 0 else (fr.P_INT - v) % fr.P_INT)
    X = fr.mont(jnp.asarray(fr.from_ints(ints)))
    Z, aux = zkrescale.forward(X)
    proof = zkrescale.prove(X, aux, FiatShamir())
    ok, msg = zkrescale.verify(proof)
    assert ok, msg


def _tiny_attention(seq=4, d=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: (rng.standard_normal((d, d)) * 0.3).astype(np.float32)
    attn = zkattention.ZkAttention.from_float(
        seq, mk(), mk(), mk(), mk(), jax.random.PRNGKey(0)
    )
    X_np = rng.standard_normal((seq, d)).astype(np.float32)
    X = fr.mont(quantize.load_input(X_np))
    return attn, X, X_np


def test_attention_forward_matches_float():
    attn, X, X_np = _tiny_attention()
    Y, tr = attn.forward(X)
    # float reference of the same quantized pipeline (loose tolerance: each
    # stage rounds at 2^-16)
    deq = lambda t: quantize.dequantize_to_float(t, mont_form=True)
    W = lambda fc: np.array(deq(fc.weights)).reshape(fc.in_size, fc.out_size)
    s, d = attn.seq, attn.d_model
    Xf = np.array(deq(X)).reshape(s, d)
    Qf = Xf @ W(attn.wq)
    Kf = Xf @ W(attn.wk)
    Vf = Xf @ W(attn.wv)
    Sf = (Qf @ Kf.T) / np.sqrt(d)
    Pf = np.exp(Sf - Sf.max(axis=1, keepdims=True))
    Pf /= Pf.sum(axis=1, keepdims=True)
    Of = Pf @ Vf
    Yf = Of @ W(attn.wo)
    Y_got = np.array(deq(Y)).reshape(s, d)
    assert np.allclose(Y_got, Yf, atol=2e-3), np.abs(Y_got - Yf).max()


def test_attention_softmax_row_sums_near_scale():
    # The zksoftmax circuit proves sum_j P_ij = 2^16 - slack_i with
    # slack_i in [0, cols) range-proved (zksoftmax.py:20,44) — rows need not
    # sum exactly to SCALE, but must be within the slack bound.
    attn, X, _ = _tiny_attention()
    _, tr = attn.forward(X)
    q = tr["P_raw_vals"]
    sums = q.sum(axis=1)
    assert (sums <= quantize.SCALE).all()
    assert (sums > quantize.SCALE - attn.seq).all()
    assert (q <= quantize.SCALE).all()


def test_attention_prove_verify():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir())
    ok, msg = attn.verify(proof)
    assert ok, msg


def test_attention_rejects_tampered_softmax():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    # break normalization: bump one P entry
    P_bad = tr["P"].at[0].set(fr.mont(jnp.asarray(fr.from_ints([3 << 16])))[0])
    tr["P"] = P_bad
    proof = attn.prove(tr, FiatShamir())
    ok, _ = attn.verify(proof)
    assert not ok


# ---------------------------------------------------------------------------
# committed-witness tier: the full attention claim DAG bound to commitments
# ---------------------------------------------------------------------------


def test_attention_committed_prove_verify():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    assert proof.witness is not None
    ok, msg = attn.verify(proof, X=X, Y=Y)
    assert ok, msg


def test_attention_committed_rejects_wrong_output():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    Y_bad = Y.at[0].set(fr.mont(jnp.asarray(fr.from_ints([7 << 16])))[0])
    ok, msg = attn.verify(proof, X=X, Y=Y_bad)
    assert not ok and "anchor" in msg.lower()


def test_attention_committed_rejects_tampered_opening():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    # forge mm_s's left-operand final: perturb the revealed fold so the
    # verifier's MSM no longer matches the row-commitment MLE
    op = proof.witness.openings["at.mm_s.fa"]
    op.proof.t_folded = op.proof.t_folded.at[0, 0].add(jnp.uint32(1))
    ok, msg = attn.verify(proof)
    assert not ok


def test_attention_committed_transcript_replay():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    ok, msg = attn.verify(proof, X=X, Y=Y, transcript=FiatShamir())
    assert ok, msg


def test_attention_committed_replay_rejects_swapped_point():
    """The attack transcript replay exists to stop: replace a challenge point
    with an adaptively chosen one. Without replay the committed checks still
    pass structurally; with replay the derived challenge differs."""
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    proof.u_x = proof.u_x.at[0, 0].add(jnp.uint32(1))
    ok, msg = attn.verify(proof, X=X, Y=Y, transcript=FiatShamir())
    assert not ok and "transcript" in msg, msg


def test_attention_committed_rejects_inconsistent_rescale():
    attn, X, _ = _tiny_attention()
    Y, tr = attn.forward(X)
    # corrupt Q (the rescale output) but keep aux honest for Q_raw: the
    # Z = (2*sign-1)*mag product binding must catch it
    tr["Q"] = tr["Q"].at[1].set(fr.mont(jnp.asarray(fr.from_ints([5 << 16])))[0])
    proof = attn.prove(tr, FiatShamir(), commit_witness=True)
    ok, msg = attn.verify(proof)
    assert not ok
