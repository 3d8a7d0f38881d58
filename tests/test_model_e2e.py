"""End-to-end: quantized inference vs float torch model, zkReLU semantics,
full MLP prove + verify (BASELINE config 1 scale)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, host
from zkdl_tpu.models import mlp, quantize, zkfc, zkrelu
from zkdl_tpu.sumcheck import transcript
from zkdl_tpu.tensor import fr_ops

HF = host.fr
P = fr.P_INT


def signed(v):
    return v if v <= P // 2 else v - P


def test_quantize_matches_reference_semantics():
    xs = np.array([0.0, 1.0, -1.0, 0.5, -0.25, 1e-6, -1e-6, 123.456, -3.00001526], dtype=np.float32)
    q = quantize.float_to_fr(jnp.asarray(xs))
    vals = [signed(v) for v in fr.to_ints(np.asarray(q).reshape(-1, 8))]
    for x, v in zip(xs, vals):
        scaled = np.float32(x) * np.float32(65536.0)
        exp = int(np.floor(np.abs(scaled) + np.float32(0.5)))
        if np.copysign(1.0, scaled) < 0:
            exp = -exp
        # reference float_to_Fr computes sub(0, mag) even for -0.0; value-wise equal
        assert v == exp or (v % P) == (exp % P), (x, v, exp)


def test_relu_forward_semantics():
    # values at combined scale 2^32; relu requantizes to 2^16
    raw = [0, 1, 65536, 2**32, 3 * 2**32 + 2**31, 2**32 + 32768, 2**32 + 32767,
           P - 2**32,  # == -2^32 -> relu 0
           P - 123456789]
    X = fr.mont(jnp.asarray(fr.from_ints(raw)))
    Z, aux = zkrelu.forward(X)
    z_vals = [signed(v) for v in fr.to_ints(np.asarray(fr.unmont(Z)))]
    # oracle: round-to-nearest (ties to even-ish via signed remainder) then relu
    def oracle(x):
        s = x if x <= P // 2 else x - P
        if s < 0:
            return 0
        mag = s
        rem_sign = (mag >> 15) & 1
        rem_mag = mag & 32767
        rem = rem_mag - 65536 // 2 if rem_sign else rem_mag
        return (mag - rem) >> 16
    for x, z in zip(raw, z_vals):
        assert z == oracle(x), (x, z, oracle(x))
    # aux bits recombine to mag_rescaled
    mag_bits = fr.to_ints(np.asarray(fr.unmont(aux["mag_bin"])))
    n = len(raw)
    for i in range(n):
        bits = mag_bits[i * 32 : (i + 1) * 32]
        assert all(b in (0, 1) for b in bits)


def test_field_matmul():
    batch, in_s, out_s = 2, 4, 4
    xs = [random.randrange(P) for _ in range(batch * in_s)]
    ws = [random.randrange(P) for _ in range(in_s * out_s)]
    X = jnp.asarray(fr.from_ints(xs))
    W = jnp.asarray(fr.from_ints(ws))
    Z = zkfc.field_matmul_jit(X, W, in_s, out_s)
    got = fr.to_ints(np.asarray(Z))
    for b in range(batch):
        for o in range(out_s):
            exp = 0
            for i in range(in_s):
                exp = HF.add(exp, HF.mul(xs[b * in_s + i], ws[i * out_s + o]))
            assert got[b * out_s + o] == exp


@pytest.fixture(scope="module")
def small_model():
    rng = np.random.default_rng(42)
    w1 = rng.standard_normal((8, 8), dtype=np.float32) * 0.5
    w2 = rng.standard_normal((8, 8), dtype=np.float32) * 0.5
    model = mlp.MLP.from_float_weights([w1, w2], jax.random.PRNGKey(0))
    X_np = rng.standard_normal((4, 8), dtype=np.float32)
    X = fr.mont(quantize.load_input(X_np))
    return model, X, (w1, w2, X_np)


def test_inference_matches_float(small_model):
    model, X, (w1, w2, X_np) = small_model
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    # dequantize: output scale 2^32 (two matmuls, one requant)
    got = np.array([signed(v) / 2.0**32 for v in fr.to_ints(np.asarray(fr.unmont(Y_hat)))])
    exp = np.maximum(X_np @ w1, 0.0) @ w2
    assert np.allclose(got.reshape(4, 8), exp, atol=2e-3), np.abs(got.reshape(4, 8) - exp).max()


def test_mlp_prove_verify(small_model):
    model, X, _ = small_model
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list, transcript.FiatShamir())
    ok, msg = model.verify(proof)
    assert ok, msg


def test_mlp_rejects_tampered_proof(small_model):
    model, X, _ = small_model
    Y_hat, Z_list, A_list, aux_list = model.infer(X)
    proof = model.prove(X, Y_hat, Z_list, A_list, aux_list, transcript.FiatShamir())
    # corrupt one sumcheck coefficient in layer 0's ip proof
    polys = np.asarray(proof.fc_proofs[0].ip_polys).copy()
    polys[0, 0, 0] ^= 1
    proof.fc_proofs[0].ip_polys = jnp.asarray(polys)
    ok, _ = model.verify(proof)
    assert not ok


def test_mt19937_matches_cpp():
    # std::mt19937 first outputs for default seed 5489
    rng = transcript.MT19937(5489)
    assert [rng.next_u32() for _ in range(3)] == [3499211612, 581869302, 3890346734]


def test_fast_matmul_matches_general():
    # realistic magnitudes (quantized activations/weights) including negatives
    rng = np.random.default_rng(3)
    batch, in_s, out_s = 4, 8, 8
    x_f = rng.standard_normal((batch, in_s)).astype(np.float32) * 20
    w_f = rng.standard_normal((in_s, out_s)).astype(np.float32) * 5
    X = fr.mont(quantize.load_input(x_f))
    W = quantize.load_weights(w_f)
    Z_gen = zkfc.field_matmul_jit(X, W, in_s, out_s)
    Z_fast = zkfc.field_matmul_fast_jit(X, W, in_s, out_s)
    assert (np.asarray(Z_gen) == np.asarray(Z_fast)).all()
    # values near the 2^47 boundary (largest valid magnitudes)
    big = [2**47 - 1, P - (2**47 - 1), 2**46, P - 2**46, 0, 1, P - 1]
    pad = [0] * (8 - len(big))
    Xb = fr.mont(jnp.asarray(fr.from_ints((big + pad) * in_s)))[: in_s * 8].reshape(-1, 8)
    # use batch=8 rows of the same pattern
    Xb = fr.mont(jnp.asarray(fr.from_ints((big + pad) * 8)))
    Wb = quantize.load_weights(rng.standard_normal((8, 8)).astype(np.float32))
    Zg = zkfc.field_matmul_jit(Xb, Wb, 8, 8)
    Zf = zkfc.field_matmul_fast_jit(Xb, Wb, 8, 8)
    assert (np.asarray(Zg) == np.asarray(Zf)).all()
