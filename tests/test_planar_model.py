"""Model-level planar prover vs the (n, 8) prover: identical proofs, verify OK."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.commit import pedersen
from zkdl_tpu.field import fr
from zkdl_tpu.models import mlp, quantize, zkfc, zkrelu
from zkdl_tpu.sumcheck.transcript import SeededRng
from zkdl_tpu.tensor import fr_ops


@pytest.fixture(scope="module")
def tiny_model():
    rng = np.random.default_rng(3)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(rng.standard_normal((2, dims[0])).astype(np.float32)))
    return model, X


def _tree_equal(a, b, path=""):
    if dataclasses.is_dataclass(a):
        for f in dataclasses.fields(a):
            _tree_equal(getattr(a, f.name), getattr(b, f.name), path + "." + f.name)
        return
    if isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
        return
    assert np.array_equal(np.asarray(a), np.asarray(b)), path


def test_planar_model_proof_identical(tiny_model, monkeypatch):
    model, X = tiny_model

    monkeypatch.setattr(mlp, "USE_PLANAR_PROVER", False)
    Y1, Z1, A1, aux1 = model.infer(X)
    proof_old = model.prove(X, Y1, Z1, A1, aux1, SeededRng(42))

    monkeypatch.setattr(mlp, "USE_PLANAR_PROVER", True)
    Y2, Z2, A2, aux2 = model.infer(X)
    assert np.array_equal(np.asarray(Y1), np.asarray(Y2))
    for z1, z2 in zip(Z1, Z2):
        assert np.array_equal(np.asarray(z1), np.asarray(z2))
    # chain=False: the unchained planar stream must match the (n, 8) prover's
    proof_new = model.prove(X, Y2, Z2, A2, aux2, SeededRng(42), chain=False)

    _tree_equal(proof_old, proof_new, "proof")

    ok, msg = model.verify(proof_new)
    assert ok, msg


def test_chained_model_verify_and_tamper(tiny_model):
    """Chained mode: full verify with public anchors passes; tampering with any
    link of the chain (intermediate activations, aux witnesses, claimed
    output) is rejected."""
    model, X = tiny_model
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux)  # chain on by default (planar)
    assert proof.relu_proofs[0].a_polys is not None
    ok, msg = model.verify(proof, X=X, Y_hat=Y)
    assert ok, msg

    # tamper 1: corrupt the intermediate pre-activation Z[0] -> the chain from
    # the output anchor must break somewhere
    Z_bad = [jnp.asarray(np.asarray(z)) for z in Z]
    zb = np.asarray(Z_bad[0]).copy()
    zb[0, 0] ^= 1
    Z_bad[0] = jnp.asarray(zb)
    proof_bad = model.prove(X, Y, Z_bad, A, aux)
    ok, msg = model.verify(proof_bad, X=X, Y_hat=Y)
    assert not ok, "tampered Z must be rejected"

    # tamper 2: corrupt an aux magnitude witness -> recombination identity fails
    aux_bad = [dict(a) for a in aux]
    mag = np.asarray(aux_bad[0]["mag"]).copy()
    mag[0] += 1
    aux_bad[0]["mag"] = jnp.asarray(mag)
    proof_bad = model.prove(X, Y, Z, A, aux_bad)
    ok, msg = model.verify(proof_bad, X=X, Y_hat=Y)
    assert not ok, "tampered mag witness must be rejected"

    # tamper 3: claim a wrong public output
    yb = np.asarray(Y).copy()
    yb[0, 0] ^= 1
    ok, msg = model.verify(proof, X=X, Y_hat=jnp.asarray(yb))
    assert not ok and "output claim" in msg

    # tamper 4: wrong public input
    xb = np.asarray(X).copy()
    xb[0, 0] ^= 1
    ok, msg = model.verify(proof, X=jnp.asarray(xb), Y_hat=Y)
    assert not ok and "input claim" in msg


def test_forward_compact_matches_forward():
    # pre-activations at combined scale 2^32, within the signed 48-bit range
    from zkdl_tpu.field import mp

    rng = np.random.default_rng(9)
    ints = rng.integers(-(1 << 39), 1 << 39, size=64)
    vals = jnp.asarray(np.stack([mp.limbs_from_int(int(v) % fr.P_INT, 8) for v in ints]))
    X = fr.mont(vals)
    Z1, aux1 = zkrelu.forward(X)
    Z2, aux2 = zkrelu.forward_compact(X)
    assert np.array_equal(np.asarray(Z1), np.asarray(Z2))
    # compact bits recombine to the mont tensors
    n = 64
    sign = fr.select(aux2["sign_bits"] == 1, fr.ones_mont((n,)), fr.zeros((n,)))
    assert np.array_equal(np.asarray(sign), np.asarray(aux1["sign"]))
    shifts = jnp.arange(zkrelu.Q, dtype=jnp.uint32)
    mag_bits = ((aux2["mag"][:, None] >> shifts) & 1).reshape(-1)
    mag_bin = fr.select(mag_bits == 1, fr.ones_mont((n * zkrelu.Q,)), fr.zeros((n * zkrelu.Q,)))
    assert np.array_equal(np.asarray(mag_bin), np.asarray(aux1["mag_bin"]))


def test_open_planar_matches_open():
    key = jax.random.PRNGKey(5)
    gens = pedersen.setup(key, 8)
    t = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(6), 32))  # m = 4 rows
    com = pedersen.commit(gens, t)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(7), 5))  # 3 in + 2 row
    p_old = pedersen.open(gens, t, com, u)
    p_new = pedersen.open_planar(gens, t, com, u)
    assert np.array_equal(np.asarray(p_old.final_scalar), np.asarray(p_new.final_scalar))
    for a, b in zip(p_old.round_points, p_new.round_points):
        assert np.array_equal(np.asarray(a.x), np.asarray(b.x))
    assert np.array_equal(np.asarray(p_old.final_gen.x), np.asarray(p_new.final_gen.x))
    assert np.array_equal(np.asarray(p_old.com_at_u_row.x), np.asarray(p_new.com_at_u_row.x))
