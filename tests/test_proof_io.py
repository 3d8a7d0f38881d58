"""Proof serialization round-trip + checkpointed proving resume."""

import numpy as np
import jax
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.io import proof_io
from zkdl_tpu.models import mlp, quantize
from zkdl_tpu.sumcheck.transcript import FiatShamir, SeededRng


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(5)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(rng.standard_normal((2, dims[0])).astype(np.float32)))
    wit = model.infer(X)
    return model, X, wit


def _proof_equal(a, b):
    import dataclasses

    if dataclasses.is_dataclass(a):
        return all(
            _proof_equal(getattr(a, f.name), getattr(b, f.name))
            for f in dataclasses.fields(a)
        )
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_proof_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return set(a) == set(b) and all(_proof_equal(a[k], b[k]) for k in a)
    if a is None or isinstance(a, (int, float, str, bool)):
        return a == b
    return np.array_equal(np.asarray(a), np.asarray(b))


def test_dump_load_roundtrip(tiny, tmp_path):
    model, X, (Y, Zs, As, auxs) = tiny
    proof = model.prove(X, Y, Zs, As, auxs, SeededRng(3))
    path = str(tmp_path / "proof.npz")
    proof_io.dump_proof(proof, path)
    back = proof_io.load_proof(path, to_device=True)
    assert _proof_equal(proof, back)
    ok, msg = model.verify(back)
    assert ok, msg


def test_checkpoint_resume_identical(tiny, tmp_path):
    model, X, (Y, Zs, As, auxs) = tiny
    full = model.prove(X, Y, Zs, As, auxs, SeededRng(9))

    ckpt_dir = str(tmp_path / "ckpt")
    ckpt = proof_io.ProofCheckpoint(ckpt_dir)
    # first run: prove only the last fc layer, then "crash"
    p1 = proof_io.prove_mlp_checkpointed(
        model, X, Y, Zs, As, auxs, SeededRng(9), ckpt
    )
    assert _proof_equal(full, p1)
    # resume from the on-disk prefix with a fresh transcript: identical proof
    ckpt2 = proof_io.ProofCheckpoint(ckpt_dir)
    p2 = proof_io.prove_mlp_checkpointed(
        model, X, Y, Zs, As, auxs, SeededRng(9), ckpt2
    )
    assert _proof_equal(full, p2)


def test_checkpoint_resume_fiatshamir(tiny, tmp_path):
    model, X, (Y, Zs, As, auxs) = tiny
    full = model.prove(X, Y, Zs, As, auxs, FiatShamir())
    ckpt = proof_io.ProofCheckpoint(str(tmp_path / "fs"))
    p1 = proof_io.prove_mlp_checkpointed(model, X, Y, Zs, As, auxs, FiatShamir(), ckpt)
    assert _proof_equal(full, p1)
    p2 = proof_io.prove_mlp_checkpointed(model, X, Y, Zs, As, auxs, FiatShamir(), ckpt)
    assert _proof_equal(full, p2)
