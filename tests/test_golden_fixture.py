"""Golden proof-transcript fixture (SURVEY §7 stage-4 gate).

`tests/fixtures/golden_config1.npz` is a recorded full proof of the
BASELINE-config-1 model (2-layer 64-wide MLP, batch 1) under the
mt19937-compatible SeededRng challenge mode — the challenge generator that is
unit-tested against std::mt19937 outputs (the reference's random_vec,
/root/reference/proof.cu:3-11). The test regenerates the proof and asserts
BYTE-IDENTICAL arrays, pinning the whole prover stack (quantizer, forward,
sumchecks, commitment openings, challenge consumption order) across rounds.

Capturing the same transcript from the CUDA reference (when a GPU host is
available): patch `random_vec` to seed its mt19937 with 12345 instead of
random_device (proof.cu:5), add prints of each sumcheck proof vector in
zkFC::prove / zkReLU::prove, rebuild `make demo`, and run it on the model
produced by `python -m zkdl_tpu.models.gen_benchmark /tmp/m --small`. The printed
streams correspond field-for-field to this fixture's *_polys arrays.
"""

import os
import pathlib

import jax
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.io import proof_io
from zkdl_tpu.models import mlp, quantize
from zkdl_tpu.sumcheck.transcript import SeededRng

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_config1.npz"
SEED = 12345


def _build_and_prove():
    rng = np.random.default_rng(2024)
    dims = [64, 64, 64]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(rng.standard_normal((1, dims[0])).astype(np.float32)))
    Y, Z, A, aux = model.infer(X)
    proof = model.prove(X, Y, Z, A, aux, SeededRng(SEED), chain=False)
    return model, proof


def test_golden_proof_regenerates_byte_identical(tmp_path):
    model, proof = _build_and_prove()
    got_path = tmp_path / "regen.npz"
    proof_io.dump_proof(proof, str(got_path))

    if not FIXTURE.exists():
        # first capture: record the fixture (commit it; later runs compare)
        FIXTURE.parent.mkdir(parents=True, exist_ok=True)
        proof_io.dump_proof(proof, str(FIXTURE))
        pytest.skip("golden fixture captured on first run")

    want = np.load(FIXTURE, allow_pickle=False)
    got = np.load(got_path, allow_pickle=False)
    assert sorted(want.files) == sorted(got.files)
    for k in want.files:
        assert want[k].dtype == got[k].dtype, k
        assert np.array_equal(want[k], got[k]), f"golden mismatch at {k}"

    ok, msg = model.verify(proof)
    assert ok, msg
