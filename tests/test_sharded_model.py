"""Full-model sharded prover: bit-identical proof streams at n_dev in {2,4,8},
sharded commitment partial sums, sharded protocol kernels (SURVEY §7 stage 7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.commit import pedersen
from zkdl_tpu.field import fr
from zkdl_tpu.models import mlp, quantize, zkrelu
from zkdl_tpu.parallel import model as pmodel
from zkdl_tpu.parallel import sharded
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.sumcheck.transcript import SeededRng
from zkdl_tpu.tensor import fr_ops


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(11)
    dims = [8, 8, 8]
    weights = [
        (rng.standard_normal((dims[i], dims[i + 1])) * 0.4).astype(np.float32)
        for i in range(len(dims) - 1)
    ]
    model = mlp.MLP.from_float_weights(weights, jax.random.PRNGKey(0))
    X = fr.mont(quantize.load_input(rng.standard_normal((8, dims[0])).astype(np.float32)))
    return model, X


def _tree_equal(a, b, path=""):
    if dataclasses.is_dataclass(a):
        for f in dataclasses.fields(a):
            _tree_equal(getattr(a, f.name), getattr(b, f.name), path + "." + f.name)
        return
    if a is None or b is None:
        assert a is None and b is None, path
        return
    if isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
        return
    assert np.array_equal(np.asarray(a), np.asarray(b)), path


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_model_prove_stream_identical(tiny, n_dev, monkeypatch):
    model, X = tiny
    mesh = sharded.make_mesh(n_dev, (n_dev,), names=("dp",))

    monkeypatch.setattr(mlp, "USE_PLANAR_PROVER", False)
    Y, Z, A, aux = model.infer(X)  # mont-tensor aux (zkrelu.forward)
    proof_ref = model.prove(X, Y, Z, A, aux, SeededRng(7), chain=False)
    proof_sh = pmodel.prove_sharded(model, X, Y, Z, A, aux, mesh, SeededRng(7))
    _tree_equal(proof_ref, proof_sh, "proof")
    ok, msg = model.verify(proof_sh)
    assert ok, msg


def test_sharded_binary_and_hadamard_kernels():
    mesh = sharded.make_mesh(4, (4,), names=("dp",))
    n = 64
    key = jax.random.PRNGKey(3)
    bits = fr.select(jax.random.bernoulli(key, shape=(n,)), fr.ones_mont((n,)), fr.zeros((n,)))
    r = fr_ops.ceil_log2(n)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(4), r))
    v = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(5), r))
    ref_p, ref_f = jax.jit(sc.binary_prove)(bits, u, v)
    sh_p, sh_f = pmodel.sharded_binary_prove(mesh, pmodel._shard(mesh, bits), u, v)
    assert np.array_equal(np.asarray(ref_p), np.asarray(sh_p))
    assert np.array_equal(np.asarray(ref_f), np.asarray(sh_f))

    a = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(6), n))
    b = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(7), n))
    ref_p, ref_f = jax.jit(sc.hadamard_prove)(a, b, u, v)
    sh_p, sh_f = pmodel.sharded_hadamard_prove(
        mesh, pmodel._shard(mesh, a), pmodel._shard(mesh, b), u, v
    )
    assert np.array_equal(np.asarray(ref_p), np.asarray(sh_p))
    assert np.array_equal(np.asarray(ref_f), np.asarray(sh_f))


def test_sharded_commit_partial_sums():
    mesh = sharded.make_mesh(4, (4,), names=("dp",))
    gens = pedersen.setup(jax.random.PRNGKey(8), 8)
    t = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(9), 8 * 8))  # m=8 rows
    ref = pedersen._commit_rows_fast(t.reshape(8, 8, 8), gens.dlogs)
    got = pmodel.sharded_commit_dlogs(mesh, pmodel._shard(mesh, t), gens.dlogs)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
