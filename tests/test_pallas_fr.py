"""Pallas Fr kernels (interpret mode on CPU) match the XLA planar ops bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, pallas_fr as pf, planar
from zkdl_tpu.tensor import fr_ops


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("ZKDL_PALLAS_INTERPRET", "1")


def _planar_rand(n, seed):
    return planar.to_planar(fr.mont(fr_ops.random_fr(jax.random.PRNGKey(seed), n)))


@pytest.mark.parametrize("n", [100, pf.BLOCK, pf.BLOCK + 37])
def test_mul_kernel(n):
    a, b = _planar_rand(n, 0), _planar_rand(n, 1)
    got = pf.mul(a, b)
    exp = planar.mul(a, b)
    assert np.array_equal(np.asarray(got), np.asarray(exp)), n


def test_mul_scalar_kernel():
    n = 500
    a = _planar_rand(n, 2)
    s = _planar_rand(1, 3)[:, 0]
    got = pf.mul_scalar(a, s)
    exp = planar.mul_scalar(a, s)
    assert np.array_equal(np.asarray(got), np.asarray(exp))


@pytest.mark.parametrize("n", [64, pf.BLOCK, 2 * pf.BLOCK + 11])
def test_dot_kernel(n):
    a, b = _planar_rand(n, 4), _planar_rand(n, 5)
    got = pf.dot(a, b)
    exp = planar.dot(a, b)
    assert np.array_equal(np.asarray(got), np.asarray(exp)), n


def test_dot_many():
    n = 300
    pairs = [(_planar_rand(n, 6 + i), _planar_rand(n, 60 + i)) for i in range(3)]
    got = pf.dot_many(pairs)
    exp = jnp.stack([planar.dot(a, b) for a, b in pairs], axis=1)
    assert np.array_equal(np.asarray(got), np.asarray(exp))
