"""planar.py vs the trusted (n, 8) field implementation: bit-identical results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, planar
from zkdl_tpu.tensor import fr_ops


@pytest.fixture(autouse=True)
def force_digit_path(monkeypatch):
    # On CPU the public ops fall back to mp.py; these tests target the
    # digit-planar implementations themselves, so force them. Fresh jax.jit
    # wrappers are used everywhere below, so no stale jit caches are hit.
    monkeypatch.setattr(planar, "FORCE_XLA_PLANAR", True)


@pytest.fixture(scope="module")
def vecs():
    key = jax.random.PRNGKey(7)
    a = fr.mont(fr_ops.random_fr(key, 300))
    b = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(8), 300))
    return np.asarray(a), np.asarray(b)


def test_roundtrip(vecs):
    a, _ = vecs
    ap = planar.to_planar(jnp.asarray(a))
    assert np.array_equal(np.asarray(planar.from_planar(ap)), a)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg", "double"])
def test_elementwise_matches_fr(vecs, op):
    a, b = vecs
    ap, bp = planar.to_planar(jnp.asarray(a)), planar.to_planar(jnp.asarray(b))
    if op in ("neg", "double"):
        got = planar.from_planar(jax.jit(getattr(planar, op))(ap))
        exp = getattr(fr, op)(jnp.asarray(a))
    else:
        got = planar.from_planar(jax.jit(getattr(planar, op))(ap, bp))
        exp = getattr(fr, op)(jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(np.asarray(got), np.asarray(exp)), op


def test_mul_scalar(vecs):
    a, b = vecs
    ap = planar.to_planar(jnp.asarray(a))
    s = jnp.asarray(b[3])
    got = planar.from_planar(jax.jit(planar.mul_scalar)(ap, s))
    exp = fr.mul(jnp.asarray(a), jnp.broadcast_to(s, a.shape))
    assert np.array_equal(np.asarray(got), np.asarray(exp))


@pytest.mark.parametrize("n", [1, 5, 300, 8192, 8193])
def test_dot_matches_mul_sum(n):
    a = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(n), n))
    b = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(n + 1), n))
    got = jax.jit(planar.dot)(planar.to_planar(a), planar.to_planar(b))
    exp = fr_ops.fr_sum(fr.mul(a, b))
    assert np.array_equal(np.asarray(got), np.asarray(exp)), n


@pytest.mark.parametrize("n", [1, 300, 8192, 8200])
def test_masked_sum(n):
    w = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(n), n))
    mask = jax.random.bernoulli(jax.random.PRNGKey(n + 5), shape=(n,))
    got = jax.jit(planar.masked_sum)(mask, planar.to_planar(w))
    exp = fr_ops.fr_sum(fr.select(mask, w, fr.zeros((n,))))
    assert np.array_equal(np.asarray(got), np.asarray(exp)), n


def test_mont_roundtrip(vecs):
    a, _ = vecs
    ap = planar.to_planar(jnp.asarray(a))
    raw = jax.jit(planar.from_mont)(ap)
    back = jax.jit(planar.to_mont)(raw)
    assert np.array_equal(np.asarray(back), np.asarray(ap))


def test_tree_sum(vecs):
    a, _ = vecs
    got = jax.jit(planar.tree_sum)(planar.to_planar(jnp.asarray(a)))
    exp = fr_ops.fr_sum(jnp.asarray(a))
    assert np.array_equal(np.asarray(got), np.asarray(exp))
