"""Scan-bodied sumcheck provers must emit bit-identical streams to the
unrolled provers (they are the compile-time-friendly execution of the same
math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.tensor import fr_ops


def _rand(key, n):
    return fr.mont(fr_ops.random_fr(jax.random.PRNGKey(key), n))


@pytest.mark.parametrize("n", [2, 8, 64, 37])  # incl. non-pow2 (padded)
def test_ip_scan_matches_unrolled(n):
    a, b = _rand(0, n), _rand(1, n)
    r = fr_ops.ceil_log2(n)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(2), r))
    p1, f1 = jax.jit(sc.inner_product_prove)(a, b, u)
    p2, f2 = jax.jit(sc.inner_product_prove_scan)(a, b, u)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(f1) == np.asarray(f2)).all()


@pytest.mark.parametrize("n", [2, 16, 64])
def test_hp_scan_matches_unrolled(n):
    a, b = _rand(3, n), _rand(4, n)
    r = fr_ops.ceil_log2(n)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(5), r))
    v = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(6), r))
    p1, f1 = jax.jit(sc.hadamard_prove)(a, b, u, v)
    p2, f2 = jax.jit(sc.hadamard_prove_scan)(a, b, u, v)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(f1) == np.asarray(f2)).all()


@pytest.mark.parametrize("n", [2, 16, 64])
def test_bin_scan_matches_unrolled(n):
    bits = jax.random.bernoulli(jax.random.PRNGKey(7), 0.5, (n,))
    a = fr.select(bits, fr.ones_mont((n,)), fr.zeros((n,)))
    r = fr_ops.ceil_log2(n)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(8), r))
    v = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(9), r))
    p1, f1 = jax.jit(sc.binary_prove)(a, u, v)
    p2, f2 = jax.jit(sc.binary_prove_scan)(a, u, v)
    assert (np.asarray(p1) == np.asarray(p2)).all()
    assert (np.asarray(f1) == np.asarray(f2)).all()
