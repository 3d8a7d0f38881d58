"""Planar provers emit bit-identical proof streams to the (n, 8) provers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, planar
from zkdl_tpu.sumcheck import planar_protocols as pp
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.tensor import fr_ops, planar_ops as pops


@pytest.fixture(autouse=True)
def small_tail(monkeypatch):
    # exercise planar rounds + the tail handoff even at unit-test sizes
    monkeypatch.setattr(pp, "TAIL_N", 16)


def _rand(n, seed):
    return fr.mont(fr_ops.random_fr(jax.random.PRNGKey(seed), n))


def _rand_u(r, seed):
    return fr.mont(fr_ops.random_fr(jax.random.PRNGKey(seed), r))


def _rand_bits(n, seed):
    return jax.random.bernoulli(jax.random.PRNGKey(seed), shape=(n,)).astype(jnp.uint32)


@pytest.mark.parametrize("r", [1, 3, 5, 8])
def test_inner_product_stream(r):
    n = 1 << r
    a, b = _rand(n, 1), _rand(n, 2)
    u = _rand_u(r, 3)
    exp_polys, exp_finals = sc.inner_product_prove(a, b, u)
    got_polys, got_finals = pp.inner_product_prove(
        pops.to_planar_rev(a, r), pops.to_planar_rev(b, r), u
    )
    assert np.array_equal(np.asarray(got_polys), np.asarray(exp_polys))
    assert np.array_equal(np.asarray(got_finals), np.asarray(exp_finals))


@pytest.mark.parametrize("r", [1, 2, 5, 8])
def test_binary_stream(r):
    n = 1 << r
    bits = _rand_bits(n, 4)
    mont_bits = fr.select(bits == 1, fr.ones_mont((n,)), fr.zeros((n,)))
    u, v = _rand_u(r, 5), _rand_u(r, 6)
    exp_polys, exp_final = sc.binary_prove(mont_bits, u, v)
    bits_rev = pops.bitrev_axis(bits, 0)
    got_polys, got_final = pp.binary_prove_bits(bits_rev, u, v)
    assert np.array_equal(np.asarray(got_polys), np.asarray(exp_polys))
    assert np.array_equal(np.asarray(got_final), np.asarray(exp_final))


@pytest.mark.parametrize("r", [1, 2, 5, 8])
def test_hadamard_stream(r):
    n = 1 << r
    a = _rand(n, 7)
    bits = _rand_bits(n, 8)
    mont_bits = fr.select(bits == 1, fr.ones_mont((n,)), fr.zeros((n,)))
    u, v = _rand_u(r, 9), _rand_u(r, 10)
    exp_polys, exp_finals = sc.hadamard_prove(a, mont_bits, u, v)
    got_polys, got_finals = pp.hadamard_prove_bits(
        pops.to_planar_rev(a, r), pops.bitrev_axis(bits, 0), u, v
    )
    assert np.array_equal(np.asarray(got_polys), np.asarray(exp_polys))
    assert np.array_equal(np.asarray(got_finals), np.asarray(exp_finals))


@pytest.mark.parametrize("r", [0, 1, 4])
def test_me_eval_rev(r):
    n = 1 << r
    t = _rand(n, 11)
    u = _rand_u(r, 12)
    exp = fr_ops.me_eval(t, u)
    got = pops.me_eval_rev(pops.to_planar_rev(t, r), u)
    assert np.array_equal(np.asarray(got), np.asarray(exp))
    got2 = pops.me_eval_rev_dot(pops.to_planar_rev(t, r), u)
    assert np.array_equal(np.asarray(got2), np.asarray(exp))


def test_eq_table_is_mle_weights():
    # dot(t, eq_table_rev(u)) == me_eval(t, u) for random t — the core identity
    r = 6
    t = _rand(1 << r, 13)
    u = _rand_u(r, 14)
    table = pops.eq_table_rev(u)
    got = planar.dot(pops.to_planar_rev(t, r), table)
    exp = fr_ops.me_eval(t, u)
    assert np.array_equal(np.asarray(got), np.asarray(exp))


def test_fold_half_matches_me_step():
    n = 64
    t = _rand(n, 15)
    x = _rand(1, 16)[0]
    exp = fr_ops.me_step(t, x)
    got = pops.from_planar_rev(pops.fold_half(pops.to_planar_rev(t, 6), x))
    assert np.array_equal(np.asarray(got), np.asarray(exp))


def test_inverse_scalar():
    x = _rand(1, 17)[0]
    inv = pops.inverse_scalar(x)
    prod = planar.mul(x[:, None], inv[:, None])[:, 0]
    one = planar.ones_mont(1)[:, 0]
    assert np.array_equal(np.asarray(prod), np.asarray(one))


def test_fused_planar_tails_stream_identical(monkeypatch):
    """The fused-tail jits must emit the exact per-round stream of the
    per-round path (and of the (n, 8) provers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zkdl_tpu.field import fr, planar
    from zkdl_tpu.sumcheck import planar_protocols as pp
    from zkdl_tpu.sumcheck import protocols as sc
    from zkdl_tpu.tensor import fr_ops
    from zkdl_tpu.tensor import planar_ops as pops

    monkeypatch.setenv("ZKDL_PLANAR_FUSE_N_CPU", "32")
    monkeypatch.setattr(pp, "TAIL_N", 0)

    n, r = 32, 5
    key = jax.random.PRNGKey(0)
    a = fr.mont(fr_ops.random_fr(key, n))
    b = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(1), n))
    bits = (np.arange(n) % 3 == 0).astype(np.uint32)
    u = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(2), r))
    v = fr.mont(fr_ops.random_fr(jax.random.PRNGKey(3), r))

    rev = pops.bitrev_indices(r)
    a_rev = planar.to_planar(a)[:, rev]
    b_rev = planar.to_planar(b)[:, rev]
    bits_rev = jnp.asarray(bits[rev])

    got_p, got_f = pp.inner_product_prove(a_rev, b_rev, u)
    want_p, want_f = sc.inner_product_prove(a, b, u)
    assert np.array_equal(np.asarray(got_p), np.asarray(want_p))
    assert np.array_equal(np.asarray(got_f), np.asarray(want_f))

    got_p, got_f = pp.binary_prove_bits(bits_rev, u, v)
    mont_bits = fr.select(jnp.asarray(bits) == 1, fr.ones_mont((n,)), fr.zeros((n,)))
    want_p, want_f = sc.binary_prove(mont_bits, u, v)
    assert np.array_equal(np.asarray(got_p), np.asarray(want_p))
    assert np.array_equal(np.asarray(got_f), np.asarray(want_f))

    got_p, got_f = pp.hadamard_prove_bits(a_rev, bits_rev, u, v)
    want_p, want_f = sc.hadamard_prove(a, mont_bits, u, v)
    assert np.array_equal(np.asarray(got_p), np.asarray(want_p))
    assert np.array_equal(np.asarray(got_f), np.asarray(want_f))
