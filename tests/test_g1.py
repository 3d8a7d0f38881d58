"""G1 curve op tests: generator sanity, formulas vs python-int oracle,
scalar-mul bit-exactness (same double/add order as reference), group laws."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.curve import convert, g1, host_g1
from zkdl_tpu.field import fp, fr, mp


def test_generator_constants():
    # the Montgomery-form generator in g1-tensor.cuh:29-63 must decode to the
    # standard BLS12-381 generator and lie on y^2 = x^3 + 4
    gen = convert.jac_from_device(g1.generator((1,)))[0]
    assert host_g1.on_curve(gen)
    assert host_g1.to_affine(gen) == (host_g1.GEN_X, host_g1.GEN_Y)


def rand_points(n, seed=7):
    rnd = random.Random(seed)
    pts = [host_g1.scalar_mul(host_g1.GENERATOR, rnd.randrange(fr.P_INT)) for _ in range(n)]
    return pts


def test_double_add_vs_oracle():
    pts = rand_points(4)
    dev = convert.jac_to_device(pts)
    doubled = convert.jac_from_device(jax.jit(g1.double)(dev))
    for got, pt in zip(doubled, pts):
        assert host_g1.eq_points(got, host_g1.double(pt))

    others = rand_points(4, seed=8)
    dev2 = convert.jac_to_device(others)
    added = convert.jac_from_device(jax.jit(g1.add)(dev, dev2))
    for got, a, b in zip(added, pts, others):
        assert host_g1.eq_points(got, host_g1.add(a, b))


def test_add_edge_cases():
    pts = rand_points(3)
    dev = convert.jac_to_device(pts)
    idn = g1.identity((3,))
    # O + p = p ; p + O = p
    got = convert.jac_from_device(jax.jit(g1.add)(idn, dev))
    for g, p in zip(got, pts):
        assert host_g1.eq_points(g, p)
    got = convert.jac_from_device(jax.jit(g1.add)(dev, idn))
    for g, p in zip(got, pts):
        assert host_g1.eq_points(g, p)
    # p + p = double(p)
    got = convert.jac_from_device(jax.jit(g1.add)(dev, dev))
    for g, p in zip(got, pts):
        assert host_g1.eq_points(g, host_g1.double(p))
    # p + (-p) = O
    got = convert.jac_from_device(jax.jit(g1.add)(dev, g1.neg(dev)))
    for g in got:
        assert g.is_identity()


def test_add_mixed():
    pts = rand_points(3)
    dev = convert.jac_to_device(pts)
    aff = g1.G1Affine(*[jnp.broadcast_to(a, (3, 12)) for a in (jnp.asarray(g1.GEN_X_MONT), jnp.asarray(g1.GEN_Y_MONT))])
    got = convert.jac_from_device(jax.jit(g1.add_mixed)(dev, aff))
    for g, p in zip(got, pts):
        assert host_g1.eq_points(g, host_g1.add(p, host_g1.GENERATOR))


def test_scalar_mul_bit_exact():
    # identical double/add order as reference => identical Jacobian coordinates
    ks = [0, 1, 2, 12345, fr.P_INT - 1]
    scal = jnp.asarray(np.stack([mp.limbs_from_int(k, 8) for k in ks]))
    base = convert.jac_to_device([host_g1.GENERATOR] * len(ks))
    got = convert.jac_from_device(jax.jit(g1.scalar_mul)(base, scal))
    for g, k in zip(got, ks):
        exp = host_g1.scalar_mul(host_g1.GENERATOR, k)
        assert (g.x, g.y, g.z) == (exp.x, exp.y, exp.z), k  # coordinate-exact


def test_scalar_mul_windowed_group_equal():
    ks = [3, 65537, fr.P_INT // 3]
    scal = jnp.asarray(np.stack([mp.limbs_from_int(k, 8) for k in ks]))
    base = convert.jac_to_device([host_g1.GENERATOR] * len(ks))
    got = convert.jac_from_device(jax.jit(g1.scalar_mul_windowed)(base, scal))
    for g, k in zip(got, ks):
        assert host_g1.eq_points(g, host_g1.scalar_mul(host_g1.GENERATOR, k)), k


def test_g1_sum():
    pts = rand_points(5)
    dev = convert.jac_to_device(pts)
    got = convert.jac_from_device(jax.jit(g1.g1_sum)(dev))[0]
    exp = host_g1.IDENTITY
    for p in pts:
        exp = host_g1.add(exp, p)
    assert host_g1.eq_points(got, exp)


def test_g1_me_eval():
    pts = rand_points(4)
    dev = convert.jac_to_device(pts)
    us = [random.randrange(fr.P_INT) for _ in range(2)]
    u_mont = jnp.asarray(fr.from_ints(us, mont_form=True))
    got = convert.jac_from_device(jax.jit(g1.me_eval)(dev, u_mont))[0]
    # oracle fold: a0 + u*(a1-a0) over points
    cur = pts
    for u in us:
        nxt = []
        for i in range(len(cur) // 2):
            d = host_g1.add(cur[2 * i + 1], host_g1.neg(cur[2 * i]))
            nxt.append(host_g1.add(cur[2 * i], host_g1.scalar_mul(d, u)))
        cur = nxt
    assert host_g1.eq_points(got, cur[0])


def test_generator_pow_comb_matches_double_and_add():
    import jax

    from zkdl_tpu.curve import convert, g1, host_g1
    from zkdl_tpu.tensor import fr_ops

    scalars = fr_ops.random_fr(jax.random.PRNGKey(123), 4)
    comb = g1.generator_pow_jit(scalars)
    ref = g1.scalar_mul_jit(g1.generator((4,)), scalars)
    for a, b in zip(convert.jac_from_device(comb), convert.jac_from_device(ref)):
        assert host_g1.eq_points(a, b)


def test_glv_decompose():
    rng = random.Random(5)
    scalars = [rng.randrange(fr.P_INT) for _ in range(6)]
    scal = jnp.asarray(fr.from_ints(scalars))
    s1, s2 = jax.jit(g1.glv_decompose)(scal)
    s1i = fr.to_ints(np.asarray(s1))
    s2i = fr.to_ints(np.asarray(s2))
    for s, a, b in zip(scalars, s1i, s2i):
        assert a + g1._LAMBDA_INT * b == s, (s, a, b)
        assert a < g1._LAMBDA_INT and b <= s // g1._LAMBDA_INT


def test_scalar_mul_glv_group_equal():
    rng = random.Random(6)
    scalars = [rng.randrange(fr.P_INT) for _ in range(3)] + [0, 1, g1._LAMBDA_INT]
    base = g1.generator((len(scalars),))
    scal = jnp.asarray(fr.from_ints(scalars))
    got = convert.affine_from_device(jax.jit(g1.scalar_mul_glv)(base, scal))
    for s, aff in zip(scalars, got):
        want = host_g1.to_affine(host_g1.scalar_mul(host_g1.GENERATOR, s))
        assert aff == want, s


def test_endomorphism_is_lambda():
    P = g1.generator((1,))
    phi = convert.affine_from_device(g1.endomorphism(P))[0]
    want = host_g1.to_affine(host_g1.scalar_mul(host_g1.GENERATOR, g1._LAMBDA_INT))
    assert phi == want
