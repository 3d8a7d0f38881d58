"""Fp2 / G2 / NTT: the reference's extension-tower and FFT surface
(bls12-381.cu:1018-1069, 1154-1257, 1075-1139 — dead code there, rebuilt for
inventory completeness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.curve import g2
from zkdl_tpu.field import fp2, fr, host
from zkdl_tpu.field.fp2 import host as hfp2
from zkdl_tpu.tensor import fft, fr_ops

pytestmark = pytest.mark.slow  # multi-minute XLA:CPU compiles; excluded from the smoke tier

HF = host.fr


def _rand_pairs(rng, n):
    return [(int(rng.integers(0, 1 << 62)) * 0x1234567 % fp2.P_INT,
             int(rng.integers(0, 1 << 62)) * 0x89ABCDE % fp2.P_INT)
            for _ in range(n)]


def test_fp2_device_matches_host_oracle():
    rng = np.random.default_rng(0)
    pairs = _rand_pairs(rng, 4)
    for a, b in zip(pairs[::2], pairs[1::2]):
        da, db = fp2.from_ints(*a), fp2.from_ints(*b)
        assert fp2.to_ints(fp2.add(da, db)) == hfp2.add(a, b)
        assert fp2.to_ints(fp2.sub(da, db)) == hfp2.sub(a, b)
        assert fp2.to_ints(fp2.mul(da, db)) == hfp2.mul(a, b)
        assert fp2.to_ints(fp2.sqr(da)) == hfp2.sqr(a)
        assert fp2.to_ints(fp2.mul(da, fp2.inv(da))) == (1, 0)


def test_fp2_host_sqrt():
    rng = np.random.default_rng(1)
    for a in _rand_pairs(rng, 3):
        sq = hfp2.sqr(a)
        root = hfp2.sqrt(sq)
        assert root is not None and hfp2.sqr(root) == sq


@pytest.fixture(scope="module")
def points():
    return g2.find_point_host(3), g2.find_point_host(11), g2.find_point_host(29)


def test_g2_double_vs_add(points):
    P = g2.jac_from_host(points[0])
    assert g2.to_affine_host(g2.add(P, P)) == g2.to_affine_host(g2.double(P))


def test_g2_add_associative_commutative(points):
    P, Q, R = (g2.jac_from_host(p) for p in points)
    lhs = g2.add(g2.add(P, Q), R)
    rhs = g2.add(P, g2.add(Q, R))
    assert g2.to_affine_host(lhs) == g2.to_affine_host(rhs)
    assert g2.to_affine_host(g2.add(P, Q)) == g2.to_affine_host(g2.add(Q, P))


def test_g2_identity_and_negation(points):
    P = g2.jac_from_host(points[0])
    O = g2.identity()
    assert g2.to_affine_host(g2.add(P, O)) == g2.to_affine_host(P)
    assert g2.to_affine_host(g2.add(P, g2.neg(P))) is None


def test_g2_add_mixed_matches_add(points):
    P = g2.jac_from_host(points[0])
    Q_aff = g2.affine_from_host(points[1])
    Q = g2.jac_from_host(points[1])
    assert g2.to_affine_host(g2.add_mixed(P, Q_aff)) == g2.to_affine_host(g2.add(P, Q))


def test_g2_scalar_mul_small(points):
    P = g2.jac_from_host(points[0])
    five = jnp.asarray(fr.from_ints([5]))[0]
    got = g2.scalar_mul_jit(P, five)
    want = g2.add(g2.double(g2.double(P)), P)
    assert g2.to_affine_host(got) == g2.to_affine_host(want)


def test_g2_msm(points):
    pts = [g2.jac_from_host(p, ()) for p in points[:2]]
    batch = g2.G2Jac(
        fp2.Fp2(jnp.stack([p.x.c0 for p in pts]), jnp.stack([p.x.c1 for p in pts])),
        fp2.Fp2(jnp.stack([p.y.c0 for p in pts]), jnp.stack([p.y.c1 for p in pts])),
        fp2.Fp2(jnp.stack([p.z.c0 for p in pts]), jnp.stack([p.z.c1 for p in pts])),
    )
    scalars = jnp.asarray(fr.from_ints([2, 3]))
    got = g2.msm(batch, scalars)
    P, Q = pts
    want = g2.add(g2.double(P), g2.add(g2.double(Q), Q))
    assert g2.to_affine_host(got) == g2.to_affine_host(want)


# ---------------------------------------------------------------------------
# NTT
# ---------------------------------------------------------------------------


def _rand_fr(rng, n):
    return fr.mont(jnp.asarray(fr.from_ints(
        [int(rng.integers(0, 1 << 61)) * 0xDEADBEEF % fr.P_INT for _ in range(n)])))


def test_ntt_roundtrip():
    rng = np.random.default_rng(2)
    x = _rand_fr(rng, 16)
    back = fft.intt(fft.ntt(x))
    assert fr.to_ints(np.asarray(back)) == fr.to_ints(np.asarray(x))


def test_ntt_matches_naive_dft():
    rng = np.random.default_rng(3)
    n = 8
    x = _rand_fr(rng, n)
    vals = [HF.unmont(v) for v in fr.to_ints(np.asarray(x))]
    w = fft._omega(3, False)
    naive = [sum(vals[j] * pow(w, i * j, fr.P_INT) for j in range(n)) % fr.P_INT
             for i in range(n)]
    got = [HF.unmont(v) for v in fr.to_ints(np.asarray(fft.ntt(x)))]
    assert got == naive


def test_poly_mul_matches_schoolbook():
    rng = np.random.default_rng(4)
    a_ints = [int(rng.integers(1, 1000)) for _ in range(5)]
    b_ints = [int(rng.integers(1, 1000)) for _ in range(4)]
    a = fr.mont(jnp.asarray(fr.from_ints(a_ints)))
    b = fr.mont(jnp.asarray(fr.from_ints(b_ints)))
    prod = fft.poly_mul(a, b)
    got = [HF.unmont(v) for v in fr.to_ints(np.asarray(prod))]
    want = [0] * (len(a_ints) + len(b_ints) - 1)
    for i, ai in enumerate(a_ints):
        for j, bj in enumerate(b_ints):
            want[i + j] += ai * bj
    want = [w % fr.P_INT for w in want] + [0] * (len(got) - len(want))
    assert got == want
