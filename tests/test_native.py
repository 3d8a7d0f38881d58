"""Cross-checks of the native C++ host library against the Python oracle."""

import random

import pytest

from zkdl_tpu import native
from zkdl_tpu.curve import host_g1
from zkdl_tpu.field import host

HF = host.fr


@pytest.fixture(scope="module")
def L():
    lib = native.lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_fr_mont_mul(L):
    rng = random.Random(0)
    a = [rng.randrange(HF.p) for _ in range(32)]
    b = [rng.randrange(HF.p) for _ in range(32)]
    got = native.fr_mont_mul_batch(a, b)
    want = [HF.mul(x, y) for x, y in zip(a, b)]
    assert got == want


def test_g1_scalar_mul_matches_python(L):
    rng = random.Random(1)
    g = host_g1.GENERATOR
    pts = [(g.x, g.y, g.z)]
    ks = [rng.randrange(1 << 256)]
    # a couple of non-generator points too
    p2 = host_g1._scalar_mul_py(g, 12345)
    pts.append((p2.x, p2.y, p2.z))
    ks.append(rng.randrange(1 << 255))
    got = native.g1_scalar_mul_batch(pts, ks)
    for (x, y, z), k, pt in zip(got, ks, [g, p2]):
        want = host_g1._scalar_mul_py(pt, k)
        assert host_g1.eq_points(host_g1.JacPoint(x, y, z), want)


def test_g1_identity_and_edge_cases(L):
    g = host_g1.GENERATOR
    zero = native.g1_scalar_mul_batch([(g.x, g.y, g.z)], [0])[0]
    assert host_g1.JacPoint(*zero).is_identity()
    one = native.g1_scalar_mul_batch([(g.x, g.y, g.z)], [1])[0]
    assert host_g1.eq_points(host_g1.JacPoint(*one), g)
    # group order * G == identity
    from zkdl_tpu.field.fr import P_INT as ORDER

    o = native.g1_scalar_mul_batch([(g.x, g.y, g.z)], [ORDER])[0]
    assert host_g1.JacPoint(*o).is_identity()


def test_g1_sum_and_msm(L):
    g = host_g1.GENERATOR
    pts_py = [host_g1._scalar_mul_py(g, k) for k in (3, 5, 9)]
    pts = [(p.x, p.y, p.z) for p in pts_py]
    s = native.g1_sum(pts)
    want = host_g1._scalar_mul_py(g, 17)
    assert host_g1.eq_points(host_g1.JacPoint(*s), want)

    m = native.g1_msm(pts, [2, 3, 1])  # 6 + 15 + 9 = 30
    want = host_g1._scalar_mul_py(g, 30)
    assert host_g1.eq_points(host_g1.JacPoint(*m), want)
    assert native.g1_eq(m, (want.x, want.y, want.z))


def test_g1_add_batch_mixed_identity(L):
    g = host_g1.GENERATOR
    idp = (0, 0, 0)
    gp = (g.x, g.y, g.z)
    res = native.g1_add_batch([idp, gp, gp], [gp, idp, gp])
    assert host_g1.eq_points(host_g1.JacPoint(*res[0]), g)
    assert host_g1.eq_points(host_g1.JacPoint(*res[1]), g)
    want2 = host_g1._scalar_mul_py(g, 2)
    assert host_g1.eq_points(host_g1.JacPoint(*res[2]), want2)
