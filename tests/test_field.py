"""Field arithmetic unit tests vs the python-int oracle and reference constants.

The reference has no tests (SURVEY.md §4); these implement the field-layer test
pyramid: known constants (bls12-381.cu:3-11), algebraic identities, and random
cross-checks against trusted big-int arithmetic.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkdl_tpu.field import fr, fp, mp, host


@pytest.mark.parametrize("F,HF", [(fr, host.fr), (fp, host.fp)], ids=["Fr", "Fp"])
class TestField:
    def _rand(self, F, n):
        xs = [random.randrange(F.P_INT) for _ in range(n)]
        arr = np.stack([mp.limbs_from_int(x, F.N_LIMBS) for x in xs])
        return xs, jnp.asarray(arr)

    def test_add_sub_neg(self, F, HF):
        xs, ax = self._rand(F, 32)
        ys, ay = self._rand(F, 32)
        got = [mp.int_from_limbs(r) for r in np.asarray(F.add(ax, ay))]
        assert got == [(x + y) % F.P_INT for x, y in zip(xs, ys)]
        got = [mp.int_from_limbs(r) for r in np.asarray(F.sub(ax, ay))]
        assert got == [(x - y) % F.P_INT for x, y in zip(xs, ys)]
        got = [mp.int_from_limbs(r) for r in np.asarray(F.neg(ax))]
        assert got == [(-x) % F.P_INT for x in xs]

    def test_mont_mul(self, F, HF):
        xs, ax = self._rand(F, 32)
        ys, ay = self._rand(F, 32)
        got = [mp.int_from_limbs(r) for r in np.asarray(F.mul(ax, ay))]
        assert got == [HF.mul(x, y) for x, y in zip(xs, ys)]

    def test_mont_roundtrip(self, F, HF):
        xs, ax = self._rand(F, 16)
        m = F.mont(ax)
        got = [mp.int_from_limbs(r) for r in np.asarray(m)]
        assert got == [HF.mont(x) for x in xs]
        back = F.unmont(m)
        assert [mp.int_from_limbs(r) for r in np.asarray(back)] == xs

    def test_edge_values(self, F, HF):
        edge = [0, 1, F.P_INT - 1, F.P_INT - 2, (1 << (32 * F.N_LIMBS - 1)) % F.P_INT]
        arr = jnp.asarray(np.stack([mp.limbs_from_int(x, F.N_LIMBS) for x in edge]))
        got = [mp.int_from_limbs(r) for r in np.asarray(F.add(arr, arr))]
        assert got == [(2 * x) % F.P_INT for x in edge]
        got = [mp.int_from_limbs(r) for r in np.asarray(F.mul(arr, arr))]
        assert got == [HF.mul(x, x) for x in edge]

    def test_mul_identity_in_mont(self, F, HF):
        # mont(x) * mont(1) = mont(x)
        xs, ax = self._rand(F, 8)
        one_m = jnp.broadcast_to(jnp.asarray(F.ONE_MONT), ax.shape)
        got = np.asarray(F.mul(F.mont(ax), one_m))
        exp = np.asarray(F.mont(ax))
        assert (got == exp).all()

    def test_pow_static(self, F, HF):
        xs, ax = self._rand(F, 4)
        axm = F.mont(ax)
        got = [mp.int_from_limbs(r) for r in np.asarray(F.pow_static(axm, 5))]
        assert got == [HF.mont(pow(x, 5, F.P_INT)) for x in xs]


def test_fr_digits_roundtrip():
    xs = [random.randrange(fr.P_INT) for _ in range(8)]
    a = jnp.asarray(np.stack([mp.limbs_from_int(x, 8) for x in xs]))
    d = mp.to_digits(a)
    assert d.shape == (8, 16)
    assert (np.asarray(mp.from_digits(d)) == np.asarray(a)).all()


def test_gte():
    import jax

    pairs = [(0, 0), (1, 0), (0, 1), (fr.P_INT - 1, fr.P_INT - 1), (fr.P_INT - 1, fr.P_INT - 2), (1 << 200, (1 << 200) + 1)]
    a = jnp.asarray(np.stack([mp.limbs_from_int(x, 8) for x, _ in pairs]))
    b = jnp.asarray(np.stack([mp.limbs_from_int(y, 8) for _, y in pairs]))
    got = np.asarray(mp._gte(a, b))
    assert list(got) == [x >= y for x, y in pairs]
