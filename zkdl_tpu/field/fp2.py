"""BLS12-381 quadratic extension field Fp2 = Fp[u]/(u^2 + 1), TPU-native.

Functional parity with the reference's `blstrs__fp2__Fp2` family
(/root/reference/bls12-381.cuh:323-352, /root/reference/bls12-381.cu:1018-1069):
eq/add/sub/double/mul/sqr over c0 + u*c1 pairs, plus inv (needed by the G2
test oracle; the reference leaves inversion host-side). Elements are
`Fp2(c0, c1)` NamedTuples of uint32[..., 12] Montgomery Fp limb tensors, so
every op vmaps/shards transparently like the rest of the field stack.

The reference instantiates this tower only for its (dead) G2/multiexp kernels;
it is rebuilt here for inventory completeness and as the base layer of
curve/g2.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import fp

P_INT = fp.P_INT


class Fp2(NamedTuple):
    """c0 + u * c1 with u^2 = -1 (p = 3 mod 4 makes -1 a non-residue)."""

    c0: jax.Array  # uint32[..., 12] Montgomery
    c1: jax.Array

    @property
    def shape(self):
        return self.c0.shape[:-1]


def zeros(shape=()) -> Fp2:
    return Fp2(fp.zeros(shape), fp.zeros(shape))


def ones_mont(shape=()) -> Fp2:
    return Fp2(fp.ones_mont(shape), fp.zeros(shape))


def is_zero(a: Fp2) -> jax.Array:
    return fp.is_zero(a.c0) & fp.is_zero(a.c1)


def eq(a: Fp2, b: Fp2) -> jax.Array:
    return fp.eq(a.c0, b.c0) & fp.eq(a.c1, b.c1)


def select(pred: jax.Array, a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp.select(pred, a.c0, b.c0), fp.select(pred, a.c1, b.c1))


def add(a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp.add(a.c0, b.c0), fp.add(a.c1, b.c1))


def sub(a: Fp2, b: Fp2) -> Fp2:
    return Fp2(fp.sub(a.c0, b.c0), fp.sub(a.c1, b.c1))


def neg(a: Fp2) -> Fp2:
    return Fp2(fp.neg(a.c0), fp.neg(a.c1))


def double(a: Fp2) -> Fp2:
    return Fp2(fp.double(a.c0), fp.double(a.c1))


def mul(a: Fp2, b: Fp2) -> Fp2:
    """Karatsuba over the tower (bls12-381.cu:1040-1051): 3 Fp muls."""
    v0 = fp.mul(a.c0, b.c0)
    v1 = fp.mul(a.c1, b.c1)
    c1 = fp.mul(fp.add(a.c0, a.c1), fp.add(b.c0, b.c1))
    return Fp2(fp.sub(v0, v1), fp.sub(fp.sub(c1, v0), v1))


def sqr(a: Fp2) -> Fp2:
    """Complex squaring (bls12-381.cu:1054-1063): 2 Fp muls."""
    ab = fp.mul(a.c0, a.c1)
    t = fp.mul(fp.add(a.c0, a.c1), fp.sub(a.c0, a.c1))
    return Fp2(t, fp.double(ab))


def conj(a: Fp2) -> Fp2:
    return Fp2(a.c0, fp.neg(a.c1))


def mul_by_fp(a: Fp2, s: jax.Array) -> Fp2:
    return Fp2(fp.mul(a.c0, s), fp.mul(a.c1, s))


def inv(a: Fp2) -> Fp2:
    """1/a = conj(a) / norm(a); the Fp inversion is a Fermat power (host-free,
    but expensive — test/verifier use only, like fr.pow_static)."""
    norm = fp.add(fp.sqr(a.c0), fp.sqr(a.c1))
    ninv = fp.pow_static(norm, P_INT - 2)
    return mul_by_fp(conj(a), ninv)


def from_ints(x0: int, x1: int, shape=()) -> Fp2:
    """Host: value pair -> broadcast Montgomery Fp2 tensor."""
    from . import mp

    c0 = jnp.broadcast_to(
        jnp.asarray(mp.limbs_from_int(x0 * fp.SPEC.r % P_INT, 12)), (*shape, 12))
    c1 = jnp.broadcast_to(
        jnp.asarray(mp.limbs_from_int(x1 * fp.SPEC.r % P_INT, 12)), (*shape, 12))
    return Fp2(c0, c1)


def to_ints(a: Fp2) -> tuple[int, int]:
    """Host: one Fp2 element (shape ()) -> canonical value pair."""
    return (fp.to_int(a.c0) * fp.SPEC.r_inv % P_INT,
            fp.to_int(a.c1) * fp.SPEC.r_inv % P_INT)


# ---------------------------------------------------------------------------
# host oracle (python ints; trusted reference for tests + point finding)
# ---------------------------------------------------------------------------


class HostFp2:
    """Fp2 on (int, int) value pairs mod p — the test oracle."""

    p = P_INT

    @staticmethod
    def add(a, b):
        return ((a[0] + b[0]) % P_INT, (a[1] + b[1]) % P_INT)

    @staticmethod
    def sub(a, b):
        return ((a[0] - b[0]) % P_INT, (a[1] - b[1]) % P_INT)

    @staticmethod
    def neg(a):
        return ((-a[0]) % P_INT, (-a[1]) % P_INT)

    @staticmethod
    def mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % P_INT,
                (a[0] * b[1] + a[1] * b[0]) % P_INT)

    @classmethod
    def sqr(cls, a):
        return cls.mul(a, a)

    @classmethod
    def pow(cls, a, e: int):
        result = (1, 0)
        base = a
        while e:
            if e & 1:
                result = cls.mul(result, base)
            base = cls.sqr(base)
            e >>= 1
        return result

    @staticmethod
    def inv(a):
        norm = (a[0] * a[0] + a[1] * a[1]) % P_INT
        ninv = pow(norm, P_INT - 2, P_INT)
        return ((a[0] * ninv) % P_INT, (-a[1] * ninv) % P_INT)

    @classmethod
    def sqrt(cls, a):
        """Square root for p = 3 mod 4 (Adj-Rodriguez); None if a is a
        non-residue."""
        if a == (0, 0):
            return (0, 0)
        a1 = cls.pow(a, (P_INT - 3) // 4)
        x0 = cls.mul(a1, a)
        alpha = cls.mul(a1, x0)  # a^((p-1)/2)
        if alpha == ((P_INT - 1) % P_INT, 0):
            x = cls.mul((0, 1), x0)
        else:
            b = cls.pow(cls.add((1, 0), alpha), (P_INT - 1) // 2)
            x = cls.mul(b, x0)
        return x if cls.sqr(x) == a else None


host = HostFp2()
