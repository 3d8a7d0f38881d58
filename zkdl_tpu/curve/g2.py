"""BLS12-381 G2 point tensors (curve over Fp2), TPU-native.

Functional parity with the reference's `blstrs__g2__G2Affine` family
(/root/reference/bls12-381.cuh:377-411, /root/reference/bls12-381.cu:1154-1257):
Jacobian double/add/add_mixed over the twist E': y^2 = x^3 + 4(1+u), plus the
multiexp building blocks (batched scalar-mul + tree reduction standing in for
the bucketed kernel, exactly as curve/g1.py does for G1 — see the PARITY.md
L0 note on why serialized bucket scatter maps poorly to XLA).

The reference never instantiates G2 (its live protocol is G1-only, SURVEY.md
§0.5); like there, no generator constant is baked in. Curve points for tests
come from `find_point` (deterministic try-and-increment + Fp2 square root on
the host oracle). Pairings are out of scope for both systems.

All formulas are the same EFD dbl-2009-l / add-2007-bl / madd-2007-bl used by
G1, instantiated over fp2 — identical structure, field swapped; edge cases are
branchless selects as everywhere in this codebase.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp2
from ..field.fp2 import Fp2, host as hfp2


class G2Jac(NamedTuple):
    """Jacobian point tensor over Fp2; z == 0 encodes the identity."""

    x: Fp2
    y: Fp2
    z: Fp2

    @property
    def shape(self):
        return self.x.c0.shape[:-1]


class G2Affine(NamedTuple):
    x: Fp2
    y: Fp2


B_COEFF = (4, 4)  # 4(1 + u): the M-twist constant (bls12-381 spec)


def identity(shape=()) -> G2Jac:
    return G2Jac(fp2.zeros(shape), fp2.zeros(shape), fp2.zeros(shape))


def is_identity(p: G2Jac) -> jax.Array:
    return fp2.is_zero(p.z)


def neg(p: G2Jac) -> G2Jac:
    return G2Jac(p.x, fp2.neg(p.y), p.z)


def select(pred: jax.Array, a: G2Jac, b: G2Jac) -> G2Jac:
    return G2Jac(fp2.select(pred, a.x, b.x), fp2.select(pred, a.y, b.y),
                 fp2.select(pred, a.z, b.z))


def double(p: G2Jac) -> G2Jac:
    """dbl-2009-l over Fp2 (cf. bls12-381.cu:1155-1181 / curve/g1.py:89)."""
    a = fp2.sqr(p.x)
    b = fp2.sqr(p.y)
    c = fp2.sqr(b)
    d = fp2.sqr(fp2.add(p.x, b))
    d = fp2.double(fp2.sub(fp2.sub(d, a), c))
    e = fp2.add(fp2.double(a), a)
    f = fp2.sqr(e)
    z3 = fp2.double(fp2.mul(p.y, p.z))
    x3 = fp2.sub(fp2.sub(f, d), d)
    c8 = fp2.double(fp2.double(fp2.double(c)))
    y3 = fp2.sub(fp2.mul(fp2.sub(d, x3), e), c8)
    return select(is_identity(p), p, G2Jac(x3, y3, z3))


def add(p: G2Jac, q: G2Jac) -> G2Jac:
    """add-2007-bl over Fp2, branchless edge cases (bls12-381.cu:1227-1257)."""
    z1z1 = fp2.sqr(p.z)
    z2z2 = fp2.sqr(q.z)
    u1 = fp2.mul(p.x, z2z2)
    u2 = fp2.mul(q.x, z1z1)
    s1 = fp2.mul(fp2.mul(p.y, q.z), z2z2)
    s2 = fp2.mul(fp2.mul(q.y, p.z), z1z1)

    h = fp2.sub(u2, u1)
    i = fp2.sqr(fp2.double(h))
    j = fp2.mul(h, i)
    r = fp2.double(fp2.sub(s2, s1))
    v = fp2.mul(u1, i)
    x3 = fp2.sub(fp2.sub(fp2.sub(fp2.sqr(r), j), v), v)
    y3 = fp2.sub(fp2.mul(fp2.sub(v, x3), r), fp2.double(fp2.mul(s1, j)))
    z3 = fp2.mul(fp2.sub(fp2.sub(fp2.sqr(fp2.add(p.z, q.z)), z1z1), z2z2), h)
    generic = G2Jac(x3, y3, z3)

    same = fp2.eq(u1, u2) & fp2.eq(s1, s2)
    out = select(same, double(p), generic)
    out = select(is_identity(q), p, out)
    out = select(is_identity(p), q, out)
    return out


def add_mixed(p: G2Jac, q: G2Affine) -> G2Jac:
    """madd-2007-bl over Fp2 (bls12-381.cu:1184-1224)."""
    z1z1 = fp2.sqr(p.z)
    u2 = fp2.mul(q.x, z1z1)
    s2 = fp2.mul(fp2.mul(q.y, p.z), z1z1)

    h = fp2.sub(u2, p.x)
    hh = fp2.sqr(h)
    i = fp2.double(fp2.double(hh))
    j = fp2.mul(h, i)
    r = fp2.double(fp2.sub(s2, p.y))
    v = fp2.mul(p.x, i)
    x3 = fp2.sub(fp2.sub(fp2.sqr(r), j), fp2.double(v))
    y3 = fp2.sub(fp2.mul(fp2.sub(v, x3), r), fp2.double(fp2.mul(p.y, j)))
    z3 = fp2.sub(fp2.sub(fp2.sqr(fp2.add(p.z, h)), z1z1), hh)
    generic = G2Jac(x3, y3, z3)

    shape = p.shape
    lifted = G2Jac(
        Fp2(jnp.broadcast_to(q.x.c0, p.x.c0.shape), jnp.broadcast_to(q.x.c1, p.x.c1.shape)),
        Fp2(jnp.broadcast_to(q.y.c0, p.y.c0.shape), jnp.broadcast_to(q.y.c1, p.y.c1.shape)),
        fp2.ones_mont(shape),
    )
    same = fp2.eq(p.x, u2) & fp2.eq(p.y, s2)
    out = select(same, double(p), generic)
    out = select(is_identity(p), lifted, out)
    return out


def _scalar_bits(scalar: jax.Array) -> jax.Array:
    """(…, 8) u32 -> (…, 256) bits, LSB first (shared with g1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (scalar[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*scalar.shape[:-1], 256)


def scalar_mul(p: G2Jac, scalar: jax.Array) -> G2Jac:
    """LSB-first 256-bit double-and-add, matching G1Jacobian_mul's orbit
    (g1-tensor.cu:422-431) for cross-checks with the G2 multiexp bases."""
    bits = _scalar_bits(scalar)
    acc = identity(p.shape)

    def body(i, carry):
        acc, base = carry
        take = bits[..., i] == 1
        acc = select(take, add(acc, base), acc)
        return acc, double(base)

    acc, _ = jax.lax.fori_loop(0, 256, body, (acc, p))
    return acc


scalar_mul_jit = jax.jit(scalar_mul)


def g2_sum(p: G2Jac) -> G2Jac:
    """Pairwise tree reduction along the leading axis (the multiexp
    accumulation step; cf. curve/g1.py:g1_sum)."""
    n = p.x.c0.shape[0]
    while n > 1:
        if n % 2:
            pad = identity((1,))
            p = G2Jac(
                Fp2(jnp.concatenate([p.x.c0, pad.x.c0]), jnp.concatenate([p.x.c1, pad.x.c1])),
                Fp2(jnp.concatenate([p.y.c0, pad.y.c0]), jnp.concatenate([p.y.c1, pad.y.c1])),
                Fp2(jnp.concatenate([p.z.c0, pad.z.c0]), jnp.concatenate([p.z.c1, pad.z.c1])),
            )
            n += 1
        half = G2Jac(
            Fp2(p.x.c0[0::2], p.x.c1[0::2]), Fp2(p.y.c0[0::2], p.y.c1[0::2]),
            Fp2(p.z.c0[0::2], p.z.c1[0::2]))
        other = G2Jac(
            Fp2(p.x.c0[1::2], p.x.c1[1::2]), Fp2(p.y.c0[1::2], p.y.c1[1::2]),
            Fp2(p.z.c0[1::2], p.z.c1[1::2]))
        p = add(half, other)
        n = (n + 1) // 2
    return p


def msm(points: G2Jac, scalars: jax.Array) -> G2Jac:
    """sum_i scalars_i * P_i — the G2 multiexp (bls12-381.cuh:408-417) as
    batched scalar-mul + tree reduce."""
    return g2_sum(scalar_mul(points, scalars))


# ---------------------------------------------------------------------------
# host-side curve points (tests / bases)
# ---------------------------------------------------------------------------


def _on_curve_host(x, y) -> bool:
    rhs = hfp2.add(hfp2.mul(hfp2.sqr(x), x), B_COEFF)
    return hfp2.sqr(y) == rhs


@functools.lru_cache(maxsize=None)
def find_point_host(seed: int) -> tuple[tuple[int, int], tuple[int, int]]:
    """Deterministic try-and-increment: first x = (seed + k) + seed*u whose
    RHS is a square. Returns affine (x, y) value pairs (NOT subgroup-reduced;
    like the reference, no protocol here needs the r-torsion subgroup)."""
    k = 0
    while True:
        x = ((seed + k) % fp2.P_INT, seed % fp2.P_INT)
        rhs = hfp2.add(hfp2.mul(hfp2.sqr(x), x), B_COEFF)
        y = hfp2.sqrt(rhs)
        if y is not None:
            assert _on_curve_host(x, y)
            return x, y
        k += 1


def affine_from_host(xy, shape=()) -> G2Affine:
    (x, y) = xy
    return G2Affine(fp2.from_ints(*x, shape), fp2.from_ints(*y, shape))


def jac_from_host(xy, shape=()) -> G2Jac:
    aff = affine_from_host(xy, shape)
    return G2Jac(aff.x, aff.y, fp2.ones_mont(shape))


def to_affine_host(p: G2Jac) -> tuple[tuple[int, int], tuple[int, int]] | None:
    """One device point -> host affine values (None for the identity)."""
    z = fp2.to_ints(p.z)
    if z == (0, 0):
        return None
    x, y = fp2.to_ints(p.x), fp2.to_ints(p.y)
    zi = hfp2.inv(z)
    zi2 = hfp2.sqr(zi)
    return hfp2.mul(x, zi2), hfp2.mul(y, hfp2.mul(zi2, zi))
