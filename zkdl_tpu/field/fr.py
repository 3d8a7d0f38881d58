"""BLS12-381 scalar field Fr, TPU-native.

Mirrors the reference's `blstrs__scalar__Scalar` family
(/root/reference/bls12-381.cuh:116-120, /root/reference/bls12-381.cu:3-6) in
semantics and in-memory limb layout: uint32[..., 8] little-endian limbs,
Montgomery form with R = 2^256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import mp

# p = 0x73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001
P_INT = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

SPEC = mp.FieldSpec(name="Fr", p=P_INT, n_limbs=8)

N_LIMBS = 8
# Top u32 limb of p; the reference draws its "uniform" Fr elements with the top limb
# reduced mod this (proof.cu:3-11, fr-tensor.cu:337-347).
P_TOP_LIMB = 1944954707

# reference constant sanity (bls12-381.cu:3-6)
assert list(SPEC.P_limbs) == [1, 4294967295, 4294859774, 1404937218, 161601541, 859428872, 698187080, 1944954707]
assert list(SPEC.ONE_mont) == [4294967294, 1, 215042, 1485092858, 3971764213, 2576109551, 2898593135, 405057881]
assert list(SPEC.R2_limbs) == [4092763245, 3382307216, 2274516003, 728559051, 1918122383, 97719446, 2673475345, 122214873]

ZERO = SPEC.ZERO
ONE_MONT = SPEC.ONE_mont

# jit-wrapped: repeated shapes hit the compile cache; under an outer jit these
# inline as plain traced calls.
add = jax.jit(functools.partial(mp.mod_add, SPEC))
sub = jax.jit(functools.partial(mp.mod_sub, SPEC))
neg = jax.jit(functools.partial(mp.mod_neg, SPEC))
double = jax.jit(functools.partial(mp.mod_double, SPEC))
mul = jax.jit(functools.partial(mp.mont_mul, SPEC))
sqr = jax.jit(functools.partial(mp.mont_sqr, SPEC))
mont = jax.jit(functools.partial(mp.to_mont, SPEC))
unmont = jax.jit(functools.partial(mp.from_mont, SPEC))
pow_static = functools.partial(mp.mont_pow, SPEC)
is_zero = mp.is_zero
eq = mp.eq
select = mp.select


def zeros(shape=()) -> jax.Array:
    return jnp.zeros((*shape, N_LIMBS), dtype=jnp.uint32)


def ones_mont(shape=()) -> jax.Array:
    return jnp.broadcast_to(jnp.asarray(ONE_MONT), (*shape, N_LIMBS))


def from_int(x: int) -> np.ndarray:
    """Host: python int -> canonical (non-Montgomery) limbs."""
    return SPEC.from_int(x)


def to_int(a) -> int:
    return SPEC.to_int(a)


def from_ints(xs, mont_form: bool = False) -> np.ndarray:
    """Host: iterable of python ints -> uint32[N, 8] (optionally Montgomery)."""
    arr = np.stack([
        mp.limbs_from_int((x % P_INT) * (SPEC.r if mont_form else 1) % P_INT, N_LIMBS)
        for x in xs
    ])
    return arr


def to_ints(a, mont_form: bool = False) -> list[int]:
    """Host: uint32[N, 8] -> list of python ints (demontgomerized if mont_form)."""
    arr = np.asarray(a, dtype=np.uint32).reshape(-1, N_LIMBS)
    out = []
    for row in arr:
        v = mp.int_from_limbs(row)
        if mont_form:
            v = (v * SPEC.r_inv) % P_INT
        out.append(v)
    return out
