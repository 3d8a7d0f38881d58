"""BLS12-381 base field Fp (381-bit), TPU-native.

Mirrors the reference's `blstrs__fp__Fp` family
(/root/reference/bls12-381.cuh:218-226, /root/reference/bls12-381.cu:8-11):
uint32[..., 12] little-endian limbs, Montgomery form with R = 2^384.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import mp

P_INT = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

SPEC = mp.FieldSpec(name="Fp", p=P_INT, n_limbs=12)

N_LIMBS = 12

# reference constant sanity (bls12-381.cu:8-11)
assert list(SPEC.P_limbs) == [4294945451, 3120496639, 2975072255, 514588670, 4138792484, 1731252896, 4085584575, 1685539716, 1129032919, 1260103606, 964683418, 436277738]
assert list(SPEC.ONE_mont) == [196605, 1980301312, 3289120770, 3958636555, 1405573306, 1598593111, 1884444485, 2010011731, 2723605613, 1543969431, 4202751123, 368467651]
assert list(SPEC.R2_limbs) == [473175878, 4108263220, 164693233, 175564454, 1284880085, 2380613484, 2476573632, 1743489193, 3038352685, 2591637125, 2462770090, 295210981]

ZERO = SPEC.ZERO
ONE_MONT = SPEC.ONE_mont

# jit-wrapped (see fr.py)
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
    return SPEC.from_int(x)


def to_int(a) -> int:
    return SPEC.to_int(a)
