"""Host-side (pure python-int) field arithmetic.

Used as (a) the trusted test oracle for the JAX kernels and (b) fast scalar math for
verifier-side logic, where per-element jnp graphs would be wasteful. Mirrors the
Montgomery semantics of /root/reference/bls12-381.cu exactly (values are plain ints;
Montgomery form is tracked by the caller, as in the reference).
"""

from __future__ import annotations

from .fr import P_INT as FR_P
from .fr import SPEC as FR_SPEC
from .fp import P_INT as FP_P
from .fp import SPEC as FP_SPEC


class HostField:
    """Montgomery arithmetic on python ints for one field."""

    def __init__(self, spec):
        self.spec = spec
        self.p = spec.p
        self.r = spec.r
        self.r_inv = spec.r_inv
        self.one_mont = spec.r % spec.p

    # all inputs/outputs below are Montgomery-form ints unless noted
    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b * self.r_inv) % self.p

    def sqr(self, a: int) -> int:
        return self.mul(a, a)

    def inv(self, a: int) -> int:
        # Montgomery-form inverse: returns mont(x^-1) for a = mont(x)
        x = (a * self.r_inv) % self.p
        return (pow(x, -1, self.p) * self.r) % self.p

    def mont(self, a: int) -> int:
        return (a * self.r) % self.p

    def unmont(self, a: int) -> int:
        return (a * self.r_inv) % self.p


fr = HostField(FR_SPEC)
fp = HostField(FP_SPEC)
