"""zkRescale: sign-preserving fixed-point requantization (scale 2^32 -> 2^16).

NEW circuit op (no counterpart in the reference, which only has ReLU-fused
requantization, /root/reference/zkrelu.cu:11-41). Attention needs requantization
*without* clamping negatives: after every field matmul the scale doubles, and
values must return to 2^16 to respect the protocol's signed-48-bit magnitude
invariant (zkrelu.cu:18).

Semantics, per element x of X (Montgomery Fr, combined scale 2^32):
  sign = [x positive]  (positive iff unmont(x) <= 2^47 - 1, like zkReLU)
  mag  = |x|           (p - x for negatives — UNbiased, unlike zkReLU)
  rem  = signed 16-bit remainder of mag (round-to-nearest, sign bit 15)
  mag_rescaled = (mag - rem) >> 16
  Z = +mont(mag_rescaled) if sign else -mont(mag_rescaled)

Auxiliary tensors have the exact zkReLU layout (sign, mag_bin (n*32), rem_bin
(n*16)), so the PROOF is zkReLU's verbatim: two binary sumchecks + bit
recombination folds + a Hadamard sumcheck of X (.) sign (zkrelu.cu:79-100) —
prove/verify delegate to zkrelu. The recombination identity differs only in
the verifier-side equation: x = (2*sign - 1) * (2^16*mag_rescaled + rem_signed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from . import zkrelu

Q, R = zkrelu.Q, zkrelu.R

_POS_MAX = zkrelu._POS_MAX


@jax.jit
def forward(X: jax.Array):
    """X: (n, 8) Montgomery Fr at scale 2^32. Returns (Z at scale 2^16,
    aux dict with sign/mag_bin/rem_bin)."""
    from ..field import mp

    n = X.shape[0]
    x = fr.unmont(X)
    pos = mp._gte(jnp.broadcast_to(jnp.asarray(_POS_MAX), x.shape), x)

    neg_mag = fr.neg(x)  # |x| = p - x for negatives (exact, < 2^47)
    lo = jnp.where(pos, x[:, 0], neg_mag[:, 0])
    hi = jnp.where(pos, x[:, 1], neg_mag[:, 1])

    rem_sign = (lo >> 15) & jnp.uint32(1)
    rem_mag = lo & jnp.uint32(32767)
    add_amt = jnp.uint32(32768) - rem_mag
    lo_neg = lo + add_amt
    hi_neg = hi + (lo_neg < lo).astype(jnp.uint32)
    lo_pos = lo - rem_mag
    lo2 = jnp.where(rem_sign == 1, lo_neg, lo_pos)
    hi2 = jnp.where(rem_sign == 1, hi_neg, hi)
    mag_rescaled = (lo2 >> 16) | (hi2 << 16)

    one_m = fr.ones_mont((n,))
    zero = fr.zeros((n,))
    sign = fr.select(pos, one_m, zero)

    shifts = jnp.arange(Q, dtype=jnp.uint32)
    mag_bits = (mag_rescaled[:, None] >> shifts) & jnp.uint32(1)
    mag_bin = fr.select((mag_bits == 1).reshape(-1), fr.ones_mont((n * Q,)), fr.zeros((n * Q,)))

    rem_shifts = jnp.arange(15, dtype=jnp.uint32)
    rem_bits = (rem_mag[:, None] >> rem_shifts) & jnp.uint32(1)
    rem_bits = jnp.concatenate([rem_bits, rem_sign[:, None]], axis=1)
    rem_bin = fr.select((rem_bits == 1).reshape(-1), fr.ones_mont((n * R,)), fr.zeros((n * R,)))

    mag_m = fr.mont(fr_ops.from_u32(mag_rescaled))
    Z = fr.select(pos, mag_m, fr.neg(mag_m))
    return Z, {"sign": sign, "mag_bin": mag_bin, "rem_bin": rem_bin}


def prove(X: jax.Array, aux: dict, challenges: ChallengeSource):
    """Same proof surface as zkReLU (binary x2 + recombination + Hadamard)."""
    return zkrelu.prove(X, aux, challenges)


def verify(proof) -> tuple[bool, str]:
    return zkrelu.verify(proof)
