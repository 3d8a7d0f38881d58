"""Modular-arithmetic-safe collectives over a JAX mesh.

The reference has no distributed layer at all (SURVEY.md §2.7). Here sumcheck
round-coefficient sums and commitment partial sums are reduced across devices.
A plain `psum` of u32 limb arrays would drop carries, so Fr partials are split
into 16-bit digits (u32 lanes), psum'd (digit sums stay < 2^16 * n_dev — far
from overflow), then carry-normalized and reduced mod p. The result is the
*canonical* value — bit-identical to a single-device modular sum, which keeps
the transcript replicated and deterministic across hosts."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, mp

_FR = fr.SPEC

# p << j as 9-limb arrays for the conditional-subtract reduction (supports
# partial sums < 128 * p, i.e. up to 128 devices per reduced axis)
_P_SHIFTED = [mp.limbs_from_int(_FR.p << j, 9) for j in range(7, -1, -1)]


def _digits17_to_limbs9(d: jax.Array) -> jax.Array:
    """(..., 17) 16-bit digits -> (..., 9) u32 limbs (top limb 16-bit)."""
    pad = jnp.zeros((*d.shape[:-1], 1), dtype=jnp.uint32)
    d18 = jnp.concatenate([d, pad], axis=-1)
    return mp.from_digits(d18)


def reduce_mod_p(limbs9: jax.Array) -> jax.Array:
    """(..., 9) u32 value < 2^8 * p -> canonical (..., 8) mod p."""
    v = limbs9
    for p_shift in _P_SHIFTED:
        c = jnp.asarray(p_shift)
        ge = mp._gte(v, jnp.broadcast_to(c, v.shape))
        sub, _ = mp._raw_sub(v, jnp.broadcast_to(c, v.shape))
        v = jnp.where(ge[..., None], sub, v)
    return v[..., :8]


def psum_fr(x: jax.Array, axis_name: str) -> jax.Array:
    """Modular psum of Fr values (..., 8) across a mesh axis; canonical result."""
    d = mp.to_digits(x)  # (..., 16), each < 2^16
    s = jax.lax.psum(d, axis_name)  # < 2^16 * n_dev
    s = mp._carry_normalize(s, 17)
    return reduce_mod_p(_digits17_to_limbs9(s))


def fr_sum_local_then_psum(t: jax.Array, axis_name: str) -> jax.Array:
    """Tree-sum the local block then modular-psum across the axis."""
    from ..tensor import fr_ops

    return psum_fr(fr_ops.fr_sum(t), axis_name)
