"""Planar tensor protocol helpers: bit-reversed storage, eq tables, MLE folds.

The planar prover re-design (see field/planar.py for the layout rationale):

**Bit-reversed storage.** Sumcheck/MLE folding binds the LOWEST index bit each
round — pairs (2i, 2i+1) — which on TPU lanes is a strided shuffle every round.
We instead store each protocol tensor with its index bits reversed
(stored[rev(e)] = t[e]): binding the lowest semantic bit then becomes combining
the two contiguous HALVES of the stored array, and the fold output is again
bit-reversed storage of the folded tensor — the invariant is self-sustaining.
One gather per tensor per prove replaces a shuffle per round. All sums are
order-independent and all MLE evaluations are value-identical, so the proof
STREAM is bit-identical to the reference-convention (pair-interleaved) provers
(asserted by tests).

**Eq-weight tables.** The point-anchored sumchecks (hadamard/binary) evaluate
their round-coefficient tensors at the remaining challenge tail each round.
Instead of a log-deep fold chain per round, we use the identity
  MLE_c(u_tail) = sum_j c[j] * eq(u_tail, j)
and ONE precomputed table: with T* = eq-table of u[1:] (bit-reversed storage),
the first m = 2^(r-1-i) entries of T* equal (prod_{1<=j<=i} (1-u_j)) *
eq(u[i+1:], .), so round i is a lazy dot against a PREFIX of T*, rescaled by a
running scalar prod of inverses — no per-round table rebuilds. (Challenges are
transcript outputs; u_j == 1 has probability ~2^-255 and would only yield an
invalid proof, never an unsound acceptance.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, planar
from ..field.planar import N_LIMBS


@functools.lru_cache(maxsize=None)
def bitrev_indices(r: int) -> np.ndarray:
    """perm[i] = bit-reverse of i over r bits; an involution (perm[perm] = id)."""
    n = 1 << r
    idx = np.arange(n, dtype=np.int32)
    out = np.zeros(n, dtype=np.int32)
    for b in range(r):
        out |= ((idx >> b) & 1) << (r - 1 - b)
    return out


def bitrev_axis(t: jax.Array, axis: int) -> jax.Array:
    """Apply the bit-reversal permutation along `axis` (length must be 2^r)."""
    n = t.shape[axis]
    r = int(n - 1).bit_length() if n > 1 else 0
    assert (1 << r) == n, (n, "axis length must be a power of two")
    if r <= 1:
        return t
    perm = jnp.asarray(bitrev_indices(r))
    return jnp.take(t, perm, axis=axis)


def inverse_scalar(x: jax.Array) -> jax.Array:
    """x^-1 in Fr via Fermat (x^(p-2)), Montgomery in/out. x: (8,) -> (8,)."""
    e = fr.P_INT - 2
    x2 = x[:, None]  # (8, 1)
    result = planar.ones_mont(1)
    acc = x2
    while e > 0:
        if e & 1:
            result = planar.mul(result, acc)
        e >>= 1
        if e:
            acc = planar.mul(acc, acc)
    return result[:, 0]


def eq_table_rev(u: jax.Array) -> jax.Array:
    """Bit-reversed-storage eq table of u ((r, 8) mont) -> planar (8, 2^r).

    T[:, p] = prod_k f_{u[k]}(bit_{r-1-k}(p)), f_v(0) = 1-v, f_v(1) = v —
    i.e. u[0] controls the TOP stored bit, matching bit-reversed tensors:
    for stored index p = rev(j), T[:, p] == eq(u, j).
    """
    from ..field import pallas_fr as pf

    r = u.shape[0]
    t = planar.ones_mont(1)  # (8, 1)
    for k in range(r - 1, -1, -1):
        hi = pf.mul_scalar(t, u[k])
        lo = planar.sub(t, hi)  # (1-u)*t == t - u*t
        t = jnp.concatenate([lo, hi], axis=1)
    return t


def eq_table(u: jax.Array) -> jax.Array:
    """Standard-order eq table: T[:, j] = eq(u, j) = prod_k f_{u[k]}(bit_k(j))
    — u[0] controls the LOWEST stored bit. Planar (8, 2^r). Use for
    order-independent weighted sums/contractions (no bit reversal needed)."""
    from ..field import pallas_fr as pf

    r = u.shape[0]
    t = planar.ones_mont(1)
    for k in range(r):
        hi = pf.mul_scalar(t, u[k])
        lo = planar.sub(t, hi)
        t = jnp.concatenate([lo, hi], axis=1)
    return t


def fold_half(t: jax.Array, x: jax.Array) -> jax.Array:
    """One MLE fold on bit-reversed storage: combine contiguous halves.

    t: (8, n) (n even); x: (8,). Returns (8, n/2):
    out = t_lo + x * (t_hi - t_lo). Equals me_step on the unreversed tensor.
    """
    h = t.shape[1] // 2
    lo, hi = t[:, :h], t[:, h:]
    return planar.add(lo, planar.mul_scalar(planar.sub(hi, lo), x))


def fold_axis(t: jax.Array, x: jax.Array, axis: int) -> jax.Array:
    """Fold halves along `axis` of a (8, ...) planar tensor (axis >= 1)."""
    h = t.shape[axis] // 2
    sl_lo = [slice(None)] * t.ndim
    sl_hi = [slice(None)] * t.ndim
    sl_lo[axis] = slice(0, h)
    sl_hi[axis] = slice(h, 2 * h)
    lo, hi = t[tuple(sl_lo)], t[tuple(sl_hi)]
    shape = [N_LIMBS] + [1] * (t.ndim - 1)
    xb = jnp.broadcast_to(x.reshape(shape), lo.shape)
    return planar.add(lo, planar.mul(planar.sub(hi, lo), xb))


def me_eval_rev(t: jax.Array, u: jax.Array) -> jax.Array:
    """MLE eval of a bit-reversed planar tensor at u ((r, 8)) -> (8,).

    Value-identical to fr_ops.me_eval on the unreversed (n, 8) tensor.
    """
    n = t.shape[1]
    r = u.shape[0]
    assert n == (1 << r), (n, r)
    for i in range(r):
        t = fold_half(t, u[i])
    return t[:, 0]


def me_eval_rev_dot(t: jax.Array, u: jax.Array) -> jax.Array:
    """Same value as me_eval_rev but as ONE lazy dot against the eq table —
    cheaper when the table is shared or the tensor is huge."""
    return planar.dot(t, eq_table_rev(u))


def to_planar_rev(t: jax.Array, r: int) -> jax.Array:
    """(n, 8) (n <= 2^r, zero-padded) -> bit-reversed planar (8, 2^r)."""
    n = t.shape[0]
    if n < (1 << r):
        t = jnp.concatenate(
            [t, jnp.zeros(((1 << r) - n, 8), dtype=t.dtype)], axis=0
        )
    return bitrev_axis(planar.to_planar(t), axis=1)


def from_planar_rev(t: jax.Array) -> jax.Array:
    """Bit-reversed planar (8, n) -> (n, 8) semantic order."""
    return planar.from_planar(bitrev_axis(t, axis=1))
