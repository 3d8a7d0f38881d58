"""Sumcheck protocol provers (JAX, jittable) and verifiers (host).

TPU-native rebuild of the reference proof layer (/root/reference/proof.cu):

- ``inner_product``: proves S = sum_i a_i * b_i (Fr_ip_sc, proof.cu:55-108).
  Round i emits the degree-2 round polynomial q_i as coefficient sums
  (c0, c1, c2) = (sum a0*b0, sum a0*(b1-b0)+b0*(a1-a0), sum (a1-a0)*(b1-b0)),
  then folds a and b at challenge u_i.
- ``hadamard``: GKR-style product check at a point u (Fr_hp_sc, proof.cu:110-150):
  same per-pair coefficient tensors, but each is *MLE-evaluated at the remaining
  u-tail* instead of summed; tensors fold along separate challenges v.
- ``binary``: proves every element x satisfies x(x-1)=0 at point u
  (Fr_bin_sc, proof.cu:152-200): coefficients (a0^2-a0, 2*a0*d-d, d^2), d=a1-a0.

Where the reference syncs the device and reads back three scalars per round
(proof.cu:84-93), here each prover is one pure function: the full round loop is
Python-unrolled over statically halving shapes inside a single jit, with all
challenges passed in as arrays — zero host round-trips. Proof layout matches the
reference exactly (3 scalars/round, then finals), enabling transcript-level
comparison.

The verifiers are NEW (the reference discards its proofs, SURVEY.md §0.1); they
run on host python ints. Round identity for the point-anchored variants
(hadamard/binary): claim_i == (1-u_i)*q_i(0) + u_i*q_i(1), next claim = q_i(v_i);
for inner_product: claim_i == q_i(0) + q_i(1), next claim = q_i(u_i).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host
from ..tensor import fr_ops

HF = host.fr


# ---------------------------------------------------------------------------
# provers (jittable; wrap call sites in jax.jit)
# ---------------------------------------------------------------------------


def _pad_even(t: jax.Array) -> jax.Array:
    m = (t.shape[0] + 1) // 2
    return fr_ops.pad_to(t, 2 * m)


@jax.jit
def _ip_round_kernel(a: jax.Array, b: jax.Array, x: jax.Array):
    """One inner-product round on even-size tensors: returns
    (c0_sum, c1_sum, c2_sum, a_folded, b_folded). Compile unit shared across all
    layers/rounds of the same size (sizes are always powers of two)."""
    a0, a1 = a[0::2], a[1::2]
    b0, b1 = b[0::2], b[1::2]
    da = fr.sub(a1, a0)
    db = fr.sub(b1, b0)
    c0 = fr_ops.fr_sum(fr.mul(a0, b0))
    c1 = fr_ops.fr_sum(fr.add(fr.mul(a0, db), fr.mul(b0, da)))
    c2 = fr_ops.fr_sum(fr.mul(da, db))
    xb = jnp.broadcast_to(x, a0.shape)
    return c0, c1, c2, fr.add(a0, fr.mul(xb, da)), fr.add(b0, fr.mul(xb, db))


@functools.partial(jax.jit, static_argnums=(3,))
def _hp_round_kernel(a: jax.Array, b: jax.Array, u_tail: jax.Array, n_tail: int, x: jax.Array):
    """One hadamard round: coefficient tensors MLE-evaluated at u_tail."""
    a0, a1 = a[0::2], a[1::2]
    b0, b1 = b[0::2], b[1::2]
    da = fr.sub(a1, a0)
    db = fr.sub(b1, b0)
    c0 = fr.mul(a0, b0)
    c1 = fr.add(fr.mul(a0, db), fr.mul(b0, da))
    c2 = fr.mul(da, db)
    evals = [_me_eval_in_jit(c, u_tail, n_tail) for c in (c0, c1, c2)]
    xb = jnp.broadcast_to(x, a0.shape)
    return (*evals, fr.add(a0, fr.mul(xb, da)), fr.add(b0, fr.mul(xb, db)))


@functools.partial(jax.jit, static_argnums=(2,))
def _bin_round_kernel(a: jax.Array, u_tail: jax.Array, n_tail: int, x: jax.Array):
    a0, a1 = a[0::2], a[1::2]
    d = fr.sub(a1, a0)
    c0 = fr.sub(fr.mul(a0, a0), a0)
    c1 = fr.sub(fr.mul(fr.double(a0), d), d)
    c2 = fr.mul(d, d)
    evals = [_me_eval_in_jit(c, u_tail, n_tail) for c in (c0, c1, c2)]
    xb = jnp.broadcast_to(x, a0.shape)
    return (*evals, fr.add(a0, fr.mul(xb, d)))


def _me_eval_in_jit(t: jax.Array, u: jax.Array, r: int) -> jax.Array:
    """MLE eval usable while tracing (r static = u rows)."""
    for i in range(r):
        m = (t.shape[0] + 1) // 2
        t = fr_ops.pad_to(t, 2 * m)
        a0, a1 = t[0::2], t[1::2]
        t = fr.add(a0, fr.mul(jnp.broadcast_to(u[i], a0.shape), fr.sub(a1, a0)))
    return t[0]


def inner_product_prove(a: jax.Array, b: jax.Array, u: jax.Array):
    """Prove sum_i a_i*b_i. a, b: (n, 8) mont; u: (r, 8) challenges with
    2^(r-1) < n <= 2^r. Returns (polys (r,3,8), finals (2,8)).
    Proof stream order matches inner_product_sumcheck (proof.cu:98-108).
    """
    n, r = a.shape[0], u.shape[0]
    assert a.shape == b.shape
    assert n > (1 << r) // 2 and n <= (1 << r), (n, r)
    polys = []
    for i in range(r):
        a, b = _pad_even(a), _pad_even(b)
        c0, c1, c2, a, b = _ip_round_kernel(a, b, u[i])
        polys.append(jnp.stack([c0, c1, c2]))
    return jnp.stack(polys), jnp.stack([a[0], b[0]])


def hadamard_prove(a: jax.Array, b: jax.Array, u: jax.Array, v: jax.Array):
    """Prove the elementwise-product relation at point u, folding along v.
    Matches Fr_hp_sc (proof.cu:110-137): round i MLE-evaluates the coefficient
    tensors at u[i+1:], folds a, b by v[i]. Returns (polys (r,3,8), finals (2,8)).
    """
    n, r = a.shape[0], u.shape[0]
    assert a.shape == b.shape and v.shape[0] == r
    assert n > (1 << r) // 2 and n <= (1 << r), (n, r)
    polys = []
    for i in range(r):
        a, b = _pad_even(a), _pad_even(b)
        c0, c1, c2, a, b = _hp_round_kernel(a, b, u[i + 1 :], r - i - 1, v[i])
        polys.append(jnp.stack([c0, c1, c2]))
    return jnp.stack(polys), jnp.stack([a[0], b[0]])


def binary_prove(a: jax.Array, u: jax.Array, v: jax.Array):
    """Prove every element is a bit (x^2 - x = 0 at point u), folding along v.
    Matches Fr_bin_sc (proof.cu:152-188). Returns (polys (r,3,8), final (8,)).
    """
    n, r = a.shape[0], u.shape[0]
    assert v.shape[0] == r
    assert n > (1 << r) // 2 and n <= (1 << r), (n, r)
    polys = []
    for i in range(r):
        a = _pad_even(a)
        c0, c1, c2, a = _bin_round_kernel(a, u[i + 1 :], r - i - 1, v[i])
        polys.append(jnp.stack([c0, c1, c2]))
    return jnp.stack(polys), a[0]


# ---------------------------------------------------------------------------
# verifiers (host python ints; Montgomery-form values)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SumcheckResult:
    ok: bool
    final_claim: int  # claim to be checked against final openings
    reason: str = ""


def _q_at(c: Sequence[int], x: int) -> int:
    """Evaluate c0 + c1*x + c2*x^2 (mont ints)."""
    return HF.add(c[0], HF.add(HF.mul(c[1], x), HF.mul(c[2], HF.mul(x, x))))


def inner_product_verify(polys: Sequence[Sequence[int]], u: Sequence[int], claim: int) -> SumcheckResult:
    """Check q_i(0)+q_i(1) == claim_i; next claim = q_i(u_i)."""
    for i, c in enumerate(polys):
        total = HF.add(c[0], _q_at(c, HF.one_mont))
        if total != claim:
            return SumcheckResult(False, claim, f"round {i}: q(0)+q(1) != claim")
        claim = _q_at(c, u[i])
    return SumcheckResult(True, claim)


def point_anchored_verify(polys: Sequence[Sequence[int]], u: Sequence[int], v: Sequence[int], claim: int) -> SumcheckResult:
    """Shared verifier for hadamard/binary: the eq(u, ·) weight over the bound
    variable gives claim_i == (1-u_i)*q_i(0) + u_i*q_i(1); next claim = q_i(v_i).
    """
    one = HF.one_mont
    for i, c in enumerate(polys):
        q0 = c[0]
        q1 = _q_at(c, one)
        lhs = HF.add(HF.mul(HF.sub(one, u[i]), q0), HF.mul(u[i], q1))
        if lhs != claim:
            return SumcheckResult(False, claim, f"round {i}: eq-weighted sum != claim")
        claim = _q_at(c, v[i])
    return SumcheckResult(True, claim)


def hadamard_verify(polys, u, v, claim, final_a: int, final_b: int) -> SumcheckResult:
    res = point_anchored_verify(polys, u, v, claim)
    if not res.ok:
        return res
    if HF.mul(final_a, final_b) != res.final_claim:
        return SumcheckResult(False, res.final_claim, "final product mismatch")
    return res


def binary_verify(polys, u, v, final_a: int) -> SumcheckResult:
    res = point_anchored_verify(polys, u, v, 0)
    if not res.ok:
        return res
    if HF.sub(HF.mul(final_a, final_a), final_a) != res.final_claim:
        return SumcheckResult(False, res.final_claim, "final bit-check mismatch")
    return res


def inner_product_check_final(res: SumcheckResult, final_a: int, final_b: int) -> bool:
    return res.ok and HF.mul(final_a, final_b) == res.final_claim


# ---------------------------------------------------------------------------
# host-side helpers to turn prover outputs into int lists
# ---------------------------------------------------------------------------


def polys_to_ints(polys) -> list[list[int]]:
    arr = np.asarray(polys)  # (r, 3, 8)
    return [[fr.to_ints(arr[i, j][None])[0] for j in range(3)] for i in range(arr.shape[0])]


def scalars_to_ints(scalars) -> list[int]:
    arr = np.asarray(scalars).reshape(-1, 8)
    return fr.to_ints(arr)
