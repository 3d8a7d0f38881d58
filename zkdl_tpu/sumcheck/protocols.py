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
from ..utils import aot

HF = host.fr


# ---------------------------------------------------------------------------
# provers (jittable; wrap call sites in jax.jit)
# ---------------------------------------------------------------------------


def _pad_even(t: jax.Array) -> jax.Array:
    m = (t.shape[0] + 1) // 2
    return fr_ops.pad_to(t, 2 * m)


@aot.jit
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


@functools.partial(aot.jit, static_argnums=(3,))
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


@functools.partial(aot.jit, static_argnums=(2,))
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


# Fused single-dispatch forms of the unrolled provers (used as planar tail
# provers on TPU: whole remaining round ladder in one executable).
inner_product_prove_jit = aot.jit(inner_product_prove)
hadamard_prove_jit = aot.jit(hadamard_prove)
binary_prove_jit = aot.jit(binary_prove)


# ---------------------------------------------------------------------------
# scan-based provers (bit-identical streams, one compiled round body)
# ---------------------------------------------------------------------------
#
# The unrolled provers above trace every round at its own (halving) shape —
# semantically ideal, but the fused per-layer graphs grow with log^2(n) and XLA
# compile time grows much faster than that. These variants run the round loop
# as ONE lax.scan body at a fixed padded shape: after each fold the valid
# prefix halves and the tail is zeros, which contribute nothing to any round
# sum (0*0 pairs) and fold to zeros again — so the emitted proof stream is
# bit-identical to the unrolled provers (asserted by tests). Compute cost is
# O(n) per round instead of O(n/2^i), a ~log(n)/2 factor of extra VPU work the
# TPU absorbs for a compile-time reduction of orders of magnitude.
#
# For the point-anchored variants the per-round MLE evaluation of the
# coefficient tensors at the *shrinking* u-tail is done at fixed length by
# evaluating the zero-padded tensor at [u[i+1:], 0, ..., 0]: folding at 0
# selects the even branch, which after the real variables are consumed is
# exactly index 0 — the true evaluation.


def _fold_padded(t: jax.Array, x: jax.Array) -> jax.Array:
    """(n, 8) -> (n, 8): fold pairs at x into the first n/2 slots, zero tail."""
    n = t.shape[0]
    p = t.reshape(n // 2, 2, 8)
    a0, a1 = p[:, 0, :], p[:, 1, :]
    folded = fr.add(a0, fr.mul(jnp.broadcast_to(x, a0.shape), fr.sub(a1, a0)))
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)


def _me_eval_padded(c: jax.Array, tail: jax.Array) -> jax.Array:
    """Evaluate the MLE of c ((m, 8), m = 2^k) at a fixed-length variable
    vector tail ((k, 8)); trailing zero variables preserve index 0."""
    for i in range(tail.shape[0]):
        p = c.reshape(c.shape[0] // 2, 2, 8)
        a0, a1 = p[:, 0, :], p[:, 1, :]
        c = fr.add(a0, fr.mul(jnp.broadcast_to(tail[i], a0.shape), fr.sub(a1, a0)))
    return c[0]


def _tails(u: jax.Array) -> jax.Array:
    """tails[i] = [u[i+1], ..., u[r-1], 0, ...] of fixed length r-1."""
    r = u.shape[0]
    if r <= 1:
        return jnp.zeros((r, 0, 8), dtype=jnp.uint32)
    rows = []
    for i in range(r):
        pad = jnp.zeros((i, 8), dtype=jnp.uint32)
        rows.append(jnp.concatenate([u[i + 1 :], pad], axis=0))
    return jnp.stack(rows)


def inner_product_prove_scan(a: jax.Array, b: jax.Array, u: jax.Array):
    """Scan-bodied inner_product_prove; identical proof stream."""
    r = u.shape[0]
    n = 1 << r
    a = fr_ops.pad_to(a, n)
    b = fr_ops.pad_to(b, n)
    if r == 0:
        return jnp.zeros((0, 3, 8), jnp.uint32), jnp.stack([a[0], b[0]])

    def body(carry, x):
        a, b = carry
        pa = a.reshape(n // 2, 2, 8)
        pb = b.reshape(n // 2, 2, 8)
        a0, a1, b0, b1 = pa[:, 0], pa[:, 1], pb[:, 0], pb[:, 1]
        da, db = fr.sub(a1, a0), fr.sub(b1, b0)
        c0 = fr_ops.fr_sum(fr.mul(a0, b0))
        c1 = fr_ops.fr_sum(fr.add(fr.mul(a0, db), fr.mul(b0, da)))
        c2 = fr_ops.fr_sum(fr.mul(da, db))
        xb = jnp.broadcast_to(x, a0.shape)
        a_new = jnp.concatenate([fr.add(a0, fr.mul(xb, da)), jnp.zeros_like(a0)], axis=0)
        b_new = jnp.concatenate([fr.add(b0, fr.mul(xb, db)), jnp.zeros_like(b0)], axis=0)
        return (a_new, b_new), jnp.stack([c0, c1, c2])

    (a, b), polys = jax.lax.scan(body, (a, b), u)
    return polys, jnp.stack([a[0], b[0]])


def hadamard_prove_scan(a: jax.Array, b: jax.Array, u: jax.Array, v: jax.Array):
    """Scan-bodied hadamard_prove; identical proof stream."""
    r = u.shape[0]
    n = 1 << r
    a = fr_ops.pad_to(a, n)
    b = fr_ops.pad_to(b, n)
    if r == 0:
        return jnp.zeros((0, 3, 8), jnp.uint32), jnp.stack([a[0], b[0]])
    tails = _tails(u)

    def body(carry, xs):
        a, b = carry
        x, tail = xs
        pa = a.reshape(n // 2, 2, 8)
        pb = b.reshape(n // 2, 2, 8)
        a0, a1, b0, b1 = pa[:, 0], pa[:, 1], pb[:, 0], pb[:, 1]
        da, db = fr.sub(a1, a0), fr.sub(b1, b0)
        c0 = _me_eval_padded(fr.mul(a0, b0), tail)
        c1 = _me_eval_padded(fr.add(fr.mul(a0, db), fr.mul(b0, da)), tail)
        c2 = _me_eval_padded(fr.mul(da, db), tail)
        xb = jnp.broadcast_to(x, a0.shape)
        a_new = jnp.concatenate([fr.add(a0, fr.mul(xb, da)), jnp.zeros_like(a0)], axis=0)
        b_new = jnp.concatenate([fr.add(b0, fr.mul(xb, db)), jnp.zeros_like(b0)], axis=0)
        return (a_new, b_new), jnp.stack([c0, c1, c2])

    (a, b), polys = jax.lax.scan(body, (a, b), (v, tails))
    return polys, jnp.stack([a[0], b[0]])


def binary_prove_scan(a: jax.Array, u: jax.Array, v: jax.Array):
    """Scan-bodied binary_prove; identical proof stream."""
    r = u.shape[0]
    n = 1 << r
    a = fr_ops.pad_to(a, n)
    if r == 0:
        return jnp.zeros((0, 3, 8), jnp.uint32), a[0]
    tails = _tails(u)

    def body(a, xs):
        x, tail = xs
        pa = a.reshape(n // 2, 2, 8)
        a0, a1 = pa[:, 0], pa[:, 1]
        d = fr.sub(a1, a0)
        c0 = _me_eval_padded(fr.sub(fr.mul(a0, a0), a0), tail)
        c1 = _me_eval_padded(fr.sub(fr.mul(fr.double(a0), d), d), tail)
        c2 = _me_eval_padded(fr.mul(d, d), tail)
        xb = jnp.broadcast_to(x, a0.shape)
        a_new = jnp.concatenate([fr.add(a0, fr.mul(xb, d)), jnp.zeros_like(a0)], axis=0)
        return a_new, jnp.stack([c0, c1, c2])

    a, polys = jax.lax.scan(body, a, (v, tails))
    return polys, a[0]


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
