"""Sumcheck prover/verifier round-trips + negative tests.

The reference never verifies its proofs (SURVEY.md §0.1); these tests close that
gap: an honest prover must convince the verifier, and a corrupted proof or false
statement must be rejected.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkdl_tpu.field import fr, host
from zkdl_tpu.sumcheck import protocols as sc
from zkdl_tpu.tensor import fr_ops

P = fr.P_INT
HF = host.fr


def rand_mont(n):
    xs = [random.randrange(P) for _ in range(n)]
    return xs, jnp.asarray(fr.from_ints(xs))  # raw limb ints == mont-form field elems


def test_inner_product_roundtrip():
    for n in [8, 16, 31]:
        xs, a = rand_mont(n)
        ys, b = rand_mont(n)
        r = fr_ops.ceil_log2(n)
        us, u = rand_mont(r)
        polys, finals = jax.jit(sc.inner_product_prove)(a, b, u)
        claim = 0
        for x, y in zip(xs, ys):
            claim = HF.add(claim, HF.mul(x, y))
        res = sc.inner_product_verify(sc.polys_to_ints(polys), us, claim)
        assert res.ok, res.reason
        fa, fb = sc.scalars_to_ints(finals)
        assert sc.inner_product_check_final(res, fa, fb)


def test_inner_product_rejects_false_claim():
    xs, a = rand_mont(16)
    ys, b = rand_mont(16)
    us, u = rand_mont(4)
    polys, _ = jax.jit(sc.inner_product_prove)(a, b, u)
    claim = HF.add(1234, 0)  # wrong claim
    res = sc.inner_product_verify(sc.polys_to_ints(polys), us, claim)
    assert not res.ok


def test_inner_product_rejects_tampered_proof():
    xs, a = rand_mont(16)
    ys, b = rand_mont(16)
    us, u = rand_mont(4)
    polys, finals = jax.jit(sc.inner_product_prove)(a, b, u)
    claim = 0
    for x, y in zip(xs, ys):
        claim = HF.add(claim, HF.mul(x, y))
    bad = sc.polys_to_ints(polys)
    bad[2][1] = HF.add(bad[2][1], HF.one_mont)
    res = sc.inner_product_verify(bad, us, claim)
    assert not res.ok


def mle_host(vals, point):
    """MLE of vals (mont ints) at point (mont ints), low variable first."""
    vals = list(vals)
    for x in point:
        if len(vals) % 2:
            vals.append(0)
        vals = [HF.add(vals[2 * i], HF.mul(x, HF.sub(vals[2 * i + 1], vals[2 * i]))) for i in range(len(vals) // 2)]
    return vals[0]


def test_hadamard_roundtrip():
    n = 16
    xs, a = rand_mont(n)
    ys, b = rand_mont(n)
    r = 4
    us, u = rand_mont(r)
    vs, v = rand_mont(r)
    polys, finals = jax.jit(sc.hadamard_prove)(a, b, u, v)
    # the initial claim: MLE of the elementwise product, evaluated at u
    prod = [HF.mul(x, y) for x, y in zip(xs, ys)]
    claim = mle_host(prod, us)
    fa, fb = sc.scalars_to_ints(finals)
    res = sc.hadamard_verify(sc.polys_to_ints(polys), us, vs, claim, fa, fb)
    assert res.ok, res.reason
    # finals must equal MLEs of a and b at v
    assert fa == mle_host(xs, vs)
    assert fb == mle_host(ys, vs)


def test_hadamard_rejects_wrong_point():
    n = 16
    xs, a = rand_mont(n)
    ys, b = rand_mont(n)
    us, u = rand_mont(4)
    vs, v = rand_mont(4)
    polys, finals = jax.jit(sc.hadamard_prove)(a, b, u, v)
    prod = [HF.mul(x, y) for x, y in zip(xs, ys)]
    claim = HF.add(mle_host(prod, us), HF.one_mont)  # off-by-one claim
    fa, fb = sc.scalars_to_ints(finals)
    res = sc.hadamard_verify(sc.polys_to_ints(polys), us, vs, claim, fa, fb)
    assert not res.ok


def test_binary_roundtrip():
    n = 32
    bits = [random.randrange(2) for _ in range(n)]
    a = jnp.asarray(fr.from_ints([HF.mont(b) for b in bits]))
    r = 5
    us, u = rand_mont(r)
    vs, v = rand_mont(r)
    polys, final = jax.jit(sc.binary_prove)(a, u, v)
    fa = sc.scalars_to_ints(final[None])[0]
    res = sc.binary_verify(sc.polys_to_ints(polys), us, vs, fa)
    assert res.ok, res.reason
    assert fa == mle_host([HF.mont(b) for b in bits], vs)


def test_binary_rejects_non_bit():
    n = 32
    vals = [random.randrange(2) for _ in range(n)]
    vals[7] = 5  # not a bit
    a = jnp.asarray(fr.from_ints([HF.mont(b) for b in vals]))
    us, u = rand_mont(5)
    vs, v = rand_mont(5)
    polys, final = jax.jit(sc.binary_prove)(a, u, v)
    fa = sc.scalars_to_ints(final[None])[0]
    res = sc.binary_verify(sc.polys_to_ints(polys), us, vs, fa)
    assert not res.ok
