"""logUp-style lookup argument over Fr (NEW — no counterpart in the reference).

The reference proves set-membership facts only via bit decomposition (zkReLU's
binary sumchecks, /root/reference/zkrelu.cu:79-100). A lookup argument is the
modern replacement (and the building block zkLLM-style attention circuits use
for non-linearities): to show every witness element a_i lies in a table
{t_j}, prove the rational identity

    sum_i 1/(a_i + z)  ==  sum_j m_j/(t_j + z)

at a random challenge z drawn after a, t, m are fixed (Fiat-Shamir), where m_j
is the multiplicity of t_j among the a_i. Soundness: the two sides are equal as
rational functions of z iff the multisets match; a random z catches a mismatch
except with probability (|a|+|t|)/|Fr|.

TPU-native layout: everything is (n, 8)-limb Montgomery Fr tensors; the
inverse vectors are produced by ONE batched Fermat inversion of the running
product (associative-scan prefix products, a single 255-bit pow, then a
backward sweep) — O(log n) full-width tensor muls instead of n inversions.

What the prover emits (all later verified):
  - z (challenge), m (multiplicity vector, table-sized — verifier re-derivable
    for public tables but carried in the proof),
  - w = 1/(a+z) and v = m/(t+z) *sum claims* S_w == S_v,
  - two Hadamard sumchecks binding the inverse vectors to a and t:
      (w ⊙ (a+z)) MLE-evaluates to 1's MLE (all-ones ⇒ value 1) at u_w,
      (v ⊙ (t+z)) MLE-evaluates to m's MLE at u_t (verifier evaluates m itself),
  - inner-product sumchecks reducing S_w = <w, 1> and S_v = <v, 1>.

Sizes must be powers of two; pad the witness with copies of t[0] (bumping
m[0]) so padding entries are themselves valid lookups.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host
from ..tensor import fr_ops
from . import protocols as sc
from .transcript import ChallengeSource

HF = host.fr


# ---------------------------------------------------------------------------
# batched field inversion
# ---------------------------------------------------------------------------


def batch_inverse(x: jax.Array) -> jax.Array:
    """Elementwise 1/x over Fr (Montgomery in/out), x: (n, 8), all nonzero.

    Montgomery's trick, TPU-shaped: prefix products via associative scan
    (O(log n) vector muls), one Fermat inversion of the total product
    (255 squarings on a single element), and a backward recombination
    inv_i = prefix_{i-1} * suffix-inverse_i.
    """
    n = x.shape[0]
    if n == 1:
        return fr.pow_static(x, fr.P_INT - 2)
    pre = jax.lax.associative_scan(fr.mul, x, axis=0)  # pre[i] = x0*...*xi
    total_inv = fr.pow_static(pre[-1:], fr.P_INT - 2)  # (1, 8)
    # suffix inverses: sinv[i] = 1/(x_i*...*x_{n-1}) = total_inv * pre[i-1]
    pre_shift = jnp.concatenate([fr.ones_mont((1,)), pre[:-1]], axis=0)
    # inv_i = pre_{i-1} * (1/(x0..xi)) ; compute 1/(x0..xi) by back-scan:
    # run the scan on reversed suffix products instead — cheaper: iprefix[i] =
    # 1/(x0..xi) = iprefix[i+1] * x_{i+1}; vectorize with a reversed scan.
    rev = jnp.flip(x, axis=0)
    # cumulative products of the reversed tail: q[k] = x_{n-1}*...*x_{n-k}
    qrev = jax.lax.associative_scan(fr.mul, rev, axis=0)
    # 1/(x0..xi) = total_inv * (x_{i+1}*...*x_{n-1}) = total_inv * q[n-2-i]
    tail = jnp.concatenate([jnp.flip(qrev[:-1], axis=0), fr.ones_mont((1,))], axis=0)
    iprefix = fr.mul(jnp.broadcast_to(total_inv, x.shape), tail)  # (n, 8)
    return fr.mul(pre_shift, iprefix)


batch_inverse_jit = jax.jit(batch_inverse)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LookupProof:
    z: jax.Array  # (8,) challenge
    m: jax.Array  # (T, 8) multiplicities (Montgomery)
    sum_w: jax.Array  # (8,) sum of 1/(a+z)
    sum_v: jax.Array  # (8,) sum of m/(t+z)
    # <w,1> and <v,1> inner-product sumchecks (reduce the sum claims)
    u_w_ip: jax.Array
    w_ip_polys: jax.Array
    w_ip_finals: jax.Array  # (2, 8): w(u), ones(u)=1
    u_v_ip: jax.Array
    v_ip_polys: jax.Array
    v_ip_finals: jax.Array
    # Hadamard bindings w*(a+z)=1 and v*(t+z)=m
    u_w: jax.Array
    v_w: jax.Array
    w_hp_polys: jax.Array
    w_hp_finals: jax.Array  # (2, 8): w(v_w), (a+z)(v_w)
    u_t: jax.Array
    v_t: jax.Array
    t_hp_polys: jax.Array
    t_hp_finals: jax.Array
    m_at_ut: jax.Array  # (8,) claimed m MLE at u_t (verifier recomputes)
    a_at_vw: jax.Array  # (8,) claimed a MLE at v_w (for caller-side binding)
    t_at_vt: jax.Array  # (8,) claimed t MLE at v_t


@jax.jit
def _lookup_core(a, t, m, z, u_w_ip, u_v_ip, u_w, v_w, u_t, v_t):
    """The whole lookup prover fused into one jit (codebase pattern: zero
    per-round host round-trips, cf. zkfc._fc_prove_core)."""
    az = fr.add(a, jnp.broadcast_to(z, a.shape))
    tz = fr.add(t, jnp.broadcast_to(z, t.shape))
    w = batch_inverse(az)
    v = fr.mul(m, batch_inverse(tz))
    sum_w, sum_v = fr_ops.fr_sum(w), fr_ops.fr_sum(v)

    ones_a = fr.ones_mont((a.shape[0],))
    ones_t = fr.ones_mont((t.shape[0],))
    w_ip_polys, w_ip_finals = sc.inner_product_prove_scan(w, ones_a, u_w_ip)
    v_ip_polys, v_ip_finals = sc.inner_product_prove_scan(v, ones_t, u_v_ip)
    w_hp_polys, w_hp_finals = sc.hadamard_prove_scan(w, az, u_w, v_w)
    t_hp_polys, t_hp_finals = sc.hadamard_prove_scan(v, tz, u_t, v_t)
    m_at_ut = fr_ops.me_eval(m, u_t)
    a_at_vw = fr_ops.me_eval(a, v_w)
    t_at_vt = fr_ops.me_eval(t, v_t)
    return (sum_w, sum_v, w_ip_polys, w_ip_finals, v_ip_polys, v_ip_finals,
            w_hp_polys, w_hp_finals, t_hp_polys, t_hp_finals,
            m_at_ut, a_at_vw, t_at_vt)


def multiplicities(a_vals: np.ndarray, table_size: int) -> jax.Array:
    """Multiplicity tensor ((T, 8) Montgomery) for a range table t_j = j,
    from u64 witness values."""
    counts = np.bincount(a_vals.reshape(-1).astype(np.int64), minlength=table_size)
    raw = np.zeros((table_size, 8), dtype=np.uint32)
    raw[:, 0] = (counts & 0xFFFFFFFF).astype(np.uint32)
    raw[:, 1] = (counts >> 32).astype(np.uint32)
    return fr.mont(jnp.asarray(raw))


def prove(a: jax.Array, t: jax.Array, m: jax.Array, challenges: ChallengeSource) -> LookupProof:
    """a: (n, 8) witness, t: (T, 8) table, m: (T, 8) multiplicities — all
    Montgomery, n and T powers of two, multiset(a) ⊆ multiset-with-counts(t, m)."""
    challenges.absorb_array(m)
    z = challenges.random_vec(1)[0]
    n_log = fr_ops.ceil_log2(a.shape[0])
    t_log = fr_ops.ceil_log2(t.shape[0])
    u_w_ip = challenges.random_vec(n_log)
    u_v_ip = challenges.random_vec(t_log)
    u_w = challenges.random_vec(n_log)
    v_w = challenges.random_vec(n_log)
    u_t = challenges.random_vec(t_log)
    v_t = challenges.random_vec(t_log)

    (sum_w, sum_v, w_ip_polys, w_ip_finals, v_ip_polys, v_ip_finals,
     w_hp_polys, w_hp_finals, t_hp_polys, t_hp_finals,
     m_at_ut, a_at_vw, t_at_vt) = _lookup_core(
        a, t, m, z, u_w_ip, u_v_ip, u_w, v_w, u_t, v_t
    )

    proof = LookupProof(
        z, m, sum_w, sum_v,
        u_w_ip, w_ip_polys, w_ip_finals,
        u_v_ip, v_ip_polys, v_ip_finals,
        u_w, v_w, w_hp_polys, w_hp_finals,
        u_t, v_t, t_hp_polys, t_hp_finals,
        m_at_ut, a_at_vw, t_at_vt,
    )
    for arr in (sum_w, sum_v, w_ip_polys, v_ip_polys, w_hp_polys, t_hp_polys):
        challenges.absorb_array(arr)
    return proof


# ---------------------------------------------------------------------------
# verifier (host)
# ---------------------------------------------------------------------------


def verify(proof: LookupProof, table_vals: list[int] | None = None) -> tuple[bool, str]:
    """Verify the lookup proof. table_vals: optional raw table values (ints);
    when given, t's MLE claim at v_t is recomputed from them. The binding of
    a's MLE claim (a_at_vw) to the caller's witness commitment/sumcheck chain
    is the caller's job, as with every claim-forwarding step in this codebase.
    """
    sum_w = sc.scalars_to_ints(proof.sum_w[None])[0]
    sum_v = sc.scalars_to_ints(proof.sum_v[None])[0]
    if sum_w != sum_v:
        return False, "grand sums differ"

    # sum claims reduce via inner-product sumchecks against the all-ones vector
    res = sc.inner_product_verify(
        sc.polys_to_ints(proof.w_ip_polys), sc.scalars_to_ints(proof.u_w_ip), sum_w
    )
    if not res.ok:
        return False, "w ip: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.w_ip_finals)
    if fb != HF.one_mont or not sc.inner_product_check_final(res, fa, fb):
        return False, "w ip: final mismatch"
    res = sc.inner_product_verify(
        sc.polys_to_ints(proof.v_ip_polys), sc.scalars_to_ints(proof.u_v_ip), sum_v
    )
    if not res.ok:
        return False, "v ip: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.v_ip_finals)
    if fb != HF.one_mont or not sc.inner_product_check_final(res, fa, fb):
        return False, "v ip: final mismatch"

    z = sc.scalars_to_ints(proof.z[None])[0]

    # w ⊙ (a+z) == all-ones: its MLE at any point is exactly 1
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.w_hp_polys),
        sc.scalars_to_ints(proof.u_w),
        sc.scalars_to_ints(proof.v_w),
        HF.one_mont,
        *sc.scalars_to_ints(proof.w_hp_finals),
    )
    if not res.ok:
        return False, "w hp: " + res.reason
    # final (a+z) claim must match a(v_w) + z
    fw, faz = sc.scalars_to_ints(proof.w_hp_finals)
    a_vw = sc.scalars_to_ints(proof.a_at_vw[None])[0]
    if faz != HF.add(a_vw, z):
        return False, "w hp: (a+z) final != a(v_w)+z"

    # v ⊙ (t+z) == m: MLE claim at u_t is m(u_t), recomputed from proof.m
    m_ints = sc.scalars_to_ints(proof.m)
    u_t = sc.scalars_to_ints(proof.u_t)
    m_at = _host_me_eval(m_ints, u_t)
    got_m = sc.scalars_to_ints(proof.m_at_ut[None])[0]
    if m_at != got_m:
        return False, "m MLE claim mismatch"
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.t_hp_polys),
        u_t,
        sc.scalars_to_ints(proof.v_t),
        m_at,
        *sc.scalars_to_ints(proof.t_hp_finals),
    )
    if not res.ok:
        return False, "t hp: " + res.reason
    fv, ftz = sc.scalars_to_ints(proof.t_hp_finals)
    t_vt = sc.scalars_to_ints(proof.t_at_vt[None])[0]
    if ftz != HF.add(t_vt, z):
        return False, "t hp: (t+z) final != t(v_t)+z"
    if table_vals is not None:
        want = _host_me_eval([HF.mont(int(x)) for x in table_vals], sc.scalars_to_ints(proof.v_t))
        if want != t_vt:
            return False, "t MLE != public table"
    return True, ""


def _host_me_eval(vals_mont: list[int], u_mont: list[int]) -> int:
    """Host MLE evaluation (Montgomery ints), LSB-variable-first like
    fr_ops.me_eval."""
    cur = list(vals_mont)
    for uk in u_mont:
        if len(cur) % 2:
            cur.append(0)
        cur = [
            HF.add(cur[2 * i], HF.mul(uk, HF.sub(cur[2 * i + 1], cur[2 * i])))
            for i in range(len(cur) // 2)
        ]
    return cur[0]


def range_table(bits: int) -> jax.Array:
    """The table [0, 2^bits) as Montgomery Fr, for range lookups."""
    vals = np.arange(1 << bits, dtype=np.uint64)
    raw = np.zeros((1 << bits, 8), dtype=np.uint32)
    raw[:, 0] = (vals & 0xFFFFFFFF).astype(np.uint32)
    raw[:, 1] = (vals >> 32).astype(np.uint32)
    return fr.mont(jnp.asarray(raw))
