"""zkReLU: quantized ReLU with auxiliary bit-decomposition inputs + its prover.

TPU-native rebuild of /root/reference/zkrelu.cu. The forward computes, per
element of the pre-activation X (Montgomery Fr at combined scale 2^32):

  x = unmont(X) interpreted as signed 48-bit fixed point:
      positive iff x <= 2^47 - 1; negative iff x >= p - 2^47 (zkrelu.cu:18-27)
  mag = x (positive) or low-64-bits of x + 2^47 mod p (negative, biased)
  rem = signed 16-bit remainder: low 15 bits, sign at bit 15 (round-to-nearest)
  mag_rescaled = (mag - rem) >> 16                    (32-bit)
  Z = sign * mont(mag_rescaled)   — ReLU fused with /2^16 requantization

Auxiliary tensors (layout matches zkrelu.cu:33-39): sign (n,), mag_bin (n*32,)
bits of mag_rescaled LSB-first, rem_bin (n*16,) 15 magnitude bits + sign bit.

All 64-bit math is done on u32 (lo, hi) pairs — TPUs have no native u64.

prove() mirrors zkReLU::prove (zkrelu.cu:79-100): two binary sumchecks (bit-ness
of mag_bin/rem_bin), bit-recombination partial-ME folds at u_recover, and a
Hadamard sumcheck of X (.) sign. The reference discards the recombination
results (SURVEY.md §0.1); we keep them in the proof and verify them.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host, planar
from ..sumcheck import planar_protocols as pp
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from ..tensor import planar_ops as pops

HF = host.fr

LOG_Q, Q = 5, 32  # mag_rescaled bit width (zkrelu.cu:74-77)
LOG_R, R = 4, 16  # remainder width (15 bits + sign)

# 2^47 - 1 and p - 2^47 as limb constants (zkrelu.cu:18,23)
_POS_MAX = np.array([4294967295, 32767, 0, 0, 0, 0, 0, 0], dtype=np.uint32)
_NEG_MIN = np.array([1, 4294934527, 4294859774, 1404937218, 161601541, 859428872, 698187080, 1944954707], dtype=np.uint32)
_BIAS_2_47 = np.array([0, 32768, 0, 0, 0, 0, 0, 0], dtype=np.uint32)


@jax.jit
def forward(X: jax.Array):
    """X: (n, 8) Montgomery Fr. Returns (Z, aux dict with sign/mag_bin/rem_bin).

    Exact semantics of relu_kernel (zkrelu.cu:11-41). Elements outside the valid
    signed-48-bit range take the positive branch (the reference leaves `sign`
    uninitialized there — undefined behavior we replace with a defined default).
    """
    from ..field import mp

    n = X.shape[0]
    x = fr.unmont(X)
    pos = mp._gte(jnp.broadcast_to(jnp.asarray(_POS_MAX), x.shape), x)

    x_biased = fr.add(x, jnp.broadcast_to(jnp.asarray(_BIAS_2_47), x.shape))
    lo = jnp.where(pos, x[:, 0], x_biased[:, 0])
    hi = jnp.where(pos, x[:, 1], x_biased[:, 1])

    rem_sign = (lo >> 15) & jnp.uint32(1)
    rem_mag = lo & jnp.uint32(32767)
    # mag - rem on the (lo, hi) pair:
    #   rem >= 0: subtract rem_mag (borrow-free: rem_mag <= lo's low bits)
    #   rem <  0: add (2^15 - rem_mag), propagating the carry into hi
    add_amt = jnp.uint32(32768) - rem_mag
    lo_neg = lo + add_amt
    hi_neg = hi + (lo_neg < lo).astype(jnp.uint32)
    lo_pos = lo - rem_mag
    lo2 = jnp.where(rem_sign == 1, lo_neg, lo_pos)
    hi2 = jnp.where(rem_sign == 1, hi_neg, hi)
    mag_rescaled = (lo2 >> 16) | (hi2 << 16)  # bits 16..47 of (mag - rem)

    one_m = fr.ones_mont((n,))
    zero = fr.zeros((n,))
    sign = fr.select(pos, one_m, zero)

    shifts = jnp.arange(Q, dtype=jnp.uint32)
    mag_bits = (mag_rescaled[:, None] >> shifts) & jnp.uint32(1)  # (n, 32)
    mag_bin = fr.select((mag_bits == 1).reshape(-1), fr.ones_mont((n * Q,)), fr.zeros((n * Q,)))

    rem_shifts = jnp.arange(15, dtype=jnp.uint32)
    rem_bits = (rem_mag[:, None] >> rem_shifts) & jnp.uint32(1)  # (n, 15)
    rem_bits = jnp.concatenate([rem_bits, rem_sign[:, None]], axis=1)  # (n, 16)
    rem_bin = fr.select((rem_bits == 1).reshape(-1), fr.ones_mont((n * R,)), fr.zeros((n * R,)))

    Z = fr.mul(fr.mont(fr_ops.from_u32(mag_rescaled)), sign)
    return Z, {"sign": sign, "mag_bin": mag_bin, "rem_bin": rem_bin}


@jax.jit
def forward_compact(X: jax.Array):
    """Forward pass returning COMPACT auxiliary witnesses (u32 per element
    instead of Montgomery bit tensors — 48x less HBM; the planar prover
    expands bits on the fly). Z is identical to forward(X)'s.

    Returns (Z, {"sign_bits": (n,) u32 0/1, "mag": (n,) u32 (mag_rescaled),
    "rem_bits16": (n,) u32 (15 magnitude bits + sign at bit 15)}).
    """
    from ..field import mp

    n = X.shape[0]
    x = fr.unmont(X)
    pos = mp._gte(jnp.broadcast_to(jnp.asarray(_POS_MAX), x.shape), x)

    x_biased = fr.add(x, jnp.broadcast_to(jnp.asarray(_BIAS_2_47), x.shape))
    lo = jnp.where(pos, x[:, 0], x_biased[:, 0])
    hi = jnp.where(pos, x[:, 1], x_biased[:, 1])

    rem_sign = (lo >> 15) & jnp.uint32(1)
    rem_mag = lo & jnp.uint32(32767)
    add_amt = jnp.uint32(32768) - rem_mag
    lo_neg = lo + add_amt
    hi_neg = hi + (lo_neg < lo).astype(jnp.uint32)
    lo_pos = lo - rem_mag
    lo2 = jnp.where(rem_sign == 1, lo_neg, lo_pos)
    hi2 = jnp.where(rem_sign == 1, hi_neg, hi)
    mag_rescaled = (lo2 >> 16) | (hi2 << 16)

    sign_bits = pos.astype(jnp.uint32)
    rem_bits16 = rem_mag | (rem_sign << 15)

    one_m = fr.ones_mont((n,))
    zero = fr.zeros((n,))
    sign = fr.select(pos, one_m, zero)
    Z = fr.mul(fr.mont(fr_ops.from_u32(mag_rescaled)), sign)
    return Z, {"sign_bits": sign_bits, "mag": mag_rescaled, "rem_bits16": rem_bits16}


@dataclasses.dataclass
class ZkReluProof:
    # challenge vectors (recorded so the verifier in any challenge mode can replay)
    u_z_bin: jax.Array
    v_z_bin: jax.Array
    u_r_bin: jax.Array
    v_r_bin: jax.Array
    u_recover: jax.Array
    u_hp: jax.Array
    v_hp: jax.Array
    # sumcheck messages
    mag_polys: jax.Array  # (log n + 5, 3, 8)
    mag_final: jax.Array  # (8,)
    rem_polys: jax.Array
    rem_final: jax.Array
    hp_polys: jax.Array
    hp_finals: jax.Array  # (2, 8): X(v_hp), sign(v_hp)
    # bit recombination folds at u_recover (reference computes-and-discards;
    # zkrelu.cu:92,94 — we keep them)
    mag_bits_at_u: jax.Array  # (Q, 8)
    rem_bits_at_u: jax.Array  # (R, 8)
    # claims for the verifier
    hp_claim: jax.Array  # (8,) MLE of X (.) sign at u_hp


@jax.jit
def _prove_core(X, sign, mag_bin, rem_bin, u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp):
    """All three sumchecks of the layer fused into ONE jit (statically halving
    shapes; zero per-round host round-trips)."""
    mag_polys, mag_final = sc.binary_prove(mag_bin, u_z, v_z)
    mag_bits_at_u = fr_ops.partial_me(mag_bin, u_rec, Q)
    rem_polys, rem_final = sc.binary_prove(rem_bin, u_r, v_r)
    rem_bits_at_u = fr_ops.partial_me(rem_bin, u_rec, R)
    hp_polys, hp_finals = sc.hadamard_prove(X, sign, u_hp, v_hp)
    hp_claim = fr_ops.me_eval(fr.mul(X, sign), u_hp)
    return mag_polys, mag_final, mag_bits_at_u, rem_polys, rem_final, rem_bits_at_u, hp_polys, hp_finals, hp_claim


def prove(X: jax.Array, aux: dict, challenges: ChallengeSource) -> ZkReluProof:
    """Mirror of zkReLU::prove (zkrelu.cu:79-100); challenge draw order matches
    the reference exactly (u_z, v_z, u_r, v_r, u_recover, u_hp, v_hp)."""
    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    u_z = challenges.random_vec(log_size + LOG_Q)
    v_z = challenges.random_vec(log_size + LOG_Q)
    u_r = challenges.random_vec(log_size + LOG_R)
    v_r = challenges.random_vec(log_size + LOG_R)
    u_rec = challenges.random_vec(log_size)
    u_hp = challenges.random_vec(log_size)
    v_hp = challenges.random_vec(log_size)
    (mag_polys, mag_final, mag_bits_at_u, rem_polys, rem_final, rem_bits_at_u,
     hp_polys, hp_finals, hp_claim) = _prove_core(
        X, aux["sign"], aux["mag_bin"], aux["rem_bin"], u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp
    )
    proof = ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_bits_at_u, rem_bits_at_u, hp_claim,
    )
    challenges.absorb_array(mag_polys)
    challenges.absorb_array(rem_polys)
    challenges.absorb_array(hp_polys)
    return proof


# ---------------------------------------------------------------------------
# planar prover (TPU hot path; stream-identical to prove())
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(4,))
def _relu_prep_planar(X, aux_mag, aux_rem, aux_sign, log_size, u_rec, u_hp):
    """One fused prep dispatch: expand bit matrices into bit-reversed flat
    layout for the binary sumchecks, bit-reverse X/sign for the Hadamard,
    and compute the recombination claims + hp_claim as eq-weighted masked
    sums (mul-free on the bit side)."""
    n2 = 1 << log_size
    pad = n2 - aux_mag.shape[0]
    mag = jnp.pad(aux_mag, (0, pad))
    rem = jnp.pad(aux_rem, (0, pad))
    sign = jnp.pad(aux_sign, (0, pad))
    Xp = planar.to_planar(fr_ops.pad_to(X, n2))  # (8, n2) plain order

    revn = jnp.asarray(pops.bitrev_indices(log_size))
    rev5 = pops.bitrev_indices(LOG_Q)
    rev4 = pops.bitrev_indices(LOG_R)

    shifts_q = jnp.arange(Q, dtype=jnp.uint32)
    mag_bits = (mag[None, :] >> shifts_q[:, None]) & jnp.uint32(1)  # (32, n2) semantic rows
    shifts_r = jnp.arange(R, dtype=jnp.uint32)
    rem_bits = (rem[None, :] >> shifts_r[:, None]) & jnp.uint32(1)  # (16, n2)

    # binary-sumcheck inputs: stored[rev5(k)*n2 + revn(j)] = bit_k(mag[j])
    mag_rev = jnp.take(mag_bits, jnp.asarray(rev5), axis=0)[:, revn].reshape(-1)
    rem_rev = jnp.take(rem_bits, jnp.asarray(rev4), axis=0)[:, revn].reshape(-1)

    # recombination claims (reference computes-and-discards, zkrelu.cu:92-94):
    # row k's MLE at u_rec = eq-weighted masked sum over the element axis.
    E_rec = pops.eq_table(u_rec)  # (8, n2) standard order
    mag_at_u = planar.masked_sum(mag_bits == 1, E_rec[:, None, :])  # (8, 32)
    rem_at_u = planar.masked_sum(rem_bits == 1, E_rec[:, None, :])  # (8, 16)

    # Hadamard inputs (bit-reversed) + claim MLE of X (.) sign at u_hp
    X_rev = Xp[:, revn]
    sign_rev = sign[revn]
    E_hp = pops.eq_table(u_hp)
    hp_claim = planar.dot(planar.select(sign == 1, Xp, jnp.zeros_like(Xp)), E_hp)

    return (mag_rev, rem_rev, X_rev, sign_rev,
            jnp.swapaxes(mag_at_u, 0, 1), jnp.swapaxes(rem_at_u, 0, 1), hp_claim)


def prove_planar(X: jax.Array, aux: dict, challenges: ChallengeSource) -> ZkReluProof:
    """Planar/pallas prover on compact aux (forward_compact). Challenge draw
    order and emitted proof stream match prove() bit-for-bit."""
    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    u_z = challenges.random_vec(log_size + LOG_Q)
    v_z = challenges.random_vec(log_size + LOG_Q)
    u_r = challenges.random_vec(log_size + LOG_R)
    v_r = challenges.random_vec(log_size + LOG_R)
    u_rec = challenges.random_vec(log_size)
    u_hp = challenges.random_vec(log_size)
    v_hp = challenges.random_vec(log_size)

    (mag_rev, rem_rev, X_rev, sign_rev, mag_at_u, rem_at_u, hp_claim) = _relu_prep_planar(
        X, aux["mag"], aux["rem_bits16"], aux["sign_bits"], log_size, u_rec, u_hp
    )
    mag_polys, mag_final = pp.binary_prove_bits(mag_rev, u_z, v_z)
    rem_polys, rem_final = pp.binary_prove_bits(rem_rev, u_r, v_r)
    hp_polys, hp_finals = pp.hadamard_prove_bits(X_rev, sign_rev, u_hp, v_hp)

    proof = ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_at_u, rem_at_u, hp_claim,
    )
    challenges.absorb_array(mag_polys)
    challenges.absorb_array(rem_polys)
    challenges.absorb_array(hp_polys)
    return proof


def verify(proof: ZkReluProof) -> tuple[bool, str]:
    """Check both binary sumchecks, the Hadamard sumcheck against the claimed
    product MLE, and final-claim consistency. (The reference proves-and-discards;
    cross-layer binding of hp_claim to the FC sumchecks is done at model level.)
    """
    mag_final = sc.scalars_to_ints(proof.mag_final[None])[0]
    res = sc.binary_verify(
        sc.polys_to_ints(proof.mag_polys),
        sc.scalars_to_ints(proof.u_z_bin),
        sc.scalars_to_ints(proof.v_z_bin),
        mag_final,
    )
    if not res.ok:
        return False, "mag_bin: " + res.reason
    rem_final = sc.scalars_to_ints(proof.rem_final[None])[0]
    res = sc.binary_verify(
        sc.polys_to_ints(proof.rem_polys),
        sc.scalars_to_ints(proof.u_r_bin),
        sc.scalars_to_ints(proof.v_r_bin),
        rem_final,
    )
    if not res.ok:
        return False, "rem_bin: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.hp_finals)
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.hp_polys),
        sc.scalars_to_ints(proof.u_hp),
        sc.scalars_to_ints(proof.v_hp),
        sc.scalars_to_ints(proof.hp_claim[None])[0],
        fa,
        fb,
    )
    if not res.ok:
        return False, "hadamard: " + res.reason
    return True, ""
