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

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from . import zkrelu

Q, R = zkrelu.Q, zkrelu.R

_POS_MAX = zkrelu._POS_MAX

HF = host.fr


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


# ---------------------------------------------------------------------------
# committed-witness tier: bind X, Z and the aux tensors together
# ---------------------------------------------------------------------------
#
# The base proof establishes range facts about prover-supplied bit tensors but
# forwards every cross-tensor claim. With input X, output Z, sign/mag_bin/
# rem_bin, and ABS = |X| all Pedersen-committed (commit/witness.py), two
# product sumchecks close the rescale relation end to end:
#
#   (1) X = (2*sign - 1) .* ABS        -> sumcheck of sign .* ABS at u1:
#       X(u1) == 2*(sign.*ABS)(u1) - ABS(u1)
#   (2) Z = (2*sign - 1) .* MAGV       -> sumcheck of sign .* MAGV at u2:
#       Z(u2) == 2*(sign.*MAGV)(u2) - MAGV(u2),  MAGV = recombined mag_bin
#   (3) ABS = 2^16*MAGV + REMV at the base proof's u_rec (linear; REMV's
#       signed bit-15 weight = full recombination - 2^16 * top bit).
#
# Every tensor evaluation in (1)-(3) and in the base proof's finals is a
# verified commitment opening, so a malicious prover cannot answer different
# points with different tensors.


@functools.partial(jax.jit, static_argnums=(1,))
def _recombine_tensor(bits: jax.Array, width: int) -> jax.Array:
    """(n*width, 8) bit tensor -> (n, 8) recombined values sum_k 2^k b_k."""
    n = bits.shape[0] // width
    b3 = bits.reshape(n, width, 8)
    w = fr.mont(fr_ops.from_u32(jnp.asarray([1 << k for k in range(width)], jnp.uint32)))
    prod = fr.mul(b3, w[None])
    acc = prod[:, 0]
    for k in range(1, width):
        acc = fr.add(acc, prod[:, k])
    return acc


@jax.jit
def _abs_tensor(aux_mag: jax.Array, aux_rem: jax.Array) -> jax.Array:
    """ABS = 2^16 * MAGV + REMV from the committed bit tensors' layout
    (REMV = sum_{k<15} 2^k rem_k - 2^15 rem_15, the signed remainder)."""
    magv = _recombine_tensor(aux_mag, Q)
    n = aux_rem.shape[0] // R
    r3 = aux_rem.reshape(n, R, 8)
    w_ints = [1 << k for k in range(R - 1)] + [fr.P_INT - (1 << (R - 1))]
    w = jnp.asarray(fr.from_ints(w_ints, mont_form=True))
    prod = fr.mul(r3, w[None])
    remv = prod[:, 0]
    for k in range(1, R):
        remv = fr.add(remv, prod[:, k])
    scale = fr.mont(fr_ops.from_u32(jnp.full((n,), 1 << 16, jnp.uint32)))
    return fr.add(fr.mul(scale, magv), remv)


@dataclasses.dataclass
class RescaleBinding:
    """Committed-tier rescale proof: base zkReLU-shaped proof + the two
    product sumchecks binding X and Z to the committed aux."""

    base: "zkrelu.ZkReluProof"
    u1: jax.Array
    v1: jax.Array
    sa_polys: jax.Array
    sa_finals: jax.Array  # (2, 8): sign(v1), ABS(v1)
    sa_claim: jax.Array  # (8,) (sign .* ABS)(u1)
    u2: jax.Array
    v2: jax.Array
    sm_polys: jax.Array
    sm_finals: jax.Array  # (2, 8): sign(v2), MAGV(v2)
    sm_claim: jax.Array  # (8,) (sign .* MAGV)(u2)


def commit_witness(wc, aux: dict, prefix: str) -> None:
    """Commit this rescale's aux tensors (call BEFORE wc.absorb)."""
    wc.commit(f"{prefix}sign", aux["sign"])
    wc.commit(f"{prefix}mag", aux["mag_bin"])
    wc.commit(f"{prefix}rem", aux["rem_bin"])
    wc.commit(f"{prefix}abs", _abs_tensor(aux["mag_bin"], aux["rem_bin"]))


def prove_committed(X: jax.Array, Z: jax.Array, aux: dict, wc, prefix: str,
                    challenges: ChallengeSource,
                    x_name: str, z_name: str) -> RescaleBinding:
    """Committed-tier prove. `wc` must already hold commitments for
    {prefix}{sign,mag,rem,abs} (commit_witness) plus x_name/z_name, absorbed."""
    base = zkrelu.prove(X, aux, challenges)
    log_q, log_r = fr_ops.ceil_log2(Q), fr_ops.ceil_log2(R)
    wc.open(f"{prefix}X@v_hp", x_name, base.v_hp)
    wc.open(f"{prefix}sign@v_hp", f"{prefix}sign", base.v_hp)
    wc.open(f"{prefix}mag@v_z", f"{prefix}mag", base.v_z_bin)
    wc.open(f"{prefix}rem@v_r", f"{prefix}rem", base.v_r_bin)
    wc.open_recombined(f"{prefix}mag.rec", f"{prefix}mag", base.u_recover, log_q)
    wc.open_recombined(f"{prefix}rem.rec", f"{prefix}rem", base.u_recover, log_r)
    wc.open_top_bit(f"{prefix}rem.top", f"{prefix}rem", base.u_recover, log_r)
    wc.open(f"{prefix}abs@u_rec", f"{prefix}abs", base.u_recover)

    sign_t, mag_bin, rem_bin = aux["sign"], aux["mag_bin"], aux["rem_bin"]
    abs_t = _abs_tensor(mag_bin, rem_bin)
    magv_t = _recombine_tensor(mag_bin, Q)
    log_n = fr_ops.ceil_log2(X.shape[0])

    u1 = challenges.random_vec(log_n)
    v1 = challenges.random_vec(log_n)
    sa_polys, sa_finals = sc.hadamard_prove_scan(sign_t, abs_t, u1, v1)
    sa_claim = fr_ops.me_eval(fr.mul(sign_t, abs_t), u1)
    challenges.absorb_array(sa_polys)
    wc.open(f"{prefix}X@u1", x_name, u1)
    wc.open(f"{prefix}abs@u1", f"{prefix}abs", u1)
    wc.open(f"{prefix}sign@v1", f"{prefix}sign", v1)
    wc.open(f"{prefix}abs@v1", f"{prefix}abs", v1)

    u2 = challenges.random_vec(log_n)
    v2 = challenges.random_vec(log_n)
    sm_polys, sm_finals = sc.hadamard_prove_scan(sign_t, magv_t, u2, v2)
    sm_claim = fr_ops.me_eval(fr.mul(sign_t, magv_t), u2)
    challenges.absorb_array(sm_polys)
    wc.open(f"{prefix}Z@u2", z_name, u2)
    wc.open_recombined(f"{prefix}mag.rec_u2", f"{prefix}mag", u2, log_q)
    wc.open(f"{prefix}sign@v2", f"{prefix}sign", v2)
    wc.open_recombined(f"{prefix}mag.rec_v2", f"{prefix}mag", v2, log_q)

    return RescaleBinding(base, u1, v1, sa_polys, sa_finals, sa_claim,
                          u2, v2, sm_polys, sm_finals, sm_claim)


def verify_committed(proof: RescaleBinding, ck, prefix: str,
                     x_name: str, z_name: str) -> tuple[bool, str]:
    """Verify the committed-tier rescale: base proof structure + bindings."""
    from ..commit import witness as wcommit

    ok, msg = zkrelu.verify(proof.base)
    if not ok:
        return False, f"base: {msg}"
    b = proof.base
    ints = sc.scalars_to_ints
    log_q, log_r = fr_ops.ceil_log2(Q), fr_ops.ceil_log2(R)
    try:
        hp = ints(b.hp_finals)
        ck.require(f"{prefix}X@v_hp", x_name, ints(b.v_hp), hp[0], "X@v_hp")
        ck.require(f"{prefix}sign@v_hp", f"{prefix}sign", ints(b.v_hp), hp[1],
                   "sign@v_hp")
        ck.require(f"{prefix}mag@v_z", f"{prefix}mag", ints(b.v_z_bin),
                   ints(b.mag_final[None])[0], "mag binary final")
        ck.require(f"{prefix}rem@v_r", f"{prefix}rem", ints(b.v_r_bin),
                   ints(b.rem_final[None])[0], "rem binary final")

        # (3) ABS recombination at u_rec
        u_rec = ints(b.u_recover)
        magrec = ck.recombined(f"{prefix}mag.rec", f"{prefix}mag", u_rec, log_q)
        remfull = ck.recombined(f"{prefix}rem.rec", f"{prefix}rem", u_rec, log_r)
        remtop = ck.top_bit(f"{prefix}rem.top", f"{prefix}rem", u_rec, log_r)
        remv = HF.sub(remfull, HF.mul(HF.mont(1 << R), remtop))
        abs_urec = ck.value(f"{prefix}abs@u_rec", f"{prefix}abs", u_rec)
        if abs_urec != HF.add(HF.mul(HF.mont(1 << 16), magrec), remv):
            return False, "ABS != 2^16*mag + rem_signed at u_rec"

        # (1) X = 2*(sign.*ABS) - ABS at u1
        u1, v1 = ints(proof.u1), ints(proof.v1)
        fa = ck.value(f"{prefix}sign@v1", f"{prefix}sign", v1)
        fb = ck.value(f"{prefix}abs@v1", f"{prefix}abs", v1)
        res = sc.hadamard_verify(sc.polys_to_ints(proof.sa_polys), u1, v1,
                                 ints(proof.sa_claim[None])[0], fa, fb)
        if not res.ok:
            return False, "sign*ABS sumcheck: " + res.reason
        x_u1 = ck.value(f"{prefix}X@u1", x_name, u1)
        abs_u1 = ck.value(f"{prefix}abs@u1", f"{prefix}abs", u1)
        two = HF.mont(2)
        if x_u1 != HF.sub(HF.mul(two, ints(proof.sa_claim[None])[0]), abs_u1):
            return False, "X != (2*sign-1)*ABS at u1"

        # (2) Z = 2*(sign.*MAGV) - MAGV at u2
        u2, v2 = ints(proof.u2), ints(proof.v2)
        fa = ck.value(f"{prefix}sign@v2", f"{prefix}sign", v2)
        fb = ck.recombined(f"{prefix}mag.rec_v2", f"{prefix}mag", v2, log_q)
        res = sc.hadamard_verify(sc.polys_to_ints(proof.sm_polys), u2, v2,
                                 ints(proof.sm_claim[None])[0], fa, fb)
        if not res.ok:
            return False, "sign*MAGV sumcheck: " + res.reason
        z_u2 = ck.value(f"{prefix}Z@u2", z_name, u2)
        mag_u2 = ck.recombined(f"{prefix}mag.rec_u2", f"{prefix}mag", u2, log_q)
        if z_u2 != HF.sub(HF.mul(two, ints(proof.sm_claim[None])[0]), mag_u2):
            return False, "Z != (2*sign-1)*mag at u2"
    except wcommit.BindingError as e:
        return False, f"binding: {e}"
    return True, ""
