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
from ..utils import aot

HF = host.fr

LOG_Q, Q = 5, 32  # mag_rescaled bit width (zkrelu.cu:74-77)
LOG_R, R = 4, 16  # remainder width (R-1 magnitude bits + sign)
SCALE_OUT_BITS = 16  # requantization shift == R: mag_rescaled = (mag - rem) >> R

# Derived threshold constants. The sign threshold is 2^(Q+R-1): a magnitude
# occupies Q + R bits, so positives are x <= 2^(Q+R-1) - 1 and negatives
# x >= p - 2^(Q+R-1) (zkrelu.cu:18,23 hardcodes the Q=32/R=16 instance, 2^47).
_POS_MAX = np.zeros(8, np.uint32)
_NEG_MIN = np.zeros(8, np.uint32)
_BIAS = np.zeros(8, np.uint32)


def set_widths(q: int, r: int) -> None:
    """(Re)derive all width-dependent constants. Called at import for the
    reference widths and by config._apply for overrides; jitted kernels take
    (Q, R) as static args so a reconfigure can't hit stale compile caches."""
    global Q, R, LOG_Q, LOG_R, SCALE_OUT_BITS, _POS_MAX, _NEG_MIN, _BIAS
    # r <= 31: _split_mag computes `lo2 >> r` and `hi2 << (32 - r)` on u32 —
    # a shift by the full 32-bit width would be undefined in XLA
    assert 2 <= r <= 31 and 1 <= q <= 32 and q + r <= 64
    Q, R = q, r
    LOG_Q = (q - 1).bit_length()
    LOG_R = (r - 1).bit_length()
    SCALE_OUT_BITS = r
    from ..field import mp

    tb = q + r - 1
    _POS_MAX = mp.limbs_from_int((1 << tb) - 1, 8)
    _NEG_MIN = mp.limbs_from_int(fr.P_INT - (1 << tb), 8)
    _BIAS = mp.limbs_from_int(1 << tb, 8)


set_widths(32, 16)
# reference-instance sanity (zkrelu.cu:18,23)
assert list(_POS_MAX) == [4294967295, 32767, 0, 0, 0, 0, 0, 0]
assert list(_NEG_MIN) == [1, 4294934527, 4294859774, 1404937218, 161601541, 859428872, 698187080, 1944954707]


def _split_mag(X: jax.Array, q: int, r: int):
    """Shared forward core: (pos mask, rem_sign, rem_mag, mag_rescaled) per
    element, exact semantics of relu_kernel (zkrelu.cu:11-41) at widths (q, r).
    The (q+r)-bit magnitude lives in the low two u32 limbs (q + r <= 64)."""
    from ..field import mp, planar

    pos_max, bias = _width_consts(q, r)
    # unmont via the blocked pallas kernel (mp.from_mont's digit outer product
    # costs ~2 KB of i32 temporaries per element — 1 GB at the zkdl256 scale)
    x = planar.from_planar(planar.from_mont(planar.to_planar(X)))
    pos = mp._gte(jnp.broadcast_to(jnp.asarray(pos_max), x.shape), x)

    x_biased = fr.add(x, jnp.broadcast_to(jnp.asarray(bias), x.shape))
    lo = jnp.where(pos, x[:, 0], x_biased[:, 0])
    hi = jnp.where(pos, x[:, 1], x_biased[:, 1])

    rem_sign = (lo >> np.uint32(r - 1)) & jnp.uint32(1)
    rem_mag = lo & jnp.uint32((1 << (r - 1)) - 1)
    # mag - rem on the (lo, hi) pair:
    #   rem >= 0: subtract rem_mag (borrow-free: rem_mag <= lo's low bits)
    #   rem <  0: add (2^(r-1) - rem_mag), propagating the carry into hi
    add_amt = jnp.uint32(1 << (r - 1)) - rem_mag
    lo_neg = lo + add_amt
    hi_neg = hi + (lo_neg < lo).astype(jnp.uint32)
    lo_pos = lo - rem_mag
    lo2 = jnp.where(rem_sign == 1, lo_neg, lo_pos)
    hi2 = jnp.where(rem_sign == 1, hi_neg, hi)
    mag_rescaled = (lo2 >> np.uint32(r)) | (hi2 << np.uint32(32 - r))  # bits r..q+r-1
    return pos, rem_sign, rem_mag, mag_rescaled


@functools.lru_cache(maxsize=None)
def _width_consts(q: int, r: int):
    from ..field import mp

    tb = q + r - 1
    return mp.limbs_from_int((1 << tb) - 1, 8), mp.limbs_from_int(1 << tb, 8)


@functools.partial(aot.jit, static_argnums=(1, 2))
def _forward(X: jax.Array, q: int, r: int):
    """X: (n, 8) Montgomery Fr. Returns (Z, aux dict with sign/mag_bin/rem_bin).

    Exact semantics of relu_kernel (zkrelu.cu:11-41). Elements outside the valid
    signed-(q+r)-bit range take the positive branch (the reference leaves `sign`
    uninitialized there — undefined behavior we replace with a defined default).
    """
    n = X.shape[0]
    pos, rem_sign, rem_mag, mag_rescaled = _split_mag(X, q, r)

    one_m = fr.ones_mont((n,))
    zero = fr.zeros((n,))
    sign = fr.select(pos, one_m, zero)

    shifts = jnp.arange(q, dtype=jnp.uint32)
    mag_bits = (mag_rescaled[:, None] >> shifts) & jnp.uint32(1)  # (n, q)
    mag_bin = fr.select((mag_bits == 1).reshape(-1), fr.ones_mont((n * q,)), fr.zeros((n * q,)))

    rem_shifts = jnp.arange(r - 1, dtype=jnp.uint32)
    rem_bits = (rem_mag[:, None] >> rem_shifts) & jnp.uint32(1)  # (n, r-1)
    rem_bits = jnp.concatenate([rem_bits, rem_sign[:, None]], axis=1)  # (n, r)
    rem_bin = fr.select((rem_bits == 1).reshape(-1), fr.ones_mont((n * r,)), fr.zeros((n * r,)))

    Z = fr.mul(fr.mont(fr_ops.from_u32(mag_rescaled)), sign)
    return Z, {"sign": sign, "mag_bin": mag_bin, "rem_bin": rem_bin}


def forward(X: jax.Array):
    return _forward(X, Q, R)


@functools.partial(aot.jit, static_argnums=(1, 2))
def _forward_compact(X: jax.Array, q: int, r: int):
    """Forward pass returning COMPACT auxiliary witnesses (u32 per element
    instead of Montgomery bit tensors — 48x less HBM; the planar prover
    expands bits on the fly). Z is identical to forward(X)'s.

    Returns (Z, {"sign_bits": (n,) u32 0/1, "mag": (n,) u32 (mag_rescaled),
    "rem_bits16": (n,) u32 (r-1 magnitude bits + sign at bit r-1)}).
    """
    from ..field import planar

    n = X.shape[0]
    pos, rem_sign, rem_mag, mag_rescaled = _split_mag(X, q, r)

    sign_bits = pos.astype(jnp.uint32)
    rem_bits16 = rem_mag | (rem_sign << np.uint32(r - 1))

    # Z = sign * mont(mag): mont via the blocked pallas kernel (mp.to_mont's
    # temporaries are ~2 KB/element), then a select — fr.mul by a 0/1-valued
    # sign is exactly a select.
    mag_limbs = jnp.concatenate([mag_rescaled[None, :], jnp.zeros((7, n), jnp.uint32)], axis=0)
    mag_mont = planar.to_mont(mag_limbs)  # (8, n)
    Zp = planar.select(pos, mag_mont, jnp.zeros_like(mag_mont))
    return planar.from_planar(Zp), {"sign_bits": sign_bits, "mag": mag_rescaled, "rem_bits16": rem_bits16}


def forward_compact(X: jax.Array):
    return _forward_compact(X, Q, R)


@dataclasses.dataclass
class AuxCommitments:
    """Pedersen row commitments over the auxiliary witness tensors
    (docs/SOUNDNESS.md gap #1): sign (n,), mag_bin (n*Q,), rem_bin (n*R,),
    all in the standard (n, 8)-prover layout. Generators come from the
    deterministic shared pool (pedersen.aux_generators), sqrt-sized like the
    weight commitments (demo.cu:81)."""

    sign: "pedersen.RowCommitments"
    mag: "pedersen.RowCommitments"
    rem: "pedersen.RowCommitments"


@functools.partial(aot.jit, static_argnums=(3, 4))
def _expand_aux(sign_bits, mag, rem_bits16, q: int, r: int):
    """Compact aux -> standard-layout Montgomery tensors: sign (n, 8),
    mag_bin (n*q, 8) with bit k of element j at index j*q + k (matching
    _forward / zkrelu.cu:33-39), rem_bin (n*r, 8) likewise (sign bit is row
    r-1, already packed into rem_bits16)."""
    n = sign_bits.shape[0]
    sign = fr.select(sign_bits == 1, fr.ones_mont((n,)), fr.zeros((n,)))
    shifts = jnp.arange(q, dtype=jnp.uint32)
    mag_bits = ((mag[:, None] >> shifts) & jnp.uint32(1)).reshape(-1)
    mag_bin = fr.select(mag_bits == 1, fr.ones_mont((n * q,)), fr.zeros((n * q,)))
    rshifts = jnp.arange(r, dtype=jnp.uint32)
    rem_bits = ((rem_bits16[:, None] >> rshifts) & jnp.uint32(1)).reshape(-1)
    rem_bin = fr.select(rem_bits == 1, fr.ones_mont((n * r,)), fr.zeros((n * r,)))
    return sign, mag_bin, rem_bin


def _aux_gens(size: int) -> "pedersen.Generators":
    from ..commit import pedersen

    gen_size = 1 << ((fr_ops.ceil_log2(size) + 1) // 2)
    return pedersen.nums_generators(gen_size)


@functools.partial(aot.jit, static_argnums=(3, 4))
def _expand_aux_bits(sign_bits, mag, rem_bits16, q: int, r: int):
    """Compact aux -> u32 0/1 bit arrays in the standard layout (bit k of
    element j at index j*q + k), for the masked-sum commitment path."""
    shifts = jnp.arange(q, dtype=jnp.uint32)
    mag_bits = ((mag[:, None] >> shifts) & jnp.uint32(1)).reshape(-1)
    rshifts = jnp.arange(r, dtype=jnp.uint32)
    rem_bits = ((rem_bits16[:, None] >> rshifts) & jnp.uint32(1)).reshape(-1)
    return sign_bits, mag_bits, rem_bits


def commit_aux(aux: dict) -> AuxCommitments:
    """Commit the compact auxiliary witnesses (forward_compact output). The
    commitments are absorbed into the transcript before this layer's
    challenges are drawn (prove_planar), so the prover is bound to ONE witness
    tensor for both the binary sumchecks and the recombination folds (closing
    the range-proof binding gap, docs/SOUNDNESS.md gap #1). Generators are
    NUMS (pedersen.nums_generators — dlogs unknown to everyone, so the
    commitments are binding against the prover itself); all three tensors are
    0/1-valued, so each commitment is a masked generator sum — no scalar-muls."""
    from ..commit import pedersen

    assert Q == (1 << LOG_Q) and R == (1 << LOG_R), "committed aux needs 2^k widths"
    sign_b, mag_b, rem_b = _expand_aux_bits(aux["sign_bits"], aux["mag"], aux["rem_bits16"], Q, R)
    return AuxCommitments(
        sign=pedersen.commit_bits(_aux_gens(sign_b.shape[0]), sign_b),
        mag=pedersen.commit_bits(_aux_gens(mag_b.shape[0]), mag_b),
        rem=pedersen.commit_bits(_aux_gens(rem_b.shape[0]), rem_b),
    )


def _absorb_aux_coms(challenges: ChallengeSource, coms: AuxCommitments) -> None:
    for c in (coms.sign, coms.mag, coms.rem):
        challenges.absorb_array(c.points.x)
        challenges.absorb_array(c.points.y)
        challenges.absorb_array(c.points.z)


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
    # --- chained mode (GKR-style cross-layer binding; None when unchained) ---
    # A = sign (.) mont(mag) product sumcheck anchored at the downstream FC's
    # X-side point w (so its initial claim IS that FC's ip_finals[0]):
    a_point: jax.Array | None = None  # (log n, 8) = w = u_in^{fc} || u_bs^{fc}
    a_polys: jax.Array | None = None  # (log n, 3, 8)
    a_finals: jax.Array | None = None  # (2, 8): mont(mag)(v_a), sign(v_a)
    # X's MLE at v_a (the A-sumcheck fold point). In chained mode
    # u_recover == v_a, so the recombination identity and the upstream FC's
    # z-claim are all checked at this one point.
    x_at_va: jax.Array | None = None  # (8,)
    # --- committed-aux mode (closes SOUNDNESS.md gap #1; None otherwise) ---
    # Commitments to sign/mag_bin/rem_bin (absorbed before this layer's
    # draws) plus openings binding every aux claim to those commitments:
    # mag_bin at v_z (binary-sumcheck final) and at w_q||u_rec (eq-weighted
    # combination of the recombination folds); rem_bin likewise; sign at
    # v_hp (Hadamard final) and at u_rec = v_a (A-product final).
    aux_coms: AuxCommitments | None = None
    w_q: jax.Array | None = None  # (LOG_Q, 8) bit-axis combiner challenge
    w_r: jax.Array | None = None  # (LOG_R, 8)
    open_mag_bin: object | None = None  # pedersen.OpeningProof
    open_mag_rec: object | None = None
    open_rem_bin: object | None = None
    open_rem_rec: object | None = None
    open_sign_hp: object | None = None
    open_sign_rec: object | None = None


@aot.jit
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


def _layout_body(X, aux_mag, aux_rem, aux_sign, log_size, q, r):
    """Challenge-independent layout transforms: expand bit matrices into
    bit-reversed flat layout for the binary sumchecks, bit-reverse X/sign for
    the Hadamard, mont(mag) for the chained A-product. Returns the bit-rev
    prover inputs plus the plain-order tensors the claims need."""
    n2 = 1 << log_size
    pad = n2 - aux_mag.shape[0]
    mag = jnp.pad(aux_mag, (0, pad))
    rem = jnp.pad(aux_rem, (0, pad))
    sign = jnp.pad(aux_sign, (0, pad))
    Xp = planar.to_planar(fr_ops.pad_to(X, n2))  # (8, n2) plain order

    revn = jnp.asarray(pops.bitrev_indices(log_size))
    rev5 = pops.bitrev_indices((q - 1).bit_length())
    rev4 = pops.bitrev_indices((r - 1).bit_length())

    shifts_q = jnp.arange(q, dtype=jnp.uint32)
    mag_bits = (mag[None, :] >> shifts_q[:, None]) & jnp.uint32(1)  # (q, n2) semantic rows
    shifts_r = jnp.arange(r, dtype=jnp.uint32)
    rem_bits = (rem[None, :] >> shifts_r[:, None]) & jnp.uint32(1)  # (16, n2)

    # binary-sumcheck inputs: stored[rev5(k)*n2 + revn(j)] = bit_k(mag[j])
    mag_rev = jnp.take(mag_bits, jnp.asarray(rev5), axis=0)[:, revn].reshape(-1)
    rem_rev = jnp.take(rem_bits, jnp.asarray(rev4), axis=0)[:, revn].reshape(-1)

    X_rev = Xp[:, revn]
    sign_rev = sign[revn]
    mag_limbs = jnp.concatenate([mag[None, :], jnp.zeros((7, n2), jnp.uint32)], axis=0)
    mag_mont_rev = planar.to_mont(mag_limbs)[:, revn]
    return mag_rev, rem_rev, X_rev, sign_rev, mag_mont_rev, mag_bits, rem_bits, Xp, sign


def _claims_body(mag_bits, rem_bits, Xp, sign, u_rec, u_hp):
    """Challenge-dependent claims: recombination folds at u_rec (the reference
    computes-and-discards these, zkrelu.cu:92-94), the Hadamard claim MLE of
    X (.) sign at u_hp, and X's MLE at u_rec (chained mode)."""
    E_rec = pops.eq_table(u_rec)  # (8, n2) standard order
    mag_at_u = planar.masked_sum(mag_bits == 1, E_rec[:, None, :])  # (8, q)
    rem_at_u = planar.masked_sum(rem_bits == 1, E_rec[:, None, :])  # (8, r)
    E_hp = pops.eq_table(u_hp)
    hp_claim = planar.dot(planar.select(sign == 1, Xp, jnp.zeros_like(Xp)), E_hp)
    x_at_u = planar.dot(Xp, E_rec)
    return jnp.swapaxes(mag_at_u, 0, 1), jnp.swapaxes(rem_at_u, 0, 1), hp_claim, x_at_u


@functools.partial(aot.jit, static_argnums=(4, 7, 8))
def _relu_prep_planar(X, aux_mag, aux_rem, aux_sign, log_size, u_rec, u_hp, q, r):
    """One fused prep dispatch: layout transforms + eq-weighted claims
    (grouped-draw mode, where u_rec/u_hp are known up front)."""
    (mag_rev, rem_rev, X_rev, sign_rev, mag_mont_rev,
     mag_bits, rem_bits, Xp, sign) = _layout_body(X, aux_mag, aux_rem, aux_sign, log_size, q, r)
    mag_at_u, rem_at_u, hp_claim, x_at_u = _claims_body(mag_bits, rem_bits, Xp, sign, u_rec, u_hp)
    return (mag_rev, rem_rev, X_rev, sign_rev,
            mag_at_u, rem_at_u, hp_claim, mag_mont_rev, x_at_u)


@functools.partial(aot.jit, static_argnums=(4, 5, 6))
def _relu_layout_planar(X, aux_mag, aux_rem, aux_sign, log_size, q, r):
    """Layout transforms only (interleaved mode: claims points not yet drawn)."""
    return _layout_body(X, aux_mag, aux_rem, aux_sign, log_size, q, r)


@aot.jit
def _relu_claims_planar(mag_bits, rem_bits, Xp, sign, u_rec, u_hp):
    return _claims_body(mag_bits, rem_bits, Xp, sign, u_rec, u_hp)


def prove_planar(
    X: jax.Array, aux: dict, challenges: ChallengeSource, chain_point: jax.Array | None = None,
    aux_com: AuxCommitments | None = None, interleave: bool = False,
) -> ZkReluProof:
    """Planar/pallas prover on compact aux (forward_compact). Challenge draw
    order and emitted proof stream match prove() bit-for-bit when
    chain_point is None.

    Chained mode (chain_point = w, the downstream FC's X-side evaluation
    point): additionally proves A = sign (.) mont(mag) with a Hadamard
    sumcheck anchored at w — its initial claim is the downstream FC's
    ip_finals[0] = A(w), binding this layer's output to that proof — and the
    recombination point u_recover is set to that sumcheck's fold point v_a, so
    the bit-recombination identity and the upstream FC's z-claim (X(v_a),
    emitted here) are all checked at one shared point. Draw order in chained
    mode: u_z, v_z, u_r, v_r, v_a, u_hp, v_hp.

    interleave=True switches to the round-interleaved Fiat-Shamir schedule
    (textbook sumcheck FS: each round polynomial is absorbed before the next
    fold challenge is drawn) — see _prove_planar_interleaved for the exact
    draw/absorb order. One host round-trip per sumcheck round; stream differs
    from the grouped mode by construction.
    """
    if interleave:
        return _prove_planar_interleaved(X, aux, challenges, chain_point, aux_com)
    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    if aux_com is not None:
        assert chain_point is not None, "committed aux requires chained mode"
        _absorb_aux_coms(challenges, aux_com)  # bind witness before any draw
    u_z = challenges.random_vec(log_size + LOG_Q)
    v_z = challenges.random_vec(log_size + LOG_Q)
    u_r = challenges.random_vec(log_size + LOG_R)
    v_r = challenges.random_vec(log_size + LOG_R)
    u_rec = challenges.random_vec(log_size)  # == v_a in chained mode
    u_hp = challenges.random_vec(log_size)
    v_hp = challenges.random_vec(log_size)
    w_q = challenges.random_vec(LOG_Q) if aux_com is not None else None
    w_r = challenges.random_vec(LOG_R) if aux_com is not None else None

    (mag_rev, rem_rev, X_rev, sign_rev, mag_at_u, rem_at_u, hp_claim,
     mag_mont_rev, x_at_u) = _relu_prep_planar(
        X, aux["mag"], aux["rem_bits16"], aux["sign_bits"], log_size, u_rec, u_hp, Q, R
    )
    mag_polys, mag_final = pp.binary_prove_bits(mag_rev, u_z, v_z)
    rem_polys, rem_final = pp.binary_prove_bits(rem_rev, u_r, v_r)
    hp_polys, hp_finals = pp.hadamard_prove_bits(X_rev, sign_rev, u_hp, v_hp)

    a_polys = a_finals = x_at_va = a_point = None
    if chain_point is not None:
        assert chain_point.shape[0] == log_size, (chain_point.shape, log_size)
        # the recombination identity assumes no zero-padded tail (padded
        # elements would need sign = 1); MLP tensors are always 2^k-sized
        assert n == (1 << log_size), "chained mode requires power-of-two size"
        a_point = chain_point
        a_polys, a_finals = pp.hadamard_prove_bits(mag_mont_rev, sign_rev, chain_point, u_rec)
        x_at_va = x_at_u

    proof = ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_at_u, rem_at_u, hp_claim,
        a_point, a_polys, a_finals, x_at_va,
    )
    if aux_com is not None:
        from ..commit import pedersen

        sign_m, mag_bin, rem_bin = _expand_aux(
            aux["sign_bits"], aux["mag"], aux["rem_bits16"], Q, R
        )
        g_s, g_m, g_r = _aux_gens(n), _aux_gens(n * Q), _aux_gens(n * R)
        proof.aux_coms = aux_com
        proof.w_q, proof.w_r = w_q, w_r
        proof.open_mag_bin = pedersen.open_reveal(g_m, mag_bin, aux_com.mag, v_z)
        proof.open_mag_rec = pedersen.open_reveal(
            g_m, mag_bin, aux_com.mag, jnp.concatenate([w_q, u_rec], axis=0)
        )
        proof.open_rem_bin = pedersen.open_reveal(g_r, rem_bin, aux_com.rem, v_r)
        proof.open_rem_rec = pedersen.open_reveal(
            g_r, rem_bin, aux_com.rem, jnp.concatenate([w_r, u_rec], axis=0)
        )
        proof.open_sign_hp = pedersen.open_reveal(g_s, sign_m, aux_com.sign, v_hp)
        proof.open_sign_rec = pedersen.open_reveal(g_s, sign_m, aux_com.sign, u_rec)
    challenges.absorb_array(mag_polys)
    challenges.absorb_array(rem_polys)
    challenges.absorb_array(hp_polys)
    if a_polys is not None:
        challenges.absorb_array(a_polys)
    return proof


def _prove_planar_interleaved(
    X: jax.Array, aux: dict, challenges: ChallengeSource,
    chain_point: jax.Array | None, aux_com: AuxCommitments | None,
) -> ZkReluProof:
    """Round-interleaved FS schedule for the planar ReLU prover:

      [absorb aux commitments]                      (committed tier)
      u_z   <- draw        ; mag binary sumcheck    (absorb poly_i, draw v_z[i])
      u_r   <- draw        ; rem binary sumcheck    (absorb poly_i, draw v_r[i])
      chained:   A-product sumcheck at chain_point  (absorb poly_i, draw v_a[i])
                 u_rec := v_a
      unchained: u_rec <- draw
      u_hp  <- draw
      absorb(mag_bits_at_u, rem_bits_at_u, hp_claim, x_at_u)  (claims at u_rec/u_hp)
      hp sumcheck of X (.) sign at u_hp             (absorb poly_i, draw v_hp[i])
      [w_q, w_r <- draw]                            (committed tier)

    Every fold challenge is derived AFTER the corresponding round polynomial
    was absorbed — the grinding surface of the grouped schedule (documented in
    docs/SOUNDNESS.md) does not exist here. Stream necessarily differs from
    the grouped mode; the verifier replays with MLP.verify(interleaved=True).
    """
    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    if aux_com is not None:
        assert chain_point is not None, "committed aux requires chained mode"
        _absorb_aux_coms(challenges, aux_com)

    (mag_rev, rem_rev, X_rev, sign_rev, mag_mont_rev,
     mag_bits, rem_bits, Xp, sign_pad) = _relu_layout_planar(
        X, aux["mag"], aux["rem_bits16"], aux["sign_bits"], log_size, Q, R
    )

    u_z = challenges.random_vec(log_size + LOG_Q)
    mag_polys, mag_final, v_z = pp.binary_prove_bits_interleaved(mag_rev, u_z, challenges)
    u_r = challenges.random_vec(log_size + LOG_R)
    rem_polys, rem_final, v_r = pp.binary_prove_bits_interleaved(rem_rev, u_r, challenges)

    a_polys = a_finals = x_at_va = a_point = None
    if chain_point is not None:
        assert chain_point.shape[0] == log_size, (chain_point.shape, log_size)
        assert n == (1 << log_size), "chained mode requires power-of-two size"
        a_point = chain_point
        a_polys, a_finals, u_rec = pp.hadamard_prove_bits_interleaved(
            mag_mont_rev, sign_rev, chain_point, challenges
        )
    else:
        u_rec = challenges.random_vec(log_size)
    u_hp = challenges.random_vec(log_size)

    mag_at_u, rem_at_u, hp_claim, x_at_u = _relu_claims_planar(
        mag_bits, rem_bits, Xp, sign_pad, u_rec, u_hp
    )
    challenges.absorb_array(mag_at_u)
    challenges.absorb_array(rem_at_u)
    challenges.absorb_array(hp_claim)
    challenges.absorb_array(x_at_u)
    # stored unconditionally in interleaved mode (the replay verifier
    # re-absorbs it from the proof); chain checks only read it when chained
    x_at_va = x_at_u

    hp_polys, hp_finals, v_hp = pp.hadamard_prove_bits_interleaved(
        X_rev, sign_rev, u_hp, challenges
    )
    w_q = challenges.random_vec(LOG_Q) if aux_com is not None else None
    w_r = challenges.random_vec(LOG_R) if aux_com is not None else None

    proof = ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_at_u, rem_at_u, hp_claim,
        a_point, a_polys, a_finals, x_at_va,
    )
    if aux_com is not None:
        from ..commit import pedersen

        sign_m, mag_bin, rem_bin = _expand_aux(
            aux["sign_bits"], aux["mag"], aux["rem_bits16"], Q, R
        )
        g_s, g_m, g_r = _aux_gens(n), _aux_gens(n * Q), _aux_gens(n * R)
        proof.aux_coms = aux_com
        proof.w_q, proof.w_r = w_q, w_r
        proof.open_mag_bin = pedersen.open_reveal(g_m, mag_bin, aux_com.mag, v_z)
        proof.open_mag_rec = pedersen.open_reveal(
            g_m, mag_bin, aux_com.mag, jnp.concatenate([w_q, u_rec], axis=0)
        )
        proof.open_rem_bin = pedersen.open_reveal(g_r, rem_bin, aux_com.rem, v_r)
        proof.open_rem_rec = pedersen.open_reveal(
            g_r, rem_bin, aux_com.rem, jnp.concatenate([w_r, u_rec], axis=0)
        )
        proof.open_sign_hp = pedersen.open_reveal(g_s, sign_m, aux_com.sign, v_hp)
        proof.open_sign_rec = pedersen.open_reveal(g_s, sign_m, aux_com.sign, u_rec)
    return proof


def verify_chained(proof: ZkReluProof, a_claim: int) -> tuple[bool, str]:
    """Chained-mode checks (see prove_planar): verify the A = sign (.) mag
    product sumcheck against the downstream FC's A-claim, the bit
    recombinations against its finals, and the ReLU recombination identity
        X + 2^47*(1 - sign) == 2^16*mag + rem,   rem = sum_{k<15} 2^k b_k - 2^15 b_15
    (elementwise-linear, hence checkable on MLEs at the shared point v_a;
    the reference computes the recombination folds and discards them,
    zkrelu.cu:92-94).

    a_claim: the downstream FC's ip_finals[0] == A's MLE at proof.a_point
    (Montgomery int). Returns (ok, reason)."""
    if proof.a_polys is None:
        return False, "proof is not chained"
    fa, fb = sc.scalars_to_ints(proof.a_finals)  # mont(mag)(v_a), sign(v_a)
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.a_polys),
        sc.scalars_to_ints(proof.a_point),
        sc.scalars_to_ints(proof.u_recover),
        a_claim,
        fa,
        fb,
    )
    if not res.ok:
        return False, "a-product: " + res.reason
    mag_claims = sc.scalars_to_ints(proof.mag_bits_at_u)
    m_rec = 0
    for k, b in enumerate(mag_claims):
        m_rec = HF.add(m_rec, HF.mul(HF.mont(1 << k), b))
    if m_rec != fa:
        return False, "mag bit recombination != mag(v_a)"
    rem_claims = sc.scalars_to_ints(proof.rem_bits_at_u)
    r_rec = 0
    for k in range(R - 1):
        r_rec = HF.add(r_rec, HF.mul(HF.mont(1 << k), rem_claims[k]))
    r_rec = HF.sub(r_rec, HF.mul(HF.mont(1 << (R - 1)), rem_claims[R - 1]))
    x_va = sc.scalars_to_ints(proof.x_at_va[None])[0]
    one = HF.one_mont
    # sign bias is 2^(Q+R-1) (the generalized form of the reference's 2^47
    # instance; matches _BIAS in set_widths)
    lhs = HF.add(x_va, HF.mul(HF.mont(1 << (Q + R - 1)), HF.sub(one, fb)))
    rhs = HF.add(HF.mul(HF.mont(1 << SCALE_OUT_BITS), fa), r_rec)
    if lhs != rhs:
        return False, "recombination identity failed at v_a"
    return True, ""


def _eq_weights(w: list[int], m: int) -> list[int]:
    """eq(w, k) for k in range(m), mont ints; w[0] is the lowest index bit."""
    one = HF.one_mont
    out = [one]
    for wi in w:
        nxt = []
        for e in out:
            nxt.append(HF.mul(e, HF.sub(one, wi)))
        for e in out:
            nxt.append(HF.mul(e, wi))
        out = nxt
    return out[:m]


def verify_committed(proof: ZkReluProof) -> tuple[bool, str]:
    """Committed-aux checks: every claim about the auxiliary witnesses is an
    opening of a commitment that was absorbed before this layer's challenges —
    the binary sumchecks' finals (mag_bin at v_z, rem_bin at v_r), the
    eq(w)-weighted combination of the recombination folds (mag_bin/rem_bin at
    w||u_rec), the Hadamard sign final (sign at v_hp), and the A-product sign
    final (sign at u_rec = v_a). With these, the bit tensor range-checked by
    the binary sumcheck and the one recombined into X at v_a are provably the
    SAME committed tensor (closes docs/SOUNDNESS.md gap #1).

    Openings are Hyrax-style revealed folds over NUMS generators
    (pedersen.verify_reveal): the verifier regenerates the generator vector
    and recomputes the MSM + row-commitment MLE itself, so nothing in the
    opening is attacker-steerable; binding holds under the DL assumption."""
    from ..commit import pedersen

    if proof.aux_coms is None:
        return False, "proof has no aux commitments"
    if proof.a_polys is None:
        return False, "committed aux requires a chained proof"

    def check(opening, com, point_ints, expected, what):
        gens = pedersen.nums_generators(1 << ((len(point_ints) + 1) // 2))
        ok, msg = pedersen.verify_reveal(
            opening, gens, com, point_ints, expected_value=expected
        )
        if not ok:
            return f"{what}: {msg}"
        return None

    coms = proof.aux_coms
    v_z = sc.scalars_to_ints(proof.v_z_bin)
    err = check(proof.open_mag_bin, coms.mag, v_z,
                sc.scalars_to_ints(proof.mag_final[None])[0], "mag_bin@v_z")
    if err:
        return False, err
    v_r = sc.scalars_to_ints(proof.v_r_bin)
    err = check(proof.open_rem_bin, coms.rem, v_r,
                sc.scalars_to_ints(proof.rem_final[None])[0], "rem_bin@v_r")
    if err:
        return False, err

    u_rec = sc.scalars_to_ints(proof.u_recover)
    w_q = sc.scalars_to_ints(proof.w_q)
    eq_q = _eq_weights(w_q, Q)
    mag_claims = sc.scalars_to_ints(proof.mag_bits_at_u)
    expect = 0
    for e, b in zip(eq_q, mag_claims):
        expect = HF.add(expect, HF.mul(e, b))
    err = check(proof.open_mag_rec, coms.mag, w_q + u_rec, expect, "mag_bin@w||u_rec")
    if err:
        return False, err
    w_r = sc.scalars_to_ints(proof.w_r)
    eq_r = _eq_weights(w_r, R)
    rem_claims = sc.scalars_to_ints(proof.rem_bits_at_u)
    expect = 0
    for e, b in zip(eq_r, rem_claims):
        expect = HF.add(expect, HF.mul(e, b))
    err = check(proof.open_rem_rec, coms.rem, w_r + u_rec, expect, "rem_bin@w||u_rec")
    if err:
        return False, err

    v_hp = sc.scalars_to_ints(proof.v_hp)
    err = check(proof.open_sign_hp, coms.sign, v_hp,
                sc.scalars_to_ints(proof.hp_finals)[1], "sign@v_hp")
    if err:
        return False, err
    err = check(proof.open_sign_rec, coms.sign, u_rec,
                sc.scalars_to_ints(proof.a_finals)[1], "sign@v_a")
    if err:
        return False, err
    return True, ""


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
