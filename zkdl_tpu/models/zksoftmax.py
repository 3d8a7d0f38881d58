"""zkSoftmax: exp-consistent quantized softmax proof (lookup-based, zkLLM-style).

Closes the exp-consistency item left open by zkattention.py's range+normalization
proofs: P is now tied to the scores S through an explicit quantized-softmax
CIRCUIT whose only non-arithmetic step (exp) is a table lookup
(sumcheck/lookup.py, logUp). No counterpart exists in the reference (it proves
MLPs only, /root/reference/README.md:12); this is the aux-decomposition
methodology of zkReLU (zkrelu.cu:11-41) generalized per the zkLLM recipe.

The circuit (all fixed point; S at scale 2^16, signed, |S| < 2^47):

  Smax_i  = sum_j h_ij * S_ij         h = row argmax one-hot (prover witness)
  t_ij    = Smax_i - S_ij             >= 0 (forced by decomposition)
  t_ij    = d_full_ij * 2^8 + rem8_ij       rem8 in [0, 2^8)
  d_ij    = min(d_full_ij, D_MAX)           bucket index, D_MAX = 2^12 - 1
  e_ij    = EXPTAB_d[d_ij]                  = round(exp(-d*2^8 / (2^16 sqrt(dm))) * 2^16),
                                              EXPTAB[D_MAX] = 0 (saturation)
  E_i     = sum_j e_ij                      in [2^16, cols * 2^16]
  P_ij    = floor(e_ij * 2^16 / E_i):       e_ij*2^16 = P_ij*E_i + r_ij, 0 <= r_ij < E_i
  row sums: sum_j P_ij = 2^16 - slack_i,    slack_i in [0, cols)

Proof obligations (every claim verified; MLE equalities are checked at random
points, linear combinations of forwarded claims — the same claim-chaining
discipline as the rest of the framework):

  1. h is binary (binary sumcheck) and each row sums to 1 (fold + ip vs ones).
  2. t-decomposition: binary sumchecks over d_full (D_FULL_BITS) and rem8
     bits; recombinations at a shared point u_r give d_full(u_r), rem8(u_r),
     hence t(u_r) = 2^8 d_full(u_r) + rem8(u_r).
  3. t definition: t + S - Smax_bcast == 0 at u_r:
     S(u_r) is a forwarded claim (chains to the score-matmul/rescale proofs);
     Smax_bcast(u_col, u_row) == Smax(u_row) and Smax(u_row) is proven by a
     hadamard sumcheck of h (.) S at u_r's row part + row-sum reduction.
  4. clip: d is 12 bits, (d_full - d) is D_FULL_BITS bits (both binary-
     decomposed), and (d_full - d) (.) (d - D_MAX) == 0 at a random point
     (hadamard with zero claim) — together these force d = min(d_full, D_MAX).
  5. exp lookup: pair values a = d * 2^E_PAIR + e lie in the 4096-entry pair
     table {b * 2^E_PAIR + EXPTAB[b]} (logUp); the lookup's witness MLE claim
     equals 2^E_PAIR * d(.) + e(.) from the forwarded claims.
  6. division: e * 2^16 - P (.) E_bcast - r == 0 at a random point (hadamard
     of P (.) E_bcast + linear claims for e, r); r and (E-1-r) are
     range-decomposed (E_BITS + log2(cols) bits) so 0 <= r < E; E_i is proven
     as the row sums of e (fold + ip vs ones).
  7. row-sum slack: sum_j P_ij = 2^16 - slack_i with slack_i range-decomposed
     to log2(cols)+1 bits (replaces the exact-2^16 normalization of the
     argmax-fixup variant; floors make row sums land in (2^16 - cols, 2^16]).

Soundness of each piece reduces to the sumcheck/logUp soundness already used
framework-wide; the quantization statement proven is exactly the circuit above
(bucket quantum 2^-8 in the exponent => e within ~0.4% of continuous exp).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..commit import witness as wcommit
from ..field import fr, host
from ..sumcheck import lookup
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from . import quantize

HF = host.fr

D_BITS = 12
D_MAX = (1 << D_BITS) - 1
BUCKET_SHIFT = 8
D_FULL_BITS = 40  # t < 2^48, t >> 8 fits 40 bits
REM_BITS = 8
E_PAIR = 17  # e in [0, 2^16] needs 17 bits in the pair encoding
R_BITS = 17 + 11  # r < E <= cols * 2^16; supports cols <= 2^11


@functools.lru_cache(maxsize=None)
def exp_table_vals(d_model: int) -> np.ndarray:
    """EXPTAB[b] = round(exp(-b * 2^BUCKET_SHIFT / (2^16 sqrt(d_model))) * 2^16),
    with the saturation row EXPTAB[D_MAX] = 0."""
    b = np.arange(1 << D_BITS, dtype=np.float64)
    vals = np.rint(np.exp(-b * (1 << BUCKET_SHIFT) / (quantize.SCALE * np.sqrt(d_model))) * quantize.SCALE)
    vals = vals.astype(np.uint64)
    vals[D_MAX] = 0
    return vals


@functools.lru_cache(maxsize=None)
def pair_table_vals(d_model: int) -> np.ndarray:
    b = np.arange(1 << D_BITS, dtype=np.uint64)
    return (b << E_PAIR) | exp_table_vals(d_model)


def _mont_from_u64(vals: jax.Array) -> jax.Array:
    raw = jnp.zeros((*vals.shape, 8), dtype=jnp.uint32)
    raw = raw.at[..., 0].set((vals & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    raw = raw.at[..., 1].set((vals >> jnp.uint64(32)).astype(jnp.uint32))
    return fr.mont(raw)


# ---------------------------------------------------------------------------
# witness generation
# ---------------------------------------------------------------------------


def softmax_witness(S: jax.Array, rows: int, cols: int, d_model: int):
    """Build every circuit value from the scores S ((rows*cols, 8) mont,
    scale 2^16 signed). Host-side u64 math (witness generation is setup-shaped,
    like the reference's relu_kernel aux generation). Returns a dict of u64
    numpy arrays + Montgomery tensors.
    """
    from ..field import mp

    x = np.asarray(fr.unmont(S)).astype(np.uint64)
    lo = x[:, 0]
    hi = x[:, 1]
    # interpret as signed 48-bit fixed point (zkrelu.cu:18 convention)
    val = (lo | (hi << np.uint64(32))).astype(np.int64)
    # negatives are stored as p - |v| and have nonzero high limbs
    neg_mask = ~np.all(x[:, 2:] == 0, axis=1)
    if neg_mask.any():
        P = fr.P_INT
        ints = np.zeros(x.shape[0], dtype=object)
        for i in np.where(neg_mask)[0]:
            full = 0
            for k in reversed(range(8)):
                full = (full << 32) | int(x[i, k])
            ints[i] = -(P - full)
        val = val.copy()
        for i in np.where(neg_mask)[0]:
            val[i] = int(ints[i])
    Sv = val.reshape(rows, cols)  # signed, |.| < 2^47

    smax = Sv.max(axis=1)
    am = Sv.argmax(axis=1)
    h = np.zeros((rows, cols), dtype=np.uint64)
    h[np.arange(rows), am] = 1

    t = (smax[:, None] - Sv).astype(np.uint64)  # >= 0, < 2^48
    rem8 = t & np.uint64((1 << BUCKET_SHIFT) - 1)
    d_full = t >> np.uint64(BUCKET_SHIFT)
    d = np.minimum(d_full, np.uint64(D_MAX))

    tab = exp_table_vals(d_model)
    e = tab[d.astype(np.int64)]
    E = e.sum(axis=1)  # in [2^16, cols * 2^16]
    P_q = (e * np.uint64(quantize.SCALE)) // E[:, None]
    r = e * np.uint64(quantize.SCALE) - P_q * E[:, None]
    slack = np.uint64(quantize.SCALE) - P_q.sum(axis=1)  # in [0, cols)

    wit = {
        "h": h.reshape(-1), "t": t.reshape(-1), "rem8": rem8.reshape(-1),
        "d_full": d_full.reshape(-1), "d": d.reshape(-1), "e": e.reshape(-1),
        "E": E, "P": P_q.reshape(-1), "r": r.reshape(-1), "slack": slack,
        "smax": smax,
    }
    wit["P_mont"] = _mont_from_u64(jnp.asarray(wit["P"]))
    return wit


# ---------------------------------------------------------------------------
# generic helpers: range decomposition proof, zero-product proof, row sums
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RangeProof:
    """vals = sum_k 2^k bits_k with every bit binary: binary sumcheck over the
    (n * width) bit tensor + recombination claims at u_rec (the zkReLU
    mechanism, zkrelu.cu:91-94)."""

    width: int
    u: jax.Array
    v: jax.Array
    polys: jax.Array
    final: jax.Array
    u_rec: jax.Array
    bits_at_u: jax.Array  # (width, 8)

    def value_claim(self) -> int:
        """vals' MLE at u_rec = sum_k 2^k * bits_k(u_rec)."""
        bits = sc.scalars_to_ints(self.bits_at_u)
        acc = 0
        for k, b in enumerate(bits):
            acc = HF.add(acc, HF.mul(b, HF.mont(1 << k)))
        return acc

    def verify(self) -> tuple[bool, str]:
        res = sc.binary_verify(
            sc.polys_to_ints(self.polys),
            sc.scalars_to_ints(self.u),
            sc.scalars_to_ints(self.v),
            sc.scalars_to_ints(self.final[None])[0],
        )
        return (res.ok, res.reason)


def _bits_tensor(vals: jax.Array, width: int) -> jax.Array:
    shifts = jnp.arange(width, dtype=jnp.uint64)
    bits = (vals[:, None] >> shifts) & jnp.uint64(1)
    n = vals.shape[0]
    return fr.select(
        (bits == 1).reshape(-1), fr.ones_mont((n * width,)), fr.zeros((n * width,))
    )


def range_prove(vals_u64: np.ndarray, width: int, u_rec: jax.Array,
                challenges: ChallengeSource) -> RangeProof:
    n = len(vals_u64)
    log_n = fr_ops.ceil_log2(n)
    log_w = fr_ops.ceil_log2(width)
    bits = _bits_tensor(jnp.asarray(vals_u64, dtype=jnp.uint64), 1 << log_w)
    u = challenges.random_vec(log_n + log_w)
    v = challenges.random_vec(log_n + log_w)
    polys, final = sc.binary_prove_scan(bits, u, v)
    bits_at_u = fr_ops.partial_me(bits, u_rec, 1 << log_w)[:width]
    proof = RangeProof(width, u, v, polys, final, u_rec, bits_at_u)
    challenges.absorb_array(polys)
    challenges.absorb_array(bits_at_u)
    return proof


@dataclasses.dataclass
class ZeroProductProof:
    """Proves a (.) b == 0 everywhere: hadamard sumcheck with initial claim 0."""

    u: jax.Array
    v: jax.Array
    polys: jax.Array
    finals: jax.Array

    def verify(self) -> tuple[bool, str]:
        fa, fb = sc.scalars_to_ints(self.finals)
        res = sc.hadamard_verify(
            sc.polys_to_ints(self.polys),
            sc.scalars_to_ints(self.u),
            sc.scalars_to_ints(self.v),
            0,
            fa,
            fb,
        )
        return (res.ok, res.reason)


def zero_product_prove(a: jax.Array, b: jax.Array, challenges: ChallengeSource) -> ZeroProductProof:
    log_n = fr_ops.ceil_log2(a.shape[0])
    u = challenges.random_vec(log_n)
    v = challenges.random_vec(log_n)
    polys, finals = sc.hadamard_prove_scan(a, b, u, v)
    proof = ZeroProductProof(u, v, polys, finals)
    challenges.absorb_array(polys)
    return proof


@dataclasses.dataclass
class RowSumProof:
    """Proves row-sum claims of M ((rows, cols) flattened): the verifier learns
    sums(u_row) = <M(u_row, .), ones> via one fold + inner-product sumcheck."""

    u_row: jax.Array
    u_col: jax.Array
    polys: jax.Array
    finals: jax.Array
    claim: jax.Array  # (8,) <M(u_row, .), 1> initial sum claim

    def verify(self) -> tuple[bool, str]:
        claim = sc.scalars_to_ints(self.claim[None])[0]
        res = sc.inner_product_verify(
            sc.polys_to_ints(self.polys), sc.scalars_to_ints(self.u_col), claim
        )
        if not res.ok:
            return False, res.reason
        fa, fb = sc.scalars_to_ints(self.finals)
        if fb != HF.one_mont:
            return False, "ones final != 1"
        if not sc.inner_product_check_final(res, fa, fb):
            return False, "final product mismatch"
        return True, ""


@functools.partial(jax.jit, static_argnums=(3,))
def _rowsum_core(M, u_row, u_col, cols):
    folded = fr_ops.partial_me(M, u_row, cols)
    ones = fr.ones_mont((cols,))
    polys, finals = sc.inner_product_prove_scan(folded, ones, u_col)
    claim = fr_ops.fr_sum(fr.mul(folded, ones))
    return polys, finals, claim


def rowsum_prove(M: jax.Array, rows: int, cols: int, challenges: ChallengeSource) -> RowSumProof:
    u_row = challenges.random_vec(fr_ops.ceil_log2(rows))
    u_col = challenges.random_vec(fr_ops.ceil_log2(cols))
    polys, finals, claim = _rowsum_core(M, u_row, u_col, cols)
    proof = RowSumProof(u_row, u_col, polys, finals, claim)
    challenges.absorb_array(polys)
    challenges.absorb_array(claim)
    return proof


# ---------------------------------------------------------------------------
# committed-witness tier (commit/witness.py): tensor inventory
# ---------------------------------------------------------------------------


def _hs_and_smax(h_m: jax.Array, S: jax.Array, rows: int, cols: int):
    hs = fr.mul(h_m, S)
    hs3 = hs.reshape(rows, cols, 8)
    smax_m = hs3[:, 0]
    for c in range(1, cols):
        smax_m = fr.add(smax_m, hs3[:, c])
    return hs, smax_m


def _range_widths(cols: int) -> dict:
    """range-proof name -> (witness key / derived, width)."""
    return {
        "dfull_bits": ("d_full", D_FULL_BITS),
        "rem8_bits": ("rem8", REM_BITS),
        "d_bits": ("d", D_BITS),
        "dgap_bits": (None, D_FULL_BITS),  # d_full - d
        "r_bits": ("r", R_BITS),
        "er_bits": (None, R_BITS),  # E_bcast - 1 - r
        "slack_bits": ("slack", fr_ops.ceil_log2(cols) + 1),
    }


def commit_witness(wc: "wcommit.Committer", S: jax.Array, wit: dict,
                   rows: int, cols: int, prefix: str = "sm.",
                   s_name: str | None = None) -> None:
    """Commit every softmax circuit tensor into `wc` (call BEFORE wc.absorb,
    hence before any challenge is drawn). When `s_name` is given, S is assumed
    committed already under that name (e.g. by the enclosing attention block);
    otherwise it is committed as {prefix}S."""
    if s_name is None:
        wc.commit(f"{prefix}S", S)
    h_m = _mont_from_u64(jnp.asarray(wit["h"]))
    wc.commit(f"{prefix}h", h_m)
    hs, smax_m = _hs_and_smax(h_m, S, rows, cols)
    wc.commit(f"{prefix}hs", hs)
    wc.commit(f"{prefix}smax", smax_m)
    wc.commit(f"{prefix}e", _mont_from_u64(jnp.asarray(wit["e"])))
    wc.commit(f"{prefix}E", _mont_from_u64(jnp.asarray(wit["E"])))
    wc.commit(f"{prefix}P", wit["P_mont"])
    widths = _range_widths(cols)
    vals = {
        "dfull_bits": wit["d_full"], "rem8_bits": wit["rem8"],
        "d_bits": wit["d"], "dgap_bits": wit["d_full"] - wit["d"],
        "r_bits": wit["r"],
        "er_bits": (wit["E"].repeat(cols) - 1 - wit["r"]).astype(np.uint64),
        "slack_bits": wit["slack"],
    }
    for nm, (_, width) in widths.items():
        log_w = fr_ops.ceil_log2(width)
        bits = _bits_tensor(jnp.asarray(vals[nm], dtype=jnp.uint64), 1 << log_w)
        wc.commit(f"{prefix}{nm}", bits)


# ---------------------------------------------------------------------------
# the full softmax proof
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ZkSoftmaxProof:
    rows: int
    cols: int
    d_model: int
    # 1. argmax one-hot h
    h_range: RangeProof  # width 1 == binary
    h_rowsum: RowSumProof  # claims h row-sums; verifier checks claim == 1 when u_row folds... claims
    # 2/3. t decomposition + definition
    u_rec: jax.Array
    dfull_range: RangeProof
    rem8_range: RangeProof
    s_at_urec: jax.Array  # (8,) forwarded S claim at u_rec (chains to score proofs)
    hs_u: jax.Array  # hadamard binding of hs = h (.) S
    hs_v: jax.Array
    hs_polys: jax.Array
    hs_finals: jax.Array
    hs_claim: jax.Array  # (8,) MLE of hs at hs_u
    smax_rowsum: RowSumProof  # row sums of h (.) S == Smax vector
    smax_at_urec_row: jax.Array  # (8,) Smax MLE at u_rec's row variables
    # 4. clip
    d_range: RangeProof
    dgap_range: RangeProof  # d_full - d
    clip_zero: ZeroProductProof
    # 5. exp lookup
    lk: lookup.LookupProof
    d_at_lk: jax.Array  # (8,) d MLE at the lookup's v_w binding point
    e_at_lk: jax.Array
    # 6. division
    e_rowsum: RowSumProof  # E_i = row sums of e
    div_zero_u: jax.Array
    div_zero_v: jax.Array
    div_polys: jax.Array  # hadamard of P (.) E_bcast
    div_finals: jax.Array
    e_at_div: jax.Array  # (8,) e MLE at div point
    r_at_div: jax.Array
    pE_claim: jax.Array  # (8,) MLE of P (.) E_bcast at div point
    E_at_divrow: jax.Array  # (8,) E(u_row part of div point)
    r_range: RangeProof
    er_range: RangeProof  # E - 1 - r
    # 7. P row-sum slack
    p_rowsum: RowSumProof
    slack_range: RangeProof
    slack_at_urow: jax.Array  # (8,) slack MLE at p_rowsum.u_row
    # committed-witness tier (commit/witness.py; None = claim-forwarding mode)
    witness: "wcommit.WitnessSet | None" = None


def prove(S: jax.Array, wit: dict, rows: int, cols: int, d_model: int,
          challenges: ChallengeSource,
          witness: "wcommit.Committer | None" = None,
          prefix: str = "sm.", s_name: str | None = None) -> ZkSoftmaxProof:
    """Prove the quantized-softmax circuit for witness `wit` (softmax_witness).

    Challenge-draw order is fixed; every sub-proof absorbs its messages.

    Committed-witness mode: pass a Committer already holding this circuit's
    tensors (commit_witness) and ALREADY absorbed; every forwarded claim then
    gets a Pedersen opening binding it to the committed tensors. `s_name`
    names S's commitment when the caller committed it (attention blocks).
    """
    n = rows * cols
    log_n = fr_ops.ceil_log2(n)
    log_rows = fr_ops.ceil_log2(rows)
    W, px = witness, prefix
    sn = s_name or f"{px}S"

    def rp_open(nm: str, rp: RangeProof) -> None:
        if W is None:
            return
        log_w = fr_ops.ceil_log2(rp.width)
        W.open(f"{px}{nm}@v", f"{px}{nm}", rp.v)
        W.open_recombined(f"{px}{nm}.rec", f"{px}{nm}", rp.u_rec, log_w)

    h_m = _mont_from_u64(jnp.asarray(wit["h"]))
    t_m = _mont_from_u64(jnp.asarray(wit["t"]))
    e_m = _mont_from_u64(jnp.asarray(wit["e"]))
    d_m = _mont_from_u64(jnp.asarray(wit["d"]))
    dfull_m = _mont_from_u64(jnp.asarray(wit["d_full"]))
    r_m = _mont_from_u64(jnp.asarray(wit["r"]))
    E_m = _mont_from_u64(jnp.asarray(wit["E"]))
    P_m = wit["P_mont"]

    # 1. h binary + row sums (the row-sum CLAIM is checked == 1 by the verifier:
    # ones' MLE is 1 everywhere, so each row's sum being 1 makes the folded
    # claim exactly 1)
    h_range = range_prove(wit["h"], 1, challenges.random_vec(log_n), challenges)
    rp_open("h", h_range)
    h_rowsum = rowsum_prove(h_m, rows, cols, challenges)
    if W is not None:
        W.open(f"{px}h@rowsum", f"{px}h",
               jnp.concatenate([h_rowsum.u_col, h_rowsum.u_row], axis=0))

    # 2/3. t decomposition + definition at a shared point u_rec
    u_rec = challenges.random_vec(log_n)
    dfull_range = range_prove(wit["d_full"], D_FULL_BITS, u_rec, challenges)
    rp_open("dfull_bits", dfull_range)
    rem8_range = range_prove(wit["rem8"], REM_BITS, u_rec, challenges)
    rp_open("rem8_bits", rem8_range)
    s_at_urec = fr_ops.me_eval(S, u_rec)
    if W is not None:
        W.open(f"{px}S@u_rec", sn, u_rec)
    # Smax selection: hs = h (.) S bound by a hadamard sumcheck (claim = hs MLE
    # at hs_u, finals chain to h/S claims); Smax = row sums of hs (rowsum
    # proof); Smax_bcast(u_rec) = Smax(u_rec row part) (broadcast MLE identity)
    hs, smax_m = _hs_and_smax(h_m, S, rows, cols)
    hs_u = challenges.random_vec(log_n)
    hs_v = challenges.random_vec(log_n)
    hs_polys, hs_finals = sc.hadamard_prove_scan(h_m, S, hs_u, hs_v)
    hs_claim = fr_ops.me_eval(hs, hs_u)
    challenges.absorb_array(hs_polys)
    if W is not None:
        W.open(f"{px}h@hs_v", f"{px}h", hs_v)
        W.open(f"{px}S@hs_v", sn, hs_v)
        W.open(f"{px}hs@hs_u", f"{px}hs", hs_u)
    smax_rowsum = rowsum_prove(hs, rows, cols, challenges)
    log_cols = fr_ops.ceil_log2(cols)
    smax_at_urec_row = fr_ops.me_eval(smax_m, u_rec[log_cols:])
    if W is not None:
        W.open(f"{px}hs@rowsum", f"{px}hs",
               jnp.concatenate([smax_rowsum.u_col, smax_rowsum.u_row], axis=0))
        W.open(f"{px}smax@rowsum", f"{px}smax", smax_rowsum.u_row)
        W.open(f"{px}smax@u_rec_row", f"{px}smax", u_rec[log_cols:])

    # 4. clip
    d_range = range_prove(wit["d"], D_BITS, u_rec, challenges)
    rp_open("d_bits", d_range)
    dgap = wit["d_full"] - wit["d"]
    dgap_range = range_prove(dgap, D_FULL_BITS, u_rec, challenges)
    rp_open("dgap_bits", dgap_range)
    dmax = fr.mont(fr_ops.from_u32(jnp.full((n,), D_MAX, jnp.uint32)))
    clip_zero = zero_product_prove(
        fr.sub(dfull_m, d_m), fr.sub(d_m, dmax), challenges
    )
    if W is not None:
        W.open_recombined(f"{px}dfull.clip", f"{px}dfull_bits", clip_zero.v,
                          fr_ops.ceil_log2(D_FULL_BITS))
        W.open_recombined(f"{px}d.clip", f"{px}d_bits", clip_zero.v,
                          fr_ops.ceil_log2(D_BITS))

    # 5. exp lookup on pair values
    pair_vals = (wit["d"] << np.uint64(E_PAIR)) | wit["e"]
    a_pairs = _mont_from_u64(jnp.asarray(pair_vals))
    tab = _mont_from_u64(jnp.asarray(pair_table_vals(d_model)))
    counts = np.bincount(wit["d"].astype(np.int64), minlength=1 << D_BITS)
    m_raw = np.zeros((1 << D_BITS, 8), dtype=np.uint32)
    m_raw[:, 0] = counts.astype(np.uint32)
    m = fr.mont(jnp.asarray(m_raw))
    lk = lookup.prove(a_pairs, tab, m, challenges)
    d_at_lk = fr_ops.me_eval(d_m, lk.v_w)
    e_at_lk = fr_ops.me_eval(e_m, lk.v_w)
    if W is not None:
        W.open_recombined(f"{px}d.lk", f"{px}d_bits", lk.v_w,
                          fr_ops.ceil_log2(D_BITS))
        W.open(f"{px}e@lk", f"{px}e", lk.v_w)

    # 6. division: e*2^16 - P (.) E_bcast - r == 0
    e_rowsum = rowsum_prove(e_m, rows, cols, challenges)
    if W is not None:
        W.open(f"{px}e@rowsum", f"{px}e",
               jnp.concatenate([e_rowsum.u_col, e_rowsum.u_row], axis=0))
        W.open(f"{px}E@erowsum", f"{px}E", e_rowsum.u_row)
    E_bcast = _mont_from_u64(jnp.asarray(np.repeat(wit["E"], cols)))
    div_u = challenges.random_vec(log_n)
    div_v = challenges.random_vec(log_n)
    div_polys, div_finals = sc.hadamard_prove_scan(P_m, E_bcast, div_u, div_v)
    pE_claim = fr_ops.me_eval(fr.mul(P_m, E_bcast), div_u)
    e_at_div = fr_ops.me_eval(e_m, div_u)
    r_at_div = fr_ops.me_eval(r_m, div_u)
    E_at_divrow = fr_ops.me_eval(E_m, div_u[fr_ops.ceil_log2(cols):])
    challenges.absorb_array(div_polys)
    if W is not None:
        W.open(f"{px}P@div_v", f"{px}P", div_v)
        W.open(f"{px}E@div_v", f"{px}E", div_v[fr_ops.ceil_log2(cols):])
        W.open(f"{px}e@div", f"{px}e", div_u)
        # r@div_u binding rides the r_bits recombination opening (same point)
        W.open(f"{px}E@div_row", f"{px}E", div_u[fr_ops.ceil_log2(cols):])
    r_range = range_prove(wit["r"], R_BITS, div_u, challenges)
    rp_open("r_bits", r_range)
    er_vals = (wit["E"].repeat(cols) - 1 - wit["r"]).astype(np.uint64)
    er_range = range_prove(er_vals, R_BITS, div_u, challenges)
    rp_open("er_bits", er_range)

    # 7. P row sums + slack
    p_rowsum = rowsum_prove(P_m, rows, cols, challenges)
    if W is not None:
        W.open(f"{px}P@rowsum", f"{px}P",
               jnp.concatenate([p_rowsum.u_col, p_rowsum.u_row], axis=0))
    slack_bits = fr_ops.ceil_log2(cols) + 1
    slack_range = range_prove(wit["slack"], slack_bits, p_rowsum.u_row, challenges)
    rp_open("slack_bits", slack_range)
    slack_m = _mont_from_u64(jnp.asarray(wit["slack"]))
    slack_at_urow = fr_ops.me_eval(slack_m, p_rowsum.u_row)

    return ZkSoftmaxProof(
        rows, cols, d_model,
        h_range, h_rowsum,
        u_rec, dfull_range, rem8_range, s_at_urec,
        hs_u, hs_v, hs_polys, hs_finals, hs_claim,
        smax_rowsum, smax_at_urec_row,
        d_range, dgap_range, clip_zero,
        lk, d_at_lk, e_at_lk,
        e_rowsum, div_u, div_v, div_polys, div_finals,
        e_at_div, r_at_div, pE_claim, E_at_divrow, r_range, er_range,
        p_rowsum, slack_range, slack_at_urow,
    )


def prove_committed(S: jax.Array, wit: dict, rows: int, cols: int, d_model: int,
                    challenges: ChallengeSource) -> ZkSoftmaxProof:
    """Standalone committed-witness prove: commits every circuit tensor
    (absorbed before the first draw), then proves with openings."""
    wc = wcommit.Committer()
    commit_witness(wc, S, wit, rows, cols)
    wc.absorb(challenges)
    proof = prove(S, wit, rows, cols, d_model, challenges, witness=wc)
    proof.witness = wc.witness_set()
    return proof


def _check_bound(proof: ZkSoftmaxProof, ck: "wcommit.Checker",
                 prefix: str = "sm.", s_name: str | None = None) -> None:
    """Committed-witness checks: every forwarded claim must equal a verified
    opening of the corresponding committed tensor (raises BindingError)."""
    px = prefix
    sn = s_name or f"{px}S"
    ints = sc.scalars_to_ints
    one = HF.one_mont
    rows, cols = proof.rows, proof.cols
    log_cols = fr_ops.ceil_log2(cols)

    def rp_bind(nm: str, rp: RangeProof) -> None:
        tn = f"{px}{nm}"
        log_w = fr_ops.ceil_log2(rp.width)
        ck.require(f"{px}{nm}@v", tn, ints(rp.v),
                   ints(rp.final[None])[0], f"{nm} binary final")
        got = ck.recombined(f"{px}{nm}.rec", tn, ints(rp.u_rec), log_w)
        if got != rp.value_claim():
            raise wcommit.BindingError(f"{nm}: recombination claim unbound")

    rp_bind("h", proof.h_range)
    rp_bind("dfull_bits", proof.dfull_range)
    rp_bind("rem8_bits", proof.rem8_range)
    rp_bind("d_bits", proof.d_range)
    rp_bind("dgap_bits", proof.dgap_range)
    rp_bind("r_bits", proof.r_range)
    rp_bind("er_bits", proof.er_range)
    rp_bind("slack_bits", proof.slack_range)

    u_rec = ints(proof.u_rec)
    ck.require(f"{px}S@u_rec", sn, u_rec,
               ints(proof.s_at_urec[None])[0], "S@u_rec")
    hs_u, hs_v = ints(proof.hs_u), ints(proof.hs_v)
    hf = ints(proof.hs_finals)
    ck.require(f"{px}h@hs_v", f"{px}h", hs_v, hf[0], "hs hadamard h-final")
    ck.require(f"{px}S@hs_v", sn, hs_v, hf[1], "hs hadamard S-final")
    ck.require(f"{px}hs@hs_u", f"{px}hs", hs_u,
               ints(proof.hs_claim[None])[0], "hs claim")
    ck.require(f"{px}h@rowsum", f"{px}h",
               ints(proof.h_rowsum.u_col) + ints(proof.h_rowsum.u_row),
               ints(proof.h_rowsum.finals)[0], "h rowsum final")
    sr = proof.smax_rowsum
    ck.require(f"{px}hs@rowsum", f"{px}hs",
               ints(sr.u_col) + ints(sr.u_row),
               ints(sr.finals)[0], "smax rowsum final")
    ck.require(f"{px}smax@rowsum", f"{px}smax", ints(sr.u_row),
               ints(sr.claim[None])[0], "smax rowsum claim")
    ck.require(f"{px}smax@u_rec_row", f"{px}smax", u_rec[log_cols:],
               ints(proof.smax_at_urec_row[None])[0], "smax@u_rec_row")

    # clip operands at the zero-product fold point
    clip_v = ints(proof.clip_zero.v)
    dfull_clip = ck.recombined(f"{px}dfull.clip", f"{px}dfull_bits", clip_v,
                               fr_ops.ceil_log2(D_FULL_BITS))
    d_clip = ck.recombined(f"{px}d.clip", f"{px}d_bits", clip_v,
                           fr_ops.ceil_log2(D_BITS))
    cf = ints(proof.clip_zero.finals)
    if cf[0] != HF.sub(dfull_clip, d_clip):
        raise wcommit.BindingError("clip: (d_full - d) final unbound")
    if cf[1] != HF.sub(d_clip, HF.mont(D_MAX)):
        raise wcommit.BindingError("clip: (d - D_MAX) final unbound")

    v_w = ints(proof.lk.v_w)
    got = ck.recombined(f"{px}d.lk", f"{px}d_bits", v_w, fr_ops.ceil_log2(D_BITS))
    if got != ints(proof.d_at_lk[None])[0]:
        raise wcommit.BindingError("lookup: d claim unbound")
    ck.require(f"{px}e@lk", f"{px}e", v_w,
               ints(proof.e_at_lk[None])[0], "lookup e claim")

    er_ = proof.e_rowsum
    ck.require(f"{px}e@rowsum", f"{px}e", ints(er_.u_col) + ints(er_.u_row),
               ints(er_.finals)[0], "e rowsum final")
    ck.require(f"{px}E@erowsum", f"{px}E", ints(er_.u_row),
               ints(er_.claim[None])[0], "E != e row sums")

    div_u, div_v = ints(proof.div_zero_u), ints(proof.div_zero_v)
    df = ints(proof.div_finals)
    ck.require(f"{px}P@div_v", f"{px}P", div_v, df[0], "division P final")
    ck.require(f"{px}E@div_v", f"{px}E", div_v[log_cols:], df[1],
               "division E_bcast final")
    ck.require(f"{px}e@div", f"{px}e", div_u,
               ints(proof.e_at_div[None])[0], "e@div")
    r_div = ck.recombined(f"{px}r_bits.rec", f"{px}r_bits", div_u,
                          fr_ops.ceil_log2(R_BITS))
    if r_div != ints(proof.r_at_div[None])[0]:
        raise wcommit.BindingError("r@div claim unbound")
    E_div_row = ck.value(f"{px}E@div_row", f"{px}E", div_u[log_cols:])
    if E_div_row != ints(proof.E_at_divrow[None])[0]:
        raise wcommit.BindingError("E@div_row claim unbound")
    # r < E binding: (E_bcast - 1 - r)(div_u) must equal the er range tensor
    er_rec = ck.recombined(f"{px}er_bits.rec", f"{px}er_bits", div_u,
                           fr_ops.ceil_log2(R_BITS))
    if er_rec != HF.sub(HF.sub(E_div_row, one), r_div):
        raise wcommit.BindingError("er range tensor != E - 1 - r at div_u")

    pr = proof.p_rowsum
    ck.require(f"{px}P@rowsum", f"{px}P", ints(pr.u_col) + ints(pr.u_row),
               ints(pr.finals)[0], "P rowsum final")
    slack_rec = ck.recombined(f"{px}slack_bits.rec", f"{px}slack_bits",
                              ints(pr.u_row), fr_ops.ceil_log2(proof.slack_range.width))
    if slack_rec != ints(proof.slack_at_urow[None])[0]:
        raise wcommit.BindingError("slack@u_row claim unbound")


def witness_names(rows: int, cols: int, prefix: str = "sm.",
                  s_name: str | None = None) -> list[str]:
    """Canonical commitment-insertion order of commit_witness — the verifier
    re-absorbs commitments in exactly this order during transcript replay."""
    names = [] if s_name else [f"{prefix}S"]
    names += [f"{prefix}h", f"{prefix}hs", f"{prefix}smax",
              f"{prefix}e", f"{prefix}E", f"{prefix}P"]
    names += [f"{prefix}{nm}" for nm in _range_widths(cols)]
    return names


def absorb_witness_coms(transcript: "ChallengeSource", ws: "wcommit.WitnessSet",
                        names: list[str]) -> str | None:
    """Absorb the witness commitments in canonical order (mirrors
    Committer.absorb); a missing commitment is a clean rejection."""
    for nm in names:
        com = ws.coms.get(nm)
        if com is None:
            return f"missing witness commitment {nm}"
        pts = com.points
        transcript.absorb_array(pts.x)
        transcript.absorb_array(pts.y)
        transcript.absorb_array(pts.z)
    return None


def replay_transcript(proof: ZkSoftmaxProof, transcript: "ChallengeSource") -> str | None:
    """Re-derive every softmax challenge from `transcript` (which must already
    hold the witness-commitment absorbs) and compare with the proof — without
    this, every evaluation point is taken from the (attacker-supplied) proof
    on trust and a malicious prover can pick all points adaptively. Mirrors
    prove()'s draw/absorb schedule exactly; openings never touch the
    transcript. Returns an error string or None."""

    def draw_eq(tag, stored):
        arr = np.asarray(stored).reshape(-1, 8)
        got = np.asarray(transcript.random_vec(arr.shape[0]))
        return None if np.array_equal(got, arr) else f"{tag} not transcript-derived"

    def point_eq(tag, stored, expect):
        return (None if np.array_equal(np.asarray(stored), np.asarray(expect))
                else f"{tag} anchor-point mismatch")

    def rp(tag, rpf, expect_urec):
        # range_prove(vals, width, u_rec, ch): u_rec is DRAWN by the caller for
        # h (the very first draw) and reused otherwise
        e = (draw_eq(f"{tag}.u_rec", rpf.u_rec) if expect_urec is None
             else point_eq(f"{tag}.u_rec", rpf.u_rec, expect_urec))
        e = e or draw_eq(f"{tag}.u", rpf.u) or draw_eq(f"{tag}.v", rpf.v)
        if e:
            return e
        transcript.absorb_array(rpf.polys)
        transcript.absorb_array(rpf.bits_at_u)
        return None

    def rowsum(tag, rs):
        e = draw_eq(f"{tag}.u_row", rs.u_row) or draw_eq(f"{tag}.u_col", rs.u_col)
        if e:
            return e
        transcript.absorb_array(rs.polys)
        transcript.absorb_array(rs.claim)
        return None

    err = rp("h", proof.h_range, None) or rowsum("h_rowsum", proof.h_rowsum) \
        or draw_eq("u_rec", proof.u_rec) \
        or rp("dfull_bits", proof.dfull_range, proof.u_rec) \
        or rp("rem8_bits", proof.rem8_range, proof.u_rec) \
        or draw_eq("hs_u", proof.hs_u) or draw_eq("hs_v", proof.hs_v)
    if err:
        return err
    transcript.absorb_array(proof.hs_polys)
    err = rowsum("smax_rowsum", proof.smax_rowsum) \
        or rp("d_bits", proof.d_range, proof.u_rec) \
        or rp("dgap_bits", proof.dgap_range, proof.u_rec) \
        or draw_eq("clip.u", proof.clip_zero.u) or draw_eq("clip.v", proof.clip_zero.v)
    if err:
        return err
    transcript.absorb_array(proof.clip_zero.polys)
    lk = proof.lk
    transcript.absorb_array(lk.m)
    err = draw_eq("lk.z", lk.z) \
        or draw_eq("lk.u_w_ip", lk.u_w_ip) or draw_eq("lk.u_v_ip", lk.u_v_ip) \
        or draw_eq("lk.u_w", lk.u_w) or draw_eq("lk.v_w", lk.v_w) \
        or draw_eq("lk.u_t", lk.u_t) or draw_eq("lk.v_t", lk.v_t)
    if err:
        return err
    for arr in (lk.sum_w, lk.sum_v, lk.w_ip_polys, lk.v_ip_polys,
                lk.w_hp_polys, lk.t_hp_polys):
        transcript.absorb_array(arr)
    err = rowsum("e_rowsum", proof.e_rowsum) \
        or draw_eq("div_u", proof.div_zero_u) or draw_eq("div_v", proof.div_zero_v)
    if err:
        return err
    transcript.absorb_array(proof.div_polys)
    return rp("r_bits", proof.r_range, proof.div_zero_u) \
        or rp("er_bits", proof.er_range, proof.div_zero_u) \
        or rowsum("p_rowsum", proof.p_rowsum) \
        or rp("slack_bits", proof.slack_range, proof.p_rowsum.u_row)


def verify(proof: ZkSoftmaxProof,
           checker: "wcommit.Checker | None" = None,
           prefix: str = "sm.", s_name: str | None = None,
           transcript: "ChallengeSource | None" = None) -> tuple[bool, str]:
    rows, cols = proof.rows, proof.cols
    if transcript is not None:
        # full Fiat-Shamir replay: absorb the witness commitments (canonical
        # order) and re-derive every challenge; without this the evaluation
        # points come from the proof on trust (tamper-evidence only).
        if proof.witness is None:
            return False, "transcript replay requires a committed-witness proof"
        err = absorb_witness_coms(
            transcript, proof.witness, witness_names(rows, cols, prefix, s_name)
        ) or replay_transcript(proof, transcript)
        if err:
            return False, f"transcript: {err}"
    checks: list[tuple[str, tuple[bool, str]]] = []
    checks.append(("h binary", proof.h_range.verify()))
    checks.append(("h rowsum", proof.h_rowsum.verify()))
    # every row of h sums to 1 -> the folded claim is exactly 1
    if sc.scalars_to_ints(proof.h_rowsum.claim[None])[0] != HF.one_mont:
        return False, "h rowsum claim != 1"
    checks.append(("d_full range", proof.dfull_range.verify()))
    checks.append(("rem8 range", proof.rem8_range.verify()))
    # t(u_rec) == Smax_bcast(u_rec) - S(u_rec)
    t_claim = HF.add(
        HF.mul(HF.mont(1 << BUCKET_SHIFT), proof.dfull_range.value_claim()),
        proof.rem8_range.value_claim(),
    )
    # Smax_bcast's MLE at u_rec = (col vars, row vars) equals Smax(row vars)
    # since eq-weights over the broadcast column axis sum to 1; the forwarded
    # smax_at_urec_row claim's own binding is the hs hadamard + smax rowsum
    # (claims at distinct points chain through the model layer as everywhere
    # else in this framework).
    smax_b = sc.scalars_to_ints(proof.smax_at_urec_row[None])[0]
    s_val = sc.scalars_to_ints(proof.s_at_urec[None])[0]
    if t_claim != HF.sub(smax_b, s_val):
        return False, "t != Smax - S at u_rec"
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.hs_polys),
        sc.scalars_to_ints(proof.hs_u),
        sc.scalars_to_ints(proof.hs_v),
        sc.scalars_to_ints(proof.hs_claim[None])[0],
        *sc.scalars_to_ints(proof.hs_finals),
    )
    if not res.ok:
        return False, "hs hadamard: " + res.reason
    checks.append(("smax rowsum", proof.smax_rowsum.verify()))
    checks.append(("d range", proof.d_range.verify()))
    checks.append(("dgap range", proof.dgap_range.verify()))
    # d(u_rec) + dgap(u_rec) == d_full(u_rec)
    if HF.add(proof.d_range.value_claim(), proof.dgap_range.value_claim()) != proof.dfull_range.value_claim():
        return False, "d + (d_full - d) != d_full at u_rec"
    checks.append(("clip zero-product", proof.clip_zero.verify()))
    checks.append(("exp lookup", lookup.verify(proof.lk, table_vals=[int(x) for x in pair_table_vals(proof.d_model)])))
    # lookup witness MLE == 2^E_PAIR * d + e at the lookup binding point
    a_vw = sc.scalars_to_ints(proof.lk.a_at_vw[None])[0]
    d_lk = sc.scalars_to_ints(proof.d_at_lk[None])[0]
    e_lk = sc.scalars_to_ints(proof.e_at_lk[None])[0]
    if a_vw != HF.add(HF.mul(HF.mont(1 << E_PAIR), d_lk), e_lk):
        return False, "lookup pair claim != 2^17 d + e"
    checks.append(("e rowsum", proof.e_rowsum.verify()))
    # division relation at div_u: e*2^16 == P.E + r
    res = sc.hadamard_verify(
        sc.polys_to_ints(proof.div_polys),
        sc.scalars_to_ints(proof.div_zero_u),
        sc.scalars_to_ints(proof.div_zero_v),
        sc.scalars_to_ints(proof.pE_claim[None])[0],
        *sc.scalars_to_ints(proof.div_finals),
    )
    if not res.ok:
        return False, "division hadamard: " + res.reason
    lhs = HF.mul(HF.mont(quantize.SCALE), sc.scalars_to_ints(proof.e_at_div[None])[0])
    rhs = HF.add(
        sc.scalars_to_ints(proof.pE_claim[None])[0],
        sc.scalars_to_ints(proof.r_at_div[None])[0],
    )
    if lhs != rhs:
        return False, "e*2^16 != P*E + r at div point"
    checks.append(("r range", proof.r_range.verify()))
    checks.append(("E-1-r range", proof.er_range.verify()))
    checks.append(("P rowsum", proof.p_rowsum.verify()))
    checks.append(("slack range", proof.slack_range.verify()))
    # row sums: P(u_row,.) summed == 2^16 - slack(u_row)
    want = HF.sub(HF.mont(quantize.SCALE), sc.scalars_to_ints(proof.slack_at_urow[None])[0])
    if sc.scalars_to_ints(proof.p_rowsum.claim[None])[0] != want:
        return False, "P rowsum != 2^16 - slack"
    for name, (ok, msg) in checks:
        if not ok:
            return False, f"{name}: {msg}"
    if checker is None and proof.witness is not None:
        checker = wcommit.Checker(proof.witness)
    if checker is not None:
        try:
            _check_bound(proof, checker, prefix=prefix, s_name=s_name)
        except wcommit.BindingError as e:
            return False, f"binding: {e}"
    return True, ""
