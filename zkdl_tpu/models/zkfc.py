"""zkFC: quantized fully-connected layer (field matmul) + matmul sumcheck prover.

TPU-native rebuild of /root/reference/zkfc.cu. The layer holds a padded
Montgomery weight tensor (in_p * out_p, 8) and its Pedersen row commitments
(built at load, zkfc.cu:102-104).

Forward: Z = X (.) W over Fr (batch x in) @ (in x out). The reference uses a
16x16 shared-memory tiled CUDA field matmul (matrixMultiplyOptimized,
zkfc.cu:6-47). On TPU we provide:
  - `field_matmul`: general blocked elementwise-mul + modular tree-reduction
    (always correct, any magnitudes);
  - (planned) an MXU int8 digit-decomposition path exploiting the protocol's
    own 48-bit magnitude bound for ~100x faster inference.

prove() mirrors zkFC::prove (zkfc.cu:128-145): fold X along the batch axis at
u_bs, fold W along the out axis at u_out, inner-product sumcheck over u_in,
evaluate the output claim Z(u_out || u_bs), and open the weight commitment at
u_out || u_in. The reference discards Z(u) and the opening (SURVEY.md §0.1); we
keep both and verify: sumcheck rounds, final a*b binding, Z-claim equality with
the sumcheck's initial claim, and the Pedersen opening (bound to the row
commitments, with final_scalar == the sumcheck's W-side final claim)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..commit import pedersen
from ..curve import g1
from ..field import fr, host
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from ..utils import aot

HF = host.fr

# Forward-matmul path selector: the fast MXU path is exact for all models that
# satisfy the protocol's own magnitude bound (any model zkReLU can handle).
USE_FAST_MATMUL = True


def field_matmul(X: jax.Array, W: jax.Array, in_size: int, out_size: int, block: int = 64) -> jax.Array:
    """Z = X @ W over Fr (Montgomery). X: (batch*in, 8); W: (in*out, 8).

    Blocked over output columns: for each block, broadcast-multiply
    (batch, in, blk) elementwise and tree-reduce the `in` axis with modular adds.
    """
    batch = X.shape[0] // in_size
    Xm = X.reshape(batch, in_size, 8)
    Wm = W.reshape(in_size, out_size, 8)
    blocks = []
    for j0 in range(0, out_size, block):
        j1 = min(j0 + block, out_size)
        prod = fr.mul(Xm[:, :, None, :], Wm[None, :, j0:j1, :])  # (b, in, blk, 8)
        # modular tree-reduction along `in`
        while prod.shape[1] > 1:
            m = prod.shape[1]
            if m % 2:
                prod = jnp.concatenate([prod, jnp.zeros_like(prod[:, :1])], axis=1)
            prod = fr.add(prod[:, 0::2], prod[:, 1::2])
        blocks.append(prod[:, 0])
    Z = jnp.concatenate(blocks, axis=1)  # (batch, out, 8)
    return Z.reshape(batch * out_size, 8)


field_matmul_jit = aot.jit(field_matmul, static_argnums=(2, 3, 4))


# ---------------------------------------------------------------------------
# fast MXU path
# ---------------------------------------------------------------------------

_N_DIGITS = 7  # 7-bit digits x 7 = 49 bits, covers the protocol's 48-bit bound
_DIGIT_BITS = 7
_N_COLS = 2 * _N_DIGITS - 1

# 2^47 - 1 threshold for "positive" (same as zkReLU, zkrelu.cu:18)
_POS_MAX_47 = np.array([4294967295, 32767, 0, 0, 0, 0, 0, 0], dtype=np.uint32)


def _signed_digits(v: jax.Array):
    """Montgomery Fr (n, 8) -> (pos_digits, neg_digits) int8 (n, 7) of the
    value's magnitude, split by sign (values must lie in (-2^47, 2^47) — the
    protocol invariant zkReLU already assumes, zkrelu.cu:18-27).

    The unmont runs through the blocked pallas planar kernel: the mp.mont_mul
    digit outer product would materialize (n, 512) i32 temporaries — 8.6 GB for
    an 18M-param layer's weights — while the pallas path streams 8x8192 blocks.
    """
    from ..field import planar

    xP = planar.from_mont(planar.to_planar(v))  # (8, n) raw value, canonical
    # x <= 2^47 - 1  <=>  limb1 < 2^15 and limbs 2..7 all zero (_POS_MAX_47)
    hi_or = xP[2] | xP[3] | xP[4] | xP[5] | xP[6] | xP[7]
    pos = (xP[1] <= jnp.uint32(32767)) & (hi_or == 0)
    negP = planar.neg(xP)
    lo = jnp.where(pos, xP[0], negP[0])
    hi = jnp.where(pos, xP[1], negP[1])

    digits = []
    for k in range(_N_DIGITS):
        s = _DIGIT_BITS * k
        if s < 32:
            d = lo >> np.uint32(s)
            if s > 32 - _DIGIT_BITS:
                d = d | (hi << np.uint32(32 - s))
        else:
            d = hi >> np.uint32(s - 32)
        digits.append(d & np.uint32(0x7F))
    dig = jnp.stack(digits, axis=-1).astype(jnp.int8)  # (n, 7)
    posb = pos[:, None]
    return jnp.where(posb, dig, 0), jnp.where(posb, 0, dig)


def _combine_columns(R: jax.Array) -> jax.Array:
    """(b, d1, d2, o) int32 -> (b, o, n_cols) column sums c = d1 + d2."""
    b, _, _, o = R.shape
    cols = [jnp.zeros((b, o), jnp.int32) for _ in range(_N_COLS)]
    for d1 in range(_N_DIGITS):
        for d2 in range(_N_DIGITS):
            cols[d1 + d2] = cols[d1 + d2] + R[:, d1, d2, :]
    return jnp.stack(cols, axis=-1)  # (b, o, n_cols) each < 2^29


def _lift_cols_to_mont(cols: jax.Array) -> jax.Array:
    """(..., _N_COLS) int32 radix-2^7 column sums (each < 2^30, non-negative)
    -> planar (8, ...) Montgomery Fr of V = sum_c cols_c * 2^(7c).

    Assembles V's 16-bit digits with shifted adds (V < 2^114 < p, so the digits
    are already canonical), then ONE blocked pallas Montgomery mul by R^2 lifts
    to Montgomery form. This replaces the previous per-column fr.mul lift whose
    mp.mont_mul temporaries (u32[b, o, 13, 256]) OOM'd HBM at the zkdl256
    config — and costs 1 field mul per output element instead of 13.
    """
    from ..field import planar

    v = cols.astype(jnp.uint32)
    digs = [jnp.zeros(cols.shape[:-1], jnp.uint32) for _ in range(planar.N_DIGITS)]
    for c in range(cols.shape[-1]):
        q, r0 = divmod(_DIGIT_BITS * c, 16)
        vc = v[..., c]
        # vc << r0 spans bits [r0, r0+30) -> 16-bit digit slots q, q+1, (q+2)
        digs[q] = digs[q] + ((vc << np.uint32(r0)) & np.uint32(0xFFFF))
        digs[q + 1] = digs[q + 1] + ((vc >> np.uint32(16 - r0)) & np.uint32(0xFFFF))
        if r0 > 2:  # vc < 2^30: a third slot exists only when 30 + r0 > 32
            digs[q + 2] = digs[q + 2] + (vc >> np.uint32(32 - r0))
    # each slot sums <= 13 parts < 2^16 -> < 2^20, safe in u32
    raw = planar._from_digits(planar._carry_digits(digs, planar.N_DIGITS))
    return planar.to_mont(raw)  # (8, ...) mont, via the pallas kernel


def field_matmul_fast(X: jax.Array, W: jax.Array, in_size: int, out_size: int) -> jax.Array:
    """MXU int8 field matmul. Exploits the protocol's bounded-magnitude
    invariant (all values in (-2^47, 2^47), cf. zkrelu.cu:18): operands are
    sign-split into 7-bit digit matrices, multiplied with two int8 MXU matmuls
    ((7b, 2*in) @ (2*in, 7o): same-sign products in one, cross-sign in the
    other), and the int32 digit-column sums are lifted back into Montgomery Fr
    with one blocked pallas Montgomery mul per output element.

    Group-identical output to `field_matmul` whenever operand magnitudes are in
    range; out-of-range models (invalid for zkReLU anyway) would differ.
    """
    batch = X.shape[0] // in_size
    xp, xn = _signed_digits(X)
    wp, wn = _signed_digits(W)

    # (7b, 2in): in-axis is [xp block ; xn block]
    A = jnp.concatenate(
        [xp.reshape(batch, in_size, _N_DIGITS), xn.reshape(batch, in_size, _N_DIGITS)],
        axis=1,
    ).transpose(0, 2, 1).reshape(batch * _N_DIGITS, 2 * in_size)
    Wp = wp.reshape(in_size, out_size, _N_DIGITS).transpose(0, 2, 1).reshape(in_size, _N_DIGITS * out_size)
    Wn = wn.reshape(in_size, out_size, _N_DIGITS).transpose(0, 2, 1).reshape(in_size, _N_DIGITS * out_size)
    Bpos = jnp.concatenate([Wp, Wn], axis=0)  # xp@wp + xn@wn
    Bneg = jnp.concatenate([Wn, Wp], axis=0)  # xp@wn + xn@wp

    def mm(B):
        # accumulation over 2*in_size <= 2^12 of 127^2 products < 2^26: exact i32
        R = jax.lax.dot_general(
            A, B, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return R.reshape(batch, _N_DIGITS, _N_DIGITS, out_size)

    cols_pos = _combine_columns(mm(Bpos))  # (b, o, 13), each < 2^30
    cols_neg = _combine_columns(mm(Bneg))

    from ..field import planar

    Zp = planar.sub(_lift_cols_to_mont(cols_pos), _lift_cols_to_mont(cols_neg))
    return jnp.moveaxis(Zp, 0, -1).reshape(batch * out_size, 8)


field_matmul_fast_jit = aot.jit(field_matmul_fast, static_argnums=(2, 3))


@dataclasses.dataclass
class ZkFC:
    """Layer parameters. weights: (in_size*out_size, 8) Montgomery, padded to
    powers of two; gens: generator vector; com: row commitments (m,)."""

    in_size: int
    out_size: int
    weights: jax.Array
    gens: pedersen.Generators
    com: pedersen.RowCommitments

    @staticmethod
    def gen_size_for(in_size: int, out_size: int) -> int:
        # 2^ceil((log2(in*out)+1)/2)  (demo.cu:81)
        return 1 << ((fr_ops.ceil_log2(in_size * out_size) + 1) // 2)

    @classmethod
    def from_float(cls, w: np.ndarray, key: jax.Array) -> "ZkFC":
        """w: float (in, out) unpadded. Quantizes, pads, commits (zkfc.cu:90-104)."""
        from . import quantize

        weights = quantize.load_weights(w)
        in_p = 1 << fr_ops.ceil_log2(w.shape[0])
        out_p = 1 << fr_ops.ceil_log2(w.shape[1])
        gens = pedersen.setup(key, cls.gen_size_for(in_p, out_p))
        com = pedersen.commit(gens, weights)
        return cls(in_p, out_p, weights, gens, com)

    def __call__(self, X: jax.Array) -> jax.Array:
        assert X.shape[0] % self.in_size == 0
        if USE_FAST_MATMUL:
            return field_matmul_fast_jit(X, self.weights, self.in_size, self.out_size)
        return field_matmul_jit(X, self.weights, self.in_size, self.out_size)


@dataclasses.dataclass
class ZkFCProof:
    u_bs: jax.Array
    u_in: jax.Array
    u_out: jax.Array
    ip_polys: jax.Array  # (log in, 3, 8)
    ip_finals: jax.Array  # (2, 8): X'(u_in), W'(u_in)
    z_claim: jax.Array  # (8,)  Z(u_out || u_bs)
    opening: pedersen.OpeningProof


@functools.partial(aot.jit, static_argnums=(6, 7))
def _fc_prove_core(X, W, Z, u_bs, u_in, u_out, in_size, out_size):
    """The whole per-layer sumcheck fused into ONE jit: all rounds (statically
    halving shapes) trace inline — zero host round-trips per round, unlike the
    reference's sync-per-kernel loop (proof.cu:84-93)."""
    X_folded = fr_ops.partial_me(X, u_bs, in_size) if u_bs.shape[0] else X
    W_folded = fr_ops.partial_me(W, u_out, 1)
    ip_polys, ip_finals = sc.inner_product_prove(X_folded, W_folded, u_in)
    z_claim = fr_ops.me_eval(Z, jnp.concatenate([u_out, u_bs], axis=0))
    return ip_polys, ip_finals, z_claim


@functools.partial(aot.jit, static_argnums=(6, 7))
def _fc_prep_planar(X, W, Z, u_bs, u_in, u_out, in_size, out_size):
    """Planar prep for the matmul sumcheck, one dispatch.

    The reference folds X along the batch axis and W along the output axis one
    challenge at a time (zkfc.cu:138-140, O(2n) muls); here each multi-variable
    fold IS a single eq-weighted contraction: fold(T, u) == T . eq_table(u)
    along the folded axis (O(n) lazy-dot muls, one pass). Likewise the output
    claim Z(u_out || u_bs) is one weighted sum over the flat tensor — sums are
    order-independent so no bit reversal is needed; only the inner-product
    operands (consumed by halving rounds) come out bit-reversed.
    """
    from ..field import planar
    from ..tensor import planar_ops as pops

    batch = X.shape[0] // in_size
    lb = fr_ops.ceil_log2(batch)
    B2 = 1 << lb
    # X: (batch*in, 8) -> planar (8, I, B2) with the in-axis bit-reversed
    X3 = fr_ops.pad_to(X.reshape(batch, in_size, 8), B2) if batch < B2 else X.reshape(batch, in_size, 8)
    Xp = jnp.transpose(X3, (2, 1, 0))  # (8, I, B2)
    Xp = pops.bitrev_axis(Xp, axis=1)
    X_folded = planar.dot(Xp, pops.eq_table(u_bs)[:, None, :]) if lb else Xp[:, :, 0]

    # W: (in*out, 8) -> (8, I, O); fold the out axis (lowest index bits first)
    Wp = jnp.transpose(W.reshape(in_size, out_size, 8), (2, 0, 1))
    Wp = pops.bitrev_axis(Wp, axis=1)
    W_folded = planar.dot(Wp, pops.eq_table(u_out)[:, None, :])  # (8, I) bit-rev

    # Z claim: one weighted sum over the padded flat tensor, plain order
    u_full = jnp.concatenate([u_out, u_bs], axis=0)
    Zp = planar.to_planar(fr_ops.pad_to(Z, 1 << u_full.shape[0]))
    z_claim = planar.from_planar(planar.dot(Zp, pops.eq_table(u_full))[:, None])[0]
    return X_folded, W_folded, z_claim


def prove(layer: ZkFC, X: jax.Array, Z: jax.Array, challenges: ChallengeSource) -> ZkFCProof:
    """Mirror of zkFC::prove (zkfc.cu:128-145); challenge order matches
    (u_bs, u_in_dim, u_out_dim)."""
    batch = X.shape[0] // layer.in_size
    u_bs = challenges.random_vec(fr_ops.ceil_log2(batch))
    u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))
    u_out = challenges.random_vec(fr_ops.ceil_log2(layer.out_size))
    ip_polys, ip_finals, z_claim = _fc_prove_core(
        X, layer.weights, Z, u_bs, u_in, u_out, layer.in_size, layer.out_size
    )
    u_w = jnp.concatenate([u_out, u_in], axis=0)
    opening = pedersen.open(layer.gens, layer.weights, layer.com, u_w)
    proof = ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return proof


def prove_planar(
    layer: ZkFC, X: jax.Array, Z: jax.Array, challenges: ChallengeSource,
    z_point: jax.Array | None = None, interleave: bool = False,
) -> ZkFCProof:
    """Planar/pallas prover; challenge order and proof stream identical to
    prove() (tests assert) when z_point is None.

    Chained mode: z_point (log_out + log_batch, 8) fixes (u_out || u_bs) to
    the adjacent ReLU's shared evaluation point v_a, so this proof's z_claim
    must equal that proof's emitted X(v_a) — only u_in is drawn fresh.

    interleave=True: round-interleaved FS schedule — draw u_bs/u_out (the
    statement evaluation points) first, absorb the claimed Z(u_out||u_bs),
    then run the inner-product sumcheck absorbing each round polynomial
    before deriving that round's fold challenge (u_in becomes a transcript
    OUTPUT). Textbook sumcheck FS order; stream differs from grouped mode."""
    from ..sumcheck import planar_protocols as pp

    batch = X.shape[0] // layer.in_size
    if interleave:
        if z_point is None:
            u_bs = challenges.random_vec(fr_ops.ceil_log2(batch))
            u_out = challenges.random_vec(fr_ops.ceil_log2(layer.out_size))
        else:
            lo = fr_ops.ceil_log2(layer.out_size)
            assert z_point.shape[0] == lo + fr_ops.ceil_log2(batch), (z_point.shape, lo, batch)
            u_out, u_bs = z_point[:lo], z_point[lo:]
        # u_in is only consumed by the sumcheck; pass a placeholder to the
        # fused prep (its folds/claim depend on u_bs/u_out alone)
        u_in_dummy = jnp.zeros((fr_ops.ceil_log2(layer.in_size), 8), jnp.uint32)
        X_folded, W_folded, z_claim = _fc_prep_planar(
            X, layer.weights, Z, u_bs, u_in_dummy, u_out, layer.in_size, layer.out_size
        )
        challenges.absorb_array(z_claim)
        ip_polys, ip_finals, u_in = pp.inner_product_prove_interleaved(
            X_folded, W_folded, challenges
        )
        u_w = jnp.concatenate([u_out, u_in], axis=0)
        opening = pedersen.open_planar(layer.gens, layer.weights, layer.com, u_w)
        return ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)

    if z_point is None:
        u_bs = challenges.random_vec(fr_ops.ceil_log2(batch))
        u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))
        u_out = challenges.random_vec(fr_ops.ceil_log2(layer.out_size))
    else:
        lo = fr_ops.ceil_log2(layer.out_size)
        assert z_point.shape[0] == lo + fr_ops.ceil_log2(batch), (z_point.shape, lo, batch)
        u_out, u_bs = z_point[:lo], z_point[lo:]
        u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))
    X_folded, W_folded, z_claim = _fc_prep_planar(
        X, layer.weights, Z, u_bs, u_in, u_out, layer.in_size, layer.out_size
    )
    ip_polys, ip_finals = pp.inner_product_prove(X_folded, W_folded, u_in)
    u_w = jnp.concatenate([u_out, u_in], axis=0)
    opening = pedersen.open_planar(layer.gens, layer.weights, layer.com, u_w)
    proof = ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return proof


def verify(layer_com: pedersen.RowCommitments, proof: ZkFCProof) -> tuple[bool, str]:
    """Verify the matmul sumcheck and the weight-commitment opening.

    The initial sumcheck claim is the proof's Z(u_out||u_bs) — at model level
    this same Z tensor chains into the adjacent ReLU proof. The W-side final
    claim must equal the Pedersen opening's final scalar (same MLE point,
    variable order irrelevant for multilinear evals)."""
    u_in = sc.scalars_to_ints(proof.u_in)
    claim = sc.scalars_to_ints(proof.z_claim[None])[0]
    res = sc.inner_product_verify(sc.polys_to_ints(proof.ip_polys), u_in, claim)
    if not res.ok:
        return False, "ip: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.ip_finals)
    if not sc.inner_product_check_final(res, fa, fb):
        return False, "ip: final product mismatch"
    u_w = sc.scalars_to_ints(jnp.concatenate([proof.u_out, proof.u_in], axis=0))
    ok, msg = pedersen.verify_open(proof.opening, u_w, expected_value=fb)
    if not ok:
        return False, "open: " + msg
    ok, msg = pedersen.verify_open_against_com(proof.opening, layer_com, u_w)
    if not ok:
        return False, "open: " + msg
    return True, ""
