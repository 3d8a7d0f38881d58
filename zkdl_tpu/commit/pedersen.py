"""Pedersen-style multilinear polynomial commitment with split-and-fold opening.

TPU-native rebuild of /root/reference/commitment.cu. The scheme:

- setup: a generator vector g of size 2^ceil((log2(N)+1)/2) (~sqrt of the matrix
  size), formed as r_i * G for random r_i (demo.cu:81-82 — a transparent stand-in
  for an SRS; not hiding, matching the reference).
- commit(t): view t as (m, gen_size) rows; row commitments C_row = sum_i t[row,i]*g_i
  with *non-Montgomery* scalars (commitment.cu:29-41).
- open(t, com, u): split u into u_row (last ceil(log2 m) coords) and u_in; evaluate
  the row-commitment vector at u_row (G1 MLE); fold t along u_row; then the
  `me_open` split-and-fold argument (commitment.cu:43-81): per round emit three
  G1 cross-term sums and fold scalars (by u, Montgomery math) and generators
  (reversed fold g1 + u*(g0-g1), by unmont u).

Two executions of the same math:

- **Transparent fast path (default).** The reference's setup draws r_i itself
  (demo.cu:82), so the proving party knows every generator's discrete log. All
  G1 *tensor* work then collapses to Fr arithmetic on the dlog vector — a row
  commitment is (sum_i s_i*r_i) * G, each me_open cross-term sum is one scalar
  whose point is a single G^sigma — producing *identical group elements* to the
  naive path while replacing ~N 256-bit double-and-add chains by N Fr muls and
  O(1) scalar muls. This eliminates the reference's hottest loop
  (G1Jacobian_mul inside commit/open, SURVEY.md §3) by algorithm, not by kernel
  tuning. Trust model is unchanged from the reference: whoever runs setup knows
  the dlogs either way.
- **Opaque path.** For generators from an external SRS (no dlogs), the generic
  G1-tensor implementation (scalar-mul + tree-sum + point folds) is used.
  Tests cross-check both paths for point equality.

Reference quirk preserved (both paths): inside me_open, G1 exponents are the
*Montgomery representation bits* of the scalars (me_open_step, commitment.cu:43-60),
i.e. every cross term is the R-scaled group element g^(s*R). Still verifiable —
our verifier (absent in the reference) tracks D_k = C_k^R with
   check: temp_A_k == D_k
   D_{k+1} = (1-u)^2 * temp0_k + u(1-u) * D_k + u^2 * temp1_k
   base:  D_final == final_gen^(mont_repr(final_scalar)).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import g1, host_g1, convert
from ..field import fr, host
from ..tensor import fr_ops
from ..utils import aot

HF = host.fr


@dataclasses.dataclass
class Generators:
    """Generator vector; dlogs (Montgomery form, (n, 8)) are present in the
    transparent setting: points[i] == unmont(dlogs[i]) * G.

    glv_safe: the GLV endomorphism split (phi(P) = lambda*P) is valid only for
    points in the order-r subgroup. setup()'s points are r_i*G (in-subgroup by
    construction); externally supplied SRS points must pass validate_subgroup()
    before the GLV fast path is used — unvalidated opaque generators fall back
    to the plain double-and-add orbit, which is correct for any curve point."""

    points: g1.G1Jac
    dlogs: jax.Array | None = None
    glv_safe: bool = False

    @property
    def size(self) -> int:
        return self.points.x.shape[0]

    def validate_subgroup(self) -> "Generators":
        """Check r*P == identity for every point (one-time, device-batched);
        returns self with glv_safe=True or raises ValueError."""
        order = jnp.broadcast_to(
            jnp.asarray(_order_limbs()), (*self.points.shape, 8)
        )
        prod = g1.scalar_mul_jit(self.points, order)
        if not bool(jnp.all(g1.is_identity(prod))):
            raise ValueError("generator outside the order-r subgroup")
        self.glv_safe = True
        return self


@functools.lru_cache(maxsize=None)
def _order_limbs():
    from ..field import mp

    return mp.limbs_from_int(fr.P_INT, 8)


def _smul(points: g1.G1Jac, scalars: jax.Array, glv_safe: bool) -> g1.G1Jac:
    """Batched scalar-mul: GLV when the bases are known in-subgroup, plain
    double-and-add otherwise (correct for any curve point). On CPU the plain
    loop-bodied orbit is always used: GLV's unrolled window walk is an
    XLA:CPU compile bomb (~4-5 min per shape) and CPU runs are test-sized."""
    if glv_safe and jax.default_backend() != "cpu":
        return g1.scalar_mul_glv_jit(points, scalars)
    return g1.scalar_mul_jit(points, scalars)


@dataclasses.dataclass
class RowCommitments:
    """Per-row Pedersen commitments; dlogs carried along on the fast path."""

    points: g1.G1Jac  # (m,)
    dlogs: jax.Array | None = None  # (m, 8) mont


@dataclasses.dataclass
class OpeningProof:
    com_at_u_row: g1.G1Jac  # evaluation of the row-commitment vector at u_row
    round_points: list  # per round: G1Jac of shape (3,): (temp, temp0, temp1)
    final_gen: g1.G1Jac  # ()-shaped
    final_scalar: jax.Array  # (8,) mont — equals t's MLE at u (order-independent)


def _gen_point() -> g1.G1Jac:
    return g1.generator((1,))


@aot.jit
def _g_pow(scalar_1x8: jax.Array) -> g1.G1Jac:
    """G ^ (raw 256-bit value of scalar) for a (1, 8) scalar."""
    return g1.generator_pow(scalar_1x8)


def setup(key: jax.Array, gen_size: int) -> Generators:
    """Generator vector: r_i * G for random Fr r_i (demo.cu:81-82).

    The reference multiplies the broadcast generator by the *raw bits* of
    `FrTensor::random` (G1Jacobian_mul consumes bits; g1-tensor.cu:433), so the
    dlog of g_i is the raw random value v_i. We store mont(v_i) for Fr math.
    """
    scalars = fr_ops.random_fr(key, gen_size)  # raw values v_i
    points = g1.generator_pow_jit(scalars)  # fixed-base comb: 64 mixed adds
    return Generators(points=points, dlogs=fr.mont(scalars), glv_safe=True)


@functools.lru_cache(maxsize=None)
def aux_generators(size: int) -> Generators:
    """Deterministic shared generator vector for auxiliary-witness commitments
    (sign/mag_bin/rem_bin tensors, docs/SOUNDNESS.md gap #1). Derivation is a
    fixed PRNG key folded with the size, so prover and verifier regenerate the
    same vector — the same transparent trust model as setup (demo.cu:81-82:
    whoever runs setup knows the dlogs either way)."""
    key = jax.random.fold_in(jax.random.PRNGKey(0x5A6B), size)
    return setup(key, size)


def commit(gens: Generators, t: jax.Array) -> RowCommitments:
    """Row commitments; t: (m*gen_size, 8) Montgomery. Returns (m,) points.

    Group-identical to Commitment::commit (commitment.cu:29-41): exponents are
    unmont(t). Fast path: sigma_row = sum_i t_i * r_i (Montgomery domain), then
    one G^unmont(sigma) per row.
    """
    gen_size = gens.size
    assert t.shape[0] % gen_size == 0
    m = t.shape[0] // gen_size

    if gens.dlogs is not None:
        sigma = _commit_rows_fast(t.reshape(m, gen_size, 8), gens.dlogs)  # (m, 8) mont
        points = g1.generator_pow_jit(fr.unmont(sigma))
        return RowCommitments(points=points, dlogs=sigma)

    t_unmont = fr.unmont(t).reshape(m, gen_size, 8)
    gx = jnp.broadcast_to(gens.points.x, (m, gen_size, 12))
    gy = jnp.broadcast_to(gens.points.y, (m, gen_size, 12))
    gz = jnp.broadcast_to(gens.points.z, (m, gen_size, 12))
    # GLV dual-window walk: ~2.3x fewer point ops than the reference's
    # double-and-add orbit (g1-tensor.cu:422-431) — only for subgroup-checked
    # bases (validate_subgroup); unvalidated SRS points take the plain orbit
    prods = _smul(g1.G1Jac(gx, gy, gz), t_unmont, gens.glv_safe)
    p = g1.G1Jac(
        jnp.moveaxis(prods.x, 1, 0), jnp.moveaxis(prods.y, 1, 0), jnp.moveaxis(prods.z, 1, 0)
    )
    return RowCommitments(points=g1.g1_sum(p))


@aot.jit
def _commit_rows_fast(t3: jax.Array, dlogs: jax.Array) -> jax.Array:
    """(m, gen_size, 8) mont x (gen_size, 8) mont -> (m, 8) mont row sums of
    t_i * r_i (value domain: s_i * v_i).

    One lazy planar dot per row (chunked digit-column accumulation, a single
    Montgomery reduction per chunk) — the former elementwise mul + tree-add
    materialized (m*gen, 512) i32 mont temporaries, 8.6 GB at the 18M-param
    layer scale."""
    from ..field import planar

    tp = jnp.transpose(t3, (2, 0, 1))  # (8, m, gen_size)
    dp = planar.to_planar(dlogs)  # (8, gen_size)
    return planar.from_planar(planar.dot(tp, dp[:, None, :]))  # (m, 8)


# ---------------------------------------------------------------------------
# opening
# ---------------------------------------------------------------------------


def me_open_fast(t: jax.Array, dlogs: jax.Array, u_in: jax.Array):
    """Dlog-domain split-and-fold: identical proof points to me_open.

    Per round (cf. me_open_step, commitment.cu:43-60), with value-domain
    identities  temp = (sum v_i s_i R) G  etc., each emitted point is
    G^(raw bits of a Montgomery sum):
      sigmaA = sum_pairs (r0*s0 + r1*s1);  sigma0 = sum r1*s0;  sigma1 = sum r0*s1
    where all products are Montgomery muls (so raw bits carry the extra R).

    All round scalars are computed in ONE jit, then a single batched G1
    scalar-mul produces every proof point — one heavy kernel dispatch per
    opening instead of one per round.
    """
    n, r = t.shape[0], u_in.shape[0]
    assert n == (1 << r), (n, r)
    sigmas, final_scalar, final_dlog_exp = _me_open_fast_scalars(t, dlogs, u_in)
    exps = jnp.concatenate([sigmas, final_dlog_exp[None]], axis=0)  # (3r+1, 8)
    pts = g1.generator_pow_jit(exps)
    round_points = [
        g1.G1Jac(pts.x[3 * i : 3 * i + 3], pts.y[3 * i : 3 * i + 3], pts.z[3 * i : 3 * i + 3])
        for i in range(r)
    ]
    final_gen = g1.G1Jac(pts.x[3 * r], pts.y[3 * r], pts.z[3 * r])
    return round_points, final_gen, final_scalar


def _me_open_fast_scalars_body(t, d, u_in):
    """All rounds' cross-term scalars (3r, 8), the final folded scalar, and the
    final generator's *raw* dlog exponent."""
    r = u_in.shape[0]
    sigmas = []
    for i in range(r):
        ub = jnp.broadcast_to(u_in[i], t[0::2].shape)
        s0, s1 = t[0::2], t[1::2]
        d0, d1 = d[0::2], d[1::2]
        # cross-term scalars; exponents are the raw (Montgomery) bits of these sums
        sigmas.append(fr_ops.fr_sum(fr.add(fr.mul(d0, s0), fr.mul(d1, s1))))
        sigmas.append(fr_ops.fr_sum(fr.mul(d1, s0)))
        sigmas.append(fr_ops.fr_sum(fr.mul(d0, s1)))
        t = fr.add(s0, fr.mul(ub, fr.sub(s1, s0)))
        # generators fold reversed by the *value* of u: r' = r1 + u(r0 - r1)
        d = fr.add(d1, fr.mul(ub, fr.sub(d0, d1)))
    return jnp.stack(sigmas), t[0], fr.unmont(d[0])


_me_open_fast_scalars = aot.jit(_me_open_fast_scalars_body)


def me_open(t: jax.Array, gens: g1.G1Jac, u_in: jax.Array, glv_safe: bool = False):
    """Opaque-generator split-and-fold (Commitment::me_open, commitment.cu:43-81).

    t: (n, 8) mont scalars, gens: (n,) points, u_in: (r, 8) with n == 2^r.
    glv_safe: bases verified in the order-r subgroup (Generators.glv_safe).
    Returns (round_points list, final_gen, final_scalar).
    """
    n, r = t.shape[0], u_in.shape[0]
    assert n == (1 << r), (n, r)
    round_points = []
    for i in range(r):
        u = u_in[i]
        s0, s1 = t[0::2], t[1::2]
        gg0 = g1.G1Jac(gens.x[0::2], gens.y[0::2], gens.z[0::2])
        gg1 = g1.G1Jac(gens.x[1::2], gens.y[1::2], gens.z[1::2])
        t = fr.add(s0, fr.mul(jnp.broadcast_to(u, s0.shape), fr.sub(s1, s0)))
        u_unmont = fr.unmont(u)
        gdiff = g1.add_jit(gg0, g1.neg(gg1))
        gens = g1.add_jit(gg1, _smul(gdiff, jnp.broadcast_to(u_unmont, (*gdiff.shape, 8)), glv_safe))
        tA = g1.add_jit(_smul(gg0, s0, glv_safe), _smul(gg1, s1, glv_safe))
        t0 = _smul(gg1, s0, glv_safe)
        t1 = _smul(gg0, s1, glv_safe)
        sA, s0p, s1p = g1.g1_sum(tA), g1.g1_sum(t0), g1.g1_sum(t1)
        round_points.append(
            g1.G1Jac(
                jnp.stack([sA.x, s0p.x, s1p.x]),
                jnp.stack([sA.y, s0p.y, s1p.y]),
                jnp.stack([sA.z, s0p.z, s1p.z]),
            )
        )
    final_gen = g1.G1Jac(gens.x[0], gens.y[0], gens.z[0])
    return round_points, final_gen, t[0]


def open(gens: Generators, t: jax.Array, com: RowCommitments, u: jax.Array) -> OpeningProof:
    """Full opening at point u (Commitment::open, commitment.cu:83-92)."""
    gen_size = gens.size
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    assert gen_size == (1 << (u.shape[0] - log_m)), (gen_size, u.shape, log_m)
    u_row = u[u.shape[0] - log_m :]
    u_in = u[: u.shape[0] - log_m]

    if gens.dlogs is not None and com.dlogs is not None:
        # Whole opening fused: scalar side in one jit, every G1 point (3 per
        # round + final gen + com(u_row)) in ONE batched scalar-mul.
        r = u_in.shape[0]
        sigmas, final_scalar, final_dlog_exp, com_exp = _open_fast_scalars(
            t, com.dlogs, gens.dlogs, u_row, u_in, gen_size
        )
        exps = jnp.concatenate([sigmas, final_dlog_exp[None], com_exp[None]], axis=0)
        pts = g1.generator_pow_jit(exps)
        round_points = [
            g1.G1Jac(pts.x[3 * i : 3 * i + 3], pts.y[3 * i : 3 * i + 3], pts.z[3 * i : 3 * i + 3])
            for i in range(r)
        ]
        final_gen = g1.G1Jac(pts.x[3 * r], pts.y[3 * r], pts.z[3 * r])
        com_at = g1.G1Jac(pts.x[3 * r + 1], pts.y[3 * r + 1], pts.z[3 * r + 1])
        return OpeningProof(com_at, round_points, final_gen, final_scalar)

    t_folded = fr_ops.partial_me(t, u_row, gen_size) if log_m > 0 else t
    com_at = (
        g1.me_eval(com.points, u_row)
        if log_m > 0
        else g1.G1Jac(com.points.x[0], com.points.y[0], com.points.z[0])
    )
    round_points, final_gen, final_scalar = me_open(
        t_folded, gens.points, u_in, glv_safe=gens.glv_safe
    )
    return OpeningProof(com_at, round_points, final_gen, final_scalar)


def open_planar(gens: Generators, t: jax.Array, com: RowCommitments, u: jax.Array) -> OpeningProof:
    """Planar/pallas fast-path opening; proof identical to open() (tests
    assert). Requires the transparent setup (dlogs present)."""
    if gens.dlogs is None or com.dlogs is None:
        return open(gens, t, com, u)
    gen_size = gens.size
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    assert gen_size == (1 << (u.shape[0] - log_m)), (gen_size, u.shape, log_m)
    u_row = u[u.shape[0] - log_m :]
    u_in = u[: u.shape[0] - log_m]
    r = u_in.shape[0]
    sigmas, final_scalar, final_dlog_exp, com_exp = _open_planar_scalars(
        t, com.dlogs, gens.dlogs, u_row, u_in, gen_size
    )
    exps = jnp.concatenate([sigmas, final_dlog_exp[None], com_exp[None]], axis=0)
    pts = g1.generator_pow_jit(exps)
    round_points = [
        g1.G1Jac(pts.x[3 * i : 3 * i + 3], pts.y[3 * i : 3 * i + 3], pts.z[3 * i : 3 * i + 3])
        for i in range(r)
    ]
    final_gen = g1.G1Jac(pts.x[3 * r], pts.y[3 * r], pts.z[3 * r])
    com_at = g1.G1Jac(pts.x[3 * r + 1], pts.y[3 * r + 1], pts.z[3 * r + 1])
    return OpeningProof(com_at, round_points, final_gen, final_scalar)


@functools.partial(aot.jit, static_argnums=(5,))
def _open_planar_scalars(t, com_dlogs, gen_dlogs, u_row, u_in, gen_size):
    """Planar scalar side of the opening, one dispatch.

    The u_row fold of t is ONE eq-weighted contraction over the row axis
    (instead of log_m fold passes); the me_open split-and-fold rounds run on
    bit-reversed planar halves with lazy pallas dots for the three cross-term
    sums per round (me_open_step, commitment.cu:43-60). Emits the exact same
    scalar stream as _open_fast_scalars.
    """
    from ..field import pallas_fr as pf, planar
    from ..tensor import planar_ops as pops

    m = t.shape[0] // gen_size
    lm = fr_ops.ceil_log2(m)
    t3 = t.reshape(m, gen_size, 8)
    if m < (1 << lm):
        t3 = fr_ops.pad_to(t3, 1 << lm)
    tp = jnp.transpose(t3, (2, 1, 0))  # (8, G, M2)
    tp = pops.bitrev_axis(tp, axis=1)
    if lm:
        row_table = pops.eq_table(u_row)
        t_f = planar.dot(tp, row_table[:, None, :])  # (8, G) bit-rev
        com_sig = planar.dot(planar.to_planar(fr_ops.pad_to(com_dlogs, 1 << lm)), row_table)
    else:
        t_f = tp[:, :, 0]
        com_sig = planar.to_planar(com_dlogs)[:, 0]
    d = pops.bitrev_axis(planar.to_planar(gen_dlogs), axis=1)  # (8, G) bit-rev

    sigmas = []
    for i in range(u_in.shape[0]):
        h = t_f.shape[1] // 2
        s0, s1 = t_f[:, :h], t_f[:, h:]
        d0, d1 = d[:, :h], d[:, h:]
        dots = pf.dot_many([(d0, s0), (d1, s1), (d1, s0), (d0, s1)])  # (8, 4)
        sigmas.append(planar.add(dots[:, 0], dots[:, 1]))
        sigmas.append(dots[:, 2])
        sigmas.append(dots[:, 3])
        x = u_in[i]
        t_f = planar.add(s0, pf.mul_scalar(planar.sub(s1, s0), x))
        d = planar.add(d1, pf.mul_scalar(planar.sub(d0, d1), x))
    final_scalar = t_f[:, 0]
    final_dlog_exp = planar.from_mont(d[:, 0:1])[:, 0]
    com_exp = planar.from_mont(com_sig[:, None])[:, 0]
    sig_arr = jnp.stack(sigmas) if sigmas else jnp.zeros((0, 8), jnp.uint32)
    return sig_arr, final_scalar, final_dlog_exp, com_exp


@functools.partial(aot.jit, static_argnums=(5,))
def _open_fast_scalars(t, com_dlogs, gen_dlogs, u_row, u_in, gen_size):
    """Scalar side of the full fast opening in one jit: fold t along u_row,
    run all me_open rounds, and fold the row-commitment dlogs at u_row."""
    t_folded = fr_ops.partial_me(t, u_row, gen_size) if u_row.shape[0] else t
    sigmas, final_scalar, final_dlog_exp = _me_open_fast_scalars_body(
        t_folded, gen_dlogs, u_in
    )
    sig = com_dlogs
    for i in range(u_row.shape[0]):
        sig = fr_ops.me_step(sig, u_row[i])
    return sigmas, final_scalar, final_dlog_exp, fr.unmont(sig[0])


# ---------------------------------------------------------------------------
# verifier (host; NEW — the reference discards opening proofs)
# ---------------------------------------------------------------------------


def verify_open(proof: OpeningProof, u: Sequence[int], expected_value: int | None = None) -> tuple[bool, str]:
    """Verify the split-and-fold opening.

    u: full evaluation point as Montgomery ints (same list passed to open()).
    expected_value: optional claimed MLE value of t at u (Montgomery int) — e.g.
    the matching sumcheck final claim; checked against final_scalar.

    Tracks D_k = C_k^R (see module docstring). D_0 comes from the proof's own
    com_at_u_row — binding it to the original commitment is the caller's job
    (pass the commitment's G1 MLE evaluation; see verify_open_against_com).
    """
    rounds = [convert.jac_from_device(rp) for rp in proof.round_points]
    com_at = convert.jac_from_device(
        g1.G1Jac(proof.com_at_u_row.x[None], proof.com_at_u_row.y[None], proof.com_at_u_row.z[None])
    )[0]
    u_in = list(u[: len(rounds)])

    R = HF.r
    D = host_g1.scalar_mul(com_at, R % fr.P_INT)  # C_0^R; exponent mod group order
    one = HF.one_mont
    for k, (tA, t0, t1) in enumerate(rounds):
        if not host_g1.eq_points(tA, D):
            return False, f"round {k}: temp != D_k"
        uk = u_in[k]
        c0 = HF.mul(HF.sub(one, uk), HF.sub(one, uk))  # (1-u)^2
        cA = HF.mul(uk, HF.sub(one, uk))  # u(1-u)
        c1 = HF.mul(uk, uk)  # u^2
        # exponents must be *true integer values* of the mont products
        D = host_g1.add(
            host_g1.add(
                host_g1.scalar_mul(t0, HF.unmont(c0)),
                host_g1.scalar_mul(D, HF.unmont(cA)),
            ),
            host_g1.scalar_mul(t1, HF.unmont(c1)),
        )
    fg = convert.jac_from_device(
        g1.G1Jac(proof.final_gen.x[None], proof.final_gen.y[None], proof.final_gen.z[None])
    )[0]
    fs_mont_repr = fr.to_ints(np.asarray(proof.final_scalar)[None])[0]  # raw bits
    if not host_g1.eq_points(host_g1.scalar_mul(fg, fs_mont_repr), D):
        return False, "final: final_gen^final_scalar != D"
    if expected_value is not None and fs_mont_repr != expected_value:
        return False, "final scalar != expected MLE value"
    return True, ""


# ---------------------------------------------------------------------------
# blinded (hiding) commitments — opt-in tier (no reference counterpart:
# commitment.cu:29-41 has no hiding term)
# ---------------------------------------------------------------------------
#
# C_row = G^{sigma_row} * H^{b_row} with fresh random blinders b_row and H a
# NUMS point (dlog vs G unknown to everyone): perfectly hiding per row before
# opening — commitments of equal tensors under different blinder keys are
# unlinkable. Opening reveals ONE scalar b(u_row) (the blinder MLE at the
# opened row point): the verifier unblinds com(u_row) by H^{-b(u_row)} and
# runs the standard opening check. Residual leakage (the evaluation value and
# the sumcheck messages) is documented in docs/SOUNDNESS.md — full ZK needs
# masked sigma-protocol openings, out of scope for this tier.


@functools.lru_cache(maxsize=None)
def blinding_point() -> g1.G1Jac:
    """H: a NUMS curve point from a DOMAIN-SEPARATED hash-to-curve stream
    (never overlaps the nums_generators stream), cofactor-cleared."""
    import hashlib

    from ..field import fp

    p = fp.P_INT
    ctr = 0
    while True:
        h1 = hashlib.sha256(f"zkdl-tpu/nums-blind/v1/{ctr}".encode()).digest()
        h2 = hashlib.sha256(f"zkdl-tpu/nums-blind/v1/{ctr}/b".encode()).digest()
        x = int.from_bytes(h1 + h2, "big") % p
        rhs = (x * x % p * x + 4) % p
        y = pow(rhs, (p + 1) // 4, p)
        if y * y % p == rhs:
            pt = host_g1.scalar_mul(host_g1.JacPoint(x, min(y, p - y), 1), _G1_COFACTOR)
            assert not pt.is_identity()
            return convert.jac_to_device([pt])


@dataclasses.dataclass
class BlindedRowCommitments:
    """Hiding row commitments + the prover-side blinder vector (kept secret;
    only folded combinations are ever revealed in openings)."""

    points: g1.G1Jac  # (m,) C_row = G^sigma_row * H^b_row
    blinders: jax.Array  # (m, 8) mont — prover-side secret

    @property
    def public(self) -> RowCommitments:
        return RowCommitments(points=self.points)


def commit_blinded(gens: Generators, t: jax.Array, key) -> BlindedRowCommitments:
    """Hiding commit (transparent fast path): C_row = G^sigma_row * H^b_row,
    b_row fresh uniform Fr from `key`."""
    assert gens.dlogs is not None, "blinded commit implemented on the fast path"
    gen_size = gens.size
    m = t.shape[0] // gen_size
    sigma = _commit_rows_fast(t.reshape(m, gen_size, 8), gens.dlogs)
    g_part = g1.generator_pow_jit(fr.unmont(sigma))
    b = fr.mont(fr_ops.random_fr(key, m))
    H = blinding_point()
    Hb = g1.G1Jac(
        jnp.broadcast_to(H.x, (m, 12)), jnp.broadcast_to(H.y, (m, 12)),
        jnp.broadcast_to(H.z, (m, 12)),
    )
    h_part = _smul(Hb, fr.unmont(b), glv_safe=True)
    return BlindedRowCommitments(points=g1.add_jit(g_part, h_part), blinders=b)


def open_blinded(gens: Generators, t: jax.Array, com: BlindedRowCommitments,
                 u: jax.Array) -> tuple[OpeningProof, jax.Array]:
    """Opening against a blinded commitment: the standard fast-path opening on
    the UNBLINDED scalars plus the revealed blinder fold b(u_row) ((8,) mont).
    The com_at_u_row inside the proof is the unblinded G^sigma(u_row)."""
    gen_size = gens.size
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    assert gen_size == (1 << (u.shape[0] - log_m)), (gen_size, u.shape, log_m)
    u_row = u[u.shape[0] - log_m :]
    sigma = _commit_rows_fast(t.reshape(m, gen_size, 8), gens.dlogs)
    unblinded = RowCommitments(points=g1.generator_pow_jit(fr.unmont(sigma)), dlogs=sigma)
    proof = open_planar(gens, t, unblinded, u)
    b_fold = fr_ops.me_eval(com.blinders, u_row) if log_m else com.blinders[0]
    return proof, b_fold


def verify_open_blinded(proof: OpeningProof, com: RowCommitments, u: Sequence[int],
                        b_fold: int, expected_value: int | None = None) -> tuple[bool, str]:
    """Verify an opening against BLINDED row commitments: fold the public
    blinded points at u_row, unblind by H^{-b(u_row)}, compare with the
    proof's (unblinded) com_at_u_row, then run the standard opening checks."""
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    u_row = list(u[len(u) - log_m :]) if log_m else []
    pts = convert.jac_from_device(com.points)
    for uk in u_row:
        uk_true = HF.unmont(uk)
        if len(pts) % 2:
            pts.append(host_g1.IDENTITY)
        pts = [
            host_g1.add(
                pts[2 * i],
                host_g1.scalar_mul(host_g1.add(pts[2 * i + 1], host_g1.neg(pts[2 * i])), uk_true),
            )
            for i in range(len(pts) // 2)
        ]
    H = convert.jac_from_device(blinding_point())[0]
    unblinded = host_g1.add(pts[0], host_g1.neg(host_g1.scalar_mul(H, HF.unmont(b_fold))))
    got = convert.jac_from_device(
        g1.G1Jac(proof.com_at_u_row.x[None], proof.com_at_u_row.y[None], proof.com_at_u_row.z[None])
    )[0]
    if not host_g1.eq_points(got, unblinded):
        return False, "unblinded com(u_row) mismatch"
    return verify_open(proof, u, expected_value=expected_value)


# ---------------------------------------------------------------------------
# NUMS generators + binding revealed-fold opening (no reference counterpart)
# ---------------------------------------------------------------------------
#
# The transparent setup above matches the reference's trust model
# (demo.cu:81-82: the setup party knows every generator's discrete log). That
# is fine for the *model owner's* weight commitments, but worthless for
# witness tensors committed by the PROVER itself — with known dlogs any prover
# can open a commitment to arbitrary values. The committed-witness/-aux
# soundness tiers therefore use:
#   * nums_generators: nothing-up-my-sleeve points (try-and-increment
#     hash-to-curve + cofactor clearing) — no one knows their dlogs, so the
#     commitments are binding under the discrete-log assumption;
#   * FoldOpening: a Hyrax-style evaluation proof whose ONLY prover message is
#     the u_row-fold of the tensor; the verifier recomputes the row-commitment
#     MLE and the generator MSM itself, leaving nothing to forge. (The
#     me_open argument above folds by the PRE-KNOWN evaluation point, so its
#     cross-terms can be steered by a malicious prover; it is kept for
#     reference stream parity and tamper evidence, not binding.)

_G1_COFACTOR = 0x396C8C005555E1568C00AAAB0000AAAB  # (x-1)^2 / 3

_NUMS_STREAM: list = []  # accepted curve points, before cofactor clearing


def _nums_affine(count: int) -> list:
    """First `count` points of the deterministic try-and-increment stream:
    x = SHA256("zkdl-tpu/nums/v1/<ctr>") mod p (two hashes -> 512 bits, bias
    < 2^-130), y = smaller sqrt of x^3 + 4 when it exists (p = 3 mod 4)."""
    import hashlib

    from ..field import fp

    p = fp.P_INT
    ctr = len(_NUMS_STREAM) and _NUMS_STREAM[-1][0] + 1
    while len(_NUMS_STREAM) < count:
        h1 = hashlib.sha256(f"zkdl-tpu/nums/v1/{ctr}".encode()).digest()
        h2 = hashlib.sha256(f"zkdl-tpu/nums/v1/{ctr}/b".encode()).digest()
        x = int.from_bytes(h1 + h2, "big") % p
        rhs = (x * x % p * x + 4) % p
        y = pow(rhs, (p + 1) // 4, p)
        if y * y % p == rhs:
            _NUMS_STREAM.append((ctr, x, min(y, p - y)))
        ctr += 1
    return _NUMS_STREAM[:count]


@functools.lru_cache(maxsize=None)
def nums_generators(size: int) -> Generators:
    """Nothing-up-my-sleeve generator vector (prefix-stable across sizes):
    hash-to-curve candidates cofactor-cleared into the order-r subgroup in one
    device-batched scalar-mul. dlogs unknown to everyone -> binding."""
    cands = convert.jac_to_device(
        [host_g1.JacPoint(x, y, 1) for (_, x, y) in _nums_affine(size)]
    )
    cof = np.zeros(8, np.uint32)
    for i in range(4):
        cof[i] = (_G1_COFACTOR >> (32 * i)) & 0xFFFFFFFF
    pts = g1.scalar_mul_jit(cands, jnp.broadcast_to(jnp.asarray(cof), (size, 8)))
    assert not bool(jnp.any(g1.is_identity(pts))), "cofactor-cleared to identity"
    # cofactor-cleared points are in the order-r subgroup by construction
    return Generators(points=pts, dlogs=None, glv_safe=True)


def commit_bits(gens: Generators, bits: jax.Array) -> RowCommitments:
    """Row commitments of a 0/1-valued tensor over (typically NUMS) generators:
    the exponent of a bit is 0 or 1, so each row commitment is a masked SUM of
    generators — no scalar-muls at all. bits: (m*gen_size,) uint32 in {0, 1}.
    Group-identical to commit() on the Montgomery bit tensor."""
    gen_size = gens.size
    assert bits.shape[0] % gen_size == 0
    m = bits.shape[0] // gen_size
    points = _commit_bits_rows(bits.reshape(m, gen_size), gens.points)
    return RowCommitments(points=points)


@aot.jit
def _commit_bits_rows(bits2: jax.Array, gens: g1.G1Jac) -> g1.G1Jac:
    m, gen_size = bits2.shape
    gx = jnp.broadcast_to(gens.x, (m, gen_size, 12))
    gy = jnp.broadcast_to(gens.y, (m, gen_size, 12))
    gz = jnp.broadcast_to(gens.z, (m, gen_size, 12))
    masked = g1.select(
        bits2 != 0, g1.G1Jac(gx, gy, gz), g1.identity((m, gen_size))
    )
    # tree-sum along the gen axis (leading-axis reduction after a moveaxis)
    p = g1.G1Jac(
        jnp.moveaxis(masked.x, 1, 0), jnp.moveaxis(masked.y, 1, 0), jnp.moveaxis(masked.z, 1, 0)
    )
    return g1.g1_sum(p)


@dataclasses.dataclass
class FoldOpening:
    """Hyrax-style revealed-fold evaluation proof. The prover reveals the
    u_row-fold of the committed tensor (sqrt-sized); the verifier checks
      (1) MSM_i g_i^unmont(t_folded_i) == MLE of the row commitments at u_row
      (2) MLE of t_folded at u_in == the claimed value.
    Binding reduces to the binding of the row commitments (DL-hard for NUMS /
    opaque-SRS generators). Not zero-knowledge (neither is anything in the
    reference); the blinded tier masks it."""

    t_folded: jax.Array  # (gen_size, 8) Montgomery


def open_reveal(gens: Generators, t: jax.Array, com: RowCommitments, u: jax.Array) -> FoldOpening:
    """Evaluation proof of t at u against com: just the u_row fold (the
    verifier recomputes everything else)."""
    gen_size = gens.size
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    assert gen_size == (1 << (u.shape[0] - log_m)), (gen_size, u.shape, log_m)
    u_row = u[u.shape[0] - log_m :]
    t_folded = fr_ops.partial_me(t, u_row, gen_size) if log_m else t
    return FoldOpening(t_folded=t_folded)


@aot.jit
def _verify_reveal_dev(t_folded, gens_pts: g1.G1Jac, com_pts: g1.G1Jac, u):
    # GLV's unrolled window walk is an XLA:CPU compile bomb (~5 min); the
    # loop-bodied plain orbit compiles in seconds there and tests are tiny
    smul = g1.scalar_mul if jax.default_backend() == "cpu" else g1.scalar_mul_glv
    msm = g1.g1_sum(smul(gens_pts, fr.unmont(t_folded)))
    log_m = u.shape[0] - fr_ops.ceil_log2(t_folded.shape[0])
    u_row = u[u.shape[0] - log_m :] if log_m else u[:0]
    com_at = (
        g1.me_eval(com_pts, u_row)
        if log_m
        else g1.G1Jac(com_pts.x[0], com_pts.y[0], com_pts.z[0])
    )
    u_in = u[: u.shape[0] - log_m]
    value = fr_ops.me_eval(t_folded, u_in)
    return msm, com_at, value


def verify_reveal(
    opening: FoldOpening, gens: Generators, com: RowCommitments, u: Sequence[int],
    expected_value: int | None = None,
) -> tuple[bool, str]:
    """Verify a FoldOpening (see class docstring). u: full evaluation point as
    Montgomery ints; gens must be the same (deterministically regenerable)
    vector the commitment was built over.

    The group math runs device-side on accelerators and host-side (python-int
    G1) on the cpu backend: the unrolled G1 MSM/MLE graphs are multi-minute
    XLA:CPU compiles while cpu runs are test-sized."""
    gen_size = gens.size
    t_folded = np.asarray(opening.t_folded)
    if t_folded.shape != (gen_size, 8):
        return False, f"fold shape {t_folded.shape} != ({gen_size}, 8)"
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    if len(u) != log_m + fr_ops.ceil_log2(gen_size):
        return False, "point length mismatch"
    if not gens.glv_safe:
        return False, "generators not subgroup-validated (run validate_subgroup)"
    u_row = list(u[len(u) - log_m :]) if log_m else []
    u_in = list(u[: len(u) - log_m])

    if jax.default_backend() == "cpu":
        t_ints = fr.to_ints(t_folded)
        gpts = convert.jac_from_device(gens.points)
        msm = host_g1.IDENTITY
        for gpt, ti in zip(gpts, t_ints):
            msm = host_g1.add(msm, host_g1.scalar_mul(gpt, HF.unmont(ti)))
        pts = convert.jac_from_device(com.points)
        for uk in u_row:
            uk_true = HF.unmont(uk)
            if len(pts) % 2:
                pts.append(host_g1.IDENTITY)
            pts = [
                host_g1.add(
                    pts[2 * i],
                    host_g1.scalar_mul(
                        host_g1.add(pts[2 * i + 1], host_g1.neg(pts[2 * i])), uk_true
                    ),
                )
                for i in range(len(pts) // 2)
            ]
        if not host_g1.eq_points(msm, pts[0]):
            return False, "generator MSM != row-commitment MLE at u_row"
        if expected_value is not None:
            vals = t_ints
            for uk in u_in:
                vals = [
                    HF.add(vals[2 * i], HF.mul(uk, HF.sub(vals[2 * i + 1], vals[2 * i])))
                    for i in range(len(vals) // 2)
                ]
            if vals[0] != expected_value:
                return False, "folded MLE value != expected"
        return True, ""

    u_dev = jnp.asarray(np.stack([mp_limbs(x) for x in u])) if u else jnp.zeros((0, 8), jnp.uint32)
    com_pts = com.points
    if m < (1 << log_m):
        pad = g1.identity(((1 << log_m) - m,))
        com_pts = g1.G1Jac(
            jnp.concatenate([com_pts.x, pad.x]),
            jnp.concatenate([com_pts.y, pad.y]),
            jnp.concatenate([com_pts.z, pad.z]),
        )
    msm, com_at, value = _verify_reveal_dev(
        jnp.asarray(t_folded), gens.points, com_pts, u_dev
    )
    mh = convert.jac_from_device(g1.G1Jac(msm.x[None], msm.y[None], msm.z[None]))[0]
    ch = convert.jac_from_device(g1.G1Jac(com_at.x[None], com_at.y[None], com_at.z[None]))[0]
    if not host_g1.eq_points(mh, ch):
        return False, "generator MSM != row-commitment MLE at u_row"
    if expected_value is not None:
        got = fr.to_ints(np.asarray(value)[None])[0]
        if got != expected_value:
            return False, "folded MLE value != expected"
    return True, ""


def mp_limbs(x: int) -> np.ndarray:
    from ..field import mp

    return mp.limbs_from_int(x, 8)


def verify_open_against_com(proof: OpeningProof, com: RowCommitments, u: Sequence[int]) -> tuple[bool, str]:
    """Additionally bind the proof to the original row commitments: recompute
    com(u_row) on host and compare with the proof's com_at_u_row."""
    m = com.points.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    u_row = list(u[len(u) - log_m :]) if log_m else []
    pts = convert.jac_from_device(com.points)
    for uk in u_row:
        uk_true = HF.unmont(uk)
        if len(pts) % 2:
            pts.append(host_g1.IDENTITY)
        pts = [
            host_g1.add(
                pts[2 * i],
                host_g1.scalar_mul(host_g1.add(pts[2 * i + 1], host_g1.neg(pts[2 * i])), uk_true),
            )
            for i in range(len(pts) // 2)
        ]
    got = convert.jac_from_device(
        g1.G1Jac(proof.com_at_u_row.x[None], proof.com_at_u_row.y[None], proof.com_at_u_row.z[None])
    )[0]
    if not host_g1.eq_points(got, pts[0]):
        return False, "com(u_row) mismatch"
    return True, ""
