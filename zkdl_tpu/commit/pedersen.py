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

HF = host.fr


@dataclasses.dataclass
class Generators:
    """Generator vector; dlogs (Montgomery form, (n, 8)) are present in the
    transparent setting: points[i] == unmont(dlogs[i]) * G."""

    points: g1.G1Jac
    dlogs: jax.Array | None = None

    @property
    def size(self) -> int:
        return self.points.x.shape[0]


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


@jax.jit
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
    return Generators(points=points, dlogs=fr.mont(scalars))


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
    # double-and-add orbit (g1-tensor.cu:422-431) on the opaque-SRS path
    prods = g1.scalar_mul_glv_jit(g1.G1Jac(gx, gy, gz), t_unmont)
    p = g1.G1Jac(
        jnp.moveaxis(prods.x, 1, 0), jnp.moveaxis(prods.y, 1, 0), jnp.moveaxis(prods.z, 1, 0)
    )
    return RowCommitments(points=g1.g1_sum(p))


@jax.jit
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


_me_open_fast_scalars = jax.jit(_me_open_fast_scalars_body)


def me_open(t: jax.Array, gens: g1.G1Jac, u_in: jax.Array):
    """Opaque-generator split-and-fold (Commitment::me_open, commitment.cu:43-81).

    t: (n, 8) mont scalars, gens: (n,) points, u_in: (r, 8) with n == 2^r.
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
        gens = g1.add_jit(gg1, g1.scalar_mul_glv_jit(gdiff, jnp.broadcast_to(u_unmont, (*gdiff.shape, 8))))
        tA = g1.add_jit(g1.scalar_mul_glv_jit(gg0, s0), g1.scalar_mul_glv_jit(gg1, s1))
        t0 = g1.scalar_mul_glv_jit(gg1, s0)
        t1 = g1.scalar_mul_glv_jit(gg0, s1)
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
    round_points, final_gen, final_scalar = me_open(t_folded, gens.points, u_in)
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


@functools.partial(jax.jit, static_argnums=(5,))
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


@functools.partial(jax.jit, static_argnums=(5,))
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
