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

Reference quirk preserved: inside me_open, G1 scalar-muls use the *Montgomery
representation bits* of the scalars (me_open_step treats Fr_t as a raw 256-bit
exponent; commitment.cu:43-60), i.e. every cross term is the R-scaled group
element (g^(s*R)). This is still verifiable because scalar-mul is linear:
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
class OpeningProof:
    com_at_u_row: g1.G1Jac  # evaluation of the row-commitment vector at u_row
    round_points: list  # per round: G1Jac of shape (3,): (temp, temp0, temp1)
    final_gen: g1.G1Jac  # ()-shaped
    final_scalar: jax.Array  # (8,) mont — equals t's MLE at u (order-independent)


def setup(key: jax.Array, gen_size: int) -> g1.G1Jac:
    """Generator vector: r_i * G for random Fr r_i (demo.cu:81-82).

    The reference multiplies by the Montgomery *representation* of random field
    elements (G1Jacobian_mul consumes raw bits); since r is uniform, r*R mod p is
    uniform too — we multiply the plain generator by uniform non-Montgomery
    scalars, which has the identical distribution.
    """
    scalars = fr_ops.random_fr(key, gen_size)
    return g1.scalar_mul_jit(g1.generator((gen_size,)), scalars)


def commit(gens: g1.G1Jac, t: jax.Array) -> g1.G1Jac:
    """Row commitments; t: (m*gen_size, 8) Montgomery. Returns (m,) points.

    Matches Commitment::commit (commitment.cu:29-41): scalars unmonted first.
    """
    gen_size = gens.x.shape[0]
    assert t.shape[0] % gen_size == 0
    m = t.shape[0] // gen_size
    t_unmont = fr.unmont(t).reshape(m, gen_size, 8)
    gx = jnp.broadcast_to(gens.x, (m, gen_size, 12))
    gy = jnp.broadcast_to(gens.y, (m, gen_size, 12))
    gz = jnp.broadcast_to(gens.z, (m, gen_size, 12))
    prods = g1.scalar_mul_jit(g1.G1Jac(gx, gy, gz), t_unmont)
    # row-sum: pairwise tree along axis 1
    p = g1.G1Jac(
        jnp.moveaxis(prods.x, 1, 0), jnp.moveaxis(prods.y, 1, 0), jnp.moveaxis(prods.z, 1, 0)
    )
    return g1.g1_sum(p)


def me_open(t: jax.Array, gens: g1.G1Jac, u_in: jax.Array):
    """Split-and-fold opening rounds (Commitment::me_open, commitment.cu:43-81).

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
        # scalars fold in Montgomery arithmetic
        t = fr.add(s0, fr.mul(jnp.broadcast_to(u, s0.shape), fr.sub(s1, s0)))
        # generators fold reversed, by the *integer* value of u (commitment.cu:56)
        u_unmont = fr.unmont(u)
        gdiff = g1.add_jit(gg0, g1.neg(gg1))
        gens = g1.add_jit(gg1, g1.scalar_mul_jit(gdiff, jnp.broadcast_to(u_unmont, (*gdiff.shape, 8))))
        # cross terms with Montgomery-representation exponents (reference quirk)
        tA = g1.add_jit(g1.scalar_mul_jit(gg0, s0), g1.scalar_mul_jit(gg1, s1))
        t0 = g1.scalar_mul_jit(gg1, s0)
        t1 = g1.scalar_mul_jit(gg0, s1)
        round_points.append(
            g1.G1Jac(
                jnp.stack([g1.g1_sum(tA).x, g1.g1_sum(t0).x, g1.g1_sum(t1).x]),
                jnp.stack([g1.g1_sum(tA).y, g1.g1_sum(t0).y, g1.g1_sum(t1).y]),
                jnp.stack([g1.g1_sum(tA).z, g1.g1_sum(t0).z, g1.g1_sum(t1).z]),
            )
        )
    final_gen = g1.G1Jac(gens.x[0], gens.y[0], gens.z[0])
    return round_points, final_gen, t[0]


def _open_core(gens: g1.G1Jac, t: jax.Array, com: g1.G1Jac, u: jax.Array, log_m: int):
    gen_size = gens.x.shape[0]
    u_row = u[u.shape[0] - log_m :]
    u_in = u[: u.shape[0] - log_m]
    com_at = g1.me_eval(com, u_row) if log_m > 0 else g1.G1Jac(com.x[0], com.y[0], com.z[0])
    t_folded = fr_ops.partial_me(t, u_row, gen_size) if log_m > 0 else t
    round_points, final_gen, final_scalar = me_open(t_folded, gens, u_in)
    return com_at, round_points, final_gen, final_scalar


def open(gens: g1.G1Jac, t: jax.Array, com: g1.G1Jac, u: jax.Array) -> OpeningProof:
    """Full opening at point u (Commitment::open, commitment.cu:83-92)."""
    gen_size = gens.x.shape[0]
    m = com.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    assert gen_size == (1 << (u.shape[0] - log_m)), (gen_size, u.shape, log_m)
    com_at, round_points, final_gen, final_scalar = _open_core(gens, t, com, u, log_m)
    return OpeningProof(com_at, round_points, final_gen, final_scalar)


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
    log_m_used = len(u) - len(rounds)
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


def verify_open_against_com(proof: OpeningProof, com: g1.G1Jac, u: Sequence[int]) -> tuple[bool, str]:
    """Additionally bind the proof to the original row commitments: recompute
    com(u_row) on host and compare with the proof's com_at_u_row."""
    m = com.x.shape[0]
    log_m = fr_ops.ceil_log2(m)
    u_row = list(u[len(u) - log_m :]) if log_m else []
    pts = convert.jac_from_device(com)
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
