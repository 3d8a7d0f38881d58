"""Planar sumcheck provers: full-lane-width rounds, eq-table evals, bit tricks.

Same protocols and bit-identical proof streams as protocols.py (asserted by
tests), re-engineered for TPU throughput:

- Tensors live in bit-reversed planar storage ((8, n); see tensor/planar_ops.py)
  so every round combines contiguous halves; the heavy ops are the Pallas
  kernels of field/pallas_fr.py.
- The point-anchored variants (hadamard/binary) evaluate round coefficients as
  ONE lazy dot against a prefix of a single precomputed eq table, rescaled by a
  running product of (1-u_i)^-1 — replacing the reference's per-round O(n)
  fold-chain evaluations (proof.cu:110-188) with ~1 mul/element. The inverse
  products are computed host-side (challenges are transcript outputs and exist
  on the host first); a challenge with u_i == 1 would only yield an invalid
  proof (prob ~2^-255), never an unsound acceptance.
- Binary round 0 operates on PACKED BITS and is multiplication-free: for bit
  inputs the round polynomial collapses to c0 = 0, c1 = -c2,
  c2 = sum_{pairs with a0 != a1} eq-weight (a masked lazy sum), and the fold
  output is a 4-way select among {0, 1, v, 1-v}.
- Hadamard round 0 exploits the bit-valued sign operand the same way.
- Large rounds run as per-shape jitted kernels (compile cache shared across
  layers and across the three protocols); once a tensor is down to TAIL_N
  elements the remaining rounds run as the (n, 8) scan provers of protocols.py
  (one fused jit, fixed shapes).

Challenge layout, round order, and emitted (c0, c1, c2) streams match
protocols.py exactly, so the host verifiers there apply unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host, pallas_fr as pf, planar
from ..utils import aot
from ..tensor import planar_ops as pops
from . import protocols as sc

HF = host.fr

# Below this many elements the per-round dispatch latency would dominate: hand
# the tensor to a fused (n, 8) tail prover (one dispatch for all remaining
# rounds). 0 disables tails — the planar rounds run down to size 1 (each
# per-size kernel is a small, cached compile; the unrolled tail graphs are the
# most expensive compiles in the prover: 20+ minutes of TPU warmup at the
# zkdl256 scale). -1 = auto (the default): 0 on TPU, 1024 elsewhere (small
# test tensors go straight to the scan tails, the only CPU-compile-friendly
# flavor). Env: ZKDL_PLANAR_TAIL_N.
from .. import config as _config

TAIL_N = _config.get().planar_tail_n


def _tail_n() -> int:
    if TAIL_N >= 0:
        return TAIL_N
    return 0 if jax.default_backend() == "tpu" else 1024


# Once a tensor fits in ONE pallas block (8*8192), the remaining planar rounds
# are fused into a single jit: ~2 dispatches instead of ~2 per round — the
# per-round dispatch latency over a remote-device link otherwise dominates
# small models. Per-(entry-size, rounds) compile units stay small (all pallas
# bodies). Disabled on CPU (fused multi-round graphs are the XLA:CPU
# compile-time hazard the scan tails exist to avoid). Env: ZKDL_PLANAR_FUSE_N.
import os as _os

FUSE_N = int(_os.environ.get("ZKDL_PLANAR_FUSE_N", "8192"))


def _fuse_n() -> int:
    return FUSE_N if jax.default_backend() == "tpu" else int(_os.environ.get("ZKDL_PLANAR_FUSE_N_CPU", "0"))


@aot.jit
def _ip_tail_planar(a_rev, b_rev, u_rem):
    polys = []
    for i in range(u_rem.shape[0]):
        p, a_rev, b_rev = _ip_round(a_rev, b_rev, u_rem[i])
        polys.append(p)
    return jnp.stack(polys), jnp.stack([a_rev[:, 0], b_rev[:, 0]])


@aot.jit
def _bin_tail_planar(a_rev, table, scales_rem, v_rem):
    polys = []
    for k in range(v_rem.shape[0]):
        h = a_rev.shape[1] // 2
        p, a_rev = _bin_round(a_rev, table[:, :h], scales_rem[k], v_rem[k])
        polys.append(p)
    return jnp.stack(polys), a_rev[:, 0]


@aot.jit
def _hp_tail_planar(a_rev, b_rev, table, scales_rem, v_rem):
    polys = []
    for k in range(v_rem.shape[0]):
        h = a_rev.shape[1] // 2
        p, a_rev, b_rev = _hp_round(a_rev, b_rev, table[:, :h], scales_rem[k], v_rem[k])
        polys.append(p)
    return jnp.stack(polys), jnp.stack([a_rev[:, 0], b_rev[:, 0]])


# Tail prover flavor: the lax.scan-bodied provers compile fast but run the
# fixed-size body every round — measured ~350 ms/round on TPU (the scan body
# can't halve shapes), vs <1 ms/round for the statically-unrolled provers.
# Scan on CPU, where the unrolled limb graphs are a compile-time hazard and
# tests run tiny sizes; unrolled on any accelerator backend (not just tpu).


def _tail_ip(a, b, u):
    if jax.default_backend() == "cpu":
        return sc.inner_product_prove_scan(a, b, u)
    return sc.inner_product_prove_jit(a, b, u)


def _tail_bin(a, u, v):
    if jax.default_backend() == "cpu":
        return sc.binary_prove_scan(a, u, v)
    return sc.binary_prove_jit(a, u, v)


def _tail_hp(a, b, u, v):
    if jax.default_backend() == "cpu":
        return sc.hadamard_prove_scan(a, b, u, v)
    return sc.hadamard_prove_jit(a, b, u, v)


def host_scales(u) -> jax.Array:
    """scale[i] = prod_{1<=j<=i} (1-u[j])^-1 (Montgomery ints) for
    i in 0..len(u)-2, computed host-side. Returns (len(u)-1, 8) limbs."""
    u_ints = fr.to_ints(np.asarray(u))
    one = HF.one_mont
    s = one
    out = [one]
    for j in range(1, len(u_ints)):
        d = HF.sub(one, u_ints[j])
        d_val = HF.unmont(d)
        inv_val = pow(d_val, -1, fr.P_INT) if d_val else 0
        s = HF.mul(s, HF.mont(inv_val))
        out.append(s)
    from ..field import mp

    return jnp.asarray(np.stack([mp.limbs_from_int(x, 8) for x in out]))


# ---------------------------------------------------------------------------
# per-round kernels (jitted; compile cache keyed by shape)
# ---------------------------------------------------------------------------


@aot.jit
def _ip_round(a, b, x):
    """a, b: (8, n) bit-rev planar. Emits summed (c0, c1, c2) and folded halves."""
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = b[:, :h], b[:, h:]
    da = planar.sub(a1, a0)
    db = planar.sub(b1, b0)
    dots = pf.dot_many([(a0, b0), (a0, db), (b0, da), (da, db)])  # (8, 4)
    c0 = dots[:, 0]
    c1 = planar.add(dots[:, 1], dots[:, 2])
    c2 = dots[:, 3]
    a_n = planar.add(a0, pf.mul_scalar(da, x))
    b_n = planar.add(b0, pf.mul_scalar(db, x))
    return jnp.stack([c0, c1, c2]), a_n, b_n


@aot.jit
def _bin_round(a, w, scale, x):
    """General binary round: a (8, n); w = eq-table prefix (8, n/2); scale (8,)
    corrects the table's accumulated (1-u_j) factors; x = fold challenge."""
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    d = planar.sub(a1, a0)
    aw = pf.mul(a0, w)
    dw = pf.mul(d, w)
    # c0 = sum (a0^2 - a0) w ; c1 = sum (2 a0 - 1) d w ; c2 = sum d^2 w
    dots = pf.dot_many([(a0, aw), (d, aw), (d, dw)])
    c0 = planar.sub(dots[:, 0], planar.lazy_sum(aw))
    c1 = planar.sub(planar.double(dots[:, 1]), planar.lazy_sum(dw))
    c2 = dots[:, 2]
    polys = pf.mul_scalar(jnp.stack([c0, c1, c2], axis=1), scale)
    a_n = planar.add(a0, pf.mul_scalar(d, x))
    return jnp.swapaxes(polys, 0, 1), a_n  # (3, 8)


@aot.jit
def _bin_round0_bits(bits, w, x):
    """Mul-free binary round 0 on packed bits.

    bits: (n,) uint32 0/1, bit-reversed storage; w: (8, n/2) eq table of u[1:];
    x: fold challenge v[0]. Returns ((3, 8) polys, folded (8, n/2) planar).
    For bit inputs: c0 = 0; c2 = sum_{a0 != a1} w; c1 = -c2; the fold is a
    4-way select among {0, mont(1), x, mont(1)-x}.
    """
    h = bits.shape[0] // 2
    b0, b1 = bits[:h] != 0, bits[h:] != 0
    neq = b0 != b1
    c2 = planar.masked_sum(neq, w)
    c1 = planar.neg(c2[:, None])[:, 0]
    c0 = jnp.zeros_like(c2)
    folded = _fold_bits(b0, b1, neq, x, h)
    return jnp.stack([c0, c1, c2]), folded


def _fold_bits(b0, b1, neq, x, h):
    one = planar.ones_mont(1)[:, 0]
    one_minus_x = planar.sub(one[:, None], x[:, None])[:, 0]
    hi_val = planar.select(b1, _bcast(x, h), _bcast(one_minus_x, h))
    eqv = planar.select(b0, _bcast(one, h), jnp.zeros((8, h), jnp.uint32))
    return planar.select(neq, hi_val, eqv)


@aot.jit
def _hp_round(a, b, w, scale, x):
    """General hadamard round: a, b (8, n); w (8, n/2); fold challenge x."""
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = b[:, :h], b[:, h:]
    da = planar.sub(a1, a0)
    db = planar.sub(b1, b0)
    bw = pf.mul(b0, w)
    dbw = pf.mul(db, w)
    dots = pf.dot_many([(a0, bw), (da, bw), (a0, dbw), (da, dbw)])
    c0 = dots[:, 0]
    c1 = planar.add(dots[:, 1], dots[:, 2])
    c2 = dots[:, 3]
    polys = pf.mul_scalar(jnp.stack([c0, c1, c2], axis=1), scale)
    a_n = planar.add(a0, pf.mul_scalar(da, x))
    b_n = planar.add(b0, pf.mul_scalar(db, x))
    return jnp.swapaxes(polys, 0, 1), a_n, b_n


@aot.jit
def _hp_round0_bits(a, bits, w, x):
    """Hadamard round 0 with a bit-valued b operand (e.g. the ReLU sign tensor):
    all Montgomery muls against b collapse to selects; only the three lazy dots
    against the eq table remain."""
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = bits[:h] != 0, bits[h:] != 0
    da = planar.sub(a1, a0)
    neq = b0 != b1
    zero = jnp.zeros_like(a0)
    # c0 = sum a0*b0*w ; c1 = sum (a0*db + b0*da)*w ; c2 = sum da*db*w
    a0db = planar.select(neq, planar.select(b1, a0, planar.neg(a0)), zero)
    dadb = planar.select(neq, planar.select(b1, da, planar.neg(da)), zero)
    dots = pf.dot_many(
        [
            (planar.select(b0, a0, zero), w),
            (planar.add(a0db, planar.select(b0, da, zero)), w),
            (dadb, w),
        ]
    )
    b_n = _fold_bits(b0, b1, neq, x, h)
    a_n = planar.add(a0, pf.mul_scalar(da, x))
    return jnp.swapaxes(dots, 0, 1), a_n, b_n


def _bcast(s, n):
    return jnp.broadcast_to(s[:, None], (8, n))


# ---------------------------------------------------------------------------
# split poly/fold kernels for the round-interleaved Fiat-Shamir mode
# ---------------------------------------------------------------------------
#
# Textbook sumcheck FS absorbs round i's polynomial BEFORE drawing fold
# challenge i+1; the batched provers above draw every challenge up front (the
# reference is worse still — host RNG, /root/reference/proof.cu:3-11). The
# interleaved mode pays one host round-trip per round (absorb the 3x8 poly,
# draw the next challenge) and therefore needs the round kernels split into a
# poly part and a fold part.


@aot.jit
def _ip_round_poly(a, b):
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = b[:, :h], b[:, h:]
    da = planar.sub(a1, a0)
    db = planar.sub(b1, b0)
    dots = pf.dot_many([(a0, b0), (a0, db), (b0, da), (da, db)])
    return jnp.stack([dots[:, 0], planar.add(dots[:, 1], dots[:, 2]), dots[:, 3]])


@aot.jit
def _fold_half(a, x):
    """Planar fold: a (8, n) -> (8, n/2) at challenge x (8,)."""
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    return planar.add(a0, pf.mul_scalar(planar.sub(a1, a0), x))


@aot.jit
def _bin_round_poly(a, w, scale):
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    d = planar.sub(a1, a0)
    aw = pf.mul(a0, w)
    dw = pf.mul(d, w)
    dots = pf.dot_many([(a0, aw), (d, aw), (d, dw)])
    c0 = planar.sub(dots[:, 0], planar.lazy_sum(aw))
    c1 = planar.sub(planar.double(dots[:, 1]), planar.lazy_sum(dw))
    c2 = dots[:, 2]
    polys = pf.mul_scalar(jnp.stack([c0, c1, c2], axis=1), scale)
    return jnp.swapaxes(polys, 0, 1)


@aot.jit
def _bin_round0_poly(bits, w):
    h = bits.shape[0] // 2
    neq = (bits[:h] != 0) != (bits[h:] != 0)
    c2 = planar.masked_sum(neq, w)
    return jnp.stack([jnp.zeros_like(c2), planar.neg(c2[:, None])[:, 0], c2])


@aot.jit
def _fold_bits0(bits, x):
    """Fold packed bits at challenge x -> planar (8, n/2)."""
    h = bits.shape[0] // 2
    b0, b1 = bits[:h] != 0, bits[h:] != 0
    return _fold_bits(b0, b1, b0 != b1, x, h)


@aot.jit
def _hp_round_poly(a, b, w, scale):
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = b[:, :h], b[:, h:]
    da = planar.sub(a1, a0)
    db = planar.sub(b1, b0)
    bw = pf.mul(b0, w)
    dbw = pf.mul(db, w)
    dots = pf.dot_many([(a0, bw), (da, bw), (a0, dbw), (da, dbw)])
    polys = pf.mul_scalar(
        jnp.stack([dots[:, 0], planar.add(dots[:, 1], dots[:, 2]), dots[:, 3]], axis=1),
        scale,
    )
    return jnp.swapaxes(polys, 0, 1)


@aot.jit
def _hp_round0_poly(a, bits, w):
    h = a.shape[1] // 2
    a0, a1 = a[:, :h], a[:, h:]
    b0, b1 = bits[:h] != 0, bits[h:] != 0
    da = planar.sub(a1, a0)
    neq = b0 != b1
    zero = jnp.zeros_like(a0)
    a0db = planar.select(neq, planar.select(b1, a0, planar.neg(a0)), zero)
    dadb = planar.select(neq, planar.select(b1, da, planar.neg(da)), zero)
    dots = pf.dot_many(
        [
            (planar.select(b0, a0, zero), w),
            (planar.add(a0db, planar.select(b0, da, zero)), w),
            (dadb, w),
        ]
    )
    return jnp.swapaxes(dots, 0, 1)


def inner_product_prove_interleaved(a_rev, b_rev, challenges):
    """Round-interleaved FS inner-product prover: absorbs round i's poly, THEN
    draws fold challenge u[i]. Returns (polys (r,3,8), finals (2,8), u (r,8))
    — u is an output (transcript-derived), not an input."""
    r = int(a_rev.shape[1]).bit_length() - 1
    assert a_rev.shape[1] == (1 << r)
    polys, us = [], []
    for _ in range(r):
        p = _ip_round_poly(a_rev, b_rev)
        challenges.absorb_array(p)
        x = challenges.random_vec(1)[0]
        us.append(x)
        a_rev = _fold_half(a_rev, x)
        b_rev = _fold_half(b_rev, x)
        polys.append(p)
    finals = jnp.stack([a_rev[:, 0], b_rev[:, 0]])
    if r == 0:
        return jnp.zeros((0, 3, 8), jnp.uint32), finals, jnp.zeros((0, 8), jnp.uint32)
    return jnp.stack(polys), finals, jnp.stack(us)


def binary_prove_bits_interleaved(bits_rev, u, challenges):
    """Round-interleaved binary sumcheck on packed bits; the anchor point u is
    an input (statement point), fold challenges v are transcript outputs.
    Returns (polys, final, v)."""
    r = u.shape[0]
    assert bits_rev.shape[0] == (1 << r)
    if r == 0:
        one = planar.ones_mont(1)[:, 0]
        final = jnp.where(bits_rev[0] != 0, one, jnp.zeros_like(one))
        return jnp.zeros((0, 3, 8), jnp.uint32), final, jnp.zeros((0, 8), jnp.uint32)
    table = _eq_table(u[1:])
    scales = host_scales(u)
    polys, vs = [], []
    p0 = _bin_round0_poly(bits_rev, table)
    challenges.absorb_array(p0)
    v0 = challenges.random_vec(1)[0]
    a_rev = _fold_bits0(bits_rev, v0)
    polys.append(p0)
    vs.append(v0)
    for i in range(1, r):
        p = _bin_round_poly(a_rev, table[:, : a_rev.shape[1] // 2], scales[i])
        challenges.absorb_array(p)
        v = challenges.random_vec(1)[0]
        a_rev = _fold_half(a_rev, v)
        polys.append(p)
        vs.append(v)
    return jnp.stack(polys), a_rev[:, 0], jnp.stack(vs)


def hadamard_prove_bits_interleaved(a_rev, bits_rev, u, challenges):
    """Round-interleaved Hadamard sumcheck (bit-valued b). Returns
    (polys, finals (2,8), v)."""
    r = u.shape[0]
    assert a_rev.shape[1] == (1 << r) and bits_rev.shape[0] == (1 << r)
    if r == 0:
        one = planar.ones_mont(1)[:, 0]
        b_final = jnp.where(bits_rev[0] != 0, one, jnp.zeros_like(one))
        return (jnp.zeros((0, 3, 8), jnp.uint32),
                jnp.stack([a_rev[:, 0], b_final]), jnp.zeros((0, 8), jnp.uint32))
    table = _eq_table(u[1:])
    scales = host_scales(u)
    polys, vs = [], []
    p0 = _hp_round0_poly(a_rev, bits_rev, table)
    challenges.absorb_array(p0)
    v0 = challenges.random_vec(1)[0]
    b_rev = _fold_bits0(bits_rev, v0)
    a_rev = _fold_half(a_rev, v0)
    polys.append(p0)
    vs.append(v0)
    for i in range(1, r):
        p = _hp_round_poly(a_rev, b_rev, table[:, : a_rev.shape[1] // 2], scales[i])
        challenges.absorb_array(p)
        v = challenges.random_vec(1)[0]
        a_rev = _fold_half(a_rev, v)
        b_rev = _fold_half(b_rev, v)
        polys.append(p)
        vs.append(v)
    return jnp.stack(polys), jnp.stack([a_rev[:, 0], b_rev[:, 0]]), jnp.stack(vs)


@aot.jit
def _eq_table(u_tail):
    """eq table of u_tail in bit-reversed storage -> (8, 2^len)."""
    return pops.eq_table_rev(u_tail)


# ---------------------------------------------------------------------------
# prover orchestrators
# ---------------------------------------------------------------------------


def inner_product_prove(a_rev, b_rev, u):
    """a_rev, b_rev: (8, 2^r) bit-reversed planar; u: (r, 8).

    Emits the same (polys (r, 3, 8), finals (2, 8)) stream as
    protocols.inner_product_prove on the unreversed (n, 8) tensors.
    """
    r = u.shape[0]
    n = a_rev.shape[1]
    assert n == (1 << r), (n, r)
    polys = []
    i = 0
    fuse = _fuse_n()
    while a_rev.shape[1] > max(_tail_n(), 1) and i < r and a_rev.shape[1] > fuse:
        p, a_rev, b_rev = _ip_round(a_rev, b_rev, u[i])
        polys.append(p)
        i += 1
    if i < r and a_rev.shape[1] <= fuse and a_rev.shape[1] > max(_tail_n(), 1):
        tail_polys, finals = _ip_tail_planar(a_rev, b_rev, u[i:])
        polys_arr = jnp.concatenate([jnp.stack(polys), tail_polys]) if polys else tail_polys
        return polys_arr, finals
    if i < r:
        a_t = pops.from_planar_rev(a_rev)
        b_t = pops.from_planar_rev(b_rev)
        tail_polys, finals = _tail_ip(a_t, b_t, u[i:])
        polys_arr = jnp.concatenate([jnp.stack(polys), tail_polys]) if polys else tail_polys
        return polys_arr, finals
    finals = jnp.stack([a_rev[:, 0], b_rev[:, 0]])
    return jnp.stack(polys), finals


def binary_prove_bits(bits_rev, u, v):
    """Binary sumcheck directly on packed bits.

    bits_rev: (2^r,) uint32 0/1 in bit-reversed storage; u, v: (r, 8).
    Stream-identical to protocols.binary_prove on the mont bit tensor.
    """
    r = u.shape[0]
    n = bits_rev.shape[0]
    assert n == (1 << r), (n, r)
    if r == 0:
        one = planar.ones_mont(1)[:, 0]
        final = jnp.where(bits_rev[0] != 0, one, jnp.zeros_like(one))
        return jnp.zeros((0, 3, 8), jnp.uint32), final
    table = _eq_table(u[1:])
    scales = host_scales(u)
    polys = []
    p0, a_rev = _bin_round0_bits(bits_rev, table, v[0])
    polys.append(p0)
    i = 1
    fuse = _fuse_n()
    while a_rev.shape[1] > _tail_n() and i < r and a_rev.shape[1] > fuse:
        p, a_rev = _bin_round(a_rev, table[:, : a_rev.shape[1] // 2], scales[i], v[i])
        polys.append(p)
        i += 1
    if i < r and a_rev.shape[1] <= fuse and a_rev.shape[1] > _tail_n():
        tail_polys, final = _bin_tail_planar(
            a_rev, table[:, : a_rev.shape[1] // 2], scales[i:], v[i:]
        )
        return jnp.concatenate([jnp.stack(polys), tail_polys]), final
    if i < r:
        a_t = pops.from_planar_rev(a_rev)
        tail_polys, final = _tail_bin(a_t, u[i:], v[i:])
        return jnp.concatenate([jnp.stack(polys), tail_polys]), final
    return jnp.stack(polys), a_rev[:, 0]


def hadamard_prove_bits(a_rev, bits_rev, u, v):
    """Hadamard sumcheck of a (.) b where b is bit-valued (packed).

    a_rev: (8, 2^r) planar bit-rev; bits_rev: (2^r,) 0/1; u, v: (r, 8).
    Stream-identical to protocols.hadamard_prove(a, mont_bits, u, v).
    """
    r = u.shape[0]
    n = a_rev.shape[1]
    assert n == (1 << r) and bits_rev.shape[0] == n, (n, r)
    if r == 0:
        one = planar.ones_mont(1)[:, 0]
        b_final = jnp.where(bits_rev[0] != 0, one, jnp.zeros_like(one))
        return jnp.zeros((0, 3, 8), jnp.uint32), jnp.stack([a_rev[:, 0], b_final])
    table = _eq_table(u[1:])
    scales = host_scales(u)
    polys = []
    p0, a_rev, b_rev = _hp_round0_bits(a_rev, bits_rev, table, v[0])
    polys.append(p0)
    i = 1
    fuse = _fuse_n()
    while a_rev.shape[1] > _tail_n() and i < r and a_rev.shape[1] > fuse:
        p, a_rev, b_rev = _hp_round(
            a_rev, b_rev, table[:, : a_rev.shape[1] // 2], scales[i], v[i]
        )
        polys.append(p)
        i += 1
    if i < r and a_rev.shape[1] <= fuse and a_rev.shape[1] > _tail_n():
        tail_polys, finals = _hp_tail_planar(
            a_rev, b_rev, table[:, : a_rev.shape[1] // 2], scales[i:], v[i:]
        )
        return jnp.concatenate([jnp.stack(polys), tail_polys]), finals
    if i < r:
        a_t = pops.from_planar_rev(a_rev)
        b_t = pops.from_planar_rev(b_rev)
        tail_polys, finals = _tail_hp(a_t, b_t, u[i:], v[i:])
        return jnp.concatenate([jnp.stack(polys), tail_polys]), finals
    return jnp.stack(polys), jnp.stack([a_rev[:, 0], b_rev[:, 0]])
