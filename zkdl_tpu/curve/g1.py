"""BLS12-381 G1 point tensors in Jacobian coordinates, TPU-native.

Rebuild of the reference G1 layer (/root/reference/g1-tensor.cu,
/root/reference/bls12-381.cu:1331-1435). The reference's EFD formulas
(dbl-2009-l, madd-2007-bl, add-2007-bl) carry per-thread branches for
identity/equal-point cases; XLA has no per-element divergence, so every edge case
here is a *branchless select*: both the generic formula and the special case are
computed and `where`-combined. Point tensors are pytrees of three
uint32[..., 12] Fp limb arrays (Montgomery form), so all ops vmap/shard
transparently.

Scalar multiplication follows the reference's LSB-first double-and-add over all
256 bits (G1Jacobian_mul, g1-tensor.cu:422-431) as a `lax.fori_loop` (exact
same add/double sequence => same Jacobian coordinates, enabling bit-exact
cross-checks), plus a faster fixed-window variant for production use.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fp, mp
from ..utils import aot


class G1Jac(NamedTuple):
    """Jacobian point tensor; x, y, z: uint32[..., 12] Fp in Montgomery form.

    z == 0 encodes the identity (as in the reference, bls12-381.cuh:433-439).
    """

    x: jax.Array
    y: jax.Array
    z: jax.Array

    @property
    def shape(self):
        return self.x.shape[:-1]


class G1Affine(NamedTuple):
    x: jax.Array
    y: jax.Array

    @property
    def shape(self):
        return self.x.shape[:-1]


# Generator in Montgomery form (g1-tensor.cuh:29-63)
GEN_X_MONT = np.array([
    4250078230, 1555269520, 2574712821, 2014837863, 339452353, 357537223,
    4090554183, 4037962445, 568063040, 3989728972, 2651585397, 302085953,
], dtype=np.uint32)
GEN_Y_MONT = np.array([
    216474225, 3131872213, 2031680910, 2351063834, 1460086222, 3713621779,
    1346392468, 1370249257, 2902481344, 236751935, 1342743146, 196886268,
], dtype=np.uint32)


def generator(shape=()) -> G1Jac:
    """Broadcast Jacobian generator (z = mont(1))."""
    x = jnp.broadcast_to(jnp.asarray(GEN_X_MONT), (*shape, 12))
    y = jnp.broadcast_to(jnp.asarray(GEN_Y_MONT), (*shape, 12))
    z = fp.ones_mont(shape)
    return G1Jac(x, y, z)


def identity(shape=()) -> G1Jac:
    return G1Jac(fp.zeros(shape), fp.zeros(shape), fp.zeros(shape))


def is_identity(p: G1Jac) -> jax.Array:
    return fp.is_zero(p.z)


def neg(p: G1Jac) -> G1Jac:
    return G1Jac(p.x, fp.neg(p.y), p.z)


def select(pred: jax.Array, a: G1Jac, b: G1Jac) -> G1Jac:
    return G1Jac(fp.select(pred, a.x, b.x), fp.select(pred, a.y, b.y), fp.select(pred, a.z, b.z))


def double(p: G1Jac) -> G1Jac:
    """dbl-2009-l with identity passthrough (bls12-381.cu:1332-1358)."""
    a = fp.sqr(p.x)
    b = fp.sqr(p.y)
    c = fp.sqr(b)
    d = fp.sqr(fp.add(p.x, b))
    d = fp.double(fp.sub(fp.sub(d, a), c))
    e = fp.add(fp.double(a), a)
    f = fp.sqr(e)
    z3 = fp.double(fp.mul(p.y, p.z))
    x3 = fp.sub(fp.sub(f, d), d)
    c8 = fp.double(fp.double(fp.double(c)))
    y3 = fp.sub(fp.mul(fp.sub(d, x3), e), c8)
    return select(is_identity(p), p, G1Jac(x3, y3, z3))


def add(p: G1Jac, q: G1Jac) -> G1Jac:
    """add-2007-bl with all reference edge cases branchless
    (bls12-381.cu:1404-1445): p==O -> q; q==O -> p; equal points -> double(p).
    The a == -q case falls out of the formula with z3 == 0 (identity).
    """
    z1z1 = fp.sqr(p.z)
    z2z2 = fp.sqr(q.z)
    u1 = fp.mul(p.x, z2z2)
    u2 = fp.mul(q.x, z1z1)
    s1 = fp.mul(fp.mul(p.y, q.z), z2z2)
    s2 = fp.mul(fp.mul(q.y, p.z), z1z1)

    h = fp.sub(u2, u1)
    i = fp.sqr(fp.double(h))
    j = fp.mul(h, i)
    r = fp.double(fp.sub(s2, s1))
    v = fp.mul(u1, i)
    x3 = fp.sub(fp.sub(fp.sub(fp.sqr(r), j), v), v)
    y3 = fp.sub(fp.mul(fp.sub(v, x3), r), fp.double(fp.mul(s1, j)))
    z3 = fp.mul(fp.sub(fp.sub(fp.sqr(fp.add(p.z, q.z)), z1z1), z2z2), h)
    generic = G1Jac(x3, y3, z3)

    same = fp.eq(u1, u2) & fp.eq(s1, s2)
    out = select(same, double(p), generic)
    out = select(is_identity(q), p, out)
    out = select(is_identity(p), q, out)
    return out


def add_mixed(p: G1Jac, q: G1Affine) -> G1Jac:
    """madd-2007-bl, branchless (bls12-381.cu:1361-1401). Affine q is never the
    identity in reference usage (generators are real points)."""
    z1z1 = fp.sqr(p.z)
    u2 = fp.mul(q.x, z1z1)
    s2 = fp.mul(fp.mul(q.y, p.z), z1z1)

    h = fp.sub(u2, p.x)
    hh = fp.sqr(h)
    i = fp.double(fp.double(hh))
    j = fp.mul(h, i)
    r = fp.double(fp.sub(s2, p.y))
    v = fp.mul(p.x, i)
    x3 = fp.sub(fp.sub(fp.sqr(r), j), fp.double(v))
    y3 = fp.sub(fp.mul(fp.sub(v, x3), r), fp.double(fp.mul(p.y, j)))
    z3 = fp.sub(fp.sub(fp.sqr(fp.add(p.z, h)), z1z1), hh)
    generic = G1Jac(x3, y3, z3)

    one = fp.ones_mont(p.shape)
    lifted = G1Jac(jnp.broadcast_to(q.x, p.x.shape), jnp.broadcast_to(q.y, p.y.shape), one)
    same = fp.eq(p.x, u2) & fp.eq(p.y, s2)
    out = select(same, double(p), generic)
    out = select(is_identity(p), lifted, out)
    return out


def _scalar_bits(scalar: jax.Array) -> jax.Array:
    """uint32[..., 8] (non-Montgomery Fr) -> uint32[..., 256] bits, LSB first."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (scalar[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*scalar.shape[:-1], 256)


def scalar_mul(p: G1Jac, scalar: jax.Array) -> G1Jac:
    """LSB-first double-and-add over all 256 bits, matching G1Jacobian_mul
    (g1-tensor.cu:422-431) add/double order exactly. `scalar` must be in
    *non-Montgomery* form (the reference unmonts before multiplying,
    commitment.cu:33).
    """
    bits = _scalar_bits(scalar)

    def body(i, carry):
        out, acc = carry
        bit = jax.lax.dynamic_index_in_dim(bits, i, axis=-1, keepdims=False)
        out = select(bit.astype(jnp.bool_), add(out, acc), out)
        acc = double(acc)
        return out, acc

    out, _ = jax.lax.fori_loop(0, 256, body, (identity(p.shape), p))
    return out


def scalar_mul_windowed(p: G1Jac, scalar: jax.Array, window: int = 4) -> G1Jac:
    """Fixed-window scalar mul: same group result as `scalar_mul`, ~window x
    fewer adds (Jacobian coordinates differ; compare in affine)."""
    assert 256 % window == 0
    n_windows = 256 // window
    # table[k] = k * p for k in 0..2^w-1
    table = [identity(p.shape), p]
    for k in range(2, 1 << window):
        table.append(add(table[k - 1], p))
    tx = jnp.stack([t.x for t in table])  # (2^w, ..., 12)
    ty = jnp.stack([t.y for t in table])
    tz = jnp.stack([t.z for t in table])

    shifts = jnp.arange(0, 32, window, dtype=jnp.uint32)
    digits = (scalar[..., :, None] >> shifts) & jnp.uint32((1 << window) - 1)
    digits = digits.reshape(*scalar.shape[:-1], n_windows)  # LSB-first windows

    def body(j, out):
        i = n_windows - 1 - j  # MSB-first accumulation
        for _ in range(window):
            out = double(out)
        d = jax.lax.dynamic_index_in_dim(digits, i, axis=-1, keepdims=False)
        px = jnp.take_along_axis(tx, d[None, ..., None], axis=0)[0]
        py = jnp.take_along_axis(ty, d[None, ..., None], axis=0)[0]
        pz = jnp.take_along_axis(tz, d[None, ..., None], axis=0)[0]
        return add(out, G1Jac(px, py, pz))

    return jax.lax.fori_loop(0, n_windows, body, identity(p.shape))


# ---------------------------------------------------------------------------
# GLV endomorphism scalar multiplication (variable base)
# ---------------------------------------------------------------------------
#
# BLS12-381 G1 carries the cube-root endomorphism phi(x, y) = (beta*x, y) with
# phi(P) = lambda*P, lambda = X^2 - 1 for the BLS parameter X (lambda^2 +
# lambda + 1 = 0 mod r since r = X^4 - X^2 + 1). Splitting s = s1 + lambda*s2
# by INTEGER division (r ~ lambda^2 makes both halves < 2^129) halves the
# doubling ladder: a dual 4-bit-window walk over 128-bit halves costs ~128
# doubles + ~96 adds per point vs the reference double-and-add's 256 + 256
# (g1-tensor.cu:422-431) — the TPU-native answer to the reference's dead
# bucketed-multiexp kernel (bls12-381.cu:1446-1506) for OPAQUE bases (the
# transparent fast path avoids variable-base work entirely via generator_pow).
# The 256-bit Barrett division runs on-device as two digit-matrix products
# (mp._shift_add_product) — no host round-trip.

_X_BLS = -0xD201000000010000
_LAMBDA_INT = _X_BLS**2 - 1  # 128 bits
_BETA_INT = 0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC
_M_BARRETT = (1 << 256) // _LAMBDA_INT  # 129 bits

# import-time pins (cf. fr.py's reference-constant asserts)
from ..field import fr as _fr  # noqa: E402

assert _fr.P_INT == _X_BLS**4 - _X_BLS**2 + 1, "BLS parameter"
assert (_LAMBDA_INT**2 + _LAMBDA_INT + 1) % _fr.P_INT == 0, "lambda order"
assert pow(_BETA_INT, 3, fp.P_INT) == 1 and _BETA_INT != 1, "beta order"

_LAMBDA_DIGITS = mp.digits_from_int(_LAMBDA_INT, 8)
_LAMBDA_LIMBS = mp.limbs_from_int(_LAMBDA_INT, 8)
_M_DIGITS = mp.digits_from_int(_M_BARRETT, 9)
_BETA_MONT = mp.limbs_from_int(fp.SPEC.to_mont_int(_BETA_INT), 12)


def glv_decompose(scalar: jax.Array):
    """(…, 8) non-Montgomery scalars < r -> (s1, s2) with s = s1 + lambda*s2,
    both < 2^129 (only the low 5 limbs can be nonzero). Barrett by the
    constant lambda: qhat = floor(s * m / 2^256) undershoots floor(s/lambda)
    by at most 2; corrected branchlessly."""
    sd = mp.to_digits(scalar)  # (…, 16)
    md = jnp.broadcast_to(jnp.asarray(_M_DIGITS), (*sd.shape[:-1], 9))
    cols = mp._shift_add_product(sd, md, 25)
    prod = mp._carry_normalize(cols, 25)  # s*m < 2^384: 24 digits + slack
    qhat_d = prod[..., 16:24]  # floor(/2^256), < 2^128
    lam_d = jnp.broadcast_to(jnp.asarray(_LAMBDA_DIGITS), qhat_d.shape)
    ql_cols = mp._shift_add_product(qhat_d, lam_d, 16)
    ql = mp.from_digits(mp._carry_normalize(ql_cols, 16))  # (…, 8) limbs
    rem, _ = mp._raw_sub(scalar, ql)  # >= 0 since qhat <= q
    q4 = mp.from_digits(qhat_d)  # (…, 4) limbs (128 bits)
    q = jnp.concatenate([q4, jnp.zeros_like(q4)], axis=-1)  # widen to 8
    lam = jnp.broadcast_to(jnp.asarray(_LAMBDA_LIMBS), rem.shape)
    one = jnp.zeros_like(q).at[..., 0].set(1)
    for _ in range(2):  # qhat undershoot correction
        ge = mp._gte(rem, lam)
        rem = jnp.where(ge[..., None], mp._raw_sub(rem, lam)[0], rem)
        q = jnp.where(ge[..., None], mp._raw_add(q, one)[0], q)
    return rem, q


def endomorphism(p: G1Jac) -> G1Jac:
    """phi(x, y, z) = (beta*x, y, z) — one Fp mul."""
    beta = jnp.broadcast_to(jnp.asarray(_BETA_MONT), p.x.shape)
    return G1Jac(fp.mul(p.x, beta), p.y, p.z)


_GLV_WINDOW = 4
_GLV_BITS = 132  # ceil over 129 to a window multiple
_GLV_WINDOWS = _GLV_BITS // _GLV_WINDOW


def _window_digits(scalar: jax.Array) -> jax.Array:
    """Low 5 limbs -> (…, 33) 4-bit windows, LSB first."""
    shifts = jnp.arange(0, 32, _GLV_WINDOW, dtype=jnp.uint32)
    d = (scalar[..., :5, None] >> shifts) & jnp.uint32((1 << _GLV_WINDOW) - 1)
    return d.reshape(*scalar.shape[:-1], 40)[..., :_GLV_WINDOWS]


def _mk_table(p: G1Jac):
    table = [identity(p.shape), p]
    for k in range(2, 1 << _GLV_WINDOW):
        table.append(add(table[k - 1], p))
    return (jnp.stack([t.x for t in table]), jnp.stack([t.y for t in table]),
            jnp.stack([t.z for t in table]))


def scalar_mul_glv(p: G1Jac, scalar: jax.Array) -> G1Jac:
    """GLV + dual fixed-window scalar mul; group-equal to scalar_mul for any
    scalar < r (Jacobian coordinates differ; compare in affine)."""
    s1, s2 = glv_decompose(scalar)
    t1 = _mk_table(p)
    t2 = _mk_table(endomorphism(p))
    d1 = _window_digits(s1)
    d2 = _window_digits(s2)

    def lookup(t, d):
        tx, ty, tz = t
        px = jnp.take_along_axis(tx, d[None, ..., None], axis=0)[0]
        py = jnp.take_along_axis(ty, d[None, ..., None], axis=0)[0]
        pz = jnp.take_along_axis(tz, d[None, ..., None], axis=0)[0]
        return G1Jac(px, py, pz)

    def body(j, out):
        i = _GLV_WINDOWS - 1 - j
        for _ in range(_GLV_WINDOW):
            out = double(out)
        out = add(out, lookup(t1, jax.lax.dynamic_index_in_dim(d1, i, axis=-1, keepdims=False)))
        out = add(out, lookup(t2, jax.lax.dynamic_index_in_dim(d2, i, axis=-1, keepdims=False)))
        return out

    return jax.lax.fori_loop(0, _GLV_WINDOWS, body, identity(p.shape))


scalar_mul_glv_jit = aot.jit(scalar_mul_glv)


# ---------------------------------------------------------------------------
# fixed-base exponentiation of the generator (comb method)
# ---------------------------------------------------------------------------
#
# All commitment-side exponentiations on the transparent fast path are powers
# of the ONE fixed generator G (pedersen.py: setup, commit, open). A 4-bit
# comb table T[j][k] = k * 2^(4j) * G (64 windows x 16 entries, precomputed on
# host once) turns a 256-bit exponentiation into 64 mixed adds — ~8x fewer
# field muls than the reference's 256-bit double-and-add (g1-tensor.cu:422-431),
# with no doublings at all. This is the algorithmic resurrection of the
# reference's dead fixed-window multiexp idea (bls12-381.cu:1446-1506) adapted
# to a single shared base.

_COMB_W = 4
_COMB_WINDOWS = 256 // _COMB_W


@functools.lru_cache(maxsize=None)
def _comb_table() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-precomputed (64, 16, 12) Montgomery-Fp affine coords (x, y) and an
    identity mask (64, 16) (k = 0 entries are placeholders, masked at use)."""
    from . import convert, host_g1

    n_w, n_k = _COMB_WINDOWS, 1 << _COMB_W
    xs = np.zeros((n_w, n_k, 12), dtype=np.uint32)
    ys = np.zeros((n_w, n_k, 12), dtype=np.uint32)
    ident = np.zeros((n_w, n_k), dtype=bool)
    row = [host_g1.IDENTITY, host_g1.GENERATOR]
    for k in range(2, n_k):
        row.append(host_g1.add(row[k - 1], host_g1.GENERATOR))
    for j in range(n_w):
        for k in range(n_k):
            pt = row[k]
            aff = host_g1.to_affine(pt)
            if aff is None:
                ident[j, k] = True
            else:
                xs[j, k] = mp.limbs_from_int(fp.SPEC.to_mont_int(aff[0]), 12)
                ys[j, k] = mp.limbs_from_int(fp.SPEC.to_mont_int(aff[1]), 12)
        if j + 1 < n_w:
            row = [row[k] for k in range(n_k)]
            for _ in range(_COMB_W):
                row = [host_g1.double(p) for p in row]
    return xs, ys, ident


def generator_pow(scalar: jax.Array) -> G1Jac:
    """G ^ scalar for non-Montgomery scalars uint32[..., 8]: 64 table-lookup
    mixed adds via the fixed-base comb, as a lax.fori_loop (ONE compiled add
    body — the G1 formulas are the largest graphs in the repo). Group-equal to
    scalar_mul(generator(shape), scalar); Jacobian coordinates differ."""
    xs, ys, _ = _comb_table()
    txs, tys = jnp.asarray(xs), jnp.asarray(ys)
    shifts = jnp.arange(0, 32, _COMB_W, dtype=jnp.uint32)
    digits = (scalar[..., :, None] >> shifts) & jnp.uint32((1 << _COMB_W) - 1)
    digits = digits.reshape(*scalar.shape[:-1], _COMB_WINDOWS)  # LSB-first

    def body(j, out):
        d = jax.lax.dynamic_index_in_dim(digits, j, axis=-1, keepdims=False)
        row_x = jax.lax.dynamic_index_in_dim(txs, j, axis=0, keepdims=False)
        row_y = jax.lax.dynamic_index_in_dim(tys, j, axis=0, keepdims=False)
        q = G1Affine(jnp.take(row_x, d, axis=0), jnp.take(row_y, d, axis=0))
        added = add_mixed(out, q)
        return select(d == 0, out, added)  # k = 0 table slots are the identity

    return jax.lax.fori_loop(0, _COMB_WINDOWS, body, identity(scalar.shape[:-1]))


generator_pow_jit = aot.jit(generator_pow)


# Module-level jitted primitives: the ONLY compile units for G1 work. Larger
# graphs (commit, me_open, reductions) are Python loops over these so that the
# compile cache is keyed by the small set of power-of-two shapes actually used.
add_jit = aot.jit(add)
add_mixed_jit = aot.jit(add_mixed)
double_jit = aot.jit(double)
scalar_mul_jit = aot.jit(scalar_mul)
scalar_mul_windowed_jit = aot.jit(scalar_mul_windowed, static_argnums=(2,))


def g1_sum(p: G1Jac) -> G1Jac:
    """Sum a (n, ...) point tensor along axis 0 by pairwise tree of adds.

    Group-equal to the reference's shared-memory reduction (g1-tensor.cu:368-420);
    Jacobian coordinates may differ (compare in affine)."""
    n = p.x.shape[0]
    while n > 1:
        if n % 2:
            pad = identity((1, *p.x.shape[1:-1]))
            p = G1Jac(
                jnp.concatenate([p.x, pad.x]),
                jnp.concatenate([p.y, pad.y]),
                jnp.concatenate([p.z, pad.z]),
            )
            n += 1
        p = add_jit(G1Jac(p.x[0::2], p.y[0::2], p.z[0::2]), G1Jac(p.x[1::2], p.y[1::2], p.z[1::2]))
        n = p.x.shape[0]
    return G1Jac(p.x[0], p.y[0], p.z[0])


def me_step(p: G1Jac, x_mont: jax.Array) -> G1Jac:
    """One G1 multilinear fold: out = a0 + x*(a1 - a0) with G1 adds/scalar-muls,
    matching G1_me_step (g1-tensor.cu:463-475) incl. odd-tail zero padding and
    in-kernel unmont of the challenge."""
    n = p.x.shape[0]
    m = (n + 1) // 2
    if n < 2 * m:
        pad = identity((2 * m - n, *p.x.shape[1:-1]))
        p = G1Jac(
            jnp.concatenate([p.x, pad.x]),
            jnp.concatenate([p.y, pad.y]),
            jnp.concatenate([p.z, pad.z]),
        )
    a0 = G1Jac(p.x[0::2], p.y[0::2], p.z[0::2])
    a1 = G1Jac(p.x[1::2], p.y[1::2], p.z[1::2])
    from ..field import fr

    x_unmont = fr.unmont(x_mont)
    diff_scaled = scalar_mul_jit(add_jit(a1, neg(a0)), jnp.broadcast_to(x_unmont, (*a0.shape, 8)))
    return add_jit(a0, diff_scaled)


def me_eval(p: G1Jac, u_mont: jax.Array) -> G1Jac:
    """G1 MLE eval at point u (G1_me, g1-tensor.cu:477-491)."""
    n = p.x.shape[0]
    r = u_mont.shape[0]
    assert n > (1 << r) // 2 and n <= (1 << r), (n, r)
    for i in range(r):
        p = me_step(p, u_mont[i])
    return G1Jac(p.x[0], p.y[0], p.z[0])
