"""Generic multi-precision modular arithmetic over uint32 limb arrays, TPU-native.

Design (vs the reference's CUDA carry-chain CIOS, /root/reference/bls12-381.cu:499-530):
the reference relies on per-thread PTX add-with-carry instructions. TPUs have no scalar
carry chains, so we redesign the math around what the VPU does well: wide elementwise
int32 ops with *deferred carries*.

Representation
--------------
A field element is a little-endian ``uint32[..., n_limbs]`` array (8 limbs for Fr,
12 for Fp), bit-compatible with the reference's ``blstrs__scalar__Scalar`` /
``blstrs__fp__Fp`` structs (/root/reference/bls12-381.cuh:116-120, 218-226), so test
vectors and transcripts interop directly.

Multiplication
--------------
Montgomery multiplication is done in radix 2^16 ("digits"): each u32 limb is split
into two 16-bit digits so that a digit product fits *exactly* in a u32 lane
(max (2^16-1)^2 < 2^32). The schoolbook product is one broadcasted outer product
(`(..., D, 1) * (..., 1, D)`), its 16-bit halves are accumulated into anti-diagonal
columns by shifted adds (column sums stay < 2^22, far from u32 overflow), and carries
are resolved once with a single `lax.scan` over the digit axis. Reduction uses
full-word Montgomery REDC: m = (T mod R) * (-p^-1 mod R) mod R computed with the same
column machinery. This yields ~a few hundred XLA ops per field op, all fused
elementwise over arbitrarily-shaped tensors — the digit axis rides the VPU lanes.

All functions are pure and jit-friendly; values are kept canonical (< p) at every
boundary so results are bit-exact regardless of evaluation order.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars (NOT jnp): creating a device array at import time would
# initialize a JAX backend before callers can pick a platform.
MASK16 = np.uint32(0xFFFF)
U32 = np.uint32


def limbs_from_int(x: int, n_limbs: int) -> np.ndarray:
    """Python int -> little-endian u32 limb vector."""
    out = np.zeros((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (x >> (32 * i)) & 0xFFFFFFFF
    return out


def int_from_limbs(limbs) -> int:
    limbs = np.asarray(limbs, dtype=np.uint32)
    x = 0
    for i in reversed(range(limbs.shape[-1])):
        x = (x << 32) | int(limbs[..., i])
    return x


def digits_from_int(x: int, n_digits: int) -> np.ndarray:
    out = np.zeros((n_digits,), dtype=np.uint32)
    for i in range(n_digits):
        out[i] = (x >> (16 * i)) & 0xFFFF
    return out


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static parameters of a prime field with 2^(32*n_limbs) Montgomery radix."""

    name: str
    p: int  # modulus (python int)
    n_limbs: int  # number of 32-bit limbs

    @property
    def n_digits(self) -> int:
        return 2 * self.n_limbs

    @functools.cached_property
    def r(self) -> int:  # Montgomery radix R = 2^(32*n)
        return 1 << (32 * self.n_limbs)

    @functools.cached_property
    def r_inv(self) -> int:
        return pow(self.r, -1, self.p)

    @functools.cached_property
    def r2(self) -> int:
        return (self.r * self.r) % self.p

    @functools.cached_property
    def np_full(self) -> int:  # -p^-1 mod R (full-word Montgomery constant)
        return (-pow(self.p, -1, self.r)) % self.r

    # --- constant limb/digit arrays (host numpy; jnp will close over them) ---
    @functools.cached_property
    def P_limbs(self) -> np.ndarray:
        return limbs_from_int(self.p, self.n_limbs)

    @functools.cached_property
    def P_digits(self) -> np.ndarray:
        return digits_from_int(self.p, self.n_digits)

    @functools.cached_property
    def NP_digits(self) -> np.ndarray:
        return digits_from_int(self.np_full, self.n_digits)

    @functools.cached_property
    def ONE_mont(self) -> np.ndarray:  # R mod p
        return limbs_from_int(self.r % self.p, self.n_limbs)

    @functools.cached_property
    def R2_limbs(self) -> np.ndarray:
        return limbs_from_int(self.r2, self.n_limbs)

    @functools.cached_property
    def ZERO(self) -> np.ndarray:
        return np.zeros((self.n_limbs,), dtype=np.uint32)

    @functools.cached_property
    def ONE_raw(self) -> np.ndarray:  # plain integer 1 (for unmont)
        return limbs_from_int(1, self.n_limbs)

    # ---- host-side conversions ----
    def to_int(self, limbs) -> int:
        return int_from_limbs(limbs)

    def from_int(self, x: int) -> np.ndarray:
        return limbs_from_int(x % self.p, self.n_limbs)

    def to_mont_int(self, x: int) -> int:
        return (x * self.r) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.r_inv) % self.p


# ---------------------------------------------------------------------------
# limb-level helpers (operate on uint32[..., n] arrays)
# ---------------------------------------------------------------------------


def to_digits(a: jax.Array) -> jax.Array:
    """uint32[..., n] -> uint32[..., 2n] of 16-bit digits (little-endian)."""
    lo = a & MASK16
    hi = a >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(*a.shape[:-1], 2 * a.shape[-1])


def from_digits(d: jax.Array) -> jax.Array:
    """uint32[..., 2n] 16-bit digits -> uint32[..., n] limbs."""
    return d[..., 0::2] | (d[..., 1::2] << 16)


def _shift1(x: jax.Array, fill=0) -> jax.Array:
    """Shift along the last axis so out[k] = x[k-1]; out[0] = fill."""
    pad = jnp.full((*x.shape[:-1], 1), fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _prefix_carry(gen: jax.Array, prop: jax.Array) -> jax.Array:
    """Kogge-Stone parallel-prefix carry resolution along the last axis.

    gen/prop: bool[..., n] — position k generates a carry / propagates an
    incoming one. Returns c[..., n] with c[k] = gen[k] | (prop[k] & c[k-1]).
    Log-depth instead of an n-step sequential chain: graph size matters —
    XLA compile time scales with op count and every field op is instantiated
    dozens of times inside curve kernels.
    """
    n = gen.shape[-1]
    W = 24  # bits per packed word; word sums stay < 2^25, exact in int32
    nw = -(-n // W)
    gi = gen.astype(jnp.int32)
    pi = (gen | prop).astype(jnp.int32)
    if n < nw * W:
        pad = [(0, 0)] * (gi.ndim - 1) + [(0, nw * W - n)]
        gi = jnp.pad(gi, pad)
        pi = jnp.pad(pi, pad)
    packmat = jnp.asarray(_pack_matrix(nw, W))
    A = jax.lax.dot_general(gi, packmat, dimension_numbers=(((gi.ndim - 1,), (0,)), ((), ())))
    B = jax.lax.dot_general(pi, packmat, dimension_numbers=(((pi.ndim - 1,), (0,)), ((), ())))
    # gen/prop are disjoint (g = A & B, p = A ^ B), so the machine add's carry
    # bits ARE the prefix: cin = (A + B) ^ A ^ B has bit j = carry into bit j.
    carry = jnp.zeros(A.shape[:-1], dtype=jnp.int32)
    cins = []
    for w in range(nw):
        s = A[..., w] + B[..., w] + carry
        cins.append(s ^ A[..., w] ^ B[..., w])
        carry = s >> W
    cin = jnp.stack(cins, axis=-1)  # (..., nw); bit W = carry out of the word
    shifts = jnp.arange(1, W + 1, dtype=jnp.int32)
    outs = (cin[..., :, None] >> shifts) & 1  # bit k+1 = carry OUT of position k
    return outs.reshape(*outs.shape[:-2], nw * W)[..., :n].astype(jnp.bool_)


@functools.lru_cache(maxsize=None)
def _pack_matrix(nw: int, W: int) -> np.ndarray:
    S = np.zeros((nw * W, nw), dtype=np.int32)
    for w in range(nw):
        for k in range(W):
            S[w * W + k, w] = 1 << k
    return S


def _shiftn(x: jax.Array, sh: int) -> jax.Array:
    pad = jnp.zeros((*x.shape[:-1], sh), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-sh]], axis=-1)


def _carry_normalize(cols: jax.Array, n_out: int) -> jax.Array:
    """Resolve deferred carries: u32 column sums -> n_out normalized 16-bit digits.

    Three vectorized stages (no sequential chain):
      A) split cols into lo/hi 16-bit halves; s[k] = lo[k] + hi[k-1]  (< 2^17)
      B) t = s & 0xffff, inject i[k] = s[k-1] >> 16  (0/1)
      C) binary-carry addition of i into t via Kogge-Stone prefix.
    Exact provided the true value fits in n_out digits (callers guarantee).
    """
    nd = cols.shape[-1]
    if nd > n_out:
        cols = cols[..., :n_out]
    elif nd < n_out:
        cols = jnp.concatenate(
            [cols, jnp.zeros((*cols.shape[:-1], n_out - nd), dtype=U32)], axis=-1
        )
    lo = cols & MASK16
    hi = cols >> 16
    s = lo + _shift1(hi)  # < 2^17
    t = s & MASK16
    inj = _shift1(s >> 16)  # 0/1
    ti = t + inj  # <= 2^16
    gen = (ti >> 16).astype(jnp.bool_)
    prop = (ti & MASK16) == MASK16
    c = _prefix_carry(gen, prop)
    c_in = _shift1(c, False).astype(U32)
    return (ti + c_in) & MASK16


def _shift_add_product(ad: jax.Array, bd: jax.Array, n_cols: int) -> jax.Array:
    """Column sums of the schoolbook product of digit vectors ad, bd.

    ad: (..., Da), bd: (..., Db) 16-bit digits in u32. Returns u32[..., n_cols]
    where col[k] = sum_{i+j=k} lo(ad_i*bd_j) + sum_{i+j=k-1} hi(ad_i*bd_j).
    Column sums are bounded by (Da+Db) * 2^16 < 2^22 — no overflow.
    """
    Da, Db = ad.shape[-1], bd.shape[-1]
    prod = ad[..., :, None] * bd[..., None, :]  # (..., Da, Db) exact in u32
    lo = (prod & MASK16).reshape(*prod.shape[:-2], Da * Db)
    hi = (prod >> 16).reshape(*prod.shape[:-2], Da * Db)
    flat = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int32)
    scatter = jnp.asarray(_scatter_matrix(Da, Db, n_cols))
    # One integer matmul replaces ~4*Da pad/slice/add ops: column sums stay
    # < (Da+Db)*2^16 < 2^22, exact in int32.
    cols = jax.lax.dot_general(
        flat, scatter, dimension_numbers=(((flat.ndim - 1,), (0,)), ((), ()))
    )
    return cols.astype(U32)


@functools.lru_cache(maxsize=None)
def _scatter_matrix(Da: int, Db: int, n_cols: int) -> np.ndarray:
    """0/1 matrix (2*Da*Db, n_cols): row (i*Db+j) -> col i+j (lo half) and
    row Da*Db + i*Db+j -> col i+j+1 (hi half); columns >= n_cols dropped."""
    S = np.zeros((2 * Da * Db, n_cols), dtype=np.int32)
    for i in range(Da):
        for j in range(Db):
            if i + j < n_cols:
                S[i * Db + j, i + j] = 1
            if i + j + 1 < n_cols:
                S[Da * Db + i * Db + j, i + j + 1] = 1
    return S


def _raw_add(a: jax.Array, b: jax.Array):
    """Limbwise a + b, carries via Kogge-Stone. Returns (sum limbs, carry_out)."""
    s = a + b
    gen = s < a
    prop = s == U32(0xFFFFFFFF)
    c = _prefix_carry(gen, prop)
    out = s + _shift1(c, False).astype(U32)
    return out, c[..., -1].astype(U32)


def _raw_sub(a: jax.Array, b: jax.Array):
    """Limbwise a - b, borrows via Kogge-Stone. Returns (diff limbs, borrow_out)."""
    d = a - b
    gen = a < b
    prop = d == 0
    brw = _prefix_carry(gen, prop)
    out = d - _shift1(brw, False).astype(U32)
    return out, brw[..., -1].astype(U32)


def _gte(a: jax.Array, b: jax.Array) -> jax.Array:
    """Lexicographic a >= b over little-endian limb arrays. Returns bool[...]."""
    d = a - b
    gen = a < b
    prop = d == 0
    brw = _prefix_carry(gen, prop)
    return ~brw[..., -1]


# ---------------------------------------------------------------------------
# public modular ops (elementwise over uint32[..., n_limbs])
# ---------------------------------------------------------------------------


def mod_add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p; semantics match reference add (bls12-381.cu:213-238)."""
    P = jnp.asarray(spec.P_limbs)
    s, _ = _raw_add(a, b)  # a,b < p < 2^(32n-1) => no carry out
    need_sub = _gte(s, jnp.broadcast_to(P, s.shape))
    s_red, _ = _raw_sub(s, jnp.broadcast_to(P, s.shape))
    return jnp.where(need_sub[..., None], s_red, s)


def mod_sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p; adds p back on borrow like reference sub."""
    P = jnp.asarray(spec.P_limbs)
    d, borrow = _raw_sub(a, b)
    d_fix, _ = _raw_add(d, jnp.broadcast_to(P, d.shape))
    return jnp.where((borrow > 0)[..., None], d_fix, d)


def mod_neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mod_sub(spec, jnp.zeros_like(a), a)


def mod_double(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mod_add(spec, a, a)


def mont_mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a*b*R^-1 mod p (R = 2^(32*n_limbs)).

    Full-word REDC in radix-2^16 digit space; see module docstring. Equivalent to the
    reference CIOS (/root/reference/bls12-381.cu:499-530) on canonical inputs.
    """
    D = spec.n_digits
    ad = to_digits(a)
    bd = to_digits(b)

    # 1) T = a*b as 2D+1 columns, then normalized digits (value < p^2).
    t_cols = _shift_add_product(ad, bd, 2 * D + 1)
    T = _carry_normalize(t_cols, 2 * D)  # p^2 < 2^(32n*2) so 2D digits suffice

    # 2) m = (T mod R) * NP mod R   (only low D digit-columns needed)
    NP = jnp.asarray(digits_from_int(spec.np_full, D))
    t_low = T[..., :D]
    m_cols = _shift_add_product(t_low, jnp.broadcast_to(NP, t_low.shape), D + 1)
    m = _carry_normalize(m_cols, D)  # mod R: truncate carries beyond D digits

    # 3) T2 = T + m*p ; low D digits are zero by construction; result = T2 >> 16*D.
    Pd = jnp.asarray(digits_from_int(spec.p, D))
    mp_cols = _shift_add_product(m, jnp.broadcast_to(Pd, m.shape), 2 * D + 1)
    total_cols = mp_cols + jnp.pad(T, [(0, 0)] * (T.ndim - 1) + [(0, 1)])
    T2 = _carry_normalize(total_cols, 2 * D + 1)
    r_digits = T2[..., D : 2 * D]  # (T + m*p)/R < 2p < R => top col is carry-free
    r = from_digits(r_digits)

    # 4) canonicalize: subtract p once if needed.
    P = jnp.asarray(spec.P_limbs)
    need_sub = _gte(r, jnp.broadcast_to(P, r.shape))
    r_red, _ = _raw_sub(r, jnp.broadcast_to(P, r.shape))
    return jnp.where(need_sub[..., None], r_red, r)


def mont_sqr(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """a -> a*R mod p (reference `mont`, bls12-381.cu:585-587)."""
    r2 = jnp.broadcast_to(jnp.asarray(spec.R2_limbs), a.shape)
    return mont_mul(spec, a, r2)


def from_mont(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """a -> a*R^-1 mod p (reference `unmont`, bls12-381.cu:589-593)."""
    one = jnp.broadcast_to(jnp.asarray(spec.ONE_raw), a.shape)
    return mont_mul(spec, a, one)


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def select(pred: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise where over limb arrays; pred shape = a.shape[:-1]."""
    return jnp.where(pred[..., None], a, b)


def mont_pow(spec: FieldSpec, base: jax.Array, exponent: int) -> jax.Array:
    """base^exponent (Montgomery form in/out) for a *static* python-int exponent.

    Small exponents unroll inline; large ones (e.g. Fermat inversion at p-2)
    run as a lax.scan over the exponent's bits — one mont_mul+mont_sqr body
    compiled once instead of ~380 inlined instances (an XLA:CPU compile-time
    bomb at 255 bits)."""
    e = int(exponent)
    if e.bit_length() <= 16:
        result = jnp.broadcast_to(jnp.asarray(spec.ONE_mont), base.shape)
        acc = base
        while e > 0:
            if e & 1:
                result = mont_mul(spec, result, acc)
            e >>= 1
            if e:
                acc = mont_sqr(spec, acc)
        return result

    bits = jnp.asarray([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.uint32)

    def step(carry, bit):
        result, acc = carry
        result = jnp.where(bit != 0, mont_mul(spec, result, acc), result)
        acc = mont_sqr(spec, acc)
        return (result, acc), None

    init = (jnp.broadcast_to(jnp.asarray(spec.ONE_mont), base.shape), base)
    (result, _), _ = jax.lax.scan(step, init, bits)
    return result
