"""Digit-planar Fr arithmetic: full-lane-width TPU kernels for the prover hot path.

Motivation (measured on real TPU): the `(n, 8)` limb-minor layout of `fr.py`/`mp.py`
maps the 8-limb axis onto the 128-wide VPU lane dimension — 8/128 lanes used — and
its outer-product digit matmul materializes `(n, 16, 16)` temporaries, which OOMs
HBM beyond a few million elements. This module is the re-design for the prover's
bulk work:

- **Layout**: an Fr tensor is `uint32[8, n]` ("planar": limbs leading, elements
  minor). Every arithmetic op below unrolls the limb/digit axis in Python and
  issues `(n,)`-shaped VPU ops — all 128 lanes carry elements.
- **Multiplication** is the same full-word Montgomery REDC in radix 2^16 as
  `mp.mont_mul` (the portable CIOS family of /root/reference/bls12-381.cu:499-530,
  re-derived for vector lanes), but with sequential carry propagation (a ~40-step
  Python loop of cheap `(n,)` ops) instead of Kogge-Stone — at full lane width the
  dependency chain is irrelevant and the op count is ~4x smaller.
- **Lazy-reduction dot products**: `dot(a, b)` accumulates schoolbook digit
  columns across elements in u32 (each column term < 2^16, so 2^14-element chunks
  are overflow-safe with 16 lo+hi terms each), performing ONE Montgomery reduction
  per chunk instead of per element. This is the workhorse of sumcheck round sums,
  eq-weighted evaluations, and Pedersen row sums.

Bit-compatibility: `mul(a, b) == fr.mul(a, b)` limb-for-limb (tests assert), so
planar provers emit identical proof streams to the `(n, 8)` reference-convention
implementations.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import fr, mp


def debug_assert_below(x: jax.Array, bound: int, what: str) -> None:
    """Env-gated (ZKDL_DEBUG_OVERFLOW=1) runtime bound check on lazy
    accumulators (SURVEY §5.2 rebuild item): raises from a host callback if any
    lane reaches `bound`, so chunk-size tuning can't silently corrupt proofs.
    Free when the env var is unset (no ops emitted)."""
    if not os.environ.get("ZKDL_DEBUG_OVERFLOW"):
        return

    def cb(m):
        if int(m) >= bound:
            raise OverflowError(f"lazy-accumulator overflow guard: {what}: max {int(m)} >= {bound}")

    jax.debug.callback(cb, jnp.max(x))

U32 = np.uint32
MASK16 = np.uint32(0xFFFF)

SPEC = fr.SPEC
N_LIMBS = 8
N_DIGITS = 16

# digit constants of p and -p^-1 mod R (python ints -> u32 scalars)
_P_DIGITS = [int(d) for d in mp.digits_from_int(SPEC.p, N_DIGITS)]
_NP_DIGITS = [int(d) for d in mp.digits_from_int(SPEC.np_full, N_DIGITS)]
_P_LIMBS = [int(l) for l in mp.limbs_from_int(SPEC.p, N_LIMBS)]
_ONE_MONT_LIMBS = [int(l) for l in mp.limbs_from_int(SPEC.r % SPEC.p, N_LIMBS)]


def to_planar(x: jax.Array) -> jax.Array:
    """(n, 8) -> (8, n)."""
    return jnp.swapaxes(x, -1, -2)


def from_planar(x: jax.Array) -> jax.Array:
    """(8, n) -> (n, 8)."""
    return jnp.swapaxes(x, -1, -2)


def zeros(n: int) -> jax.Array:
    return jnp.zeros((N_LIMBS, n), dtype=jnp.uint32)


def ones_mont(n: int) -> jax.Array:
    return jnp.broadcast_to(
        jnp.asarray(np.array(_ONE_MONT_LIMBS, dtype=np.uint32))[:, None], (N_LIMBS, n)
    )


# ---------------------------------------------------------------------------
# digit helpers: a "digit list" is a Python list of 16 (n,)-shaped u32 arrays
# ---------------------------------------------------------------------------


def _to_digits(x: jax.Array) -> list:
    """(8, n) limbs -> list of 16 (n,) digit rows (little-endian)."""
    out = []
    for i in range(N_LIMBS):
        out.append(x[i] & MASK16)
        out.append(x[i] >> 16)
    return out


def _from_digits(d: list) -> jax.Array:
    """16 digit rows -> (8, n) limbs."""
    return jnp.stack([d[2 * i] | (d[2 * i + 1] << 16) for i in range(N_LIMBS)])


def _product_cols(ad: list, bd: list, n_cols: int) -> list:
    """Schoolbook digit product as column sums (lo parts at i+j, hi at i+j+1).

    Each column accumulates <= 16 lo + 16 hi terms, each < 2^16: sums < 2^21.
    """
    cols = [None] * n_cols
    for i in range(len(ad)):
        for j in range(len(bd)):
            k = i + j
            if k >= n_cols:
                continue
            p = ad[i] * bd[j]
            lo = p & MASK16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < n_cols:
                hi = p >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = jnp.zeros_like(ad[0])
    return [c if c is not None else z for c in cols]


def _carry_digits(cols: list, n_out: int) -> list:
    """Resolve deferred carries: u32 column sums -> n_out normalized 16-bit digits.

    Sequential ripple along the digit axis — ~2 VPU ops per digit at full lane
    width. Exact while carries stay < 2^16 (columns < 2^21 guarantee it).
    """
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK16)
        carry = v >> 16
    return out


def _limbs_sub_p_if_gte(r: jax.Array) -> jax.Array:
    """Canonicalize: subtract p once when r >= p. r: (8, n) with r < 2p."""
    # compute r - p with ripple borrow (8 sequential limb steps)
    diff = []
    borrow = jnp.zeros_like(r[0])
    for i in range(N_LIMBS):
        pi = U32(_P_LIMBS[i])
        d1 = r[i] - pi
        b1 = (r[i] < pi).astype(jnp.uint32)
        d2 = d1 - borrow
        b2 = (d1 < borrow).astype(jnp.uint32)
        diff.append(d2)
        borrow = b1 | b2
    gte = borrow == 0  # no final borrow => r >= p
    return jnp.stack([jnp.where(gte, diff[i], r[i]) for i in range(N_LIMBS)])


# ---------------------------------------------------------------------------
# elementwise modular ops on (8, n)
# ---------------------------------------------------------------------------


def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a + b) mod p, planar. Inputs canonical (< p)."""
    s = []
    carry = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        v = a[i] + b[i]
        c1 = (v < a[i]).astype(jnp.uint32)
        v2 = v + carry
        c2 = (v2 < v).astype(jnp.uint32)
        s.append(v2)
        carry = c1 | c2
    # a, b < p < 2^255 => no carry out of limb 7
    return _limbs_sub_p_if_gte(jnp.stack(s))


def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a - b) mod p, planar."""
    d = []
    borrow = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        d1 = a[i] - b[i]
        b1 = (a[i] < b[i]).astype(jnp.uint32)
        d2 = d1 - borrow
        b2 = (d1 < borrow).astype(jnp.uint32)
        d.append(d2)
        borrow = b1 | b2
    # on borrow, add p back
    fixed = []
    carry = jnp.zeros_like(a[0])
    under = borrow != 0
    for i in range(N_LIMBS):
        pi = U32(_P_LIMBS[i])
        v = d[i] + pi
        c1 = (v < d[i]).astype(jnp.uint32)
        v2 = v + carry
        c2 = (v2 < v).astype(jnp.uint32)
        fixed.append(v2)
        carry = c1 | c2
    return jnp.stack([jnp.where(under, fixed[i], d[i]) for i in range(N_LIMBS)])


def neg(a: jax.Array) -> jax.Array:
    return sub(jnp.zeros_like(a), a)


def double(a: jax.Array) -> jax.Array:
    return add(a, a)


# On non-TPU backends the digit-planar graphs compile far too slowly under
# XLA:CPU (minutes per op instance); the heavy public ops below fall back to
# the mp.py implementations via a layout swap — bit-identical results (both
# asserted against each other in tests). Set FORCE_XLA_PLANAR to exercise the
# digit path on CPU (small sizes only).
FORCE_XLA_PLANAR = False


def _digit_path() -> bool:
    return FORCE_XLA_PLANAR or jax.default_backend() == "tpu"


def _via_mp(fn, *planar_args) -> jax.Array:
    args = [jnp.swapaxes(x, 0, -1) if x.shape[0] == N_LIMBS else x for x in planar_args]
    out = fn(*args)
    return jnp.swapaxes(out, 0, -1)


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product a*b*R^-1 mod p, planar. Bit-identical to fr.mul."""
    if not _digit_path():
        return _via_mp(lambda x, y: mp.mont_mul(SPEC, x, y), a, b)
    ad = _to_digits(a)
    bd = _to_digits(b)
    return _mul_digits(ad, bd)


def _mul_digits(ad: list, bd: list) -> jax.Array:
    """Montgomery product from digit lists; returns (8, n) canonical limbs."""
    D = N_DIGITS
    t_cols = _product_cols(ad, bd, 2 * D + 1)
    T = _carry_digits(t_cols, 2 * D)
    return _redc(T)


def _redc(T: list) -> jax.Array:
    """Full-word REDC of 32 normalized digits T (value < p*R). -> (8,n) canonical."""
    D = N_DIGITS
    np_d = [U32(x) for x in _NP_DIGITS]
    m_cols = _product_cols_scalar_b(T[:D], np_d, D + 1)
    m = _carry_digits(m_cols, D)
    p_d = [U32(x) for x in _P_DIGITS]
    mp_cols = _product_cols_scalar_b(m, p_d, 2 * D + 1)
    total = [mp_cols[k] + (T[k] if k < len(T) else jnp.zeros_like(T[0])) for k in range(2 * D + 1)]
    T2 = _carry_digits(total, 2 * D + 1)
    r = _from_digits(T2[D : 2 * D])
    return _limbs_sub_p_if_gte(r)


def _product_cols_scalar_b(ad: list, b_scalars: list, n_cols: int) -> list:
    """Like _product_cols but with per-digit u32 SCALAR b (constants)."""
    cols = [None] * n_cols
    for i in range(len(ad)):
        for j, bj in enumerate(b_scalars):
            k = i + j
            if k >= n_cols:
                continue
            if int(bj) == 0:
                continue
            p = ad[i] * bj
            lo = p & MASK16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < n_cols:
                hi = p >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = jnp.zeros_like(ad[0])
    return [c if c is not None else z for c in cols]


def mul_scalar(a: jax.Array, s: jax.Array) -> jax.Array:
    """a * s for a broadcast scalar s: a (8, *any), s (8,). Montgomery."""
    s = s.reshape((N_LIMBS,) + (1,) * (a.ndim - 1))
    sb = jnp.broadcast_to(s, a.shape)
    return mul(a, sb)


def _dot_via_mp(a: jax.Array, b: jax.Array) -> jax.Array:
    """CPU fallback for dot: elementwise mont_mul + modular pairwise tree over
    the contraction axis, in (..., 8) layout (compact, well-cached graphs)."""
    a2 = jnp.moveaxis(a, 0, -1)  # (*batch, n, 8)
    b2 = jnp.moveaxis(b, 0, -1)
    prod = mp.mont_mul(SPEC, a2, b2)
    while prod.shape[-2] > 1:
        m = prod.shape[-2]
        if m % 2:
            padw = [(0, 0)] * prod.ndim
            padw[-2] = (0, 1)
            prod = jnp.pad(prod, padw)
        prod = mp.mod_add(SPEC, prod[..., 0::2, :], prod[..., 1::2, :])
    return jnp.moveaxis(prod[..., 0, :], -1, 0)


def _masked_sum_via_mp(mask: jax.Array, w: jax.Array) -> jax.Array:
    w = jnp.broadcast_to(w, (N_LIMBS, *mask.shape))
    w2 = jnp.moveaxis(w, 0, -1)  # (*batch, n, 8)
    sel = jnp.where(mask[..., None], w2, 0)
    while sel.shape[-2] > 1:
        m = sel.shape[-2]
        if m % 2:
            padw = [(0, 0)] * sel.ndim
            padw[-2] = (0, 1)
            sel = jnp.pad(sel, padw)
        sel = mp.mod_add(SPEC, sel[..., 0::2, :], sel[..., 1::2, :])
    return jnp.moveaxis(sel[..., 0, :], -1, 0)


def select(pred: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """pred: (n,) bool -> where(pred, a, b) over (8, n)."""
    return jnp.where(pred[None, :], a, b)


# ---------------------------------------------------------------------------
# lazy-reduction reductions
# ---------------------------------------------------------------------------

# Chunk length for lazy accumulation: per (i, j) digit pair a chunk sums
# <= CHUNK products each < 2^32 split into lo/hi 16-bit parts, so per-pair
# partial sums stay < CHUNK * 2^16 = 2^29; those partials are themselves
# re-split into 16-bit digits before column accumulation (<= ~32 terms * 2^16
# < 2^22), keeping everything exact in u32.
DOT_CHUNK = 1 << 13


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Modular sum of elementwise Montgomery products over the LAST axis:
    exactly fr_sum(fr.mul(a, b)) per batch element — one Montgomery reduction
    per chunk instead of per element.

    a, b: (8, *batch, n) canonical Montgomery (shapes must broadcast against
    each other; e.g. a (8, M, n) against a shared table b (8, n)).
    Returns (8, *batch) canonical.
    """
    a, b = _broadcast_pair(a, b)
    n = a.shape[-1]
    batch = a.shape[1:-1]
    if n == 0:
        return jnp.zeros((N_LIMBS, *batch), dtype=jnp.uint32)
    if not _digit_path():
        return _dot_via_mp(a, b)
    c = min(DOT_CHUNK, _next_pow2(n))
    # overflow invariant: per-(i,j)-digit-pair chunk sums are < c * 2^16 and
    # must stay exact in u32 (docstring) — c <= 2^13 keeps them < 2^29, leaving
    # headroom for the ~48-term column accumulation that follows.
    assert c <= 1 << 13, f"DOT_CHUNK={c} violates the u32 lazy-sum overflow bound (max 2^13)"
    pad = (-n) % c
    if pad:
        padw = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        a = jnp.pad(a, padw)
        b = jnp.pad(b, padw)
    m = a.shape[-1] // c
    a3 = a.reshape(N_LIMBS, *batch, m, c)
    b3 = b.reshape(N_LIMBS, *batch, m, c)
    ad = _to_digits_nd(a3)
    bd = _to_digits_nd(b3)
    # Per-chunk lazy accumulation: per (i, j) digit pair the lo/hi partial sums
    # over a chunk stay < c * 2^16 <= 2^29 in u32; those partials are re-split
    # into 16-bit digits before column accumulation (<= ~48 terms * 2^16 < 2^22).
    D = N_DIGITS
    n_cols = 2 * D + 1
    cols = [None] * n_cols

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(D):
        for j in range(D):
            k = i + j
            if k >= n_cols:
                continue
            p = ad[i] * bd[j]  # (*batch, m, c) u32 exact
            lo = jnp.sum(p & MASK16, axis=-1, dtype=jnp.uint32)  # < 2^29
            hi = jnp.sum(p >> 16, axis=-1, dtype=jnp.uint32)
            acc(k, lo & MASK16)
            acc(k + 1, (lo >> 16) + (hi & MASK16))
            if k + 2 < n_cols:
                acc(k + 2, hi >> 16)
    z = jnp.zeros((*batch, m), dtype=jnp.uint32)
    cols = [col if col is not None else z for col in cols]
    debug_assert_below(jnp.stack(cols, axis=-1), 1 << 30, "planar.dot columns")
    # cols: (m,) u32, each < 2^22. The chunk total S = sum_e a_e*b_e < c * p^2
    # < 2^523 — larger than REDC's T < p*R precondition. Split S = S0 + S1*R
    # + S2*R^2 (R = 2^256 = 16 digits): S*R^-1 mod p = REDC(S0) + (S1 mod p)
    # + (S2*R mod p), with S2 < 2^16 handled by a Montgomery lift.
    digs = _carry_digits(cols, 2 * D + 2)  # 34 digits cover 2^544 > c * p^2
    s0 = _redc(digs[:D])  # REDC treats missing high digits as zero
    s1 = _from_digits(digs[D : 2 * D])  # < 2^256 < 4.45 p
    for _ in range(3):
        s1 = _limbs_sub_p_if_gte(s1)
    s2_val = digs[2 * D] | (digs[2 * D + 1] << 16)
    s2 = to_mont(jnp.stack([s2_val] + [jnp.zeros_like(s2_val)] * (N_LIMBS - 1)))
    per_chunk = add(add(s0, s1), s2)  # (8, *batch, m)
    return tree_sum(per_chunk)


def _broadcast_pair(a: jax.Array, b: jax.Array):
    if a.shape != b.shape:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
    return a, b


def _to_digits_nd(x: jax.Array) -> list:
    """(8, ...) -> 16 digit arrays of shape (...)."""
    out = []
    for i in range(N_LIMBS):
        out.append(x[i] & MASK16)
        out.append(x[i] >> 16)
    return out


def tree_sum(a: jax.Array) -> jax.Array:
    """Modular sum over the LAST axis: (8, *batch, m) -> (8, *batch)."""
    while a.shape[-1] > 1:
        m = a.shape[-1]
        if m % 2:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])
            m += 1
        a = add(a[..., 0::2], a[..., 1::2])
    return a[..., 0]


def masked_sum(mask: jax.Array, w: jax.Array) -> jax.Array:
    """Sum of w entries where mask, along the LAST axis.

    mask: bool (*batch, n); w: (8, *batch, n). Returns (8, *batch).
    Mul-free lazy sum: masked 16-bit digit columns accumulate in u32 chunks;
    the per-chunk 268-bit total is reduced mod p with <= 3 conditional
    subtractions for the low 256 bits plus one Montgomery lift of the tiny
    overflow word (x * 2^256 mod p == to_mont(x)). Equals fr_sum(select(mask, w, 0)).
    """
    w = jnp.broadcast_to(w, (N_LIMBS, *mask.shape))
    n = w.shape[-1]
    batch = w.shape[1:-1]
    if n == 0:
        return jnp.zeros((N_LIMBS, *batch), dtype=jnp.uint32)
    if not _digit_path():
        return _masked_sum_via_mp(mask, w)
    c = min(DOT_CHUNK, _next_pow2(n))
    pad = (-n) % c
    if pad:
        w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, pad)])
        mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    m = w.shape[-1] // c
    w3 = w.reshape(N_LIMBS, *batch, m, c)
    mask3 = mask.reshape(*batch, m, c)
    wd = _to_digits_nd(w3)  # 16 x (*batch, m, c)
    assert c <= 1 << 13, f"DOT_CHUNK={c} violates the u32 lazy-sum overflow bound (max 2^13)"
    cols = []
    for k in range(N_DIGITS):
        v = jnp.where(mask3, wd[k], 0)
        cols.append(jnp.sum(v, axis=-1, dtype=jnp.uint32))  # < c * 2^16 <= 2^29
    debug_assert_below(jnp.stack(cols, axis=-1), 1 << 30, "planar.masked_sum columns")
    digs = _carry_digits(cols, N_DIGITS + 1)  # value < 2^13 * 2^255 => 17 digits
    low = _from_digits(digs[:N_DIGITS])  # < 2^256 < 4.45 * p
    for _ in range(3):
        low = _limbs_sub_p_if_gte(low)
    hi = digs[N_DIGITS]  # < 2^13
    hi_limbs = jnp.stack([hi] + [jnp.zeros_like(hi)] * (N_LIMBS - 1))
    # hi * 2^256 mod p == to_mont(hi); via the pallas kernel to keep the XLA
    # graph of every masked_sum call site small (lazy import: no module cycle)
    from . import pallas_fr as _pf

    r2 = jnp.asarray(mp.limbs_from_int(SPEC.r2, N_LIMBS)).reshape(
        (N_LIMBS,) + (1,) * (hi_limbs.ndim - 1)
    )
    hi_contrib = _pf.mul(hi_limbs, jnp.broadcast_to(r2, hi_limbs.shape))
    return tree_sum(add(low, hi_contrib))


def lazy_sum(w: jax.Array) -> jax.Array:
    """Modular sum of all elements along the last axis of (8, *batch, n) —
    masked_sum without the mask (same lazy digit-column accumulation)."""
    mask = jnp.ones(w.shape[1:], dtype=bool)
    return masked_sum(mask, w)


def to_mont(a: jax.Array) -> jax.Array:
    """a -> a*R mod p, planar (8, n). Routed through the pallas kernel on TPU
    to keep call-site XLA graphs small (lazy import: no module cycle)."""
    from . import pallas_fr as _pf

    shape = (N_LIMBS,) + (1,) * (a.ndim - 1)
    r2 = jnp.asarray(mp.limbs_from_int(SPEC.r2, N_LIMBS)).reshape(shape)
    return _pf.mul(a, jnp.broadcast_to(r2, a.shape))


def from_mont(a: jax.Array) -> jax.Array:
    """a -> a*R^-1 mod p, planar (8, n)."""
    from . import pallas_fr as _pf

    one = jnp.zeros_like(a).at[0].set(1)
    return _pf.mul(a, one)


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1).bit_length() if n > 1 else 0)
