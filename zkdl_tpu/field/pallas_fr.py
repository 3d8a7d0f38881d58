"""Pallas TPU kernels for the planar Fr hot path: mont-mul and lazy dot.

Why Pallas here: the XLA-level planar ops (field/planar.py) are fast at
runtime but each op unrolls to ~2.5K HLO nodes, and the prover needs ~15
shapes x 3 protocols of round kernels — XLA compile time explodes. As Pallas
kernels the digit schoolbook lives inside ONE Mosaic kernel; the surrounding
XLA graphs shrink to a handful of custom calls and compile in seconds.

Kernels (planar (8, n) uint32 Montgomery layout, block = (8, BLOCK) = 8x8192):

- ``mul`` / ``mul_scalar``: elementwise Montgomery product, same radix-2^16
  full-word REDC as planar.mul (bit-identical outputs; tests assert).
- ``dot_cols_raw``: lazily-accumulated digit-column sums of sum_e a_e*b_e,
  accumulated ACROSS the grid in-kernel (TPU grids run sequentially, so
  revisiting the same output block is an accumulation): out[k] +=
  lo16(col_k) + hi16(col_{k-1}) keeps every partial < 2^28 in u32 while
  preserving sum_k out[k]*2^16k == sum_k col_k*2^16k. One tiny XLA
  ``finalize_cols`` then normalizes + REDCs (batched across many dots so the
  scalar-shaped REDC graph is shared).

On non-TPU backends every public fn falls back to the XLA planar
implementation; set ZKDL_PALLAS_INTERPRET=1 to exercise the kernels in
interpreter mode (tests do).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import planar
from .planar import MASK16, N_DIGITS, N_LIMBS, U32

BLOCK_ROWS = 64  # sublane rows per block; block covers 64*128 = 8192 elements
BLOCK = BLOCK_ROWS * 128
N_COLS = 2 * N_DIGITS + 1  # 33 product columns
ACC_ROWS = N_COLS + 1  # +1 for the final hi spill

_NP_DIGITS = planar._NP_DIGITS
_P_DIGITS = planar._P_DIGITS
_P_LIMBS = planar._P_LIMBS


def _mode():
    """'pallas' on TPU, 'interpret' if forced, else 'xla' fallback."""
    if os.environ.get("ZKDL_PALLAS_INTERPRET"):
        return "interpret"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# ---------------------------------------------------------------------------
# kernel bodies (blocks reshaped to (rows, 128) per limb/digit)
# ---------------------------------------------------------------------------


def _load_digits(ref) -> list:
    """(8, BLOCK) ref -> 16 digit arrays of shape (BLOCK_ROWS, 128)."""
    out = []
    for i in range(N_LIMBS):
        limb = ref[i, :].reshape(BLOCK_ROWS, 128)
        out.append(limb & MASK16)
        out.append(limb >> 16)
    return out


def _store_limbs(ref, digs: list) -> None:
    for i in range(N_LIMBS):
        ref[i, :] = (digs[2 * i] | (digs[2 * i + 1] << 16)).reshape(BLOCK)


def _product_cols(ad, bd, n_cols):
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


def _product_cols_scalar(ad, b_consts, n_cols):
    cols = [None] * n_cols
    for i in range(len(ad)):
        for j, bj in enumerate(b_consts):
            k = i + j
            if k >= n_cols or int(bj) == 0:
                continue
            p = ad[i] * U32(bj)
            lo = p & MASK16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < n_cols:
                hi = p >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = jnp.zeros_like(ad[0])
    return [c if c is not None else z for c in cols]


def _carry_digits(cols, n_out):
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK16)
        carry = v >> 16
    return out


def _sub_p_if_gte(limbs: list) -> list:
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(N_LIMBS):
        pi = U32(_P_LIMBS[i])
        d1 = limbs[i] - pi
        b1 = (limbs[i] < pi).astype(jnp.uint32)
        d2 = d1 - borrow
        b2 = (d1 < borrow).astype(jnp.uint32)
        diff.append(d2)
        borrow = b1 | b2
    gte = borrow == 0
    return [jnp.where(gte, diff[i], limbs[i]) for i in range(N_LIMBS)]


def _redc_digits(T: list) -> list:
    """32 normalized digits (value < p*R) -> 16 canonical result digits."""
    D = N_DIGITS
    m_cols = _product_cols_scalar(T[:D], _NP_DIGITS, D + 1)
    m = _carry_digits(m_cols, D)
    mp_cols = _product_cols_scalar(m, _P_DIGITS, 2 * D + 1)
    total = [mp_cols[k] + (T[k] if k < len(T) else jnp.zeros_like(T[0])) for k in range(2 * D + 1)]
    T2 = _carry_digits(total, 2 * D + 1)
    digs = T2[D : 2 * D]
    limbs = [digs[2 * i] | (digs[2 * i + 1] << 16) for i in range(N_LIMBS)]
    limbs = _sub_p_if_gte(limbs)
    out = []
    for l in limbs:
        out.append(l & MASK16)
        out.append(l >> 16)
    return out


def _mul_kernel(a_ref, b_ref, o_ref):
    ad = _load_digits(a_ref)
    bd = _load_digits(b_ref)
    T = _carry_digits(_product_cols(ad, bd, 2 * N_DIGITS + 1), 2 * N_DIGITS)
    _store_limbs(o_ref, _redc_digits(T))


def _mul_scalar_kernel(a_ref, s_ref, o_ref):
    ad = _load_digits(a_ref)
    sd = []
    for i in range(N_LIMBS):
        limb = s_ref[i, 0]
        sd.append(limb & MASK16)
        sd.append(limb >> 16)
    cols = [None] * (2 * N_DIGITS + 1)
    for i in range(N_DIGITS):
        for j in range(N_DIGITS):
            k = i + j
            p = ad[i] * sd[j]
            lo = p & MASK16
            cols[k] = lo if cols[k] is None else cols[k] + lo
            if k + 1 < 2 * N_DIGITS + 1:
                hi = p >> 16
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = jnp.zeros_like(ad[0])
    cols = [c if c is not None else z for c in cols]
    T = _carry_digits(cols, 2 * N_DIGITS)
    _store_limbs(o_ref, _redc_digits(T))


def _dot_cols_kernel(a_ref, b_ref, o_ref):
    """Accumulate digit-column lane sums of sum_e a_e*b_e across the grid.

    o_ref: (ACC_ROWS, 128), shared by every grid step (same index_map block).
    Per block, col_k lane sums stay < 2^27 (<= 32 contributions of < 2^22
    row-sums); the split accumulation o[k] += lo16(col_k) + hi16(col_{k-1})
    adds < 2^16 + 2^11 per step — safe in u32 for >= 2^15 grid steps.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[...] = jnp.zeros((ACC_ROWS, 128), jnp.uint32)

    ad = _load_digits(a_ref)
    bd = _load_digits(b_ref)
    cols = [None] * N_COLS
    for i in range(N_DIGITS):
        for j in range(N_DIGITS):
            k = i + j
            p = ad[i] * bd[j]  # (rows, 128)
            # Mosaic lacks unsigned reductions; route through int32 (terms
            # < 2^16, row sums < 2^22 — exact in int32)
            lo = jnp.sum((p & MASK16).astype(jnp.int32), axis=0, keepdims=True).astype(jnp.uint32)
            hi = jnp.sum((p >> 16).astype(jnp.int32), axis=0, keepdims=True).astype(jnp.uint32)
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    z = jnp.zeros((1, 128), dtype=jnp.uint32)
    cols = [c if c is not None else z for c in cols]
    acc = []
    for k in range(ACC_ROWS):
        v = z
        if k < N_COLS:
            v = v + (cols[k] & MASK16)
        if k >= 1:
            v = v + (cols[k - 1] >> 16)
        acc.append(v)
    o_ref[...] = o_ref[...] + jnp.concatenate(acc, axis=0)


# ---------------------------------------------------------------------------
# host-callable wrappers
# ---------------------------------------------------------------------------


def _pad_to_block(x: jax.Array):
    n = x.shape[-1]
    pad = (-n) % BLOCK
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x, n


def _pcall(kernel, out_shape, grid, in_specs, out_specs, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=(_mode() == "interpret"),
    )(*args)


_BS = lambda: pl.BlockSpec((N_LIMBS, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise Montgomery product on planar (8, *any); bit-identical to
    planar.mul. Shapes must match exactly (broadcast beforehand)."""
    if _mode() == "xla":
        return planar.mul(a, b)
    assert a.shape == b.shape and a.shape[0] == N_LIMBS
    orig_shape = a.shape
    a2, n = _pad_to_block(a.reshape(N_LIMBS, -1))
    b2, _ = _pad_to_block(b.reshape(N_LIMBS, -1))
    grid = a2.shape[1] // BLOCK
    out = _pcall(
        _mul_kernel,
        jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        (grid,),
        [_BS(), _BS()],
        _BS(),
        a2,
        b2,
    )
    return out[:, :n].reshape(orig_shape)


def mul_scalar(a: jax.Array, s: jax.Array) -> jax.Array:
    """a * s for scalar s (8,) against planar a (8, *any). Montgomery."""
    if _mode() == "xla":
        return planar.mul_scalar(a, s)
    orig_shape = a.shape
    a2, n = _pad_to_block(a.reshape(N_LIMBS, -1))
    grid = a2.shape[1] // BLOCK
    s2 = jnp.broadcast_to(s[:, None], (N_LIMBS, 128))
    out = _pcall(
        _mul_scalar_kernel,
        jax.ShapeDtypeStruct(a2.shape, jnp.uint32),
        (grid,),
        [_BS(), pl.BlockSpec((N_LIMBS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        _BS(),
        a2,
        s2,
    )
    return out[:, :n].reshape(orig_shape)


def dot_cols_raw(a: jax.Array, b: jax.Array) -> jax.Array:
    """(8, n) x (8, n) -> (ACC_ROWS, 128) u32 lazy column partials of
    sum_e a_e * b_e (see _dot_cols_kernel). Finalize with finalize_cols."""
    a2, n = _pad_to_block(a)
    b2, _ = _pad_to_block(b)
    grid = a2.shape[1] // BLOCK
    # the in-kernel split accumulation adds < 2^16 + 2^11 per grid step; the
    # u32 accumulator is exact for up to 2^15 steps (_dot_cols_kernel docstring)
    assert grid <= 1 << 15, f"dot grid {grid} exceeds the u32 accumulator bound (2^15 blocks)"
    return _pcall(
        _dot_cols_kernel,
        jax.ShapeDtypeStruct((ACC_ROWS, 128), jnp.uint32),
        (grid,),
        [_BS(), _BS()],
        pl.BlockSpec((ACC_ROWS, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        a2,
        b2,
    )


def finalize_cols(accs: jax.Array) -> jax.Array:
    """(m, ACC_ROWS, 128) stacked dot partials -> (8, m) canonical sums.

    Batched so the scalar-shaped carry/REDC graph is built once per call site
    regardless of how many dots a round needs.
    """
    m = accs.shape[0]
    # exact lane reduction: values < 2^28 -> split 16/16
    lo = jnp.sum(accs & MASK16, axis=-1, dtype=jnp.uint32)  # (m, ACC) < 2^23
    hi = jnp.sum(accs >> 16, axis=-1, dtype=jnp.uint32)  # < 2^19
    cols = [jnp.zeros((m,), jnp.uint32)] * (ACC_ROWS + 2)
    for k in range(ACC_ROWS):
        cols[k] = cols[k] + (lo[:, k] & MASK16)
        cols[k + 1] = cols[k + 1] + (lo[:, k] >> 16) + (hi[:, k] & MASK16)
        cols[k + 2] = cols[k + 2] + (hi[:, k] >> 16)
    digs = planar._carry_digits(cols, 2 * N_DIGITS + 2)
    s0 = planar._redc(digs[:N_DIGITS])
    s1 = planar._from_digits(digs[N_DIGITS : 2 * N_DIGITS])
    for _ in range(3):
        s1 = planar._limbs_sub_p_if_gte(s1)
    s2_val = digs[2 * N_DIGITS] | (digs[2 * N_DIGITS + 1] << 16)
    s2 = planar.to_mont(jnp.stack([s2_val] + [jnp.zeros_like(s2_val)] * (N_LIMBS - 1)))
    return planar.add(planar.add(s0, s1), s2)


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """fr_sum(fr.mul(a, b)) over planar (8, n) -> (8,)."""
    if _mode() == "xla":
        return planar.dot(a, b)
    return finalize_cols(dot_cols_raw(a, b)[None])[:, 0]


def dot_many(pairs: list) -> jax.Array:
    """Batched dots sharing one finalize: [(a, b), ...] -> (8, len(pairs))."""
    if _mode() == "xla":
        return jnp.stack([planar.dot(a, b) for a, b in pairs], axis=1)
    accs = jnp.stack([dot_cols_raw(a, b) for a, b in pairs])
    return finalize_cols(accs)
