"""Radix-2 NTT (finite-field FFT) over Fr, TPU-native.

Functional parity with the reference's `blstrs__fr__Fr_radix_fft` kernel
(/root/reference/bls12-381.cu:1075-1139; dead code there — no live zkDL path
uses it, SURVEY.md §0.5 — rebuilt for inventory completeness). The reference
runs log2(n) kernel launches of shared-memory butterfly passes; here the whole
transform is ONE jit: a static Python loop over stages, each stage a full-width
vectorized butterfly over a (n/m, m/2) view — the XLA-native decomposition.

Fr has 2-adicity 32 (r - 1 = 2^32 * odd); omega = 7^((r-1)/2^32) is the
standard primitive 2^32-th root (7 is the field's canonical multiplicative
generator), asserted at import.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr, host

HF = host.fr

TWO_ADICITY = 32
assert (fr.P_INT - 1) % (1 << TWO_ADICITY) == 0
assert (fr.P_INT - 1) % (1 << (TWO_ADICITY + 1)) != 0

# primitive 2^32-th root of unity (value domain)
ROOT_INT = pow(7, (fr.P_INT - 1) >> TWO_ADICITY, fr.P_INT)
assert pow(ROOT_INT, 1 << (TWO_ADICITY - 1), fr.P_INT) == fr.P_INT - 1, (
    "7 must generate the full 2-adic subgroup")


@functools.lru_cache(maxsize=None)
def _omega(log_n: int, inverse: bool) -> int:
    assert log_n <= TWO_ADICITY
    w = pow(ROOT_INT, 1 << (TWO_ADICITY - log_n), fr.P_INT)
    if inverse:
        w = pow(w, fr.P_INT - 2, fr.P_INT)
    return w


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage (m/2, 8) Montgomery twiddle tensors w^0..w^(m/2-1)."""
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w = _omega(s, inverse)
        tw, acc = [], 1
        for _ in range(m // 2):
            tw.append(acc * HF.spec.r % fr.P_INT)  # Montgomery form
            acc = acc * w % fr.P_INT
        out.append(fr.from_ints(tw))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(1, 2))
def _ntt_core(a: jax.Array, log_n: int, inverse: bool) -> jax.Array:
    n = 1 << log_n
    a = a[jnp.asarray(_bitrev_perm(log_n))]
    for s in range(1, log_n + 1):
        m = 1 << s
        tw = jnp.asarray(_stage_twiddles(log_n, inverse)[s - 1])  # (m/2, 8)
        v = a.reshape(n // m, m, 8)
        lo, hi = v[:, : m // 2], v[:, m // 2 :]
        t = fr.mul(hi, tw[None])
        a = jnp.concatenate([fr.add(lo, t), fr.sub(lo, t)], axis=1).reshape(n, 8)
    if inverse:
        n_inv = pow(n, fr.P_INT - 2, fr.P_INT) * HF.spec.r % fr.P_INT
        a = fr.mul(a, jnp.broadcast_to(jnp.asarray(fr.from_ints([n_inv])[0]), a.shape))
    return a


def ntt(a: jax.Array) -> jax.Array:
    """Forward NTT of a (n, 8) Montgomery Fr tensor, n = 2^k <= 2^32."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert n == (1 << log_n), "NTT size must be a power of two"
    return _ntt_core(a, log_n, False)


def intt(a: jax.Array) -> jax.Array:
    """Inverse NTT (exact: intt(ntt(x)) == x)."""
    n = a.shape[0]
    log_n = n.bit_length() - 1
    assert n == (1 << log_n)
    return _ntt_core(a, log_n, True)


def poly_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Polynomial product via NTT: coefficients (na, 8) x (nb, 8) ->
    (na + nb - 1 padded to 2^k, 8). Zero-padded convolution."""
    from . import fr_ops

    n_out = a.shape[0] + b.shape[0] - 1
    n = 1 << fr_ops.ceil_log2(n_out)
    fa = ntt(fr_ops.pad_to(a, n))
    fb = ntt(fr_ops.pad_to(b, n))
    return intt(fr.mul(fa, fb))
