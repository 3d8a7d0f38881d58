"""FrTensor operations: reductions, multilinear-extension folds, RNG.

TPU-native re-design of the reference tensor runtime (/root/reference/fr-tensor.cu):
where the reference launches one CUDA kernel per op with a device sync after each
(fr-tensor.cu:122-238) and does `sum()` as a ping-pong shared-memory tree
(fr-tensor.cu:240-292), here every op is a pure jnp function over uint32[..., 8]
arrays that XLA fuses; reductions and folds are reshapes + lerps, and entire
protocols stay inside one jit with zero host round-trips.

Conventions: a "tensor" is uint32[n, 8] (Montgomery-form Fr elements). Sizes are
padded with zeros exactly like the reference kernels do (missing odd tail == 0;
see Fr_me_step, fr-tensor.cu:399-409).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..utils import aot
from ..field.fr import P_INT, P_TOP_LIMB


def ceil_log2(n: int) -> int:
    """Matches reference ceilLog2 (proof.cu:13-30)."""
    if n == 0:
        return 0
    return int(n - 1).bit_length()


def pad_to(t: jax.Array, n: int) -> jax.Array:
    """Zero-pad leading axis to length n."""
    if t.shape[0] == n:
        return t
    assert t.shape[0] < n
    return jnp.concatenate([t, jnp.zeros((n - t.shape[0], *t.shape[1:]), dtype=t.dtype)], axis=0)


def fr_sum(t: jax.Array) -> jax.Array:
    """Modular sum of all elements -> (8,). Pairwise tree of modular adds.

    Replaces the reference's shared-memory reduction (fr-tensor.cu:240-292); the
    tree order differs but modular sums are order-independent, and every partial
    stays canonical (< p) so the result is bit-exact.
    """
    n = t.shape[0]
    if n == 0:
        return fr.zeros()
    while t.shape[0] > 1:
        m = t.shape[0]
        if m % 2:
            t = pad_to(t, m + 1)
            m += 1
        t = fr.add(t[0::2], t[1::2])
    return t[0]


@aot.jit
def _me_step_kernel(t: jax.Array, x: jax.Array) -> jax.Array:
    a0 = t[0::2]
    a1 = t[1::2]
    return fr.add(a0, fr.mul(jnp.broadcast_to(x, a0.shape), fr.sub(a1, a0)))


def me_step(t: jax.Array, x: jax.Array) -> jax.Array:
    """One multilinear-extension fold: out[i] = t[2i] + x*(t[2i+1] - t[2i]).

    Semantics match Fr_me_step (fr-tensor.cu:399-409) including zero-padding of
    the odd tail. t: (n, 8); x: (8,) Montgomery scalar. Returns ((n+1)//2, 8).
    """
    n = t.shape[0]
    m = (n + 1) // 2
    t = pad_to(t, 2 * m)
    return _me_step_kernel(t, x)


def me_eval(t: jax.Array, u: jax.Array) -> jax.Array:
    """Evaluate the MLE of t at point u ((r, 8) challenges) -> (8,).

    Mirrors FrTensor::operator()(vector<Fr_t>) (fr-tensor.cu:295-300): fold along
    u[0], then u[1], ... Caller must satisfy 2^(r-1) < n <= 2^r (checked).
    """
    n = t.shape[0]
    r = u.shape[0]
    assert n > (1 << r) // 2 and n <= (1 << r), (n, r)
    for i in range(r):
        t = me_step(t, u[i])
    return t[0]


@functools.partial(aot.jit, static_argnums=(2,))
def _partial_me_step_kernel(t: jax.Array, x: jax.Array, window: int) -> jax.Array:
    num_windows = t.shape[0] // (2 * window)
    tw = t.reshape(num_windows, 2, window, 8)
    a0 = tw[:, 0]
    a1 = tw[:, 1]
    out = fr.add(a0, fr.mul(jnp.broadcast_to(x, a0.shape), fr.sub(a1, a0)))
    return out.reshape(num_windows * window, 8)


def partial_me_step(t: jax.Array, x: jax.Array, window: int) -> jax.Array:
    """Windowed fold: pairs *windows* of size `window` (Fr_partial_me_step,
    fr-tensor.cu:420-432). Folds the leading (outer) axis while keeping the inner
    window axis intact.
    """
    n = t.shape[0]
    num_windows = (n + 2 * window - 1) // (2 * window)
    t = pad_to(t, num_windows * 2 * window)
    return _partial_me_step_kernel(t, x, window)


def partial_me(t: jax.Array, u: jax.Array, window: int) -> jax.Array:
    """Fold the outer axis along all challenges in u (FrTensor::partial_me,
    fr-tensor.cu:370-374). Result length = window * ceil(n / (window * 2^r))…
    collapses to `window` when 2^r covers the outer axis.
    """
    n = t.shape[0]
    r = u.shape[0]
    assert n > window * (1 << (r - 1)), (n, window, r)
    for i in range(r):
        t = partial_me_step(t, u[i], window)
    return t


def random_fr(key: jax.Array, n: int) -> jax.Array:
    """Near-uniform Fr elements, same distribution as the reference's
    `FrTensor::random` (fr-tensor.cu:337-368): 8 uniform u32 limbs with the top
    limb reduced mod P_TOP_LIMB. Deterministic via JAX PRNG keys (a deliberate
    upgrade over the reference's random_device seeding).
    """
    bits = jax.random.bits(key, (n, 8), dtype=jnp.uint32)
    top = bits[:, 7] % jnp.uint32(P_TOP_LIMB)
    return bits.at[:, 7].set(top)


def random_int(key: jax.Array, n: int, num_bits: int) -> jax.Array:
    """Centered num_bits-wide integers embedded in Fr (non-Montgomery), matching
    random_int_kernel (fr-tensor.cu:302-335): x = (u32 & mask) - 2^(bits-1) mod p.
    """
    bits = jax.random.bits(key, (n,), dtype=jnp.uint32)
    small = bits & jnp.uint32((1 << num_bits) - 1)
    t = jnp.zeros((n, 8), dtype=jnp.uint32).at[:, 0].set(small)
    offset = jnp.zeros((n, 8), dtype=jnp.uint32).at[:, 0].set(jnp.uint32(1 << (num_bits - 1)))
    return fr.sub(t, offset)


def from_u32(vals: jax.Array) -> jax.Array:
    """Lift u32 scalars (n,) into Fr limb arrays (n, 8), non-Montgomery."""
    out = jnp.zeros((*vals.shape, 8), dtype=jnp.uint32)
    return out.at[..., 0].set(vals.astype(jnp.uint32))


def to_host_ints(t, mont_form: bool = True) -> list[int]:
    return fr.to_ints(np.asarray(t), mont_form=mont_form)
