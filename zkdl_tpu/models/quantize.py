"""Fixed-point quantization of floats into Fr, matching the reference exactly.

Semantics of float_to_Fr (/root/reference/zkfc.cu:63-78): x -> round(|x * 2^16|)
(C round(): half away from zero, computed in float32), embedded sign-aware into
Fr (negatives as p - |v|). The batched loader zero-pads both dims to the next
power of two (float_to_Fr_kernel, zkfc.cu:80-88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..tensor import fr_ops

SCALE_BITS = 16
SCALE = 1 << SCALE_BITS


def float_to_fr(x: jax.Array) -> jax.Array:
    """float32[...] -> uint32[..., 8] canonical (non-Montgomery) Fr.

    Bit-compatible with the reference: scale in f32, round(|.|) half away from
    zero in f32, then sign-embed.
    """
    x = x.astype(jnp.float32) * jnp.float32(SCALE)
    abs_x = jnp.abs(x)
    # C round(): round half away from zero == floor(|x| + 0.5) for |x| (f32 ops)
    rounded = jnp.floor(abs_x + jnp.float32(0.5))
    mag = rounded.astype(jnp.uint32)
    fr_pos = fr_ops.from_u32(mag.reshape(-1)).reshape(*x.shape, 8)
    neg = (x < 0) & (mag != 0)
    return fr.select(neg, fr.neg(fr_pos), fr_pos)


def pad_pow2_2d(x: jax.Array) -> jax.Array:
    """Zero-pad a 2-D float array to next-power-of-two dims (zkfc.cu:80-115)."""
    r, c = x.shape
    rp = 1 << fr_ops.ceil_log2(r)
    cp = 1 << fr_ops.ceil_log2(c)
    return jnp.pad(x, ((0, rp - r), (0, cp - c)))


def load_weights(w: np.ndarray) -> jax.Array:
    """Float weight matrix (in, out) -> padded Montgomery Fr tensor
    (in_p * out_p, 8), as zkFC::from_float_gpu_ptr (zkfc.cu:90-100).
    Weights enter already transposed to (in, out), as in load_model
    (demo.cu:72-78)."""
    w = pad_pow2_2d(jnp.asarray(w, dtype=jnp.float32))
    q = float_to_fr(w)
    # mont via the blocked pallas planar kernel: mp.to_mont's digit outer
    # product would materialize (n, 512) i32 temporaries — 8.6 GB for an
    # 18M-param layer — where the pallas path streams fixed-size blocks.
    from ..field import planar

    return planar.from_planar(planar.to_mont(planar.to_planar(q.reshape(-1, 8))))


def load_input(x: np.ndarray) -> jax.Array:
    """Float input batch (batch, dim) -> padded *non-Montgomery* Fr tensor,
    as zkFC::load_float_gpu_input (zkfc.cu:106-115); the driver monts it once
    before inference (demo.cu:119)."""
    x = pad_pow2_2d(jnp.asarray(x, dtype=jnp.float32))
    q = float_to_fr(x)
    return q.reshape(-1, 8)


def dequantize_to_float(t: jax.Array, mont_form: bool = False) -> np.ndarray:
    """Fr tensor -> float64 (host), interpreting values as signed fixed-point
    at the given scale. For checking outputs against the float model."""
    vals = fr.to_ints(np.asarray(t if not mont_form else fr.unmont(t)))
    out = []
    half = fr.P_INT // 2
    for v in vals:
        s = v if v <= half else v - fr.P_INT
        out.append(s / SCALE)
    return np.array(out)
