"""zkConv2D: verifiable quantized 2-D convolution via im2col + matmul sumcheck.

NEW capability beyond the reference (/root/reference supports only FC+ReLU;
conv/attention are the "extend the GKR circuit" goal, BASELINE.json config 5).

Design: convolution is proved as a matrix multiplication over the *patch
matrix*. For input X: (batch, H, W, C_in) and kernel W: (kh, kw, C_in, C_out),

    Z[b, oh, ow, o] = sum_{i,j,c} P[(b,oh,ow), (i,j,c)] * W[(i,j,c), o]

where P = im2col(X) is a pure gather (no arithmetic): rows are flattened
receptive-field patches, zero-padded at the borders. Both prover and verifier
derive P from X by the same deterministic index map, so the existing
inner-product (matmul) sumcheck of zkFC applies verbatim with
batch' = batch*OH*OW, in = kh*kw*C_in, out = C_out. The kernel tensor is
Pedersen-committed exactly like FC weights (row commitments over the padded
(in_p * out_p) layout) and opened at the sumcheck's evaluation point.

The im2col map itself is public structure (like the wiring predicates of a GKR
circuit), not a witness: the X -> P relation needs no sumcheck, the verifier
recomputes any MLE claim about P from X directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..commit import pedersen
from ..field import fr
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops
from . import zkfc


@dataclasses.dataclass(frozen=True)
class ConvShape:
    """Static geometry of one conv layer (stride/padding follow 'SAME'-style
    explicit padding; dilation unsupported, like most zkML circuits)."""

    h: int
    w: int
    c_in: int
    c_out: int
    kh: int
    kw: int
    stride: int = 1
    pad: int = 0

    @property
    def oh(self) -> int:
        return (self.h + 2 * self.pad - self.kh) // self.stride + 1

    @property
    def ow(self) -> int:
        return (self.w + 2 * self.pad - self.kw) // self.stride + 1

    @property
    def patch_size(self) -> int:
        return self.kh * self.kw * self.c_in


def _patch_indices(shape: ConvShape) -> np.ndarray:
    """(OH*OW*kh*kw, ) flat indices into a zero-extended (H*W+1) plane;
    index H*W marks 'out of bounds' (reads the appended zero row)."""
    idx = np.full((shape.oh, shape.ow, shape.kh, shape.kw), shape.h * shape.w, dtype=np.int32)
    for oh in range(shape.oh):
        for ow in range(shape.ow):
            for i in range(shape.kh):
                for j in range(shape.kw):
                    y = oh * shape.stride + i - shape.pad
                    x = ow * shape.stride + j - shape.pad
                    if 0 <= y < shape.h and 0 <= x < shape.w:
                        idx[oh, ow, i, j] = y * shape.w + x
    return idx.reshape(-1)


def im2col(X: jax.Array, shape: ConvShape, batch: int) -> jax.Array:
    """X: (batch*H*W*C_in, 8) Fr -> patch matrix (batch*OH*OW * patch_p, 8)
    where patch_p = next_pow2(patch_size), zero-padded (matching the pow2
    padding of quantize.load_input / float_to_Fr_kernel, zkfc.cu:80-88)."""
    n_limbs = X.shape[-1]
    x4 = X.reshape(batch, shape.h * shape.w, shape.c_in, n_limbs)
    zero_row = jnp.zeros((batch, 1, shape.c_in, n_limbs), dtype=X.dtype)
    x4 = jnp.concatenate([x4, zero_row], axis=1)  # (b, H*W+1, C, 8)
    idx = jnp.asarray(_patch_indices(shape))  # (OH*OW*kh*kw,)
    patches = x4[:, idx]  # (b, OH*OW*kh*kw, C, 8)
    patches = patches.reshape(batch * shape.oh * shape.ow, shape.patch_size, n_limbs)
    patch_p = 1 << fr_ops.ceil_log2(shape.patch_size)
    if patch_p != shape.patch_size:
        pad = jnp.zeros((patches.shape[0], patch_p - shape.patch_size, n_limbs), dtype=X.dtype)
        patches = jnp.concatenate([patches, pad], axis=1)
    return patches.reshape(-1, n_limbs)


im2col_jit = jax.jit(im2col, static_argnums=(1, 2))


@dataclasses.dataclass
class ZkConv2D:
    """Conv layer = geometry + an inner ZkFC over the patch matrix."""

    shape: ConvShape
    fc: zkfc.ZkFC

    @classmethod
    def from_float(cls, kernel: np.ndarray, shape: ConvShape, key: jax.Array) -> "ZkConv2D":
        """kernel: float (kh, kw, C_in, C_out)."""
        assert kernel.shape == (shape.kh, shape.kw, shape.c_in, shape.c_out), (
            kernel.shape,
            shape,
        )
        w2d = kernel.reshape(shape.patch_size, shape.c_out)
        return cls(shape, zkfc.ZkFC.from_float(w2d, key))

    def __call__(self, X: jax.Array, batch: int) -> jax.Array:
        """X: (batch*H*W*C_in, 8) mont -> Z: (batch*OH*OW*out_p, 8) mont."""
        P = im2col_jit(X, self.shape, batch)
        return self.fc(P)

    def prove(self, X: jax.Array, Z: jax.Array, challenges: ChallengeSource, batch: int):
        P = im2col_jit(X, self.shape, batch)
        return zkfc.prove(self.fc, P, Z, challenges)

    def verify(self, proof) -> tuple[bool, str]:
        return zkfc.verify(self.fc.com, proof)
