"""zkFC: quantized fully-connected layer (field matmul) + matmul sumcheck prover.

TPU-native rebuild of /root/reference/zkfc.cu. The layer holds a padded
Montgomery weight tensor (in_p * out_p, 8) and its Pedersen row commitments
(built at load, zkfc.cu:102-104).

Forward: Z = X (.) W over Fr (batch x in) @ (in x out). The reference uses a
16x16 shared-memory tiled CUDA field matmul (matrixMultiplyOptimized,
zkfc.cu:6-47). On TPU we provide:
  - `field_matmul`: general blocked elementwise-mul + modular tree-reduction
    (always correct, any magnitudes);
  - (planned) an MXU int8 digit-decomposition path exploiting the protocol's
    own 48-bit magnitude bound for ~100x faster inference.

prove() mirrors zkFC::prove (zkfc.cu:128-145): fold X along the batch axis at
u_bs, fold W along the out axis at u_out, inner-product sumcheck over u_in,
evaluate the output claim Z(u_out || u_bs), and open the weight commitment at
u_out || u_in. The reference discards Z(u) and the opening (SURVEY.md §0.1); we
keep both and verify: sumcheck rounds, final a*b binding, Z-claim equality with
the sumcheck's initial claim, and the Pedersen opening (bound to the row
commitments, with final_scalar == the sumcheck's W-side final claim)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..commit import pedersen
from ..curve import g1
from ..field import fr, host
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource
from ..tensor import fr_ops

HF = host.fr


def field_matmul(X: jax.Array, W: jax.Array, in_size: int, out_size: int, block: int = 64) -> jax.Array:
    """Z = X @ W over Fr (Montgomery). X: (batch*in, 8); W: (in*out, 8).

    Blocked over output columns: for each block, broadcast-multiply
    (batch, in, blk) elementwise and tree-reduce the `in` axis with modular adds.
    """
    batch = X.shape[0] // in_size
    Xm = X.reshape(batch, in_size, 8)
    Wm = W.reshape(in_size, out_size, 8)
    blocks = []
    for j0 in range(0, out_size, block):
        j1 = min(j0 + block, out_size)
        prod = fr.mul(Xm[:, :, None, :], Wm[None, :, j0:j1, :])  # (b, in, blk, 8)
        # modular tree-reduction along `in`
        while prod.shape[1] > 1:
            m = prod.shape[1]
            if m % 2:
                prod = jnp.concatenate([prod, jnp.zeros_like(prod[:, :1])], axis=1)
            prod = fr.add(prod[:, 0::2], prod[:, 1::2])
        blocks.append(prod[:, 0])
    Z = jnp.concatenate(blocks, axis=1)  # (batch, out, 8)
    return Z.reshape(batch * out_size, 8)


field_matmul_jit = jax.jit(field_matmul, static_argnums=(2, 3, 4))


@dataclasses.dataclass
class ZkFC:
    """Layer parameters. weights: (in_size*out_size, 8) Montgomery, padded to
    powers of two; gens: generator vector; com: row commitments (m,)."""

    in_size: int
    out_size: int
    weights: jax.Array
    gens: g1.G1Jac
    com: g1.G1Jac

    @staticmethod
    def gen_size_for(in_size: int, out_size: int) -> int:
        # 2^ceil((log2(in*out)+1)/2)  (demo.cu:81)
        return 1 << ((fr_ops.ceil_log2(in_size * out_size) + 1) // 2)

    @classmethod
    def from_float(cls, w: np.ndarray, key: jax.Array) -> "ZkFC":
        """w: float (in, out) unpadded. Quantizes, pads, commits (zkfc.cu:90-104)."""
        from . import quantize

        weights = quantize.load_weights(w)
        in_p = 1 << fr_ops.ceil_log2(w.shape[0])
        out_p = 1 << fr_ops.ceil_log2(w.shape[1])
        gens = pedersen.setup(key, cls.gen_size_for(in_p, out_p))
        com = pedersen.commit(gens, weights)
        return cls(in_p, out_p, weights, gens, com)

    def __call__(self, X: jax.Array) -> jax.Array:
        assert X.shape[0] % self.in_size == 0
        return field_matmul_jit(X, self.weights, self.in_size, self.out_size)


@dataclasses.dataclass
class ZkFCProof:
    u_bs: jax.Array
    u_in: jax.Array
    u_out: jax.Array
    ip_polys: jax.Array  # (log in, 3, 8)
    ip_finals: jax.Array  # (2, 8): X'(u_in), W'(u_in)
    z_claim: jax.Array  # (8,)  Z(u_out || u_bs)
    opening: pedersen.OpeningProof


def _fc_prove_core(X, W, Z, u_bs, u_in, u_out, in_size, out_size):
    """Pieces dispatch internally-jitted per-round kernels (shape-shared)."""
    X_folded = fr_ops.partial_me(X, u_bs, in_size) if u_bs.shape[0] else X
    W_folded = fr_ops.partial_me(W, u_out, 1)
    ip_polys, ip_finals = sc.inner_product_prove(X_folded, W_folded, u_in)
    z_claim = fr_ops.me_eval(Z, jnp.concatenate([u_out, u_bs], axis=0))
    return ip_polys, ip_finals, z_claim


def prove(layer: ZkFC, X: jax.Array, Z: jax.Array, challenges: ChallengeSource) -> ZkFCProof:
    """Mirror of zkFC::prove (zkfc.cu:128-145); challenge order matches
    (u_bs, u_in_dim, u_out_dim)."""
    batch = X.shape[0] // layer.in_size
    u_bs = challenges.random_vec(fr_ops.ceil_log2(batch))
    u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))
    u_out = challenges.random_vec(fr_ops.ceil_log2(layer.out_size))
    ip_polys, ip_finals, z_claim = _fc_prove_core(
        X, layer.weights, Z, u_bs, u_in, u_out, layer.in_size, layer.out_size
    )
    u_w = jnp.concatenate([u_out, u_in], axis=0)
    opening = pedersen.open(layer.gens, layer.weights, layer.com, u_w)
    proof = ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return proof


def verify(layer_com: g1.G1Jac, proof: ZkFCProof) -> tuple[bool, str]:
    """Verify the matmul sumcheck and the weight-commitment opening.

    The initial sumcheck claim is the proof's Z(u_out||u_bs) — at model level
    this same Z tensor chains into the adjacent ReLU proof. The W-side final
    claim must equal the Pedersen opening's final scalar (same MLE point,
    variable order irrelevant for multilinear evals)."""
    u_in = sc.scalars_to_ints(proof.u_in)
    claim = sc.scalars_to_ints(proof.z_claim[None])[0]
    res = sc.inner_product_verify(sc.polys_to_ints(proof.ip_polys), u_in, claim)
    if not res.ok:
        return False, "ip: " + res.reason
    fa, fb = sc.scalars_to_ints(proof.ip_finals)
    if not sc.inner_product_check_final(res, fa, fb):
        return False, "ip: final product mismatch"
    u_w = sc.scalars_to_ints(jnp.concatenate([proof.u_out, proof.u_in], axis=0))
    ok, msg = pedersen.verify_open(proof.opening, u_w, expected_value=fb)
    if not ok:
        return False, "open: " + msg
    ok, msg = pedersen.verify_open_against_com(proof.opening, layer_com, u_w)
    if not ok:
        return False, "open: " + msg
    return True, ""
