"""Sharded provers: SPMD sumcheck + field matmul over a jax.sharding.Mesh.

Design (SURVEY.md §5.7-5.8, new — nothing distributed exists in the reference):

- Data parallel ("dp") shards the *leading/batch* axis of every multilinear
  extension. Sumcheck folds pair adjacent flat indices (low variables), which
  live inside a device's contiguous block, so the first log2(n_local) rounds are
  purely local; round coefficient sums become modular psums (collectives.py).
  Once one element remains per device, the per-device residues are all-gathered
  (tiny: n_dev elements) and the final log2(n_dev) rounds run replicated.
- Tensor parallel ("tp") shards the output-feature axis of the weight matmul;
  forward Z = X @ W shards columns, no collective needed until folding.
- Challenges are replicated inputs — every device computes the identical
  transcript (communication-free Fiat-Shamir).

Proof outputs are bit-identical to the single-device prover: modular partial
sums are canonicalized at every reduction."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import fr
from ..tensor import fr_ops
from . import collectives


def _local_ip_rounds(a, b, u, n_rounds, axis_name):
    """Run n_rounds inner-product sumcheck rounds on local blocks; coefficient
    sums are cross-device modular psums. Returns (polys list, a, b) with one
    local element left."""
    polys = []
    for i in range(n_rounds):
        a0, a1 = a[0::2], a[1::2]
        b0, b1 = b[0::2], b[1::2]
        da, db = fr.sub(a1, a0), fr.sub(b1, b0)
        c0 = collectives.fr_sum_local_then_psum(fr.mul(a0, b0), axis_name)
        c1 = collectives.fr_sum_local_then_psum(fr.add(fr.mul(a0, db), fr.mul(b0, da)), axis_name)
        c2 = collectives.fr_sum_local_then_psum(fr.mul(da, db), axis_name)
        polys.append(jnp.stack([c0, c1, c2]))
        x = jnp.broadcast_to(u[i], a0.shape)
        a = fr.add(a0, fr.mul(x, da))
        b = fr.add(b0, fr.mul(x, db))
    return polys, a, b


def sharded_inner_product_prove(mesh: Mesh, a: jax.Array, b: jax.Array, u: jax.Array, axis: str = "dp"):
    """Distributed inner_product_prove; bit-identical output to the
    single-device version (protocols.inner_product_prove)."""
    n = a.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0 and (n // n_dev) & (n // n_dev - 1) == 0, (n, n_dev)
    n_local = n // n_dev
    local_rounds = fr_ops.ceil_log2(n_local)
    total_rounds = u.shape[0]
    assert total_rounds == local_rounds + fr_ops.ceil_log2(n_dev)

    def fn(a_blk, b_blk, u_all):
        polys, a1, b1 = _local_ip_rounds(a_blk, b_blk, u_all, local_rounds, axis)
        # gather the n_dev per-device residues; remaining rounds replicated
        a_g = jax.lax.all_gather(a1, axis, axis=0).reshape(n_dev, 8)
        b_g = jax.lax.all_gather(b1, axis, axis=0).reshape(n_dev, 8)
        for i in range(local_rounds, total_rounds):
            a0g, a1g = a_g[0::2], a_g[1::2]
            b0g, b1g = b_g[0::2], b_g[1::2]
            dag, dbg = fr.sub(a1g, a0g), fr.sub(b1g, b0g)
            c0 = fr_ops.fr_sum(fr.mul(a0g, b0g))
            c1 = fr_ops.fr_sum(fr.add(fr.mul(a0g, dbg), fr.mul(b0g, dag)))
            c2 = fr_ops.fr_sum(fr.mul(dag, dbg))
            polys.append(jnp.stack([c0, c1, c2]))
            x = jnp.broadcast_to(u_all[i], a0g.shape)
            a_g = fr.add(a0g, fr.mul(x, dag))
            b_g = fr.add(b0g, fr.mul(x, dbg))
        return jnp.stack(polys), jnp.stack([a_g[0], b_g[0]])

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn)(a, b, u)


def sharded_field_matmul(mesh: Mesh, X: jax.Array, W: jax.Array, in_size: int, out_size: int,
                         dp_axis: str = "dp", tp_axis: str = "tp"):
    """Z = X @ W over Fr with batch sharded on dp and out-features on tp.
    X: (batch*in, 8) dp-sharded rows; W: (in*out, 8) tp-sharded columns.
    Returns Z (batch*out, 8) sharded (dp, tp)."""
    from ..models import zkfc

    n_tp = mesh.shape[tp_axis]
    assert out_size % n_tp == 0

    def fn(x_blk, w_blk):
        # x_blk: (batch_local*in, 8); w_blk: (in, out/n_tp, 8)
        out_local = out_size // n_tp
        b_local = x_blk.shape[0] // in_size
        z = zkfc.field_matmul(x_blk, w_blk.reshape(-1, 8), in_size, out_local)
        return z.reshape(b_local, out_local, 8)

    W3 = W.reshape(in_size, out_size, 8)
    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(dp_axis), P(None, tp_axis, None)),
        out_specs=P(dp_axis, tp_axis, None),
        check_vma=False,
    )
    Z = jax.jit(shard_fn)(X, W3)  # (batch, out, 8) sharded (dp, tp)
    return Z.reshape(-1, 8)


def make_mesh(n_devices: int, shape: tuple[int, ...] | None = None, names=("dp", "tp")):
    devs = jax.devices()[:n_devices]
    if shape is None:
        shape = (n_devices // 2, 2) if n_devices % 2 == 0 and n_devices > 1 else (n_devices, 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, names[: len(shape)])
