"""Full-model SPMD prover: every sumcheck of mlp.MLP.prove dp-sharded.

SURVEY.md §5.7-5.8 / §7 stage 7 (nothing distributed exists in the reference;
/root/reference/README.md:135 lists multi-GPU as future work). Sharding scheme:

- Every protocol tensor (Z/A activations, mag_bin, rem_bin, sign) is
  block-sharded over its flat element axis on the "dp" mesh axis. Sumcheck
  rounds bind LOW index bits, i.e. adjacent pairs — local to a device block —
  so the first log2(n/n_dev) rounds of every sumcheck run without any
  communication except one modular psum (collectives.psum_fr) per round
  coefficient; after that each device holds ONE residue, which is
  all-gathered (n_dev elements — tiny) and the last log2(n_dev) rounds run
  replicated.
- The point-anchored protocols (binary/hadamard) evaluate their round
  coefficient tensors at the remaining challenge tail: the local fold chain
  binds the low variables, the device-index bits are bound by weighting each
  device's residue with eq(u_dev_bits, device_index) inside the psum.
- Weights and challenges are replicated; the transcript is host-side and
  identical on every device (communication-free Fiat-Shamir).
- Commitments: row-axis sharded partial dlog sums (the G1 side is one
  scalar-mul per row on the local rows).

All arithmetic is exact modular integer math, and every reduction is
canonicalized (collectives.py), so the emitted proof stream is BIT-IDENTICAL
to the single-device prover (tests assert at n_dev in {2, 4, 8}).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import fr
from ..models import zkfc, zkrelu
from ..sumcheck import protocols as sc
from ..sumcheck.transcript import ChallengeSource, FiatShamir
from ..tensor import fr_ops
from . import collectives


def _dev_eq_weight(u_dev: jax.Array, axis: str) -> jax.Array:
    """eq(u_dev, axis_index) — this device's eq-weight over the device bits.
    u_dev: (ld, 8) mont. Returns (8,). Round-independent: the device bits are
    always the HIGHEST index bits of every protocol tensor."""
    d = jax.lax.axis_index(axis)
    one = jnp.asarray(fr.ONE_MONT)
    w = one
    for t in range(u_dev.shape[0]):
        bit = (d >> t) & 1
        factor = jnp.where(bit == 1, u_dev[t], fr.sub(one, u_dev[t]))
        w = fr.mul(w, factor)
    return w


def _fold_padded(a: jax.Array, x: jax.Array) -> jax.Array:
    """Fixed-shape fold (protocols.py scan-prover trick): fold pairs into the
    first half, zero the tail. Zeros stay zeros through every later round."""
    n = a.shape[0]
    p = a.reshape(n // 2, 2, 8)
    a0, a1 = p[:, 0], p[:, 1]
    folded = fr.add(a0, fr.mul(jnp.broadcast_to(x, a0.shape), fr.sub(a1, a0)))
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)


def _me_eval_padded(c: jax.Array, tail: jax.Array) -> jax.Array:
    """MLE eval at a fixed-length variable vector; trailing zero variables
    select index 0 (see protocols.py scan provers)."""
    for i in range(tail.shape[0]):
        p = c.reshape(c.shape[0] // 2, 2, 8)
        a0, a1 = p[:, 0], p[:, 1]
        c = fr.add(a0, fr.mul(jnp.broadcast_to(tail[i], a0.shape), fr.sub(a1, a0)))
    return c[0]


def _local_tails(u: jax.Array, lr: int, ld: int) -> jax.Array:
    """tails[i] = [u[i+1], ..., u[lr+ld-1-ld], 0...] of fixed width lr-1 — the
    LOCAL-variable suffix for round i (device bits u[-ld:] excluded)."""
    r = u.shape[0]
    width = max(lr - 1, 0)
    rows = []
    for i in range(lr):
        real = u[i + 1 : r - ld]
        pad = jnp.zeros((width - real.shape[0], 8), dtype=jnp.uint32)
        rows.append(jnp.concatenate([real, pad], axis=0))
    if not rows:
        return jnp.zeros((0, width, 8), dtype=jnp.uint32)
    return jnp.stack(rows)


def _sharded_pa_prove(mesh, tensors, u, v, coeff_fn, axis):
    """Shared scan-bodied driver for the point-anchored sumchecks
    (binary/hadamard). `tensors` is a tuple of dp-sharded (n, 8) arrays; the
    local rounds run as ONE lax.scan (a single compiled round body — the
    unrolled-round graphs are multi-minute XLA compiles), with each round's
    three coefficient sums evaluated as local padded folds x the device
    eq-weight, modular-psum'd; then the n_dev residues are all-gathered and
    the device-bit rounds run replicated (second tiny scan)."""
    n, r = tensors[0].shape[0], u.shape[0]
    n_dev = mesh.shape[axis]
    assert n == (1 << r) and n % n_dev == 0, (n, r, n_dev)
    lr = fr_ops.ceil_log2(n // n_dev)
    ld = r - lr

    def fn(u_all, v_all, *blks):
        w_dev = _dev_eq_weight(u_all[r - ld :], axis)
        tails = _local_tails(u_all, lr, ld)

        def body(carry, xs):
            x, tail = xs
            cs = coeff_fn(*carry)
            evals = [
                collectives.psum_fr(fr.mul(_me_eval_padded(c, tail), w_dev), axis)
                for c in cs
            ]
            new = tuple(_fold_padded(t, x) for t in carry)
            return new, jnp.stack(evals)

        carry = tuple(blks)
        if lr:
            carry, local_polys = jax.lax.scan(body, carry, (v_all[:lr], tails))
        else:
            local_polys = jnp.zeros((0, 3, 8), jnp.uint32)
        # residues: each device's valid element is local index 0
        gathered = tuple(
            jax.lax.all_gather(t[0:1], axis, axis=0).reshape(n_dev, 8) for t in carry
        )

        if ld:
            gtails = sc._tails(u_all[r - ld :])

            def gbody(carry, xs):
                x, tail = xs
                cs = coeff_fn(*carry)
                evals = [_me_eval_padded(c, tail) for c in cs]
                new = tuple(_fold_padded(t, x) for t in carry)
                return new, jnp.stack(evals)

            gathered, g_polys = jax.lax.scan(gbody, gathered, (v_all[lr:], gtails))
            polys = jnp.concatenate([local_polys, g_polys], axis=0)
        else:
            polys = local_polys
        finals = jnp.stack([t[0] for t in gathered])
        return polys, finals

    in_specs = (P(), P()) + tuple(P(axis) for _ in tensors)
    shard_fn = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=(P(), P()), check_vma=False)
    return jax.jit(shard_fn)(u, v, *tensors)


def sharded_binary_prove(mesh: Mesh, a: jax.Array, u: jax.Array, v: jax.Array, axis: str = "dp"):
    """Distributed binary_prove; stream-identical to protocols.binary_prove."""

    def coeffs(a):
        p = a.reshape(a.shape[0] // 2, 2, 8)
        a0, a1 = p[:, 0], p[:, 1]
        d = fr.sub(a1, a0)
        return (fr.sub(fr.mul(a0, a0), a0), fr.sub(fr.mul(fr.double(a0), d), d), fr.mul(d, d))

    polys, finals = _sharded_pa_prove(mesh, (a,), u, v, coeffs, axis)
    return polys, finals[0]


def sharded_hadamard_prove(mesh: Mesh, a: jax.Array, b: jax.Array, u: jax.Array, v: jax.Array,
                           axis: str = "dp"):
    """Distributed hadamard_prove; stream-identical to protocols.hadamard_prove."""

    def coeffs(a, b):
        pa = a.reshape(a.shape[0] // 2, 2, 8)
        pb = b.reshape(b.shape[0] // 2, 2, 8)
        a0, a1, b0, b1 = pa[:, 0], pa[:, 1], pb[:, 0], pb[:, 1]
        da, db = fr.sub(a1, a0), fr.sub(b1, b0)
        return (fr.mul(a0, b0), fr.add(fr.mul(a0, db), fr.mul(b0, da)), fr.mul(da, db))

    return _sharded_pa_prove(mesh, (a, b), u, v, coeffs, axis)


def sharded_partial_me(mesh: Mesh, t: jax.Array, u: jax.Array, window: int, axis: str = "dp"):
    """Distributed fr_ops.partial_me: fold the window-major element axis at u,
    keeping the `window`-minor axis. t: (n_el * window, 8) dp-sharded."""
    n_el = t.shape[0] // window
    n_dev = mesh.shape[axis]
    r = u.shape[0]
    assert n_el == (1 << r) and n_el % n_dev == 0, (n_el, r, n_dev)
    lr = fr_ops.ceil_log2(n_el // n_dev)

    def fn(t_blk, u_all):
        def body(t, x):
            t3 = t.reshape(-1, 2, window, 8)
            t0, t1 = t3[:, 0], t3[:, 1]
            folded = fr.add(t0, fr.mul(jnp.broadcast_to(x, t0.shape), fr.sub(t1, t0)))
            out = jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)
            return out.reshape(-1, 8), None

        t = t_blk
        if lr:
            t, _ = jax.lax.scan(body, t, u_all[:lr])
        t_g = jax.lax.all_gather(t[:window], axis, axis=0).reshape(n_dev * window, 8)
        for i in range(lr, r):
            t3 = t_g.reshape(-1, 2, window, 8)
            t0, t1 = t3[:, 0], t3[:, 1]
            t_g = fr.add(t0, fr.mul(jnp.broadcast_to(u_all[i], t0.shape), fr.sub(t1, t0))).reshape(-1, 8)
        return t_g

    shard_fn = jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P()),
                             out_specs=P(), check_vma=False)
    return jax.jit(shard_fn)(t, u)


def sharded_me_eval(mesh: Mesh, t: jax.Array, u: jax.Array, axis: str = "dp") -> jax.Array:
    """Distributed fr_ops.me_eval of a dp-sharded (2^r, 8) tensor."""
    n, r = t.shape[0], u.shape[0]
    n_dev = mesh.shape[axis]
    assert n == (1 << r) and n % n_dev == 0
    lr = fr_ops.ceil_log2(n // n_dev)
    ld = r - lr

    def fn(t_blk, u_all):
        def body(t, x):
            return _fold_padded(t, x), None

        t = t_blk
        if lr:
            t, _ = jax.lax.scan(body, t, u_all[:lr])
        w = _dev_eq_weight(u_all[r - ld :], axis)
        return collectives.psum_fr(fr.mul(t[0], w), axis)

    shard_fn = jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(),
                             check_vma=False)
    return jax.jit(shard_fn)(t, u)


def sharded_commit_dlogs(mesh: Mesh, t: jax.Array, dlogs: jax.Array, axis: str = "dp") -> jax.Array:
    """Row-sharded fast-path commitment scalars: sigma_row = sum_i t[row,i]*r_i
    with rows distributed over the mesh (SURVEY §5.8: per-device partial sums;
    the per-row G1 exponentiation then runs on the local rows).

    t: (m * gen_size, 8) row-sharded; dlogs: (gen_size, 8) replicated.
    Returns (m, 8) mont sigma rows (replicated)."""
    gen_size = dlogs.shape[0]
    m = t.shape[0] // gen_size
    n_dev = mesh.shape[axis]
    assert m % n_dev == 0, (m, n_dev)

    def fn(t_blk, d):
        t3 = t_blk.reshape(-1, gen_size, 8)
        prods = fr.mul(t3, jnp.broadcast_to(d, t3.shape))
        s = prods
        while s.shape[1] > 1:
            if s.shape[1] % 2:
                s = jnp.concatenate([s, jnp.zeros_like(s[:, :1])], axis=1)
            s = fr.add(s[:, 0::2], s[:, 1::2])
        return s[:, 0]

    shard_fn = jax.shard_map(fn, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
                             check_vma=False)
    return jax.jit(shard_fn)(t, dlogs)


# ---------------------------------------------------------------------------
# full-model sharded prover
# ---------------------------------------------------------------------------


def _shard(mesh, x, axis="dp"):
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def _fc_prove_sharded(mesh, layer, X, Z, challenges):
    """Sharded zkFC.prove: stream-identical to zkfc.prove (unchained)."""
    batch = X.shape[0] // layer.in_size
    u_bs = challenges.random_vec(fr_ops.ceil_log2(batch))
    u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))
    u_out = challenges.random_vec(fr_ops.ceil_log2(layer.out_size))

    X_f = sharded_partial_me(mesh, X, u_bs, layer.in_size) if u_bs.shape[0] else X
    W_f = jax.jit(fr_ops.partial_me, static_argnums=(2,))(layer.weights, u_out, 1)
    # the folded operands are in_size-scale (replicated); finish locally
    ip_polys, ip_finals = sc.inner_product_prove_jit(X_f, W_f, u_in)
    z_claim = sharded_me_eval(mesh, Z, jnp.concatenate([u_out, u_bs], axis=0))
    from ..commit import pedersen

    opening = pedersen.open(layer.gens, layer.weights, layer.com, jnp.concatenate([u_out, u_in], axis=0))
    proof = zkfc.ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return proof


def _relu_prove_sharded(mesh, X, aux, challenges):
    """Sharded zkReLU.prove: stream-identical to zkrelu.prove (unchained)."""
    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    Q, R = zkrelu.Q, zkrelu.R
    u_z = challenges.random_vec(log_size + zkrelu.LOG_Q)
    v_z = challenges.random_vec(log_size + zkrelu.LOG_Q)
    u_r = challenges.random_vec(log_size + zkrelu.LOG_R)
    v_r = challenges.random_vec(log_size + zkrelu.LOG_R)
    u_rec = challenges.random_vec(log_size)
    u_hp = challenges.random_vec(log_size)
    v_hp = challenges.random_vec(log_size)

    mag_bin = _shard(mesh, aux["mag_bin"])
    rem_bin = _shard(mesh, aux["rem_bin"])
    sign = _shard(mesh, aux["sign"])

    mag_polys, mag_final = sharded_binary_prove(mesh, mag_bin, u_z, v_z)
    mag_at_u = sharded_partial_me(mesh, mag_bin, u_rec, Q)
    rem_polys, rem_final = sharded_binary_prove(mesh, rem_bin, u_r, v_r)
    rem_at_u = sharded_partial_me(mesh, rem_bin, u_rec, R)
    hp_polys, hp_finals = sharded_hadamard_prove(mesh, X, sign, u_hp, v_hp)
    hp_claim = sharded_me_eval(mesh, jax.jit(fr.mul)(X, sign), u_hp)

    proof = zkrelu.ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_at_u, rem_at_u, hp_claim,
    )
    challenges.absorb_array(mag_polys)
    challenges.absorb_array(rem_polys)
    challenges.absorb_array(hp_polys)
    return proof


def _bits_u32(t: jax.Array) -> jax.Array:
    """Montgomery 0/1-valued tensor -> u32 bit array (1 - is_zero)."""
    from ..field import mp

    return (~mp.is_zero(t)).astype(jnp.uint32)


def commit_aux_sharded(mesh: Mesh, aux: dict, axis: str = "dp"):
    """Row-sharded NUMS aux commitments: each tensor's bit rows are
    distributed over the mesh axis; the per-row masked generator sums
    (pedersen._commit_bits_rows) are row-local, so XLA partitions them with
    zero collectives and the resulting points are bit-identical to the
    single-device commit_aux (same reduction tree). Falls back to a
    replicated layout when the row count doesn't divide the mesh."""
    from ..commit import pedersen
    from ..models import zkrelu

    n_dev = mesh.shape[axis]

    def commit_one(t):
        bits = _bits_u32(t)
        gens = zkrelu._aux_gens(bits.shape[0])
        m = bits.shape[0] // gens.size
        bits2 = bits.reshape(m, gens.size)
        if m % n_dev == 0:
            bits2 = jax.device_put(bits2, NamedSharding(mesh, P(axis, None)))
        points = pedersen._commit_bits_rows(bits2, gens.points)
        if m % n_dev == 0:  # replicate for the host-side transcript absorb
            points = jax.device_put(points, NamedSharding(mesh, P()))
        return pedersen.RowCommitments(points=points)

    return zkrelu.AuxCommitments(
        sign=commit_one(aux["sign"]),
        mag=commit_one(aux["mag_bin"]),
        rem=commit_one(aux["rem_bin"]),
    )


def _relu_prove_sharded_chained(mesh, X, aux, challenges, chain_point,
                                aux_com=None):
    """Sharded chained (and optionally committed-aux) zkReLU prover:
    stream-identical to zkrelu.prove_planar(chain_point=..., aux_com=...) —
    same draw schedule (u_z, v_z, u_r, v_r, u_rec=v_a, u_hp, v_hp [, w_q,
    w_r]), same absorbs (mag, rem, hp, a polys), with every sumcheck, fold,
    and MLE dp-sharded. The A = sign (.) mont(mag) product sumcheck runs as a
    sharded Hadamard anchored at the downstream FC's point; mont(mag) is the
    recombination of the sharded bit tensor (zkrescale._recombine_tensor)."""
    from ..commit import pedersen
    from ..models import zkrescale

    n = X.shape[0]
    log_size = fr_ops.ceil_log2(n)
    Q, R = zkrelu.Q, zkrelu.R
    if aux_com is not None:
        zkrelu._absorb_aux_coms(challenges, aux_com)
    u_z = challenges.random_vec(log_size + zkrelu.LOG_Q)
    v_z = challenges.random_vec(log_size + zkrelu.LOG_Q)
    u_r = challenges.random_vec(log_size + zkrelu.LOG_R)
    v_r = challenges.random_vec(log_size + zkrelu.LOG_R)
    u_rec = challenges.random_vec(log_size)  # == v_a (fold vector of the A-product)
    u_hp = challenges.random_vec(log_size)
    v_hp = challenges.random_vec(log_size)
    w_q = challenges.random_vec(zkrelu.LOG_Q) if aux_com is not None else None
    w_r = challenges.random_vec(zkrelu.LOG_R) if aux_com is not None else None

    mag_bin = _shard(mesh, aux["mag_bin"])
    rem_bin = _shard(mesh, aux["rem_bin"])
    sign = _shard(mesh, aux["sign"])

    mag_polys, mag_final = sharded_binary_prove(mesh, mag_bin, u_z, v_z)
    mag_at_u = sharded_partial_me(mesh, mag_bin, u_rec, Q)
    rem_polys, rem_final = sharded_binary_prove(mesh, rem_bin, u_r, v_r)
    rem_at_u = sharded_partial_me(mesh, rem_bin, u_rec, R)
    hp_polys, hp_finals = sharded_hadamard_prove(mesh, X, sign, u_hp, v_hp)
    hp_claim = sharded_me_eval(mesh, jax.jit(fr.mul)(X, sign), u_hp)

    mag_mont = _shard(mesh, zkrescale._recombine_tensor(aux["mag_bin"], Q))
    a_polys, a_finals = sharded_hadamard_prove(mesh, mag_mont, sign, chain_point, u_rec)
    x_at_va = sharded_me_eval(mesh, X, u_rec)

    proof = zkrelu.ZkReluProof(
        u_z, v_z, u_r, v_r, u_rec, u_hp, v_hp,
        mag_polys, mag_final, rem_polys, rem_final, hp_polys, hp_finals,
        mag_at_u, rem_at_u, hp_claim,
        chain_point, a_polys, a_finals, x_at_va,
    )
    if aux_com is not None:
        proof.aux_coms = aux_com
        proof.w_q, proof.w_r = w_q, w_r
        gsz = lambda size: zkrelu._aux_gens(size).size  # noqa: E731

        def fold_open(t, point):
            gen_size = gsz(t.shape[0])
            log_m = point.shape[0] - fr_ops.ceil_log2(gen_size)
            u_row = point[point.shape[0] - log_m:]
            folded = sharded_partial_me(mesh, t, u_row, gen_size) if log_m else t
            return pedersen.FoldOpening(t_folded=folded)

        proof.open_mag_bin = fold_open(mag_bin, v_z)
        proof.open_mag_rec = fold_open(mag_bin, jnp.concatenate([w_q, u_rec], axis=0))
        proof.open_rem_bin = fold_open(rem_bin, v_r)
        proof.open_rem_rec = fold_open(rem_bin, jnp.concatenate([w_r, u_rec], axis=0))
        proof.open_sign_hp = fold_open(sign, v_hp)
        proof.open_sign_rec = fold_open(sign, u_rec)
    challenges.absorb_array(mag_polys)
    challenges.absorb_array(rem_polys)
    challenges.absorb_array(hp_polys)
    challenges.absorb_array(a_polys)
    return proof


def _fc_prove_sharded_chained(mesh, layer, X, Z, challenges, z_point):
    """Sharded chained zkFC prover: (u_out || u_bs) fixed to the adjacent
    ReLU's point, only u_in drawn (stream-identical to
    zkfc.prove_planar(z_point=...))."""
    from ..commit import pedersen

    batch = X.shape[0] // layer.in_size
    lo = fr_ops.ceil_log2(layer.out_size)
    assert z_point.shape[0] == lo + fr_ops.ceil_log2(batch)
    u_out, u_bs = z_point[:lo], z_point[lo:]
    u_in = challenges.random_vec(fr_ops.ceil_log2(layer.in_size))

    X_f = sharded_partial_me(mesh, X, u_bs, layer.in_size) if u_bs.shape[0] else X
    W_f = jax.jit(fr_ops.partial_me, static_argnums=(2,))(layer.weights, u_out, 1)
    ip_polys, ip_finals = sc.inner_product_prove_jit(X_f, W_f, u_in)
    z_claim = sharded_me_eval(mesh, Z, jnp.concatenate([u_out, u_bs], axis=0))
    opening = pedersen.open(layer.gens, layer.weights, layer.com,
                            jnp.concatenate([u_out, u_in], axis=0))
    proof = zkfc.ZkFCProof(u_bs, u_in, u_out, ip_polys, ip_finals, z_claim, opening)
    challenges.absorb_array(ip_polys)
    challenges.absorb_array(z_claim)
    return proof


def prove_sharded(model, X, Y_hat, Z_list, A_list, aux_list, mesh: Mesh,
                  challenges: ChallengeSource | None = None,
                  chain: bool = False, commit_aux: bool = False):
    """Distributed mlp.MLP.prove: every layer sumcheck runs dp-sharded over
    `mesh`. chain=False emits the unchained stream (bit-identical to
    model.prove(..., chain=False) with the (n, 8) prover); chain=True emits
    the GKR-style chained stream (bit-identical to the planar chained prover:
    shared evaluation points ride the transcript as replicated host scalars —
    no new collectives), and commit_aux=True adds the committed-aux tier with
    row-sharded NUMS commitments + dp-sharded revealed-fold openings."""
    from ..models import mlp as mlp_mod

    if commit_aux and not chain:
        raise ValueError("committed aux requires chained mode")
    if challenges is None:
        challenges = FiatShamir()
    mlp_mod.absorb_statement(challenges, model.layers, X, Y_hat)
    n_layers = len(model.layers)
    fc_proofs: list = [None] * n_layers
    relu_proofs: list = [None] * (n_layers - 1)
    X_sh = _shard(mesh, X)
    Z_sh = [_shard(mesh, z) for z in Z_list]
    A_sh = [_shard(mesh, a) for a in A_list]
    Y_sh = _shard(mesh, Y_hat)
    fc_proofs[n_layers - 1] = _fc_prove_sharded(
        mesh, model.layers[n_layers - 1], A_sh[n_layers - 2] if n_layers >= 2 else X_sh, Y_sh, challenges
    )
    for i in range(n_layers - 2, -1, -1):
        A_prev = A_sh[i - 1] if i > 0 else X_sh
        if chain:
            w = jnp.concatenate([fc_proofs[i + 1].u_in, fc_proofs[i + 1].u_bs], axis=0)
            aux_com = commit_aux_sharded(mesh, aux_list[i]) if commit_aux else None
            relu_proofs[i] = _relu_prove_sharded_chained(
                mesh, Z_sh[i], aux_list[i], challenges, w, aux_com=aux_com
            )
            fc_proofs[i] = _fc_prove_sharded_chained(
                mesh, model.layers[i], A_prev, Z_sh[i], challenges,
                z_point=relu_proofs[i].u_recover,
            )
        else:
            relu_proofs[i] = _relu_prove_sharded(mesh, Z_sh[i], aux_list[i], challenges)
            fc_proofs[i] = _fc_prove_sharded(mesh, model.layers[i], A_prev, Z_sh[i], challenges)
    return mlp_mod.MLPProof(fc_proofs, relu_proofs)
